from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
    (3, "completely different content about spark dataframes and catalyst optimizer rules"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (5, "another unrelated document talking about minhash signatures and lsh banding"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = dedup.exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 4]


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(_docs(spark), k=3, threshold=0.5).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0
    assert (3, 5) not in pairs


def test_minhash_agrees_with_exact_on_extremes(spark):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
             dedup.minhash_lsh_pairs(_docs(spark), k=3, threshold=0.5).collect()}
    assert pairs[(1, 4)] == 1.0  # identical docs always collide
    assert (3, 5) not in pairs


def test_minhash_recall_vs_exact(spark, sequences):
    """On the documents testdata: every exact-Jaccard≥0.8 pair must be
    found by LSH (banding threshold ~0.55 for 16 bands × 4 rows)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in
             dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.8).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in
              dedup.minhash_lsh_pairs(docs, k=3, threshold=0.5).collect()}
    missed = exact - approx
    assert len(missed) <= max(1, len(exact) // 10), f"LSH recall too low: missed {missed}"


def test_simhash_identical_distance_zero(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(_docs(spark)).collect()}
    assert sigs[1] == sigs[4]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(_docs(spark), max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0


def test_embedding_near_dups(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    v = rng.randn(16).astype(np.float32)
    rows = [
        (1, v.tolist(), 0),
        (2, (v + rng.randn(16).astype(np.float32) * 0.001).tolist(), 0),
        (3, rng.randn(16).astype(np.float32).tolist(), 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.embedding_near_dups(df, threshold=0.99, dim=16).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_blocking_complete_vs_bruteforce(spark):
    """Pigeonhole blocking must be lossless: blocked pairs == the full
    O(n²) Hamming-threshold pairs, for a bound ABOVE the old fixed
    4-block guarantee (max_hamming=5 needs 6 blocks)."""
    import itertools

    from teleharvest_spark.functions import text as TXT

    texts = [
        " ".join(f"w{(i * 7 + j) % 23}" for j in range(12 + i % 5))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 5:
            want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_pairs(df, max_hamming=5).collect()
    }
    assert got == want
    assert want  # non-vacuous: the fixture must contain near pairs
    # the block-PAIR scheme (the large-corpus path) must be equally
    # lossless: h+2 blocks => at least two agree => some pair agrees
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_pairs(
            df, max_hamming=5, scheme="block_pairs"
        ).collect()
    }
    assert got_pairs == want


def test_simhash_kernel_trailing_empty_rows():
    """The reduceat segmentation must not truncate the last non-empty
    row's segment when the batch ends with empty/null arrays."""
    import numpy as np
    import pandas as pd

    from teleharvest_spark.operators.dedup import _simhash_kernel

    shifts = np.arange(64, dtype=np.uint64)
    h = [7, -12345678901234, 42]
    alone = _simhash_kernel(pd.Series([h]), shifts)
    padded = _simhash_kernel(pd.Series([h, [], None]), shifts)
    assert padded.iloc[0] == alone.iloc[0]  # full segment summed
    assert padded.iloc[1] == 0 and padded.iloc[2] == 0
    # empty rows interleaved (segment boundaries shared with next row)
    mixed = _simhash_kernel(pd.Series([[], h, [], [5], []]), shifts)
    assert mixed.iloc[1] == alone.iloc[0]
    assert mixed.iloc[0] == 0 and mixed.iloc[2] == 0 and mixed.iloc[4] == 0


def test_pair_ops_leave_no_cached_plans(spark):
    """minhash_lsh_pairs / ngram_jaccard_pairs must not leak persisted
    intermediates: after repeated default-mode invocations the
    CacheManager is empty (localCheckpoint blocks are RDD-level and
    GC-managed, not CacheManager entries)."""
    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(30)],
        "doc_id long, text string",
    )
    for _ in range(3):
        assert dedup.minhash_lsh_pairs(df, k=3).count() >= 0
        assert dedup.ngram_jaccard_pairs(df, k=3).count() >= 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pair_ops_caller_owned_handles(spark):
    """cache_handles mode: intermediates are handed to the caller
    (lazy result) and unpersist cleanly."""
    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, f"one two three four five six {i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    handles: list = []
    out = dedup.minhash_lsh_pairs(df, k=3, threshold=0.5, cache_handles=handles)
    assert handles, "intermediates must be appended to the caller's list"
    out.count()
    for h in handles:
        h.unpersist(True)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_incremental_dedup_two_batch_append(spark, tmp_path):
    """Cross-snapshot dedup (VERDICT r3 item 2): ingest corpus -> index,
    then two successive batches, each deduped against the index WITHOUT
    recomputing it, each appended after. The union of (corpus-internal
    pairs + both increments) must equal the one-shot full recompute."""
    all_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    corpus = all_docs.where(F.pmod("doc_id", F.lit(3)) == 0)
    batch1 = all_docs.where(F.pmod("doc_id", F.lit(3)) == 1)
    batch2 = all_docs.where(F.pmod("doc_id", F.lit(3)) == 2)
    idx = str(tmp_path / "dedup_index")

    def pairs(df):
        return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}

    dedup.write_dedup_index(corpus, idx, k=3)
    sigs, buckets = dedup.read_dedup_index(spark, idx)
    got = pairs(
        dedup.incremental_dedup_pairs(batch1, sigs, buckets, k=3, threshold=0.5)
    )
    dedup.write_dedup_index(batch1, idx, k=3)  # append batch 1
    sigs, buckets = dedup.read_dedup_index(spark, idx)
    got |= pairs(
        dedup.incremental_dedup_pairs(batch2, sigs, buckets, k=3, threshold=0.5)
    )
    got |= pairs(dedup.minhash_lsh_pairs(corpus, k=3, threshold=0.5))

    want = pairs(dedup.minhash_lsh_pairs(all_docs, k=3, threshold=0.5))
    assert got == want
    assert len(want) > 0  # fixture non-vacuity

    # index rows accumulated for every ingested doc exactly once
    n_docs = corpus.count() + batch1.count()
    assert sigs.count() == n_docs
    assert buckets.count() == n_docs * 16


def test_incremental_dedup_batch_crossing_non_vacuous(spark):
    """The driver-gated dedup_incremental query's mod-5 split must
    actually produce batch-crossing near-dup pairs on the fixture
    (non-vacuity lives here, not in the constant oracle)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    is_batch = F.coalesce(F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit(False))
    corpus = docs.where(~is_batch)
    corp_sigs = dedup.minhash_signatures(corpus, k=3)
    corp_buckets = dedup.band_buckets(corp_sigs)
    inc = dedup.incremental_dedup_pairs(
        docs.where(is_batch), corp_sigs, corp_buckets, k=3, threshold=0.5
    )
    assert inc.count() > 0


def test_token_native_dedup_paths(spark):
    """Dedup directly over the tokens payload (input_hint: sequences
    carry array<int32>): exact token-n-gram Jaccard finds planted
    near-dup token arrays, and the MinHash feature path agrees with
    the exact path on extremes (identical arrays -> est 1.0; disjoint
    arrays -> no pair)."""
    rows = [
        (1, list(range(100))),
        (2, list(range(100))),            # exact dup of 1
        (3, list(range(2, 100)) + [990, 991]),  # near-dup of 1
        (4, list(range(500, 600))),       # disjoint
        (5, None),                        # NULL tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    feats = dedup.token_shingles("tokens", 5)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(df, threshold=0.5, features=feats).collect()}
    assert exact[(1, 2)] == 1.0
    assert (1, 3) in exact and 0.5 <= exact[(1, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in exact)

    sigs = {r["doc_id"]: r["sig"] for r in
            dedup.minhash_signatures(df, features=feats).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_duplicated_ngram_spans_planted(spark):
    """Exact-substring spans: hand-computable boundaries on planted
    token arrays (shared 8-gram run across docs, a within-doc repeat,
    a too-short doc, a clean doc)."""
    from teleharvest_spark.operators.dedup import (
        duplicated_ngram_spans,
        duplicated_token_stats,
    )

    shared = list(range(100, 112))  # 12 shared tokens
    rows = [
        # doc 0: shared block at positions 5..17
        (0, list(range(0, 5)) + shared + list(range(200, 210))),
        # doc 1: same block at positions 0..12
        (1, shared + list(range(300, 320))),
        # doc 2: repeats ITS OWN 8-gram (positions 0..8 == 10..18)
        (2, list(range(400, 408)) + [901, 902] + list(range(400, 408)) + [903]),
        # doc 3: too short for k=8
        (3, [1, 2, 3]),
        # doc 4: unique content
        (4, list(range(500, 540))),
        # doc 5: NULL tokens
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    spans = {
        (r["doc_id"], r["start"], r["end"])
        for r in duplicated_ngram_spans(df, k=8).collect()
    }
    # docs 0/1: every 8-gram fully inside the 12-token shared block is
    # repeated -> merged span covers exactly the block
    assert (0, 5, 17) in spans
    assert (1, 0, 12) in spans
    # doc 2: its repeated 8-gram occurs at pos 0 and 10 -> the gap
    # (10 > k=8) separates TWO spans, one per occurrence
    assert (2, 0, 8) in spans and (2, 10, 18) in spans
    assert {s[0] for s in spans} == {0, 1, 2}

    stats = {
        r["doc_id"]: r.asDict()
        for r in duplicated_token_stats(df, duplicated_ngram_spans(df, k=8)).collect()
    }
    assert stats[0]["n_dup_tok"] == 12 and stats[0]["n_spans"] == 1
    assert abs(stats[0]["dup_tok_frac"] - 12 / 27) < 1e-12
    assert stats[4]["n_dup_tok"] == 0 and stats[4]["dup_tok_frac"] == 0.0
    assert stats[5]["n_dup_tok"] == 0 and stats[5]["dup_tok_frac"] == 0.0


def test_duplicated_ngram_spans_partitioning_invariant(spark):
    """Same spans under different input partitionings (window + global
    count are partitioning-independent)."""
    from teleharvest_spark.operators.dedup import duplicated_ngram_spans

    base = [(i, [i % 7] * 5 + list(range(i * 100, i * 100 + 20))) for i in range(40)]
    df = spark.createDataFrame(base, "doc_id long, tokens array<int>")
    a = sorted(map(tuple, duplicated_ngram_spans(df.repartition(11), k=5).collect()))
    b = sorted(map(tuple, duplicated_ngram_spans(df.repartition(1), k=5).collect()))
    assert a == b and len(a) > 0


def test_dedup_lines_global_planted(spark):
    from pyspark.sql import Row
    from teleharvest_spark.operators.dedup import dedup_lines_global, hot_lines

    boiler = "SUBSCRIBE TO OUR NEWSLETTER"
    docs = [
        Row(doc_id=0, text=f"{boiler}\nunique alpha\n\nunique beta"),
        Row(doc_id=1, text=f"unique gamma\n{boiler}\ndelta line"),
        Row(doc_id=2, text=f"{boiler}\nepsilon text"),
        # within-doc repeat reaches min_count on its own -> removed
        Row(doc_id=3, text="echo echo me\necho echo me\nzeta"),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text=""),
    ]
    df = spark.createDataFrame(docs)

    hot = {
        r["n_occurrences"]
        for r in hot_lines(df).collect()
    }
    assert hot == {3, 2}  # boilerplate x3, echo line x2; '' exempt

    out = {
        r["doc_id"]: r
        for r in dedup_lines_global(df).collect()
    }
    # boilerplate stripped everywhere, order + empty lines preserved
    assert out[0]["clean_text"] == "unique alpha\n\nunique beta"
    assert out[1]["clean_text"] == "unique gamma\ndelta line"
    assert out[2]["clean_text"] == "epsilon text"
    assert out[3]["clean_text"] == "zeta"
    assert out[3]["n_removed_lines"] == 2
    assert out[4]["clean_text"] is None          # NULL stays NULL
    assert out[5]["clean_text"] == ""            # empty line exempt
    assert out[5]["n_removed_lines"] == 0
    assert all(out[i]["n_removed_lines"] == 1 for i in (0, 1, 2))
    # input columns pass through
    assert out[0]["text"].startswith(boiler)


def test_dedup_lines_global_scoped(spark):
    from pyspark.sql import Row
    from teleharvest_spark.operators.dedup import dedup_lines_global

    line = "shared across sources"
    df = spark.createDataFrame([
        Row(doc_id=0, source="a", text=f"{line}\nkeep a"),
        Row(doc_id=1, source="b", text=f"{line}\nkeep b"),
        Row(doc_id=2, source="a", text=f"{line}\nmore a"),
    ])
    # global: the line occurs 3x -> removed everywhere
    got = {r["doc_id"]: r["clean_text"]
           for r in dedup_lines_global(df).collect()}
    assert got == {0: "keep a", 1: "keep b", 2: "more a"}
    # scoped by source: 2x in a (removed there), 1x in b (kept)
    got = {r["doc_id"]: r["clean_text"]
           for r in dedup_lines_global(df, scope_col="source").collect()}
    assert got == {0: "keep a", 1: f"{line}\nkeep b", 2: "more a"}


def test_plan_lsh_banding_math():
    """Planner reproduces the textbook S-curve arithmetic."""
    plan = dedup.plan_lsh(0.8, n_perm=64)
    b, r = plan["bands"], plan["rows_per_band"]
    assert b * r == 64
    # t* of the chosen config is the closest divisor point to 0.8
    for bb in (1, 2, 4, 8, 16, 32, 64):
        t = (1.0 / bb) ** (bb / 64.0)
        assert abs(plan["t_star"] - 0.8) <= abs(t - 0.8) + 1e-4  # t_star rounded
    # hand-check the detection probability formula at the target
    import math

    expect = 1.0 - (1.0 - 0.8**r) ** b
    assert math.isclose(plan["p_at_threshold"], expect, abs_tol=5e-5)
    # S-curve shape: more similar -> likelier candidate
    hi = list(plan["p_above"].values())
    lo = list(plan["p_below"].values())
    assert min(hi) >= plan["p_at_threshold"] >= max(lo)

    # near-dup regime (low threshold) picks many bands / short rows;
    # far threshold picks few bands / long rows
    near = dedup.plan_lsh(0.35, n_perm=64)
    far = dedup.plan_lsh(0.95, n_perm=64)
    assert near["bands"] > far["bands"]

    import pytest as _pt

    with _pt.raises(ValueError):
        dedup.plan_lsh(1.5)
    with _pt.raises(ValueError):
        dedup.plan_lsh(0.5, n_perm=1)
