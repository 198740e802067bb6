"""Sequence packing, TF-IDF top terms, quantile trim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.operators import packing, terms
from teleharvest_spark.operators.stats import quantile_trim


def _packs(rows):
    """{doc_id: pack_id} from pack_sequences over (doc_id, source, n)."""
    return rows


def test_pack_greedy_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "s", 1000), (2, "s", 1000), (3, "s", 100), (4, "s", 2000), (5, "s", 10)],
        "doc_id long, source string, n_tok long",
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in packing.pack_sequences(df, capacity=2048).collect()
    }
    # 1000+1000=2000 fits; +100 would be 2100 > 2048 → new pack;
    # 100+2000 > 2048 → 2000 starts pack 2; 2000+10 = 2010 fits
    assert got == {1: 0, 2: 0, 3: 1, 4: 2, 5: 2}


def test_pack_oversized_and_null_sizes(spark):
    df = spark.createDataFrame(
        [(1, "s", 5000), (2, "s", None), (3, "s", 10)],
        "doc_id long, source string, n_tok long",
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in packing.pack_sequences(df, capacity=100).collect()
    }
    # 5000 alone (oversized); NULL counts as 0 → joins next pack with 10
    assert got == {1: 0, 2: 1, 3: 1}


def test_pack_invariants_per_pack(spark):
    import random

    rng = random.Random(3)
    rows = [(i, f"s{i % 4}", rng.randint(1, 900)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = packing.pack_sequences(df, capacity=1000).collect()
    sizes = {i: n for i, _, n in rows}
    # every doc packed exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(i for i, _, _ in rows)
    by_pack: dict = {}
    for r in out:
        by_pack.setdefault((r["source"], r["pack_id"]), []).append(r["doc_id"])
    for (_, _), docs in by_pack.items():
        assert sum(sizes[d] for d in docs) <= 1000
    # greedy maximality: pack p+1's first doc would overflow pack p
    for (src, p), docs in by_pack.items():
        nxt = by_pack.get((src, p + 1))
        if nxt:
            first_next = min(nxt)
            assert sum(sizes[d] for d in docs) + sizes[first_next] > 1000


def test_pack_deterministic_under_repartition(spark):
    df = spark.createDataFrame(
        [(i, "s", (i * 37) % 500) for i in range(100)],
        "doc_id long, source string, n_tok long",
    )
    a = sorted(map(tuple, packing.pack_sequences(df, capacity=800).collect()))
    b = sorted(map(tuple, packing.pack_sequences(df.repartition(11), capacity=800).collect()))
    assert a == b


def test_pack_rejects_nonpositive_capacity(spark):
    df = spark.createDataFrame([(1, "s", 1)], "doc_id long, source string, n_tok long")
    with pytest.raises(ValueError):
        packing.pack_sequences(df, capacity=0)


def test_pack_with_shard_col(spark):
    df = spark.createDataFrame(
        [(1, "s", 0, 60), (2, "s", 0, 60), (3, "s", 1, 60)],
        "doc_id long, source string, shard int, n_tok long",
    )
    got = {
        (r["shard"], r["doc_id"]): r["pack_id"]
        for r in packing.pack_sequences(df, capacity=100, shard_col="shard").collect()
    }
    # packs never span shards: doc 3 starts pack 0 of its own shard
    assert got == {(0, 1): 0, (0, 2): 1, (1, 3): 0}


def test_top_terms_linear_vs_log_same_topk_on_distinct_df(spark):
    df = spark.createDataFrame(
        [
            ("a", "x x x common"),
            ("b", "y y common common"),
        ],
        "source string, text string",
    )
    lin = terms.top_terms(df, k=1, idf="linear").collect()
    # 'common' appears in both groups (df=2, idf linear = 1) so the
    # group-unique term wins in each
    assert {(r["source"], r["term"]) for r in lin} == {("a", "x"), ("b", "y")}
    log = terms.top_terms(df, k=1, idf="log").collect()
    assert {(r["source"], r["term"]) for r in log} == {("a", "x"), ("b", "y")}
    with pytest.raises(ValueError):
        terms.top_terms(df, idf="bogus")


def test_top_terms_null_text_and_whitespace(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "  lone   word  "), ("b", "word")],
        "source string, text string",
    )
    got = terms.top_terms(df, k=10, idf="linear").collect()
    terms_a = {r["term"] for r in got if r["source"] == "a"}
    assert terms_a == {"lone", "word"}
    # 'word' in both groups → idf 1 → tfidf 1.0 for single occurrence
    w = next(r for r in got if r["source"] == "b" and r["term"] == "word")
    assert w["tfidf"] == pytest.approx(1.0)


def test_quantile_trim_bounds(spark):
    rows = [(i, "s", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    kept = sorted(
        r["doc_id"]
        for r in quantile_trim(df, value_col="v", lo=0.1, hi=0.9).collect()
    )
    # exact percentile of 1..100 at 0.1 = 10.9, at 0.9 = 90.1 → keep 11..90
    assert kept == list(range(11, 91))
    # NULL values are dropped, not kept
    df2 = spark.createDataFrame(
        rows + [(999, "s", None)], "doc_id long, source string, v double"
    )
    kept2 = {r["doc_id"] for r in quantile_trim(df2, value_col="v").collect()}
    assert 999 not in kept2


def test_top_terms_null_group_rows_excluded(spark):
    """NULL-group rows must not reach the idf division (df=0 would be
    an ANSI divide-by-zero) — they're violations, not vocabulary."""
    df = spark.createDataFrame(
        [(None, "ghostword ghostword"), ("a", "real")], "source string, text string"
    )
    got = terms.top_terms(df, k=10, idf="linear").collect()
    assert {r["term"] for r in got} == {"real"}
    assert all(r["source"] == "a" for r in got)


def test_pack_dup_keys_deterministic_under_repartition(spark):
    """Duplicate doc_ids with different sizes: the (key, size) sort
    makes the fold order data-determined, so pack assignment is stable
    under any partitioning (ADVICE r2 — key-only sort left dup-key
    ties in Arrow-batch order)."""
    rows = [("d", "s", n) for n in (500, 300, 500, 200, 100)] + [
        ("a", "s", 400), ("z", "s", 600)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, n int")
    ref = sorted(
        (r["doc_id"], r["pack_id"], )
        for r in packing.pack_sequences(df, size_col="n", capacity=800).collect()
    )
    for nparts in (1, 7, 13):
        got = sorted(
            (r["doc_id"], r["pack_id"])
            for r in packing.pack_sequences(
                df.repartition(nparts), size_col="n", capacity=800
            ).collect()
        )
        assert got == ref


def test_pack_sharded_hot_source_boundary_semantics(spark):
    """(source, hash_bucket) sharding on a hot source: packs never span
    shards; within each shard the greedy boundary semantics are
    identical to packing that shard alone (VERDICT r2 item 7)."""
    import pyspark.sql.functions as F

    rows = [(f"doc_{i:04d}", "hot", 300) for i in range(200)] + [
        (f"doc_{i:04d}", "cold", 300) for i in range(200, 210)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, n int").withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
    )
    out = packing.pack_sequences(
        df, size_col="n", capacity=1000, shard_col="bucket"
    ).collect()
    assert len(out) == 210  # every doc packed exactly once
    # per-(source, shard) greedy equivalence: re-pack each shard alone
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault((r["source"], r["bucket"]), {})[r["doc_id"]] = r["pack_id"]
    for (src, b), want in by_shard.items():
        alone = {
            r["doc_id"]: r["pack_id"]
            for r in packing.pack_sequences(
                df.where((F.col("source") == src) & (F.col("bucket") == b)),
                size_col="n",
                capacity=1000,
                shard_col="bucket",
            ).collect()
        }
        assert alone == want
    # capacity respected within every (source, shard, pack)
    sizes: dict = {}
    for r in out:
        sizes.setdefault((r["source"], r["bucket"], r["pack_id"]), 0)
        sizes[(r["source"], r["bucket"], r["pack_id"])] += 300
    assert all(v <= 1000 for v in sizes.values())
