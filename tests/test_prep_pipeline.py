"""pipeline.prep_corpus — the composed training-data-prep pipeline.

Planted corpus: one Gopher-repetitive doc, one exact-dup pair, one
near-dup pair, unique clean docs, one NULL-id doc. Pins the full
quality → dedup → tokenize → split → pack chain plus the run_all
resumability contract (idempotent skips, kill-between-stages resume,
upstream-change cascade) applied to this pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row, functions as F

from teleharvest_spark import pipeline


def _corpus(spark):
    dup = " ".join(f"a{j}" for j in range(60))
    near_a = " ".join(f"b{j}" for j in range(60))
    near_b = near_a.rsplit(" ", 1)[0] + " zz"  # last word swapped:
    # 55 of 56 distinct 5-shingles shared -> Jaccard ~0.965
    rows = [
        Row(doc_id=0, text="spam spam\n" * 40, source="web"),   # quality fail
        Row(doc_id=1, text=dup, source="web"),                  # exact dup of 2
        Row(doc_id=2, text=dup, source="books"),
        Row(doc_id=3, text=near_a, source="web"),               # near dup of 4
        Row(doc_id=4, text=near_b, source="web"),
        Row(doc_id=None, text="null id doc", source="web"),     # dropped
    ]
    rows += [
        Row(
            doc_id=10 + i,
            text=" ".join(f"u{i}w{j}" for j in range(30)),
            source="web" if i % 2 else "books",
        )
        for i in range(10)
    ]
    return spark.createDataFrame(rows)


def _digests(spark, out):
    return {
        name: pipeline.content_digest(spark.read.parquet(f"{out}/{name}"))
        for name in ("clean_docs", "dedup_docs", "corpus", "packs")
    }


def test_prep_corpus_end_to_end(spark, tmp_path):
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)

    rep = pipeline.prep_corpus(spark, inp, out, run_id="p1", capacity=64)
    st = rep["stages"]
    # quality: repetitive doc out, NULL-id dropped silently (not a row)
    assert st["quality"]["failed"] == 1
    assert st["quality"]["clean"] == 14
    viol = spark.read.parquet(f"{out}/quality_violations")
    assert [r["doc_id"] for r in viol.collect()] == [0]
    # dedup: {1,2} exact-collapse, {3,4} near-collapse -> 12 kept
    assert st["dedup"]["kept"] == 12
    kept_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/dedup_docs").collect()
    }
    assert 1 in kept_ids and 2 not in kept_ids
    assert 3 in kept_ids and 4 not in kept_ids
    comps = {
        (r["node"], r["component"])
        for r in spark.read.parquet(f"{out}/dup_components").collect()
    }
    assert comps == {(1, 1), (2, 1), (3, 3), (4, 3)}
    # the incremental index covers exactly the kept docs
    sigs = spark.read.parquet(f"{out}/dedup_index/b_base/sigs")
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == kept_ids
    # tokenize + split: every kept doc has tokens and a split
    corpus = spark.read.parquet(f"{out}/corpus")
    assert corpus.count() == 12
    assert corpus.where(F.col("tokens").isNull() | F.col("split").isNull()).count() == 0
    assert sum(st["split"]["counts"].values()) == 12
    # pack: every (doc) appears exactly once, pack ids dense per group
    packs = spark.read.parquet(f"{out}/packs")
    assert packs.count() == 12
    assert packs.groupBy("doc_id").count().where("count > 1").count() == 0
    # shuffle: the train split, losslessly re-ordered, with the order key
    shuffled = spark.read.parquet(f"{out}/corpus_shuffled")
    train_ids = sorted(
        r["doc_id"] for r in corpus.where("split = 'train'").collect()
    )
    assert sorted(r["doc_id"] for r in shuffled.collect()) == train_ids
    assert "shuffle_ord" in shuffled.columns
    assert st["shuffle"]["rows"] == len(train_ids)


def test_prep_corpus_idempotent_and_resume(spark, tmp_path):
    inp = str(tmp_path / "docs")
    _corpus(spark).write.parquet(inp)

    # one-shot reference run
    ref = str(tmp_path / "ref")
    pipeline.prep_corpus(spark, inp, ref, run_id="a1", capacity=64)
    ref_digests = _digests(spark, ref)

    # re-run over the same warehouse: every stage skips, bytes unchanged
    rep2 = pipeline.prep_corpus(spark, inp, ref, run_id="a2", capacity=64)
    assert all(s == {"skipped": True} for s in rep2["stages"].values())
    assert _digests(spark, ref) == ref_digests

    # kill between stages: first run dies after dedup; the re-run
    # skips quality+dedup and completes -> identical final warehouse
    killed = str(tmp_path / "killed")
    pipeline.prep_corpus(
        spark, inp, killed, run_id="k1", capacity=64,
        stages=("quality", "dedup"),
    )
    rep = pipeline.prep_corpus(spark, inp, killed, run_id="k2", capacity=64)
    assert rep["stages"]["quality"] == {"skipped": True}
    assert rep["stages"]["dedup"] == {"skipped": True}
    assert "rows" in rep["stages"]["tokenize"]
    assert _digests(spark, killed) == ref_digests


def test_prep_corpus_upstream_change_cascades(spark, tmp_path):
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="c1", capacity=64)

    # tightening the quality thresholds reruns quality; the gate's
    # OUTPUT changes (more docs fail), so every downstream stage
    # re-runs off the cascaded content digests
    rep = pipeline.prep_corpus(
        spark, inp, out, run_id="c2", capacity=64,
        quality_thresholds={"max_top_bigram_frac": 0.05},
    )
    assert "skipped" not in rep["stages"]["quality"]
    assert rep["stages"]["quality"]["failed"] > 1
    assert "skipped" not in rep["stages"]["dedup"]
    assert "skipped" not in rep["stages"]["split"]

    # a pack-only param change reruns ONLY pack
    rep3 = pipeline.prep_corpus(
        spark, inp, out, run_id="c3", capacity=32,
        quality_thresholds={"max_top_bigram_frac": 0.05},
    )
    assert rep3["stages"]["quality"] == {"skipped": True}
    assert rep3["stages"]["dedup"] == {"skipped": True}
    assert rep3["stages"]["split"] == {"skipped": True}
    assert "rows" in rep3["stages"]["pack"]


def test_prep_corpus_keep_dups_split_is_cluster_atomic(spark, tmp_path):
    """drop_dups=False keeps near-dup clusters in the corpus — the
    leakage-safe split must then put every cluster member on ONE side."""
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    rep = pipeline.prep_corpus(
        spark, inp, out, run_id="d1", capacity=64, drop_dups=False
    )
    assert rep["stages"]["dedup"]["kept"] == 14
    corpus = spark.read.parquet(f"{out}/corpus")
    splits = {r["doc_id"]: r["split"] for r in corpus.select("doc_id", "split").collect()}
    assert splits[1] == splits[2]
    assert splits[3] == splits[4]


def _batch(spark):
    """New snapshot: one dup-of-corpus doc (same text as corpus doc 1),
    one in-batch near-dup pair, one repetitive doc, fresh docs."""
    dup_of_corpus = " ".join(f"a{j}" for j in range(60))  # == corpus doc 1
    pair_a = " ".join(f"c{j}" for j in range(60))
    pair_b = pair_a.rsplit(" ", 1)[0] + " qq"
    rows = [
        Row(doc_id=100, text=dup_of_corpus, source="web"),
        Row(doc_id=101, text=pair_a, source="web"),
        Row(doc_id=102, text=pair_b, source="books"),
        Row(doc_id=103, text="ha ha\n" * 40, source="web"),  # quality fail
    ]
    rows += [
        Row(
            doc_id=110 + i,
            text=" ".join(f"n{i}w{j}" for j in range(30)),
            source="web",
        )
        for i in range(5)
    ]
    return spark.createDataFrame(rows)


def test_prep_batch_incremental_ingest(spark, tmp_path):
    inp = str(tmp_path / "docs")
    binp = str(tmp_path / "batch")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    _batch(spark).write.parquet(binp)
    pipeline.prep_corpus(spark, inp, out, run_id="base", capacity=64)
    base_corpus_n = spark.read.parquet(f"{out}/corpus").count()

    rep = pipeline.prep_batch(spark, binp, out, run_id="b1", capacity=64)
    # 103 fails quality; 100 drops vs corpus; 102 drops vs in-batch 101
    assert rep["quality_failed"] == 1
    assert rep["dropped_dups"] == 2
    assert rep["kept"] == 6

    full = pipeline.read_prep_corpus(spark, out)
    ids = {r["doc_id"] for r in full.select("doc_id").collect()}
    assert full.count() == base_corpus_n + 6
    assert 101 in ids and 100 not in ids and 102 not in ids

    # the index grew by exactly the kept batch docs -> next batch sees them
    sigs, _ = pipeline._read_index(spark, f"{out}/dedup_index")
    assert sigs.count() == base_corpus_n + 6

    # (group, split, pack_id) stays a key across base + batch packs
    packs = pipeline.read_prep_packs(spark, out)
    assert packs.count() == base_corpus_n + 6
    assert (
        packs.groupBy("source_dir", "split", "pack_id", "doc_id").count()
        .where("count > 1").count() == 0
    )

    # replay of the same batch = recorded no-op; warehouse unchanged
    d1 = pipeline.content_digest(full)
    rep2 = pipeline.prep_batch(spark, binp, out, run_id="b2", capacity=64)
    assert rep2["skipped"] is True
    assert pipeline.content_digest(pipeline.read_prep_corpus(spark, out)) == d1


def test_prep_batch_chains_against_prior_batches(spark, tmp_path):
    """Batch 2 must dedup against batch 1's docs (index append works)."""
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="base", capacity=64)

    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    fresh = " ".join(f"e{j}" for j in range(60))
    spark.createDataFrame([Row(doc_id=200, text=fresh, source="web")]).write.parquet(b1)
    spark.createDataFrame([Row(doc_id=201, text=fresh, source="web")]).write.parquet(b2)

    r1 = pipeline.prep_batch(spark, b1, out, run_id="i1", capacity=64)
    assert r1["kept"] == 1
    r2 = pipeline.prep_batch(spark, b2, out, run_id="i2", capacity=64)
    assert r2["kept"] == 0 and r2["dropped_dups"] == 1


def test_corpus_report_datasheet(spark, tmp_path):
    """The datasheet reconciles with the pipeline reports across a base
    build + one incremental batch."""
    inp = str(tmp_path / "docs")
    binp = str(tmp_path / "batch")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    _batch(spark).write.parquet(binp)
    base = pipeline.prep_corpus(spark, inp, out, run_id="base", capacity=64)
    brep = pipeline.prep_batch(spark, binp, out, run_id="b1", capacity=64)

    rep = pipeline.corpus_report(spark, out)
    assert rep["docs"] == base["stages"]["dedup"]["kept"] + brep["kept"]
    assert rep["docs"] == sum(s["docs"] for s in rep["splits"].values())
    assert rep["tokens"] > 0
    # quality: 1 base repetitive doc + 1 batch repetitive doc
    assert rep["quality_failed"] == 2
    assert rep["quality_failed_by_rule"]["dup_line_frac"] == 2
    # packs are distinct (source, split, pack_id) bins; docs can share
    assert 0 < rep["packs"] <= rep["docs"]
    assert 0 < rep["mean_pack_tokens"] <= 64
    # per-source breakdown sums to split totals
    for s in rep["splits"].values():
        assert s["docs"] == sum(v["docs"] for v in s["sources"].values())
    # token-distribution lines: quantiles bracket the mean, every split
    # present, and the HLL vocab count is near the exact distinct count
    assert set(rep["token_dist"]) == set(rep["splits"])
    for d in rep["token_dist"].values():
        assert d["p05_n_tok"] <= d["p50_n_tok"] <= d["p95_n_tok"]
        assert d["p05_n_tok"] <= d["mean_n_tok"] <= d["p95_n_tok"]
    corpus = pipeline.read_prep_corpus(spark, out)
    exact_vocab = corpus.select(F.explode("tokens")).distinct().count()
    assert abs(rep["vocab_seen"] - exact_vocab) <= max(5, 0.05 * exact_vocab)
    # top-tokens line: MG bounds bracket the exact explode counts and
    # the head token agrees (tiny fixture -> sketch is exact)
    exact_top = {
        r["t"]: r["n"]
        for r in corpus.select(F.explode("tokens").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rep["top_tokens"], "datasheet must carry a top-tokens line"
    for e in rep["top_tokens"]:
        assert e["est_lo"] <= exact_top[e["token"]] <= e["est_hi"]
    best = max(exact_top.items(), key=lambda kv: (kv[1], -kv[0]))
    assert rep["top_tokens"][0]["est_lo"] == best[1]


def test_prep_batch_replay_after_crash_is_byte_identical(spark, tmp_path):
    """Crash AFTER all writes but BEFORE the ledger (worst replay case):
    the re-run must rebuild the same dirs byte-identically — in
    particular the pack-id offsets must not see the crashed attempt's
    own packs (double-offset regression)."""
    import os

    inp = str(tmp_path / "docs")
    b1 = str(tmp_path / "b1")
    out = str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    spark.createDataFrame(
        [Row(doc_id=400 + i, text=" ".join(f"r{i}w{j}" for j in range(30)),
             source="web") for i in range(4)]
    ).write.parquet(b1)
    pipeline.prep_corpus(spark, inp, out, run_id="base", capacity=64)

    pipeline.prep_batch(spark, b1, out, run_id="i1", capacity=64)
    packs_before = sorted(
        map(tuple, pipeline.read_prep_packs(spark, out).collect())
    )
    corpus_before = pipeline.content_digest(pipeline.read_prep_corpus(spark, out))

    # simulate the crash: all data written, ledger lost
    state_dir = os.path.join(out, pipeline.STATE_DIRNAME)
    ledger = [f for f in os.listdir(state_dir) if f.startswith("prep_batch_")]
    assert len(ledger) == 1
    os.remove(os.path.join(state_dir, ledger[0]))

    rep = pipeline.prep_batch(spark, b1, out, run_id="i1r", capacity=64)
    assert "skipped" not in rep
    assert sorted(
        map(tuple, pipeline.read_prep_packs(spark, out).collect())
    ) == packs_before
    assert (
        pipeline.content_digest(pipeline.read_prep_corpus(spark, out))
        == corpus_before
    )


def test_prep_null_source_docs_are_packed_and_reported(spark, tmp_path):
    """NULL-source docs that legitimately survive the gate must reach
    packs (under the '__null__' group) — not silently vanish — and a
    source-less corpus must still produce a datasheet."""
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    rows = [
        Row(doc_id=0, text=" ".join(f"a{j}" for j in range(30)), source=None),
        Row(doc_id=1, text=" ".join(f"b{j}" for j in range(30)), source="web"),
    ]
    spark.createDataFrame(rows).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="p", capacity=64)
    packs = spark.read.parquet(f"{out}/packs")
    got = {r["doc_id"]: r["source_dir"] for r in packs.collect()}
    assert got == {0: "__null__", 1: "web"}
    rep = pipeline.corpus_report(spark, out)
    assert rep["docs"] == 2 and rep["packs"] == 2

    # corpus WITHOUT a source column end-to-end (prep + datasheet)
    inp2 = str(tmp_path / "docs2")
    out2 = str(tmp_path / "wh2")
    spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"c{i}w{j}" for j in range(30)))
         for i in range(3)]
    ).write.parquet(inp2)
    pipeline.prep_corpus(spark, inp2, out2, run_id="p2", capacity=64)
    packs2 = spark.read.parquet(f"{out2}/packs")
    assert {r["source_dir"] for r in packs2.collect()} == {"__null__"}
    rep2 = pipeline.corpus_report(spark, out2)
    assert rep2["docs"] == 3
    for s in rep2["splits"].values():
        assert set(s["sources"]) == {"__null__"}


def test_prep_quality_families_configurable(spark, tmp_path):
    """quality_families widens the prep quality stage beyond
    repetition: a gibberish doc (zero Gopher stopwords) survives the
    default build but falls to the gopher_words family in BOTH the
    base build and a batch ingest; nested per-family thresholds flow
    through; no family signal columns leak into clean_docs."""
    inp = str(tmp_path / "docs")
    out_def = str(tmp_path / "wh_def")
    out_fam = str(tmp_path / "wh_fam")
    # gibberish: 60 distinct words, no Gopher stopwords -> passes
    # repetition, fails gopher_words' stopword-kinds rule
    gib = " ".join(f"zq{j}x" for j in range(60))
    docs = [Row(doc_id=900, text=gib, source="web")] + [
        Row(
            doc_id=910 + i,
            text="the quick brown fox is said to be near the lazy dog and "
                 + " ".join(f"v{i}w{j}" for j in range(40)),
            source="web",
        )
        for i in range(6)
    ]
    spark.createDataFrame(docs).write.parquet(inp)

    rep_def = pipeline.prep_corpus(spark, inp, out_def, run_id="d", capacity=64)
    assert rep_def["stages"]["quality"]["failed"] == 0

    fams = ("repetition", "gopher_words")
    rep_fam = pipeline.prep_corpus(
        spark, inp, out_fam, run_id="f", capacity=64,
        quality_families=fams,
        quality_thresholds={"gopher_words": {"min_stopword_kinds": 2}},
    )
    assert rep_fam["stages"]["quality"]["failed"] == 1
    viol = spark.read.parquet(f"{out_fam}/quality_violations")
    assert [(r["doc_id"], r["check_name"]) for r in viol.collect()] == [
        (900, "stopword_kinds")
    ]
    clean_cols = set(spark.read.parquet(f"{out_fam}/clean_docs").columns)
    from teleharvest_spark.operators.quality import family_signal_cols
    assert not (set(family_signal_cols(fams)) & clean_cols)

    # batch ingest with the same families drops its gibberish doc too
    b = str(tmp_path / "batch")
    spark.createDataFrame([
        Row(doc_id=950, text=" ".join(f"pk{j}m" for j in range(60)),
            source="web"),
        Row(doc_id=951, text="the cats that live here are said to be of a "
                             "kind and have the run of the house "
                             + " ".join(f"nice{j}word" for j in range(45)),
            source="web"),
    ]).write.parquet(b)
    brep = pipeline.prep_batch(
        spark, b, out_fam, run_id="fb", capacity=64,
        quality_families=fams,
        quality_thresholds={"gopher_words": {"min_stopword_kinds": 2}},
    )
    assert brep["quality_failed"] == 1
    assert brep["kept"] == 1


def test_prep_corpus_drain_to_zero_raises_clearly(spark, tmp_path):
    """A base build whose quality stage drops EVERY doc must raise a
    clear misconfiguration error, not crash later on a file-less
    parquet dir (batches drain-to-zero legitimately; the base corpus
    never should)."""
    import pytest

    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [Row(doc_id=i, text="spam spam\n" * 40, source="web")
         for i in range(3)]
    ).write.parquet(inp)
    with pytest.raises(ValueError, match="quality.*dropped every document"):
        pipeline.prep_corpus(
            spark, inp, str(tmp_path / "wh"), run_id="z", capacity=64
        )
