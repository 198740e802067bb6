"""prep_corpus "dedup_spans" stage + prep_batch span_filter: exact-
substring dedup (the public suffix-array-tool recipe, map-reduce form)
wired into the prep pipeline with a persisted repeated-gram index.

Fixture: a 12-word BOILER passage planted in several 36-word docs.
With k=5 the passage contributes exactly 8 positional grams; every
filler word is globally unique so the repeated-gram set is exactly the
boiler's grams and the cut removes exactly the 12 boiler tokens from
every occurrence (drop-all policy — the public tool's default, and the
only order-free one).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from teleharvest_spark import pipeline
from teleharvest_spark.operators import dedup as dedup_ops

BOILER = "the quick brown fox jumps over that lazy sleeping dog tonight again"
FRESH = "fresh shared passage rides along with twelve exactly counted words right here"
ONCE = "single corpus occurrence passage that the compact index cannot ever see twice"


def _filler(tag, i, j, n=12):
    return " ".join(f"{tag}{i}q{j}w{w}" for w in range(n))


def _doc(i, mid=None):
    """36 words: unique filler, a middle line (boiler or filler), filler."""
    middle = mid if mid is not None else _filler("m", i, 1)
    return "\n".join([_filler("a", i, 0), middle, _filler("b", i, 2)])


def _base_docs(spark):
    rows = [Row(doc_id=i, text=_doc(i, BOILER), source="web") for i in range(3)]
    rows += [Row(doc_id=i, text=_doc(i), source="web") for i in range(3, 9)]
    # doc 9 carries ONCE exactly once corpus-wide: below min_count, so
    # it never enters the repeated-gram index (the documented miss)
    rows += [Row(doc_id=9, text=_doc(9, ONCE), source="web")]
    return spark.createDataFrame(rows)


def _build(spark, inp, out, **kw):
    return pipeline.prep_corpus(
        spark, inp, out, run_id=kw.pop("run_id", "sp1"), capacity=64,
        dedup_spans_params=kw.pop("dedup_spans_params", {"k": 5, "min_count": 2}),
        **kw,
    )


def _ntok(spark, path):
    return {
        r["doc_id"]: r["n_tok"]
        for r in spark.read.parquet(path).select("doc_id", "n_tok").collect()
    }


def test_operator_batch_vs_full_parity_and_known_miss(spark):
    from teleharvest_spark.functions.text import hash_tokens

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=_doc(i, BOILER if i < 2 else ONCE)) for i in range(3)]
    ).withColumn("tokens", hash_tokens(F.col("text")))
    batch = spark.createDataFrame(
        [
            Row(doc_id=10, text=_doc(10, BOILER)),   # vs index: caught
            Row(doc_id=11, text=_doc(11, ONCE)),     # one+one: the miss
            Row(doc_id=12, text=_doc(12, FRESH)),    # in-batch repeat
            Row(doc_id=13, text=_doc(13, FRESH)),
        ]
    ).withColumn("tokens", hash_tokens(F.col("text")))
    stored = dedup_ops.repeated_grams(corpus, k=5, min_count=2)
    spans, new_grams = dedup_ops.batch_duplicated_spans(
        batch, stored, k=5, min_count=2
    )
    got = {(r["doc_id"], r["start"], r["end"]) for r in spans.collect()}
    # boiler sits at positions 12..24 in every _doc; FRESH likewise
    assert got == {(10, 12, 24), (12, 12, 24), (13, 12, 24)}
    # the full recompute DOES catch the one+one pair — the delta vs the
    # incremental path is exactly the documented miss (doc 11 + the
    # corpus-side copy in doc 2)
    full = dedup_ops.duplicated_ngram_spans(
        corpus.unionByName(batch), k=5, min_count=2
    )
    full_ids = {r["doc_id"] for r in full.collect()}
    assert {2, 11} <= full_ids
    # index append = the batch's OWN newly repeated grams (FRESH's 8)
    assert new_grams.count() == 8
    assert new_grams.join(stored, "gram", "semi").count() == 0


def test_spans_stage_cuts_all_copies_and_persists_index(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    rep = _build(spark, inp, out)
    st = rep["stages"]["dedup_spans"]
    assert {k: st[k] for k in ("rows", "removed_tokens", "dropped")} == {
        "rows": 10, "removed_tokens": 36, "dropped": 0
    }
    assert st["wall_sec"] > 0  # per-stage wall stamped by _StageTimer

    flat = _ntok(spark, f"{out}/corpus_flat")
    cut = _ntok(spark, f"{out}/corpus_flat_spans")
    for i in range(10):
        assert cut[i] == flat[i] - (12 if i < 3 else 0)
    # schema identical to the tokenize output (no provenance leaks)
    assert set(spark.read.parquet(f"{out}/corpus_flat_spans").columns) == set(
        spark.read.parquet(f"{out}/corpus_flat").columns
    )
    # persisted index: exactly the boiler's 8 grams + params meta
    grams = spark.read.parquet(f"{out}/span_index/b_base")
    assert grams.count() == 8
    import json as _json

    with open(f"{out}/span_index/meta.json") as fh:
        assert _json.load(fh) == {
            "k": 5, "min_count": 2, "min_tok": 1, "vocab_size": 50257,
        }
    # downstream corpus carries the cut token counts
    assert _ntok(spark, f"{out}/corpus")[0] == flat[0] - 12
    # resume: unchanged input skips the stage
    rep2 = _build(spark, inp, out)
    assert rep2["stages"]["dedup_spans"] == {"skipped": True}


def test_batch_span_filter_against_stored_index(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    _build(spark, inp, out)

    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=_doc(100, BOILER), source="web"),
            Row(doc_id=101, text=_doc(101), source="web"),
            Row(doc_id=102, text=_doc(102, FRESH), source="web"),
            Row(doc_id=103, text=_doc(103, FRESH), source="web"),
            Row(doc_id=104, text=_doc(104, ONCE), source="web"),
        ]
    )
    rep = pipeline.prep_batch(
        spark, batch, out, run_id="b1", capacity=64, span_filter=True,
    )
    assert rep["kept"] == 5 and rep["span_dropped"] == 0
    assert rep["span_removed_tok"] == 36  # 100 + 102 + 103
    nt = _ntok(spark, f"{out}/corpus_inc/b_{rep['batch']}")
    assert nt[100] == 24          # cut vs the stored corpus index
    assert nt[101] == 36          # clean doc untouched
    assert nt[102] == nt[103] == 24  # within-batch repeat cut from BOTH
    # the documented miss: one corpus occurrence + one batch occurrence
    # stays (the index stores only already-repeated grams)
    assert nt[104] == 36
    # the batch's newly repeated grams (FRESH's 8) joined the index…
    bdir = f"{out}/span_index/b_{rep['batch']}"
    assert spark.read.parquet(bdir).count() == 8
    # …so batch 2 cuts against batch 1
    rep2 = pipeline.prep_batch(
        spark,
        spark.createDataFrame(
            [Row(doc_id=110, text=_doc(110, FRESH), source="web")]
        ),
        out, run_id="b2", capacity=64, span_filter=True,
    )
    assert rep2["span_removed_tok"] == 12
    assert _ntok(spark, f"{out}/corpus_inc/b_{rep2['batch']}")[110] == 24
    # replay of a recorded batch is a no-op skip
    rep3 = pipeline.prep_batch(
        spark, batch, out, run_id="b1r", capacity=64, span_filter=True,
    )
    assert rep3.get("skipped") is True


def test_batch_drained_by_min_tok_is_recorded_noop(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    _build(
        spark, inp, out,
        dedup_spans_params={"k": 5, "min_count": 2, "min_tok": 20},
    )
    # the whole doc is corpus-duplicated boilerplate: the cut guts it
    # below min_tok and the batch drains to a recorded no-op
    rep = pipeline.prep_batch(
        spark,
        spark.createDataFrame([Row(doc_id=200, text=BOILER, source="web")]),
        out, run_id="b1", capacity=64, span_filter=True,
    )
    assert rep["kept"] == 0 and rep["packs"] == 0
    assert rep["span_dropped"] == 1 and rep["span_removed_tok"] == 12
    assert not os.path.isdir(f"{out}/corpus_inc/b_{rep['batch']}")
    # the drained doc still entered the MinHash index (dedup invariant)
    assert os.path.isdir(f"{out}/dedup_index/b_{rep['batch']}")


def test_batch_span_filter_requires_index(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="nospan", capacity=64)
    with pytest.raises(ValueError, match="span_index"):
        pipeline.prep_batch(
            spark,
            spark.createDataFrame(
                [Row(doc_id=300, text=_doc(300), source="web")]
            ),
            out, run_id="b1", capacity=64, span_filter=True,
        )


def test_batch_span_filter_rejects_vocab_mismatch(spark, tmp_path):
    """The gram fingerprints live in the tokenizer's id space: a batch
    tokenized under a different vocab would silently never match the
    stored index, so the mismatch must raise."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    _build(spark, inp, out)
    with pytest.raises(ValueError, match="vocab_size"):
        pipeline.prep_batch(
            spark,
            spark.createDataFrame(
                [Row(doc_id=500, text=_doc(500), source="web")]
            ),
            out, run_id="b1", capacity=64, span_filter=True,
            vocab_size=32000,
        )


def test_reparameterized_rebuild_sweeps_stale_batch_gram_dirs(spark, tmp_path):
    """A base rebuild with different GRAM-SPACE params (k/min_count/
    vocab) invalidates every batch's appended gram dir — the rebuild
    must sweep them so future batches can't union stale grams; a
    content-compatible rebuild (params unchanged) keeps them."""
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    _build(spark, inp, out)
    rep1 = pipeline.prep_batch(
        spark,
        spark.createDataFrame(
            [
                Row(doc_id=600, text=_doc(600, FRESH), source="web"),
                Row(doc_id=601, text=_doc(601, FRESH), source="web"),
            ]
        ),
        out, run_id="b1", capacity=64, span_filter=True,
    )
    bdir = f"{out}/span_index/b_{rep1['batch']}"
    assert os.path.isdir(bdir)

    # min_tok-only change: NOT a gram-space param — batch dirs survive
    _build(
        spark, inp, out, run_id="sp2",
        dedup_spans_params={"k": 5, "min_count": 2, "min_tok": 2},
    )
    assert os.path.isdir(bdir)

    # k change: the fingerprint space forks — batch dirs are swept
    _build(
        spark, inp, out, run_id="sp3",
        dedup_spans_params={"k": 6, "min_count": 2},
    )
    assert not os.path.isdir(bdir)
    dirs = [d for d in os.listdir(f"{out}/span_index") if d.startswith("b_")]
    assert dirs == ["b_base"]


def test_compact_folds_span_index_and_batches_still_cut(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _base_docs(spark).write.parquet(inp)
    _build(spark, inp, out)
    rep1 = pipeline.prep_batch(
        spark,
        spark.createDataFrame(
            [
                Row(doc_id=400, text=_doc(400, FRESH), source="web"),
                Row(doc_id=401, text=_doc(401, FRESH), source="web"),
            ]
        ),
        out, run_id="b1", capacity=64, span_filter=True,
    )
    assert rep1["span_removed_tok"] == 24
    crep = pipeline.compact_indexes(spark, out)
    assert crep["span_index"] == {"folded": 2}
    dirs = [d for d in os.listdir(f"{out}/span_index") if d.startswith("b_")]
    assert len(dirs) == 1 and dirs[0].startswith("b_compact_")
    # 8 boiler + 8 fresh grams survive the fold, and a post-compact
    # batch still cuts against BOTH origins
    assert spark.read.parquet(f"{out}/span_index/{dirs[0]}").count() == 16
    rep2 = pipeline.prep_batch(
        spark,
        spark.createDataFrame(
            [
                Row(doc_id=410, text=_doc(410, BOILER), source="web"),
                Row(doc_id=411, text=_doc(411, FRESH), source="web"),
            ]
        ),
        out, run_id="b2", capacity=64, span_filter=True,
    )
    assert rep2["span_removed_tok"] == 24
    nt = _ntok(spark, f"{out}/corpus_inc/b_{rep2['batch']}")
    assert nt[410] == 24 and nt[411] == 24
