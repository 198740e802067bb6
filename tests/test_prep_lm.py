"""prep_corpus "lm" stage + prep_batch lm_filter: CCNet-shaped
perplexity filtering with a persisted model and FROZEN cut lines.

Fixture: a TRUSTED target corpus of template sentences trains the LM
(the CCNet shape — a bigram fit on the corpus being scored would
memorize one-off sequences and invert the ranking, which is exactly
why the stage defaults bigram=False without a target). The scored
corpus has three strata per source — fluent (template vocabulary, low
ppl), mediocre (half template / half one-off words), gibberish (all
one-off words, max ppl) — so the quantile cut lines land STRICTLY
between strata and every keep-policy boundary is float-tie-free.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from teleharvest_spark import pipeline
from teleharvest_spark.operators.lm import read_lm_store


def _template_line(i, j):
    return (
        f"unique sentence s{i}w{j} carries enough words to pass checks."
        if j % 2 else
        f"another thought t{i}x{j} brings fresh material for review here."
    )


def _fluent(i, n_sent=12):
    return "\n".join(_template_line(i, j) for j in range(n_sent))


def _junk_line(tag, i, j):
    return " ".join(f"{tag}{i}g{j}k{w}" for w in range(9)) + "."


def _mediocre(i, n_sent=12):
    return "\n".join(
        _template_line(i, j) if j % 2 else _junk_line("mq", i, j)
        for j in range(n_sent)
    )


def _gibberish(i, n_sent=12):
    return "\n".join(_junk_line("zq", i, j) for j in range(n_sent))


GIB_IDS = {6, 7, 8, 16, 17, 18}
MED_IDS = {4, 5, 14, 15}


def _corpus(spark):
    rows = []
    for s, base in (("web", 0), ("books", 10)):
        rows += [
            Row(doc_id=base + i, text=_fluent(base + i), source=s)
            for i in range(4)
        ]
        rows += [
            Row(doc_id=base + 4 + i, text=_mediocre(base + 4 + i), source=s)
            for i in range(2)
        ]
        rows += [
            Row(doc_id=base + 6 + i, text=_gibberish(base + 6 + i), source=s)
            for i in range(3)
        ]
    return spark.createDataFrame(rows)


def _trusted(spark, path):
    """Held-out template-only corpus — the 'Wikipedia' of the fixture."""
    spark.createDataFrame(
        [Row(doc_id=100 + i, text=_fluent(100 + i)) for i in range(6)]
    ).write.mode("overwrite").parquet(path)
    return path


def _run(spark, inp, out, lm_params, **kw):
    return pipeline.prep_corpus(
        spark, inp, out, run_id=kw.pop("run_id", "lm1"), capacity=64,
        lm_params=lm_params, **kw,
    )


def test_lm_stage_drops_tail_and_freezes_store(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    trusted = _trusted(spark, str(tmp_path / "trusted"))
    _corpus(spark).write.parquet(inp)

    params = {"keep": ["head", "middle"], "target_path": trusted}
    rep = _run(spark, inp, out, params)
    st = rep["stages"]
    # per source: 4 fluent + 2 mediocre kept (head/middle), 3 gibberish tail
    assert st["lm"]["dropped"] == 6 and st["lm"]["rows"] == 12

    flm = spark.read.parquet(f"{out}/corpus_flat_lm")
    kept_ids = {r["doc_id"] for r in flm.select("doc_id").collect()}
    assert kept_ids.isdisjoint(GIB_IDS) and len(kept_ids) == 12
    # schema identical to the tokenize output (no score columns leak)
    tok_cols = set(spark.read.parquet(f"{out}/corpus_flat").columns)
    assert set(flm.columns) == tok_cols

    # the filtered corpus feeds split/pack: no gibberish id downstream
    corpus = spark.read.parquet(f"{out}/corpus")
    assert {
        r["doc_id"] for r in corpus.select("doc_id").collect()
    }.isdisjoint(GIB_IDS)

    # store: model + frozen policy + per-source thresholds; bigram
    # defaults ON because a held-out target was given
    lm, bigram, meta = read_lm_store(spark, f"{out}/lm_store")
    assert meta["policy"] == "buckets" and meta["has_bigram"] is True
    assert meta["by"] == "source" and meta["keep"] == ["head", "middle"]
    assert meta["global_lo"] <= meta["global_hi"]
    thr = spark.read.parquet(f"{out}/lm_store/thresholds")
    assert {r["source"] for r in thr.collect()} == {"web", "books"}
    assert bigram.count() > 0

    # byte-idempotent resume: everything skips
    rep2 = _run(spark, inp, out, params)
    assert all(v == {"skipped": True} for v in rep2["stages"].values())

    # lm-param change invalidates lm AND cascades downstream, while
    # upstream stages (quality/dedup/tokenize) still skip
    rep3 = _run(spark, inp, out, {**params, "keep": ["head"]})
    st3 = rep3["stages"]
    for up in ("quality", "dedup", "tokenize"):
        assert st3[up] == {"skipped": True}
    assert "skipped" not in st3["lm"]
    assert "skipped" not in st3["split"] and "skipped" not in st3["pack"]
    # head-only: the lo cut line sits between fluent and mediocre
    assert st3["lm"]["rows"] == 8
    kept3 = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/corpus_flat_lm").select("doc_id").collect()
    }
    assert kept3.isdisjoint(GIB_IDS | MED_IDS)


def test_batch_scored_against_stored_thresholds(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    trusted = _trusted(spark, str(tmp_path / "trusted"))
    _corpus(spark).write.parquet(inp)
    _run(spark, inp, out, {"keep": ["head", "middle"], "target_path": trusted})

    batch = spark.createDataFrame([
        Row(doc_id=900, text=_fluent(900), source="web"),
        Row(doc_id=901, text=_gibberish(901), source="web"),
    ])
    rep = pipeline.prep_batch(
        spark, batch, out, run_id="b1", capacity=64, lm_filter=True,
    )
    assert rep["lm_dropped"] == 1 and rep["kept"] == 1
    inc = spark.read.parquet(f"{out}/corpus_inc/b_{rep['batch']}")
    assert [r["doc_id"] for r in inc.select("doc_id").collect()] == [900]

    # replay is a recorded no-op
    rep2 = pipeline.prep_batch(
        spark, batch, out, run_id="b2", capacity=64, lm_filter=True,
    )
    assert rep2.get("skipped") is True

    # a batch that is ALL tail drains to zero post-tokenize: recorded
    # no-op ledger, no unreadable file-less corpus_inc dir
    allgib = spark.createDataFrame(
        [Row(doc_id=950, text=_gibberish(950), source="web")]
    )
    rep3 = pipeline.prep_batch(
        spark, allgib, out, run_id="b3", capacity=64, lm_filter=True,
    )
    assert rep3["kept"] == 0 and rep3["packs"] == 0
    assert not os.path.isdir(f"{out}/corpus_inc/b_{rep3['batch']}")

    # the drained batch's dedup survivors still entered the MinHash
    # index: an exact dup of doc 950 in a LATER batch drops as a
    # duplicate (never reaches the LM), same as after a partial drain
    dup950 = spark.createDataFrame(
        [Row(doc_id=951, text=_gibberish(950), source="web")]
    )
    rep4 = pipeline.prep_batch(
        spark, dup950, out, run_id="b4", capacity=64, lm_filter=True,
    )
    assert rep4["dropped_dups"] == 1 and rep4["kept"] == 0

    # retraining the store re-ingests a previously-recorded batch: the
    # stored-LM content is part of the batch digest, so the replay of
    # (900, 901) is NOT a ledger skip once the cut lines moved
    _run(spark, inp, out, {"keep": ["head"], "target_path": trusted})
    rep5 = pipeline.prep_batch(
        spark, batch, out, run_id="b5", capacity=64, lm_filter=True,
    )
    assert rep5.get("skipped") is not True
    assert rep5["lm_dropped"] >= 1



def test_batch_without_store_raises_and_sourceless_batch_falls_back(
    spark, tmp_path
):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    trusted = _trusted(spark, str(tmp_path / "trusted"))
    _corpus(spark).write.parquet(inp)
    # base build WITHOUT the lm stage -> no store
    pipeline.prep_corpus(spark, inp, out, run_id="x", capacity=64)
    batch = spark.createDataFrame([Row(doc_id=900, text=_fluent(900))])
    with pytest.raises(FileNotFoundError, match="LM store"):
        pipeline.prep_batch(
            spark, batch, out, run_id="b", capacity=64, lm_filter=True,
        )

    # now a store exists (per-source thresholds); a SOURCE-LESS batch
    # must fall back to the stored global cut lines, not crash
    out2 = str(tmp_path / "wh2")
    _run(spark, inp, out2, {"keep": ["head", "middle"], "target_path": trusted})
    noscr = spark.createDataFrame([
        Row(doc_id=900, text=_fluent(900)),
        Row(doc_id=901, text=_gibberish(901)),
    ])
    rep = pipeline.prep_batch(
        spark, noscr, out2, run_id="b2", capacity=64, lm_filter=True,
    )
    assert rep["lm_dropped"] == 1 and rep["kept"] == 1


def test_max_ppl_policy_corpus_and_batch(spark, tmp_path):
    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    _corpus(spark).write.parquet(inp)
    # no target: trains on the corpus itself, bigram defaults OFF
    rep = _run(spark, inp, out, {"max_ppl": 1e18})
    assert rep["stages"]["lm"]["dropped"] == 0
    _, bigram, meta = read_lm_store(spark, f"{out}/lm_store")
    assert meta["policy"] == "max_ppl" and bigram is None
    assert meta["bigram"] is False

    batch = spark.createDataFrame(
        [Row(doc_id=900, text=_fluent(900), source="web")]
    )
    rep2 = pipeline.prep_batch(
        spark, batch, out, run_id="b1", capacity=64, lm_filter=True,
    )
    assert rep2["lm_dropped"] == 0 and rep2["kept"] == 1


def test_cli_prep_lm_flag_corpus_then_batch(spark, tmp_path, capsys):
    """--prep-lm drives the lm stage on --prep-docs and the stored-model
    filter on --prep-batch-docs."""
    import json

    from teleharvest_spark import cli

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    trusted = _trusted(spark, str(tmp_path / "trusted"))
    _corpus(spark).write.parquet(inp)
    rc = cli.main([
        "--prep-docs", inp, "--output", out, "--run-id", "pc1",
        "--prep-lm", json.dumps(
            {"keep": ["head", "middle"], "target_path": trusted}
        ),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["stages"]["lm"]["dropped"] == 6
    assert os.path.exists(f"{out}/lm_store/meta.json")

    bdir = str(tmp_path / "batch")
    spark.createDataFrame([
        Row(doc_id=900, text=_fluent(900), source="web"),
        Row(doc_id=901, text=_gibberish(901), source="web"),
    ]).write.parquet(bdir)
    rc = cli.main([
        "--prep-batch-docs", bdir, "--output", out, "--run-id", "pb1",
        "--prep-lm", "{}",
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["lm_dropped"] == 1 and rep["kept"] == 1

    # the datasheet carries the lm line only because the stage ran
    ds = pipeline.corpus_report(spark, out)
    assert ds["lm_filter"]["dropped"] == 6
    assert ds["lm_filter"]["policy"] == "buckets"
    assert ds["lm_filter"]["bigram"] is True


def test_streaming_ingest_applies_stored_lm_filter(spark, tmp_path):
    """lm_filter rides start_prep_ingest's kwargs: a micro-batch is
    scored against the warehouse's stored model + frozen thresholds —
    fluent docs land, gibberish drops, across two micro-batches."""
    from teleharvest_spark.streaming import prep as sprep

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    trusted = _trusted(spark, str(tmp_path / "trusted"))
    _corpus(spark).write.parquet(inp)
    _run(spark, inp, out, {"keep": ["head", "middle"], "target_path": trusted})
    base_n = pipeline.read_prep_corpus(spark, out).count()

    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, source string"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sprep.start_prep_ingest(
            spark, stream, out, ckpt, capacity=64, lm_filter=True,
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(900, _fluent(900), "web"), (901, _gibberish(901), "web")], schema
    ).write.mode("append").parquet(str(drop))
    run()
    ids = {
        r["doc_id"]
        for r in pipeline.read_prep_corpus(spark, out).select("doc_id").collect()
    }
    assert 900 in ids and 901 not in ids
    assert len(ids) == base_n + 1

    # second micro-batch: another tail doc still judged by the SAME
    # stored cut lines (not re-derived per micro-batch)
    spark.createDataFrame(
        [(902, _fluent(902), "web"), (903, _gibberish(903), "web")], schema
    ).write.mode("append").parquet(str(drop))
    run()
    ids2 = {
        r["doc_id"]
        for r in pipeline.read_prep_corpus(spark, out).select("doc_id").collect()
    }
    assert 902 in ids2 and 903 not in ids2
