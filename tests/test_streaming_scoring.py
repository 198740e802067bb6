"""Streaming external-scorer enrichment (streaming/scoring.py): scores
land per micro-batch in the partitioned layout, F7/F8 violations ride
along, replay overwrites instead of duplicating, and the degraded
probe (F9) holds for the whole stream."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators.scoring import StubScorer, _stub_score
from teleharvest_spark.streaming import scoring as ss

DOCS_SCHEMA = "doc_id long, text string, source string"


def _drop(spark, path, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("append").parquet(path)


def _stream(spark, path):
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path)


def test_streaming_scoring_layout_violations_and_replay(spark, tmp_path):
    suite = CheckSuite(min_score=40, min_score_alt=40)
    drop, sink, ckpt = (
        str(tmp_path / "drop"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )

    def run():
        q = ss.start_scoring_stream(
            spark, _stream(spark, drop), StubScorer, suite, sink, ckpt
        )
        q.awaitTermination()

    b1 = [
        (1, "a good document body", "s0"),
        (2, None, "s0"),          # NULL text → NULL score → F7 violation
        (3, "another doc here", ""),  # empty source → its own hive dir
    ]
    _drop(spark, drop, b1)
    run()
    scored = spark.read.parquet(f"{sink}/scored")
    assert scored.count() == 3
    assert {"batch_id", "source_dir"} <= set(scored.columns)
    assert scored.where(F.col("source_dir") == "__empty__").count() == 1
    got = {r["doc_id"]: r for r in scored.collect()}
    # deterministic stub scores, NULL text unscored
    assert got[1]["score"] == _stub_score("a good document body")
    assert got[2]["score"] is None
    viols = spark.read.parquet(f"{sink}/score_violations")
    v_ids = {r["doc_id"] for r in viols.collect()}
    assert 2 in v_ids  # NULL score fails F7
    # rows above min_score carry the rewrite + its re-score
    for r in got.values():
        if r["score"] is not None and r["score"] > 40:
            assert r["alt_text"] is not None and r["score_alt"] is not None

    # micro-batch 2 processes only the new file
    _drop(spark, drop, [(4, "fresh arrival text", "s1")])
    run()
    scored2 = spark.read.parquet(f"{sink}/scored")
    assert scored2.count() == 4
    assert scored2.where(F.col("batch_id") == 1).count() == 1

    # replay batch 0: same batch_id overwrites its own dirs — counts
    # stay identical (stub scorer is deterministic, so byte-stable too)
    n_v = spark.read.parquet(f"{sink}/score_violations").count()
    sink_fn = ss.scoring_sink(StubScorer, suite, sink, available=True)
    sink_fn(spark.createDataFrame(b1, DOCS_SCHEMA), 0)
    assert spark.read.parquet(f"{sink}/scored").count() == 4
    assert spark.read.parquet(f"{sink}/score_violations").count() == n_v
    # bounded files per leaf dir
    for d in glob.glob(f"{sink}/scored/batch_id=*/source_dir=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert 0 < len(files) <= 4, d


def test_streaming_scoring_degraded_stream(spark, tmp_path):
    """Down scorer at stream start → every batch runs degraded: NULL
    score columns, ZERO violations (F9: rows pass unscored)."""
    suite = CheckSuite(min_score=40, min_score_alt=40)
    drop, sink, ckpt = (
        str(tmp_path / "drop"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    _drop(spark, drop, [(1, "some text", "s0"), (2, None, "s0")])
    q = ss.start_scoring_stream(
        spark, _stream(spark, drop),
        lambda: StubScorer(available=False), suite, sink, ckpt,
    )
    q.awaitTermination()
    scored = spark.read.parquet(f"{sink}/scored")
    assert scored.count() == 2
    assert scored.where(F.col("score").isNotNull()).count() == 0
    # zero violations → zero data files (an empty partitioned write
    # produces no parquet leaves to read)
    assert not glob.glob(f"{sink}/score_violations/batch_id=*/*/*.parquet")
