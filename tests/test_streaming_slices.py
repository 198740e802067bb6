"""Streaming slice lattice (streaming/slices.py): emit-once
finalization, batch-path parity, NULL dim values as slices."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from teleharvest_spark.operators import slices as sl
from teleharvest_spark.streaming import slices as ssl

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string, event_ts timestamp"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
LATE = dt.datetime(2024, 1, 1, 13, 0, 0)


def _rows(suite):
    """Window [12:00, 12:01): src_bad rows all fail (NULL payload +
    unknown source), src_00 rows pass (allowed source), plus
    NULL-source rows (null_key violations)."""
    from teleharvest_spark import datagen

    ok = datagen.SOURCES[0]
    good = [
        (f"g{i}", list(range(suite.min_n_tok)), suite.min_n_tok, ok, T0)
        for i in range(40)
    ]
    bad = [(f"b{i}", None, None, "src_bad", T0) for i in range(20)]
    nulls = [(f"n{i}", None, None, None, T0) for i in range(10)]
    return good + bad + nulls


def test_streaming_slices_emit_once_and_match_batch(spark, suite, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    sink = str(tmp_path / "slice_sink")
    ckpt = str(tmp_path / "ckpt")

    def run(rows):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(str(drop))
        stream = spark.readStream.schema(SCHEMA).parquet(str(drop))
        q = ssl.start_windowed_slices(
            spark, stream, suite, sink, ckpt,
            dims=("source",), window="1 minute", watermark="2 minutes",
            min_support=5,
        )
        q.awaitTermination()

    run(_rows(suite))
    # nothing finalized: the watermark has not passed the window
    assert not glob.glob(f"{sink}/*.parquet")

    # a late event advances the watermark; [12:00, 12:01) finalizes
    from teleharvest_spark import datagen

    run([("late", [1] * suite.min_n_tok, suite.min_n_tok,
          datagen.SOURCES[0], LATE)])
    got = spark.read.parquet(sink)
    rows = {r["slice"]: r for r in got.collect()}
    assert set(got.select("window_start").distinct().toPandas()["window_start"]) == {T0}
    # the hot slices: src_bad (100% fail) and the NULL source (∅)
    assert rows["source=src_bad"]["flagged"]
    assert rows["source=∅"]["flagged"]
    assert not rows[f"source={datagen.SOURCES[0]}"]["flagged"]
    assert rows["source=src_bad"]["n"] == 20 and rows["source=src_bad"]["violations"] == 20

    # batch-path parity on the same window's rows
    batch_df = spark.createDataFrame(_rows(suite), SCHEMA)
    from teleharvest_spark.operators import cascade

    flagged = cascade.apply_cascade(batch_df, cascade.sequence_checks(suite))
    bpdf = sl.violation_slices(flagged, ["source"], min_support=5, top_k=None)
    for _, br in bpdf.iterrows():
        sr = rows[br["slice"]]
        assert sr["n"] == br["n"] and sr["violations"] == br["violations"]
        assert abs(sr["z"] - br["z"]) < 1e-9 or (
            sr["z"] == float("inf") and br["z"] == float("inf")
        )
        assert sr["flagged"] == br["flagged"]

    # replay: restarting over the same files emits nothing new
    n_before = got.count()
    stream = spark.readStream.schema(SCHEMA).parquet(str(drop))
    q = ssl.start_windowed_slices(
        spark, stream, suite, sink, ckpt,
        dims=("source",), window="1 minute", watermark="2 minutes",
        min_support=5,
    )
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == n_before


def test_sink_batch_replay_is_idempotent(spark, suite, tmp_path):
    # foreachBatch is at-least-once: invoking the sink TWICE with the
    # same batch_id (crash between write and checkpoint commit) must
    # not duplicate the window's lattice
    base = spark.createDataFrame(
        [(T0, "a", 80, 40), (T0, "b", 80, 2)],
        "window_start timestamp, source string, _n long, _v long",
    )
    sink_path = str(tmp_path / "sink")
    sink = ssl.windowed_slice_sink(spark, sink_path, ["source"], min_support=5)
    sink(base, 7)
    once = spark.read.parquet(sink_path).count()
    sink(base, 7)
    assert spark.read.parquet(sink_path).count() == once
    # a different batch_id appends alongside
    sink(base, 8)
    assert spark.read.parquet(sink_path).count() == 2 * once


def test_null_event_ts_rows_are_dropped_explicitly(spark, suite):
    rows = [("d1", None, None, "src_bad", None),
            ("d2", [1] * suite.min_n_tok, suite.min_n_tok, "src_00", T0)]
    df = spark.createDataFrame(rows, SCHEMA)
    counts = ssl.streaming_slice_counts(df, suite, ["source"])
    # batch execution of the same plan: the NULL-ts row joins no window
    got = counts.collect()
    assert {r["source"] for r in got} == {"src_00"}


def test_streaming_dims_validated_at_wiring_time(spark, suite):
    import pytest as pt

    df = spark.createDataFrame([], SCHEMA)
    with pt.raises(ValueError, match="at least one"):
        ssl.streaming_slice_counts(df, suite, [])
    with pt.raises(ValueError, match="duplicate"):
        ssl.streaming_slice_counts(df, suite, ["source", "source"])
    with pt.raises(ValueError, match="window coordinate"):
        ssl.streaming_slice_counts(df, suite, ["window_start"])
