"""Streaming distribution drift — the north-rule KS/PSI check in
continuous mode.

Batch drift (operators/drift.py) compares each source's n_tok
histogram against a trusted baseline per validation run. In
continuous deployment sequences ARRIVE as a stream; this module keeps
a watermarked event-time-windowed histogram (bounded state — Spark
drops a window's aggregation state once the watermark passes it) and
computes KS/PSI per CLOSED window in ``foreachBatch``:

    stream → withWatermark → window(ts) × source × bucket counts
           → (append mode: a window's counts emit exactly once,
              after the watermark finalizes it)
           → foreachBatch: dense-align vs the static baseline
              histogram, Arrow-batched KS/PSI per (window, source),
              append to the metrics sink.

Scale: streaming state is |open windows| × |sources| × 128 buckets —
independent of row volume; the per-batch Python work happens on those
aggregated rows only (same sketch-sized applyInPandas as the batch
path). The metrics sink is append-only; replays of a finalized window
are impossible in append mode (the emit happens once), so the sink
needs no dedup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..operators import drift as drift_ops

_METRICS_SCHEMA = "window_start timestamp, source string, ks double, psi double"


def streaming_ntok_histogram(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-(window, source) n_tok bucket counts.

    NULL-source rows are excluded (drift is a per-partition check; a
    NULL key is a cascade violation, not a partition — the engine-wide
    exclusion policy). If ``ts_col`` is absent a processing-time stamp
    is used (tests drive event time explicitly).
    """
    if ts_col not in stream.columns:
        stream = stream.withColumn(ts_col, F.current_timestamp())
    # THE shared bucketing expression (operators/drift.ntok_bucket_col)
    # — a fork here would silently compare streaming windows against
    # batch baselines in a different bucket space
    bucket = drift_ops.ntok_bucket_col()
    return (
        stream.where(F.col("source").isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("source"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"), "source", "bucket", "cnt"
        )
    )


def streaming_token_histogram(
    stream: DataFrame,
    ts_col: str = "event_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-(window, source) TOKEN-ID bucket counts — the
    vocab-shift twin of ``streaming_ntok_histogram`` (same emit-once
    append-mode contract, same sink). Tokens are pre-bucketed per row
    with a narrow ``transform`` before the explode, so the partial
    hash aggregation collapses each task's explosion to ≤
    TOKEN_ID_BUCKETS rows per (window, source) before any shuffle —
    state stays |open windows| × |sources| × TOKEN_ID_BUCKETS (64;
    the 128 figure applies to the n_tok path only) regardless of
    tokens per row. Bucketing is the SHARED expression
    (operators/drift.token_bucket_array) so it cannot fork from the
    batch baseline's."""
    from ..datagen import VOCAB

    if ts_col not in stream.columns:
        stream = stream.withColumn(ts_col, F.current_timestamp())
    buckets = drift_ops.token_bucket_array(F.col("tokens"), VOCAB)
    return (
        stream.where(F.col("source").isNotNull())
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), "source", F.explode(buckets).alias("bucket"))
        .groupBy(F.window(F.col(ts_col), window), F.col("source"), F.col("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"), "source", "bucket", "cnt"
        )
    )


def _windowed_metrics_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    out = drift_ops._drift_metrics_pdf(pdf)
    out.insert(0, "window_start", pdf["window_start"].iloc[0])
    return out


def windowed_drift_sink(
    spark: SparkSession,
    baseline_hist: DataFrame,
    sink_path: str,
    suite: CheckSuite | None = None,
):
    """foreachBatch body: each batch carries FINALIZED (window, source,
    bucket, cnt) rows (append mode); dense-align against the static
    baseline and write (window, source, ks, psi[, verdict]) under the
    batch's own ``batch_id=<n>`` directory (overwrite).

    The batch_id-dir overwrite layout is the package's replay
    contract (violations/slices/scoring sinks use the same): the
    aggregation emits each finalized window once, but foreachBatch is
    AT-LEAST-ONCE — a crash after the write but before the checkpoint
    commit replays the batch, and a bare append would duplicate every
    metric row; the replay instead overwrites its own directory
    idempotently. Readers see one hive tree with a batch_id column.

    The baseline may be GLOBAL (bucket, cnt — every source compared
    against the pooled histogram) or PER-SOURCE (source, bucket, cnt —
    the shape batch ``drift_metrics`` accepts and the temporal baseline
    store produces): mirror of drift_metrics' branch, a per-source
    baseline joins on source instead of cross-joining (a crossJoin
    there would duplicate the source column and mis-align buckets)."""
    # Legacy-layout guard (ADVICE r5): this sink once wrote flat
    # mode('append') parquet directly under sink_path; the current
    # batch_id=<n> subdirectory layout cannot coexist with those flat
    # files (Spark refuses mixed flat/partitioned trees with a
    # conflicting-directory-structure error at READ time, long after
    # the writes landed). Fail at sink construction with a migration
    # hint instead.
    import glob as _glob
    import os as _os

    if _os.path.isdir(sink_path) and _glob.glob(
        _os.path.join(sink_path, "*.parquet")
    ):
        raise ValueError(
            f"drift sink at {sink_path} holds flat parquet files from "
            "the legacy append layout; the sink now writes per-batch "
            "batch_id=<n> directories and the two layouts cannot be "
            "read as one tree — move the legacy files into a "
            "batch_id=-1/ subdirectory (or point the sink at a fresh "
            "path) before restarting the stream"
        )
    per_source = "source" in baseline_hist.columns
    base = baseline_hist.withColumnRenamed("cnt", "base_cnt")

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        keys = batch.select("window_start", "source").distinct()
        if per_source:
            dense = keys.join(F.broadcast(base), "source")
        else:
            dense = keys.crossJoin(F.broadcast(base))
        joined = batch.join(
            dense, ["window_start", "source", "bucket"], "full_outer"
        ).fillna({"cnt": 0, "base_cnt": 0})
        metrics = joined.groupBy("window_start", "source").applyInPandas(
            _windowed_metrics_pdf, _METRICS_SCHEMA
        )
        if suite is not None:
            metrics = drift_ops.drift_verdicts(metrics, suite)
        metrics.write.mode("overwrite").parquet(
            f"{sink_path}/batch_id={batch_id}"
        )

    return sink


def start_windowed_drift(
    spark: SparkSession,
    stream: DataFrame,
    baseline_hist: DataFrame,
    sink_path: str,
    checkpoint: str,
    ts_col: str = "event_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    suite: CheckSuite | None = None,
    histogram: str = "n_tok",
):
    """Wire a sequence stream into the windowed drift metrics sink.

    ``histogram``: ``"n_tok"`` (length drift) or ``"tokens"``
    (vocab-shift drift over token-id buckets) — the baseline must be
    the matching bucketing."""
    builder = (
        streaming_token_histogram if histogram == "tokens" else streaming_ntok_histogram
    )
    hist = builder(stream, ts_col=ts_col, window=window, watermark=watermark)
    return (
        hist.writeStream.outputMode("append")
        .foreachBatch(windowed_drift_sink(spark, baseline_hist, sink_path, suite))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
