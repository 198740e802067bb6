"""Streaming ingest + windowed validation counters.

The reference is batch-incremental, NOT streaming (SURVEY.md §2.8) —
its watermark semantics map to the batch manifest (plans/manifest.py).
This module exists for the continuous-ingest deployment mode: the same
check cascade run on a file stream with event-time windowed violation
counts. The cascade expressions are reused verbatim — one definition,
two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..operators import cascade
from ..schema import SEQUENCES


def stream_sequences(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of sequence parquet drops."""
    return spark.readStream.schema(SEQUENCES).parquet(path)


def streaming_violation_counts(
    stream: DataFrame,
    suite: CheckSuite,
    ts_col: str = "_ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Windowed per-check violation counts with late-data watermark.

    If the stream has no event-time column, a processing-time column is
    stamped at ingest — deterministic tests drive this with
    ``processAllAvailable`` on a static directory.
    """
    annotated = cascade.apply_cascade(
        stream.withColumn(ts_col, F.coalesce(F.col(ts_col) if ts_col in stream.columns else F.lit(None), F.current_timestamp())),
        cascade.sequence_checks(suite),
    )
    return (
        annotated.where(F.col(cascade.FIRST_FAIL_COL).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(cascade.FIRST_FAIL_COL).alias("check_name"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
