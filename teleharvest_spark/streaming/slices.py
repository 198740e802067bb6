"""Streaming violation hotspot slicing — the slice report in
continuous mode.

Batch slicing (operators/slices.py) answers "where do failures
concentrate" per validation run. In continuous deployment sequences
ARRIVE as a stream; this module keeps a watermarked event-time-
windowed COMBINATION frame (per-(window, dims) row/violation counts —
the level-1 aggregate of the batch path, so streaming state is
|open windows| × |dim combos|, independent of row volume) and scores
each CLOSED window's slice lattice in ``foreachBatch``:

    stream → row-wise cascade flags (pure codegen, stream-safe)
           → withWatermark → window(ts) × dims counts + fail-sums
           → (append mode: a window's counts emit exactly once,
              after the watermark finalizes it)
           → foreachBatch: cube the batch's combination rows per
              window (operators/slices.lattice_from_base with
              group_keys=('window_start',)), score the metadata-sized
              lattice in pandas (score_lattice), write under a
              batch_id-keyed directory (overwrite) so the
              at-least-once foreachBatch replay after a crash between
              write and checkpoint commit rewrites the same dir
              instead of appending duplicates — the streaming
              violations writer's idempotence scheme.

Per-batch Python touches only the aggregated lattice rows. NULL dim
values are real slice values here (∅) — unlike drift, slicing does
NOT drop NULL keys, because the cascade's null-key violations are
exactly what a hotspot report must localize. The one NULL the
pipeline DOES drop is a NULL event timestamp: time-windowed
aggregation cannot place such a row in any window (Spark filters
``ts IS NOT NULL`` before windowing), so the drop is made explicit
below — a feed that can produce NULL timestamps must coalesce them
to an ingest time upstream or its violations bypass this report.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..operators import cascade as cascade_ops
from ..operators import slices as slice_ops

SINK_SCHEMA = (
    "window_start timestamp, slice string, arity int, n long, "
    "violations long, rate double, global_rate double, lift double, "
    "z double, p_value double, flagged boolean, dominated boolean"
)


def streaming_slice_counts(
    stream: DataFrame,
    suite: CheckSuite,
    dims: Sequence[str],
    ts_col: str = "event_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-(window, dims) row and violation counts — the
    streaming form of the batch level-1 aggregate. The cascade's flags
    are computed row-wise BEFORE the aggregation (sequence_checks is
    pure codegen — no joins, stream-safe); the suite's per-source
    bound overrides are not available here (they need a dimension
    join; use the batch pass for that).

    Dims must be bounded-cardinality: streaming state is
    |open windows| × |dim combos|, and the batch path's Misra-Gries
    capping (``operators.slices.capped_dim``) needs a corpus pre-pass
    a stream cannot run — cap high-cardinality dims upstream (or band
    them with ``bucketized``) before wiring the stream in."""
    dims = list(dims)
    # fail at WIRING time, not per-batch inside a running query —
    # lattice_from_base would raise identically, but only after the
    # first finalized window, leaving a silently-empty sink till then
    if not dims:
        raise ValueError("need at least one slice dimension")
    if len(dims) != len(set(dims)):
        raise ValueError(f"duplicate slice dimensions: {dims}")
    if "window_start" in dims:
        raise ValueError("'window_start' is the window coordinate, not a dim")
    if ts_col not in stream.columns:
        stream = stream.withColumn(ts_col, F.current_timestamp())
    # explicit: NULL-timestamp rows cannot be windowed (Spark's
    # TimeWindowing would filter them silently); see module docstring
    stream = stream.where(F.col(ts_col).isNotNull())
    flagged = cascade_ops.apply_cascade(
        stream, cascade_ops.sequence_checks(suite)
    )
    fail = (~F.coalesce(F.col(cascade_ops.VERDICT_COL), F.lit(True))).cast("long")
    return (
        flagged.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *[F.col(c) for c in dims])
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(fail).alias("_v"))
        .select(
            F.col("window.start").alias("window_start"), *dims, "_n", "_v"
        )
    )


def windowed_slice_sink(
    spark: SparkSession,
    sink_path: str,
    dims: Sequence[str],
    max_arity: int = 2,
    min_support: int = 30,
    alpha: float = 1e-3,
    min_lift: float = 1.5,
):
    """foreachBatch body: each batch carries FINALIZED (window, dims,
    _n, _v) combination rows (append mode); cube them into each
    window's lattice, score per window in pandas, append the scored
    rows. The lattice is metadata-sized (|combos| bounded by dim
    cardinality), so the per-batch pandas pass is trivial."""
    dims = list(dims)

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        lattice = slice_ops.lattice_from_base(
            batch,
            dims,
            max_arity=max_arity,
            min_support=min_support,
            group_keys=("window_start",),
        )
        pdf = lattice.toPandas()
        if not len(pdf):
            return
        # plain loop, not groupby().apply reading the group column —
        # pandas 3 removes include_groups=True and the lambda would
        # KeyError on 'window_start'
        import pandas as pd

        parts = []
        for ws, g in pdf.groupby("window_start", sort=False):
            parts.append(
                slice_ops.score_lattice(
                    g, alpha=alpha, min_lift=min_lift, top_k=None
                ).assign(window_start=ws)
            )
        scored = pd.concat(parts, ignore_index=True)
        cols = [c.split()[0] for c in SINK_SCHEMA.split(", ")]
        # batch_id-keyed dir + overwrite: foreachBatch is at-least-once
        # (a crash between write and checkpoint commit replays the
        # batch) — the replay rewrites this directory instead of
        # appending a duplicate lattice (the violations writer's
        # idempotence scheme)
        from ..session import local_df

        local_df(
            spark, scored[cols].astype({"arity": "int64"}), SINK_SCHEMA
        ).write.mode("overwrite").parquet(f"{sink_path}/batch_id={batch_id}")

    return sink


def start_windowed_slices(
    spark: SparkSession,
    stream: DataFrame,
    suite: CheckSuite,
    sink_path: str,
    checkpoint: str,
    dims: Sequence[str] = ("source",),
    ts_col: str = "event_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
    min_support: int = 30,
    min_lift: float = 1.5,
):
    """Wire a sequence stream into the windowed slice-lattice sink."""
    counts = streaming_slice_counts(
        stream, suite, dims, ts_col=ts_col, window=window, watermark=watermark
    )
    return (
        counts.writeStream.outputMode("append")
        .foreachBatch(
            windowed_slice_sink(
                spark, sink_path, dims,
                min_support=min_support, min_lift=min_lift,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
