"""Streaming late-data metrics refresh — entry point 3 in continuous
mode.

The batch pipeline (operators/refresh.py: reference
fetch_and_update_metrics, processor.py:65-71) re-scans a bounded
lookback window per run. In continuous deployment the fresh metric
observations ARRIVE as a stream; each micro-batch becomes one keyed
upsert into the stored table via ``foreachBatch`` — Spark's standard
stream-to-MERGE pattern (on a cluster with Iceberg jars the sink body
is a real ``MERGE INTO`` and each micro-batch is one atomic snapshot
commit; here the parquet target is rewritten through the same
merge_upsert join used by the batch path, so semantics are pinned by
one implementation).

F10 validity (views truthy AND reactions truthy, processor.py:147-157)
filters each micro-batch BEFORE the merge; invalid observations never
touch the store. Within a micro-batch, duplicate observations for one
key resolve to the highest-seq observation (late replays of older
fetches lose), making the sink idempotent under stream replay —
foreachBatch gives at-least-once, so the merge must tolerate re-runs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators import refresh as batch_refresh
from ..operators import merge

_PTR = "_LATEST"  # pointer file naming the live version directory
_KEEP_VERSIONS = 2  # live + previous (crash window / in-flight readers)


def _latest_version(target_path: str) -> str | None:
    ptr = os.path.join(target_path, _PTR)
    if os.path.exists(ptr):
        with open(ptr, encoding="utf-8") as f:
            return f.read().strip() or None
    return None


def read_stored(spark: SparkSession, target_path: str) -> DataFrame:
    """Read the live stored table: the ``_LATEST``-pointed version
    directory, or (before the first micro-batch) the seed parquet at
    the target root."""
    v = _latest_version(target_path)
    return spark.read.parquet(os.path.join(target_path, v) if v else target_path)


def _flip_pointer(target_path: str, version: str) -> None:
    """Atomic pointer swap: write-temp + os.replace (POSIX rename)."""
    ptr = os.path.join(target_path, _PTR)
    tmp = ptr + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp, ptr)


def _gc_versions(target_path: str, live: str) -> None:
    """Keep the live version plus the most recent predecessor(s) by
    mtime — version names are not chronological in every producer (the
    batch pipeline derives them from content digests), so recency must
    come from the filesystem, and the live version is kept
    unconditionally."""
    vers = [
        d for d in os.listdir(target_path)
        if d.startswith("v") and os.path.isdir(os.path.join(target_path, d))
    ]
    vers.sort(key=lambda d: os.path.getmtime(os.path.join(target_path, d)))
    keep = set(vers[-_KEEP_VERSIONS:]) | {live}
    for d in vers:
        if d not in keep:
            shutil.rmtree(os.path.join(target_path, d), ignore_errors=True)


def refresh_sink(
    spark: SparkSession,
    target_path: str,
    key: str = "source",
    seq: str = "doc_seq",
    metric_cols: tuple[str, ...] = ("views", "reactions", "forwards"),
    obs_seq: str = "_obs_seq",
):
    """foreachBatch body: upsert a micro-batch of metric observations
    into the parquet target.

    ``obs_seq`` (observation sequence — e.g. fetch timestamp) picks the
    winner among same-key duplicates inside one micro-batch; absent,
    the greatest metric struct decides — merge_upsert's documented
    winner rule, shared so the two layers agree. (The earlier fallback
    ordered by ``seq``, a PARTITION key of the dedup window: every
    duplicate tied and row_number picked an arbitrary,
    partitioning-dependent winner, so a replay could store a different
    metric row than the crashed attempt.)

    Local no-MERGE emulation writes the merged table ONCE per batch to
    a batch-id-scoped version directory, then atomically flips the
    ``_LATEST`` pointer (ADVICE r2 replaced the staging-write +
    read-back + in-place overwrite, which both doubled the IO and could
    truncate the table on a mid-overwrite crash). Crash anywhere before
    the flip leaves the old version live; checkpoint replay rewrites
    the same version dir and flips. A replayed batch whose pointer
    already names its own version is a completed application and
    short-circuits — also the guard against overwrite-while-reading-
    self. Production path: Iceberg ``MERGE INTO``
    (merge.iceberg_merge_sql), one atomic snapshot per batch.
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        vname = f"v{batch_id:012d}"
        if _latest_version(target_path) == vname:
            return  # at-least-once replay of a fully-applied batch
        valid = batch.where(
            batch_refresh.metrics_validity(F.col("views"), F.col("reactions"))
        )
        # deterministic total order: obs_seq when present, then the
        # greatest metric STRUCT — the same winner rule merge_upsert
        # documents and applies to duplicate update keys, so the two
        # layers can never pick different rows; full ties are
        # identical rows, any winner equal
        order = (
            [F.desc(obs_seq)] if obs_seq in batch.columns else []
        ) + [F.desc(F.struct(*[F.col(c) for c in metric_cols]))]
        w = W.partitionBy(key, seq).orderBy(*order)
        latest = (
            valid.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(key, seq, *metric_cols)
        )
        if latest.isEmpty():
            return
        stored = read_stored(spark, target_path)
        merged = merge.merge_upsert(
            stored, latest, keys=[key, seq], update_cols=list(metric_cols)
        )
        vdir = os.path.join(target_path, vname)
        merged.write.mode("overwrite").parquet(vdir)
        _flip_pointer(target_path, vname)
        _gc_versions(target_path, vname)

    return sink


def start_refresh_stream(
    spark: SparkSession,
    obs_path: str,
    obs_schema: str,
    target_path: str,
    checkpoint: str,
    **sink_kwargs,
):
    """Wire a file-source observation stream into the refresh sink."""
    stream = spark.readStream.schema(obs_schema).parquet(obs_path)
    return (
        stream.writeStream.foreachBatch(
            refresh_sink(spark, target_path, **sink_kwargs)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
