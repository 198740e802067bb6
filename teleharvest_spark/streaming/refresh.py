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

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators import refresh as batch_refresh
from ..operators import merge


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
    ``seq`` itself is used.
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        order_col = obs_seq if obs_seq in batch.columns else seq
        valid = batch.where(
            batch_refresh.metrics_validity(F.col("views"), F.col("reactions"))
        )
        w = W.partitionBy(key, seq).orderBy(F.desc(order_col))
        latest = (
            valid.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(key, seq, *metric_cols)
        )
        if latest.isEmpty():
            return
        stored = spark.read.parquet(target_path)
        merged = merge.merge_upsert(
            stored, latest, keys=[key, seq], update_cols=list(metric_cols)
        )
        # Local parquet has no MERGE: write the merged table to a new
        # location then swap. (Iceberg production path: MERGE INTO —
        # merge.iceberg_merge_sql — one atomic snapshot per batch.)
        tmp = f"{target_path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)

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
