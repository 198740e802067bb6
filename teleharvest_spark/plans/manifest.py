"""Checkpoint manifest + resume — per-partition lineage and skip logic.

Reference analogue: every run re-derives where it left off from stored
state (`get_last_message_id` watermarks, processor.py:60-62) and
refreshes a bounded lookback window (processor.py:65-71). Here the
state is an explicit manifest table (FIXTURES.md T5): one row per
validated (partition, snapshot, suite-hash); resume anti-joins pending
partitions against it. In production the manifest is itself an Iceberg
table and `snapshot_id` is the Iceberg snapshot; locally we model a
snapshot as a hash of the partition's file list.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..schema import MANIFEST

MANIFEST_DIRNAME = "_validation_manifest"


def manifest_path(table_path: str) -> str:
    return os.path.join(table_path, MANIFEST_DIRNAME)


def read_manifest(spark: SparkSession, table_path: str) -> DataFrame:
    path = manifest_path(table_path)
    try:
        return spark.read.schema(MANIFEST).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST)


def pending_partitions(
    all_partitions: DataFrame,  # (partition, snapshot_id, file_list_hash)
    manifest: DataFrame,
    suite: CheckSuite,
) -> DataFrame:
    """Partitions needing (re-)validation: not in the manifest under the
    SAME snapshot AND suite hash. A snapshot advance (late data) or a
    threshold change re-queues the partition — the reference's
    bounded-lookback refresh generalized (processor.py:65-71)."""
    done = manifest.where(F.col("suite_hash") == suite.suite_hash()).select(
        "partition", "snapshot_id", "file_list_hash"
    )
    return all_partitions.join(
        F.broadcast(done), ["partition", "snapshot_id", "file_list_hash"], "left_anti"
    )


def snapshot_of_partitions(sequences: DataFrame) -> DataFrame:
    """(partition, snapshot_id, file_list_hash) derived from content.

    Local stand-in for Iceberg partition snapshots: a deterministic
    hash of each source's row count and per-row (doc_id, n_tok)
    xor-digest. Inserts, deletes, key changes, and any length-changing
    payload update re-queue the partition; a payload edit that
    preserves BOTH doc_id and n_tok slips through this cheap proxy —
    hashing the token arrays would cost the full decode scan the
    manifest exists to avoid. Production uses the real Iceberg
    snapshot id, which no edit can dodge.
    """
    return (
        sequences.groupBy(
            F.coalesce(F.col("source"), F.lit("__null__")).alias("partition")
        )
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            # bit_xor: order-independent, overflow-free content digest
            F.expr("bit_xor(xxhash64(doc_id, coalesce(n_tok, -1)))").alias("_idh"),
        )
        .select(
            "partition",
            F.abs(F.xxhash64(F.col("_cnt"), F.col("_idh"))).alias("snapshot_id"),
            F.sha2(F.concat_ws(",", F.col("_cnt"), F.col("_idh")), 256).alias("file_list_hash"),
        )
    )


def append_manifest_rows(
    spark: SparkSession,
    table_path: str,
    verdicts: DataFrame,  # from plans.suite — per-source verdict + metrics
    snapshots: DataFrame,
    suite: CheckSuite,
    run_id: str,
) -> None:
    """Record one manifest row per validated partition (append-only;
    latest (partition, suite_hash) wins on read via max snapshot)."""
    # FIXTURES.md T5 metrics map: core counts + p50/distinct always,
    # ks/psi when the run included the drift check.
    keys = [F.lit("row_count"), F.lit("violation_rows"), F.lit("null_rate"),
            F.lit("p50_n_tok"), F.lit("distinct_doc_id")]
    vals = [
        F.col("row_count").cast("double"),
        F.col("violation_rows").cast("double"),
        F.col("null_rate").cast("double"),
        F.element_at("ntok_quantiles", 1).cast("double"),
        F.col("approx_distinct_doc_id").cast("double"),
    ]
    if "ks" in verdicts.columns:
        keys += [F.lit("ks_stat"), F.lit("psi")]
        vals += [F.col("ks").cast("double"), F.col("psi").cast("double")]
    metrics = F.map_from_arrays(F.array(*keys), F.array(*vals))
    rows = (
        verdicts.select(
            F.coalesce(F.col("source"), F.lit("__null__")).alias("partition"),
            F.col("verdict"),
            metrics.alias("metrics"),
        )
        .join(F.broadcast(snapshots), "partition", "inner")
        .select(
            "partition",
            "snapshot_id",
            "file_list_hash",
            F.lit(suite.suite_hash()).alias("suite_hash"),
            "verdict",
            "metrics",
            F.lit(run_id).alias("validated_at_run"),
        )
    )
    rows.write.mode("append").parquet(manifest_path(table_path))
