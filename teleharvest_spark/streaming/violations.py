"""Streaming violations writer — land per-row violation records from a
sequence STREAM in the same partitioned warehouse layout the batch
validator writes (VERDICT r3 item 5).

Reference analogue: the per-row check loop reports each failing
message as it is processed (processor.py:81-137, the in-order check
cascade); here the same row-wise verdicts land as violation ROWS in
the warehouse, batch and streaming writing one layout.

The batch path (cli.py) appends violations hive-partitioned by the
derived ``source_dir`` with bounded file counts (sources/writer.py).
In continuous ingest the violations arrive per micro-batch; this sink
writes each batch under its own ``batch_id=<n>`` directory with
``mode="overwrite"`` — the standard foreachBatch idempotency pattern:
a REPLAYED batch (restart between sink write and checkpoint commit)
rewrites the exact same directory instead of appending duplicates.
Readers see one hive tree (batch_id, source_dir partition columns);
``compact_partitioned`` folds accumulated batch dirs back to the
bounded layout, exactly as it folds accumulated batch-mode appends.

Scale: per-batch work is the cascade's narrow projection over the
micro-batch plus one size-controlled write — no state, no Python.
Cross-ROW checks don't belong here: streaming uniqueness is
``ingest.streaming_dedup`` (watermark-bounded state) and cross-batch
metrics are the windowed drift sink; this sink carries the row-wise
cascade violations that make up the violations table's bulk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..operators import cascade
from ..sources.writer import source_dir_col, write_partitioned


def _select_violations(annotated: DataFrame, batch_cols: list[str]) -> DataFrame:
    return annotated.where(F.col(cascade.FIRST_FAIL_COL).isNotNull()).select(
        "doc_id",
        "source",
        F.col(cascade.FIRST_FAIL_COL).alias("check_name"),
        F.col(cascade.REASON_COL).alias("reason"),
        (
            F.col("tokens")
            if "tokens" in batch_cols
            else F.lit(None).cast("array<int>")
        ).alias("tokens"),
    )


def violation_rows(batch: DataFrame, suite: CheckSuite) -> DataFrame:
    """Row-wise cascade violation records of one micro-batch, in the
    batch violations schema (doc_id, source, check_name, reason,
    tokens) — the per-row invariant (token-array equality with the
    reference's reported rows) rides along exactly as in
    plans/suite.py."""
    annotated = cascade.apply_cascade(batch, cascade.sequence_checks(suite))
    return _select_violations(annotated, batch.columns)


def violations_sink(
    suite: CheckSuite,
    sink_path: str,
    files_per_partition: int = 4,
    violation_sample: int | None = None,
    emit_valid: str | None = None,
):
    """foreachBatch body: cascade the batch, write its violations to
    ``<sink>/batch_id=<id>`` in the partitioned layout (overwrite —
    replay-idempotent).

    ``violation_sample``: cap written rows at N per (source, check)
    PER MICRO-BATCH via plans/suite.sample_violations — a stream stuck
    on a systematically-failing source then writes a bounded diagnostic
    per batch instead of re-materializing the batch. The sample is
    content-hash derived, so a REPLAYED batch samples the exact same
    rows and the overwrite stays byte-idempotent.

    ``emit_valid``: also land the CERTIFIED rows (cascade-clean, in the
    batch's own schema) under ``<emit_valid>/batch_id=<id>`` — the
    streaming twin of cli.run's --emit-valid (the reference's S4 insert
    path: failing rows skipped, passing rows persist). Certification
    here is CASCADE-scoped: cross-row uniqueness belongs upstream in
    ingest.streaming_dedup (watermark-bounded state), and the
    certified set is always the full uncapped complement — the sample
    cap only bounds the diagnostic, never widens certification. One
    cascade pass feeds both writes (the batch is persisted for the
    duration of the two writes).
    """

    def sink(batch: DataFrame, batch_id: int) -> None:
        annotated = cascade.apply_cascade(
            batch, cascade.sequence_checks(suite)
        )
        if emit_valid is not None:
            annotated = annotated.persist()
        try:
            viol = _select_violations(annotated, batch.columns)
            if violation_sample is not None:
                from ..plans.suite import sample_violations

                per_check = viol.groupBy("source", "check_name").agg(
                    F.count(F.lit(1)).alias("check_cnt")
                )
                viol = sample_violations(viol, per_check, violation_sample)
            viol = viol.withColumn("source_dir", source_dir_col())
            write_partitioned(
                viol,
                f"{sink_path}/batch_id={batch_id}",
                partition_by=("source_dir",),
                files_per_partition=files_per_partition,
                sort_within="doc_id",
                mode="overwrite",
            )
            if emit_valid is not None:
                certified = (
                    annotated.where(F.col(cascade.FIRST_FAIL_COL).isNull())
                    .select(*batch.columns)
                    .withColumn("source_dir", source_dir_col())
                )
                write_partitioned(
                    certified,
                    f"{emit_valid}/batch_id={batch_id}",
                    partition_by=("source_dir",),
                    files_per_partition=files_per_partition,
                    sort_within="doc_id",
                    mode="overwrite",
                )
        finally:
            # release even on a failed write: foreachBatch retries
            # build a NEW persisted frame each attempt, so a leak here
            # accumulates full micro-batch caches across retries
            if emit_valid is not None:
                annotated.unpersist()

    return sink


def start_violations_writer(
    spark: SparkSession,
    stream: DataFrame,
    suite: CheckSuite,
    sink_path: str,
    checkpoint: str,
    files_per_partition: int = 4,
    violation_sample: int | None = None,
    emit_valid: str | None = None,
):
    """Wire a sequence stream into the partitioned violations table
    (and, with ``emit_valid``, the certified table)."""
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(
            violations_sink(
                suite,
                sink_path,
                files_per_partition,
                violation_sample,
                emit_valid,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
