"""Streaming external-scorer enrichment — score documents as they
arrive, the streaming twin of pipeline.run_all's "score" stage.

Reference analogue: the reference scores each fetched message inline
in its processing loop (processor.py:121-135 — evaluate, then rewrite
+ re-evaluate above threshold); here the same enrichment runs per
micro-batch through the batched :mod:`operators.scoring` mapInPandas
stage, so a continuously-ingesting corpus gets scores (and F7/F8
threshold verdicts) without a separate batch backfill.

Layout + idempotency follow the violations writer convention
(streaming/violations.py): each micro-batch lands under its own
``batch_id=<n>`` dir with ``mode="overwrite"``, so a REPLAYED batch
(restart between sink write and checkpoint commit) rewrites the same
directory. CAVEAT, stated rather than hidden: byte-idempotent replay
additionally requires a DETERMINISTIC scorer (the stub is; a live LLM
endpoint is not — front it with a response cache keyed on content
hash, or accept value-level divergence on the rare replayed batch).

F9 degraded mode is decided ONCE, driver-side, at stream start
(probe_scorer — the reference's once-per-run credits check): a stream
started against a down scorer runs degraded end-to-end (rows pass
unscored) rather than flip-flopping per micro-batch; restart the
stream to re-probe.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CheckSuite
from ..operators import cascade, scoring
from ..sources.writer import source_dir_col, write_partitioned
from .violations import _select_violations


def scored_batch(
    batch: DataFrame,
    scorer_factory,
    suite: CheckSuite,
    available: bool,
    text_col: str = "text",
    batch_size: int = 256,
    max_calls_per_sec: float | None = None,
) -> DataFrame:
    """One micro-batch through the enrichment: input columns + score /
    alt_text / score_alt (NULL columns when degraded), annotated with
    the F7/F8 cascade flags (no flags when degraded — F9 excludes the
    score checks entirely, so rows PASS unscored)."""
    if available:
        scored = scoring.score_stage(
            batch,
            scorer_factory,
            text_col=text_col,
            min_score=suite.min_score,
            batch_size=batch_size,
            max_calls_per_sec=max_calls_per_sec,
        )
        eff = suite
    else:
        scored = (
            batch.withColumn("score", F.lit(None).cast("double"))
            .withColumn("alt_text", F.lit(None).cast("string"))
            .withColumn("score_alt", F.lit(None).cast("double"))
        )
        eff = replace(suite, scorer_available=False)
    checks = cascade.scored_checks(eff)
    if not checks:
        return scored.withColumn(
            cascade.FIRST_FAIL_COL, F.lit(None).cast("string")
        ).withColumn(cascade.REASON_COL, F.lit(None).cast("string"))
    return cascade.apply_cascade(scored, checks).select(
        *scored.columns, cascade.FIRST_FAIL_COL, cascade.REASON_COL
    )


def scoring_sink(
    scorer_factory,
    suite: CheckSuite,
    sink_path: str,
    available: bool,
    text_col: str = "text",
    files_per_partition: int = 4,
    batch_size: int = 256,
    max_calls_per_sec: float | None = None,
):
    """foreachBatch body: enrich the batch, land the scored rows under
    ``<sink>/scored/batch_id=<n>`` and the F7/F8 violation records
    under ``<sink>/score_violations/batch_id=<n>`` (both overwrite —
    replay-idempotent with a deterministic scorer; see module note).

    ONE scoring pass feeds both writes: the annotated batch is
    persisted for the duration of the two writes, because re-deriving
    it would re-issue every external scorer call — the one cost this
    stage exists to bound."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        ann = scored_batch(
            batch, scorer_factory, suite, available,
            text_col=text_col, batch_size=batch_size,
            max_calls_per_sec=max_calls_per_sec,
        ).persist()
        try:
            scored_cols = [
                c for c in ann.columns
                if c not in (cascade.FIRST_FAIL_COL, cascade.REASON_COL)
            ]
            write_partitioned(
                ann.select(*scored_cols).withColumn(
                    "source_dir", source_dir_col()
                ),
                f"{sink_path}/scored/batch_id={batch_id}",
                partition_by=("source_dir",),
                files_per_partition=files_per_partition,
                sort_within="doc_id",
                mode="overwrite",
            )
            # the ONE violations projection (streaming/violations.py)
            # — score violations land in the engine-wide violations
            # schema (incl. the NULL-tokens column for text-only
            # streams) instead of a drift-prone local copy, and the
            # write goes through write_partitioned for the same
            # bounded-file-count + doc_id-sorted layout as the scored
            # rows two lines up
            viols = _select_violations(ann, ann.columns)
            write_partitioned(
                viols.withColumn("source_dir", source_dir_col()),
                f"{sink_path}/score_violations/batch_id={batch_id}",
                partition_by=("source_dir",),
                files_per_partition=files_per_partition,
                sort_within="doc_id",
                mode="overwrite",
            )
        finally:
            # release even on a failed write (retry builds a fresh
            # cache; a leak would ALSO re-issue scorer calls)
            ann.unpersist()

    return sink


def start_scoring_stream(
    spark: SparkSession,
    stream: DataFrame,
    scorer_factory,
    suite: CheckSuite,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
    files_per_partition: int = 4,
    batch_size: int = 256,
    max_calls_per_sec: float | None = None,
):
    """Wire a document stream into the scored/score_violations layout.
    The degraded probe runs HERE, once, driver-side."""
    available = scoring.probe_scorer(scorer_factory)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(
            scoring_sink(
                scorer_factory,
                suite,
                sink_path,
                available,
                text_col=text_col,
                files_per_partition=files_per_partition,
                batch_size=batch_size,
                max_calls_per_sec=max_calls_per_sec,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
