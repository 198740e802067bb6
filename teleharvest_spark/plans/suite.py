"""The full validation run: cascade + uniqueness + referential + stats
+ drift → violations table + per-partition verdicts.

This is the engine's `fetch_and_process` analogue (processor.py:55-63)
minus the network boundaries: read → one narrow check-cascade stage →
broadcast joins → two small aggregates → verdict assembly. The fact
table is scanned ONCE for the row-level work and once for histograms;
all joins against dimensions are broadcast; the only row-volume
shuffle is the uniqueness aggregate (salted, see
operators/uniqueness.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import CheckSuite
from ..operators import cascade, drift, referential, stats, uniqueness


@dataclass
class ValidationResult:
    violations: DataFrame  # schema.VIOLATIONS
    verdicts: DataFrame    # per-source verdict + metrics
    stats: DataFrame       # raw per-partition stats


def run_suite(
    sequences: DataFrame,
    suite: CheckSuite,
    baseline_hist: DataFrame | None = None,
) -> ValidationResult:
    """Run every check family over the sequences table.

    The cascade already covers unknown_source/banned rows row-wise;
    uniqueness contributes rows the cascade can't see (cross-row).
    Violation precedence on union: cascade reason wins for a doc that
    is both (matches the reference's in-order reporting); uniqueness
    rows are additive.
    """
    checks = cascade.sequence_checks(suite)
    cascade_viol = cascade.violations(sequences, checks)
    uniq_viol = uniqueness.uniqueness_violations(sequences, key="doc_id")
    violations = cascade_viol.unionByName(uniq_viol)

    part_stats = stats.stats_verdicts(stats.partition_stats(sequences), suite)

    drift_v = None
    if baseline_hist is not None:
        hist = drift.ntok_histogram(sequences)
        drift_v = drift.drift_verdicts(drift.drift_metrics(hist, baseline_hist), suite)

    # per-source violation counts (small agg over the violations set).
    # NULL is a legitimate partition value here (null_key violations) —
    # all verdict-side joins must be null-safe.
    viol_counts = violations.groupBy("source").agg(
        F.count(F.lit(1)).alias("violation_rows")
    )
    verdicts = (
        part_stats.join(
            viol_counts.withColumnRenamed("source", "_vsource"),
            F.col("source").eqNullSafe(F.col("_vsource")),
            "left",
        )
        .drop("_vsource")
        .fillna({"violation_rows": 0})
    )
    if drift_v is not None:
        verdicts = verdicts.join(
            drift_v.select(
                F.col("source").alias("_dsource"), "ks", "psi", "drift_verdict"
            ),
            F.col("source").eqNullSafe(F.col("_dsource")),
            "left",
        ).drop("_dsource")
        drift_fail = F.col("drift_verdict") == "fail"
    else:
        drift_fail = F.lit(False)

    verdicts = verdicts.withColumn(
        "verdict",
        F.when(
            (F.col("stats_verdict") == "fail")
            | (F.col("violation_rows") > 0)
            | F.coalesce(drift_fail, F.lit(False)),
            F.lit("fail"),
        ).otherwise(F.lit("pass")),
    )
    return ValidationResult(violations=violations, verdicts=verdicts, stats=part_stats)
