"""spark-submit entrypoint for a full validation run.

Cluster usage (north_rule packaging contract):

    scripts/package.sh            # → dist/teleharvest_spark.zip
    spark-submit \
        --master yarn --deploy-mode cluster \
        --py-files dist/teleharvest_spark.zip \
        scripts/run_validation.py \
        --input /data/sequences --output /data/validation \
        --run-id 2026-08-16a --resume

Reads the sequences table (parquet path here; Iceberg table name on a
cluster with the runtime jars — see sources/iceberg.py), runs the full
check suite (cascade + uniqueness + stats + verdicts), writes the
violations and verdicts tables, and appends checkpoint-manifest rows so
a re-run with ``--resume`` skips partitions whose snapshot and suite
hash are unchanged (reference analogue: watermark re-derivation,
processor.py:60-63, and bounded lookback refresh, processor.py:65-71).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

from .config import CheckSuite
from .plans import manifest as mf
from .plans import suite as suite_plan
from .session import get_spark
from .sources.writer import write_partitioned


def build_suite(path: str | None) -> CheckSuite:
    """Suite from a JSON file of threshold overrides (driver-side read,
    reference analogue: Settings/.env, settings.py:8-62)."""
    if not path:
        return CheckSuite()
    with open(path, encoding="utf-8") as f:
        overrides = json.load(f)
    for k in ("banned_tokens", "allowed_sources"):
        if k in overrides:
            overrides[k] = tuple(overrides[k])
    return CheckSuite(**overrides)


def run(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    suite: CheckSuite,
    run_id: str,
    resume: bool = False,
    drift: bool = True,
    source_dim_path: str | None = None,
) -> dict:
    sequences = spark.read.parquet(input_path)
    source_dim = spark.read.parquet(source_dim_path) if source_dim_path else None

    snapshots = mf.snapshot_of_partitions(sequences)
    baseline_hist = None
    if resume:
        manifest = mf.read_manifest(spark, output_path)
        pending = mf.pending_partitions(snapshots, manifest, suite)
        pending_sources = [r["partition"] for r in pending.select("partition").collect()]
        if not pending_sources:
            return {"run_id": run_id, "validated_rows": 0, "skipped": True}
        if drift:
            # The drift_vs_global baseline must pool the FULL table, not
            # just the pending partitions: with a single pending source
            # the filtered pool would be that source compared against
            # itself (KS/PSI ≈ 0) and the gate would silently pass.
            from .operators import drift as drift_ops

            baseline_hist = (
                drift_ops.ntok_histogram(sequences)
                .groupBy("bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        sequences = sequences.where(
            F.coalesce(F.col("source"), F.lit("__null__")).isin(pending_sources)
        )
        snapshots = snapshots.where(F.col("partition").isin(pending_sources))

    t0 = time.perf_counter()
    res = suite_plan.run_suite(
        sequences,
        suite,
        baseline_hist=baseline_hist,
        drift_vs_global=drift,
        source_dim=source_dim,
    )
    # violations land hive-partitioned by a DERIVED dir column with
    # bounded file counts — the common failure-triage read ("show me
    # src_07's violations") prunes whole directories, and a hot
    # failing source can't produce one giant task-shaped file. The
    # dir key is derived because hive encoding maps both NULL and ''
    # to __HIVE_DEFAULT_PARTITION__, which would destroy the
    # empty-vs-null source distinction the cascade separates; the raw
    # `source` column stays in the data files untouched.
    dir_col = F.when(F.col("source").isNull(), F.lit("__null__")).when(
        F.col("source") == "", F.lit("__empty__")
    ).otherwise(F.col("source"))
    write_partitioned(
        res.violations.withColumn("source_dir", dir_col),
        f"{output_path}/violations",
        partition_by=("source_dir",),
        files_per_partition=4,
        sort_within="doc_id",
        mode="append",
    )
    res.verdicts.write.mode("overwrite").parquet(f"{output_path}/verdicts/{run_id}")
    mf.append_manifest_rows(spark, output_path, res.verdicts, snapshots, suite, run_id)
    n_rows = sequences.count()
    wall = time.perf_counter() - t0
    report = {
        "run_id": run_id,
        "validated_rows": n_rows,
        "violations": res.violations.count(),
        "partitions": res.verdicts.count(),
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "suite_hash": suite.suite_hash(),
        "skipped": False,
    }
    res.cleanup()
    return report


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="teleharvest-validate")
    ap.add_argument("--input", required=True, help="sequences table path (parquet)")
    ap.add_argument("--output", required=True, help="output root (violations/verdicts/manifest)")
    ap.add_argument("--suite-json", default=None, help="JSON file of CheckSuite overrides")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--resume", action="store_true", help="skip partitions already in the manifest")
    ap.add_argument("--no-drift", action="store_true", help="skip the KS/PSI drift check")
    ap.add_argument(
        "--source-dim",
        default=None,
        help="parquet path of (source, min_n_tok, max_n_tok) per-source overrides",
    )
    ap.add_argument("--master", default=None, help="override master (default: existing session / local)")
    ap.add_argument(
        "--run-all",
        action="store_true",
        help="composed pipeline (reference main.py): validate → "
        "similarity backfill → metrics refresh, each stage gated by "
        "its input digest (see pipeline.py)",
    )
    ap.add_argument(
        "--embeddings", default=None, help="run-all: embeddings parquet for the similarity stage"
    )
    ap.add_argument(
        "--metrics-obs", default=None, help="run-all: fresh metric observations parquet"
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"validate-{args.run_id}", master=args.master)
    if args.run_all:
        from . import pipeline

        report = pipeline.run_all(
            spark,
            args.input,
            args.output,
            build_suite(args.suite_json),
            args.run_id,
            embeddings_path=args.embeddings,
            metrics_obs_path=args.metrics_obs,
            resume=args.resume,
            drift=not args.no_drift,
            source_dim_path=args.source_dim,
        )
    else:
        report = run(
            spark,
            args.input,
            args.output,
            build_suite(args.suite_json),
            args.run_id,
            args.resume,
            drift=not args.no_drift,
            source_dim_path=args.source_dim,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
