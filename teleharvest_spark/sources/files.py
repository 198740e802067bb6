"""Schema-enforced text-format ingest (JSONL / CSV) with corrupt-record
violations.

Reference analogue S2: row materialization maps raw records to typed
rows, with defaults for missing fields (telegram_service.py:49-60) and
errors swallowed per batch (telegram_service.py:28-30). The engine
makes ingest failure EXPLICIT instead: files are read in PERMISSIVE
mode with a corrupt-record column, and malformed rows are materialized
as violation rows (check_name = ``corrupt_record``) exactly like the
row-level cascade's — one violations contract across the whole
pipeline.

Scale notes: PERMISSIVE parsing is per-row local work in the scan
stage (no shuffle); the split into clean/violations is two filters on
one cached-free scan — Spark evaluates each filter on its own pass of
the (columnar, pushdown-pruned) source, which at 10^12 rows beats
materializing an intermediate. Schema is REQUIRED (inference would
scan twice and produce run-dependent types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema + corrupt capture."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    """CSV scan with explicit schema + corrupt capture."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    cache_handles: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, violation_rows) from a PERMISSIVE scan.

    Violation rows carry the schema.VIOLATIONS contract: the raw
    record text becomes the reason so the bad byte run is recoverable
    downstream (the reference only logs and drops,
    telegram_service.py:28-30).

    **The corrupt column is NOT stable under column pruning** (a
    documented Spark behavior): a consumer that doesn't read every
    data column makes the parser re-run with a pruned schema, and a
    row that was corrupt only because of a type mismatch in a pruned
    column silently re-parses clean. So the parse must cross a
    materialization boundary before the clean/violations split:
    default = eager ``localCheckpoint`` (ingest batches are bounded);
    pass ``cache_handles`` to use caller-managed persist instead
    (unpersist when both outputs are consumed).
    """
    if cache_handles is not None:
        df = df.persist()
        cache_handles.append(df)
    else:
        df = df.localCheckpoint(eager=True)
    corrupt = F.col(CORRUPT_COL)
    clean = df.where(corrupt.isNull()).drop(CORRUPT_COL)
    violations = df.where(corrupt.isNotNull()).select(
        (F.col(id_col) if id_col in df.columns else F.lit(None).cast("string")).cast("string").alias("doc_id"),
        (F.col(source_col) if source_col in df.columns else F.lit(None).cast("string")).alias("source"),
        F.lit("corrupt_record").alias("check_name"),
        F.concat(F.lit("unparseable: "), F.substring(corrupt, 1, 200)).alias("reason"),
        F.lit(None).cast("array<int>").alias("tokens"),
    )
    return clean, violations
