"""Uniqueness check on ``doc_id`` — partial-agg hash-aggregate dedup.

Reference analogue: composite PK (id, channel) enforced by the store
(models/message.py:34-36) — a duplicate insert errors. Here the engine
*detects* duplicates at scale and materializes every row of a
duplicated key as a violation (north_rule A5, SURVEY.md §2.4).

Skew strategy — MEASURED, not assumed (scripts/salt_ab.py, 1e8 rows,
local[32]): for an ALGEBRAIC aggregate like count, Spark's map-side
partial aggregation already collapses a hot key to ONE partial row per
task before the shuffle, so a hot reducer never materializes. An
explicit (key, salt) pre-aggregation phase — whose phase-1 output is
~N rows whenever keys are mostly unique, i.e. a SECOND full N-row
shuffle plus the decode cost of the salt-input columns — measured:

    uniform (every key ×2):   plain 7.4 s   salted 10.5 s
    hot (one key = 10% of N): plain 6.3 s   salted 27.3 s

Plain partial-agg groupBy wins both distributions, so it is the
default. ``salted_partial_counts`` remains for the case that actually
needs it: NON-algebraic aggregates (collect_list, exact distinct
structs) whose partials cannot collapse map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 16


def duplicate_keys(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Keys appearing more than once → (key, dup_count).

    One column-pruned scan (just ``key``), one shuffle of ≤ one partial
    row per (task, distinct key) — hot keys collapse map-side
    (HashAggregate partial_count), so no salting is needed for count.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def salted_partial_counts(
    df: DataFrame,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase (key, salt) pre-aggregation — ONLY for non-algebraic
    aggregates where map-side combine can't collapse a hot key (e.g.
    per-key collect_list at 10^12 rows). For plain counts this is
    strictly slower (see module docstring); duplicate_keys is the
    count path.

    Deterministic salt: ``spark_partition_id`` would not be stable
    across parallelism levels, so the salt hashes *other* column
    values — duplicates of one key spread across ≤``salt`` buckets
    (same-bucket collisions are fine: phase 2 merges the partials).
    """
    if salt_cols is None:
        salt_cols = [
            c
            for (c, t) in df.dtypes
            if c != key and not t.startswith(("array", "map", "struct"))
        ][:2]
    salt_col = (
        (F.abs(F.xxhash64(*[F.col(c) for c in salt_cols])) % salt)
        if salt_cols
        else F.lit(0)
    )
    return (
        df.select(F.col(key), salt_col.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )


def uniqueness_violations(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """All rows belonging to duplicated keys, as violation rows.

    The dup-key set is usually tiny relative to the table → broadcast
    semi-join back against the fact (no second full shuffle).
    """
    dups = duplicate_keys(df, key=key)
    hit = df.join(F.broadcast(dups), key, "inner")
    return hit.select(
        F.col(key).alias("doc_id"),
        (F.col("source") if "source" in df.columns else F.lit(None).cast("string")).alias("source"),
        F.lit("duplicate_key").alias("check_name"),
        F.concat(F.lit("doc_id seen "), F.col("dup_count").cast("string"), F.lit(" times")).alias("reason"),
        (F.col("tokens") if "tokens" in df.columns else F.lit(None).cast("array<int>")).alias("tokens"),
    )
