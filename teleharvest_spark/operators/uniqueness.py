"""Uniqueness check on ``doc_id`` — salted two-phase hash-aggregate dedup.

Reference analogue: composite PK (id, channel) enforced by the store
(models/message.py:34-36) — a duplicate insert errors. Here the engine
*detects* duplicates at scale and materializes every row of a
duplicated key as a violation (north_rule A5, SURVEY.md §2.4).

Why two phases: ``groupBy(doc_id).count()`` alone shuffles every row
once, hashed by doc_id; when key frequency is skewed (one doc_id
duplicated millions of times — adversarial but real in crawl data),
one reducer gets the hot key. AQE splits skewed JOIN partitions but
NOT skewed groupBy hot keys, so phase 1 pre-aggregates on
(doc_id, salt) — partial counts spread across SALT buckets — and
phase 2 sums the ≤SALT partials per key. For the normal case the extra
phase is one cheap aggregate over already-tiny partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT = 16


def duplicate_keys(
    df: DataFrame,
    key: str = "doc_id",
    salt: int = DEFAULT_SALT,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Keys appearing more than once → (key, dup_count).

    Deterministic salt: ``spark_partition_id`` would not be stable
    across parallelism levels, so the salt hashes *other* column
    values — duplicates of one doc_id spread across ≤``salt`` buckets
    (same-bucket collisions are fine: phase 2 sums the partials).

    ``salt_cols`` defaults to the first two scalar non-key columns:
    hashing arrays would force the parquet reader to decode them, and
    hashing every column drags the full row width through the scan —
    the pruned ReadSchema (key + 2 scalars) IS the point of running
    uniqueness as its own pass (see plans/suite.py).
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
    partial = (
        df.select(F.col(key), salt_col.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(key)
        .agg(F.sum("_partial").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def uniqueness_violations(df: DataFrame, key: str = "doc_id", salt: int = DEFAULT_SALT) -> DataFrame:
    """All rows belonging to duplicated keys, as violation rows.

    The dup-key set is usually tiny relative to the table → broadcast
    semi-join back against the fact (no second full shuffle).
    """
    dups = duplicate_keys(df, key=key, salt=salt)
    hit = df.join(F.broadcast(dups), key, "inner")
    return hit.select(
        F.col(key).alias("doc_id"),
        (F.col("source") if "source" in df.columns else F.lit(None).cast("string")).alias("source"),
        F.lit("duplicate_key").alias("check_name"),
        F.concat(F.lit("doc_id seen "), F.col("dup_count").cast("string"), F.lit(" times")).alias("reason"),
        (F.col("tokens") if "tokens" in df.columns else F.lit(None).cast("array<int>")).alias("tokens"),
    )
