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


def duplicate_keys(df: DataFrame, key: str = "doc_id", salt: int = DEFAULT_SALT) -> DataFrame:
    """Keys appearing more than once → (key, dup_count).

    Deterministic salt = hash of a secondary column when present, else
    a hash of the full row spread via ``spark_partition_id`` is unsafe
    (not deterministic across parallelism) — so we hash the key with
    monotonic row position REMOVED: use xxhash64 of the *other* columns.
    For the sequences table (doc_id, tokens, n_tok, source) the salt is
    xxhash64(source, n_tok) % salt — duplicates of one doc_id landing in
    the same bucket is fine (counts still sum correctly in phase 2).
    """
    # Salt from scalar columns only: hashing the tokens array would
    # force the parquet reader to decode it, defeating column pruning
    # (the array decode IS the scan cost — see plans/suite.py).
    other = [
        c for (c, t) in df.dtypes if c != key and not t.startswith(("array", "map", "struct"))
    ]
    salt_col = (
        (F.abs(F.xxhash64(*[F.col(c) for c in other])) % salt)
        if other
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
