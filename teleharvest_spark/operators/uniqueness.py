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

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DEFAULT_SALT = 16

KEY_INDEX_DIRNAME = "_key_index"


def duplicate_keys(
    df: DataFrame,
    key: str | list[str] | tuple[str, ...] = "doc_id",
    stored_counts: DataFrame | None = None,
) -> DataFrame:
    """Keys appearing more than once → (key..., dup_count).

    ``key`` may be a single column or a COMPOSITE key (list/tuple) —
    the reference's primary key is composite (id, channel),
    models/message.py:34-36; the engine's default fact key is the
    single doc_id. Composite grouping keys compare null-safely in
    Spark aggregation (two (NULL, 'a') rows are one group), matching
    the single-column behavior.

    One column-pruned scan (just the key columns), one shuffle of ≤
    one partial row per (task, distinct key) — hot keys collapse
    map-side (HashAggregate partial_count), so no salting is needed
    for count.

    ``stored_counts`` — (key..., n_stored) occurrence counts from
    OUTSIDE ``df`` (the key index of already-validated partitions
    under ``--resume``, :func:`cross_partition_counts`) — folds into
    the totals, so a key seen once here and once in a validated
    partition reports dup_count=2 exactly as a full run would. The
    table is pre-restricted to overlapping keys (tiny), hence
    broadcast.
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))
    if stored_counts is not None:
        # null-safe fold: grouping already treats NULL as a key value,
        # so the stored-count join must too — a plain equality join
        # would drop a NULL key's stored count and a resumed run would
        # miss its cross-partition duplicate
        stored = stored_counts
        cond = None
        for k in keys:
            stored = stored.withColumnRenamed(k, f"_sk_{k}")
            c = F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
            cond = c if cond is None else (cond & c)
        counts = (
            counts.join(F.broadcast(stored), cond, "left")
            .withColumn(
                "dup_count",
                F.col("dup_count") + F.coalesce(F.col("n_stored"), F.lit(0)),
            )
            .drop("n_stored", *[f"_sk_{k}" for k in keys])
        )
    return counts.where(F.col("dup_count") > 1)


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

    Choosing WHICH keys are hot and HOW MUCH salt: measure, don't
    guess — ``operators.sketch.skew_profile`` returns the hot-key table
    (guaranteed lower-bound shares via Misra-Gries) plus a per-key
    ``suggested_salt`` sized to the session's parallelism, in one
    narrow pass over the data.
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


def key_index_path(output_path: str) -> str:
    return os.path.join(output_path, KEY_INDEX_DIRNAME)


def write_key_index(
    df: DataFrame,
    output_path: str,
    key: str = "doc_id",
    partition_col: str = "source",
) -> None:
    """Persist per-partition key occurrence counts —
    ``<out>/_key_index/partition=<p>/`` rows of (key, n).

    This is the uniqueness check's cross-snapshot memory (the
    dedup_index idiom, operators/dedup.py:283, applied to exact keys):
    a ``--resume`` run sees only pending partitions, so a doc_id
    duplicated between a pending partition and an already-validated
    one is otherwise invisible. One column-pruned two-level hash
    aggregate over (partition, key); DYNAMIC partition overwrite so a
    re-validated partition atomically replaces its rows and stale
    counts are impossible. Size: one row per distinct key — the same
    scale class as the MinHash sig index, and the token arrays are
    never decoded.

    The partition dir key uses the source_dir convention
    (sources/writer.py: NULL → '__null__', '' → '__empty__') because
    hive encoding maps BOTH to __HIVE_DEFAULT_PARTITION__, which would
    read back as NULL and break the exclusion filter for
    empty-string-source partitions.
    """
    from ..sources.writer import source_dir_col

    counts = (
        df.groupBy(
            source_dir_col(partition_col).alias("partition"),
            F.col(key),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    (
        counts.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("partition")
        .parquet(key_index_path(output_path))
    )


def read_key_index(
    spark: SparkSession, output_path: str, key: str = "doc_id"
) -> DataFrame:
    """(key, n, partition) of the stored key index — empty before the
    first indexed run."""
    schema = T.StructType(
        [
            T.StructField(key, T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("partition", T.StringType(), True),
        ]
    )
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(key_index_path(output_path))
    except AnalysisException:
        # path-not-found only: the first indexed run has no index yet.
        # Anything else (permissions, corrupt store) must PROPAGATE —
        # silently treating an unreadable index as "empty" would make a
        # --resume run miss every cross-partition duplicate and report
        # clean verdicts with no hint the index was skipped.
        from ..session import local_df

        return local_df(spark, [], schema)


def cross_partition_counts(
    pending_df: DataFrame,
    index: DataFrame,
    pending_partitions: list[str],
    key: str = "doc_id",
) -> DataFrame:
    """(key, n_stored) for keys of ``pending_df`` that already occur in
    validated partitions OUTSIDE the pending set.

    Pending partitions' own index rows are stale by definition (they
    are being re-validated) and excluded — hive partition pruning
    makes the exclusion a directory skip, not a filter scan. Join
    shape at scale: the pending batch's distinct keys are the small
    side and broadcast, so the (huge) stored index streams through a
    BroadcastHashJoin map-side — never shuffled; the surviving
    aggregate is bounded by the overlap, not the corpus.

    Scope note: this makes a resume run's verdicts equal a full run's
    restricted to the pending partitions (pinned). Rows in the OLD
    partition are not retro-flagged — they were validated before the
    duplicate existed; re-queue that partition (touch it, or change
    the suite) to surface its side of the pair.

    ``pending_partitions`` is accepted in the MANIFEST domain (NULL
    already '__null__', '' verbatim) and translated to the index's dir
    domain here, so callers never juggle the two conventions.
    """
    from ..sources.writer import dir_key_value

    excl = [dir_key_value(p) for p in pending_partitions]
    keep = index.where(~F.col("partition").isin(excl))
    # null-safe semi join: NULL is a real key group everywhere else in
    # this module (duplicate_keys' grouping + its eqNullSafe stored
    # fold), so a pending NULL key must also find its stored NULL rows
    # — a plain equality semi join would drop them and a resumed run
    # would under-count exactly the null_key duplicates.
    probe = pending_df.select(F.col(key).alias("_pk")).distinct()
    return (
        keep.join(F.broadcast(probe), F.col(key).eqNullSafe(F.col("_pk")), "semi")
        .groupBy(key)
        .agg(F.sum("n").alias("n_stored"))
    )


def uniqueness_violations(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """All rows belonging to duplicated keys, as violation rows.

    The dup-key set is usually tiny relative to the table → broadcast
    semi-join back against the fact (no second full shuffle).

    Null-safe join: duplicate_keys' grouping treats NULL as a real key
    group, so two NULL-key rows yield (NULL, dup_count=2) — the join
    back must match them (EqualNullSafe is an equi-join predicate, so
    the plan stays a BroadcastHashJoin).
    """
    dups = duplicate_keys(df, key=key).withColumnRenamed(key, "_dk")
    hit = df.join(F.broadcast(dups), F.col(key).eqNullSafe(F.col("_dk")), "inner")
    return hit.select(
        F.col(key).alias("doc_id"),
        (F.col("source") if "source" in df.columns else F.lit(None).cast("string")).alias("source"),
        F.lit("duplicate_key").alias("check_name"),
        F.concat(F.lit("doc_id seen "), F.col("dup_count").cast("string"), F.lit(" times")).alias("reason"),
        (F.col("tokens") if "tokens" in df.columns else F.lit(None).cast("array<int>")).alias("tokens"),
    )
