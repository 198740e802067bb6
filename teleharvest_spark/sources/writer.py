"""Partitioned, size-controlled parquet output — the sink-side layout
discipline a 100 TB table needs.

Reference analogue S4/S5: the reference's sink is a per-row
INSERT/COMMIT (``/root/reference/models/message.py:161-189``); the
engine replaces it with one atomic columnar write whose LAYOUT is part
of the contract:

* **hive-style partition dirs** (``partition_by``) → downstream
  readers prune whole directories (Spark shows them as
  ``PartitionFilters``; Iceberg hidden partitioning is the managed
  form, ``sources/iceberg.py``);
* **bounded file counts** (``files_per_partition``) → neither the
  10^5-small-files problem (kills listing + scheduling) nor
  one-giant-file-per-partition (kills read parallelism). Files are
  spread by a hash of the sort key, so file sizes track data volume,
  not task layout;
* **within-file ordering** (``sort_within``) → parquet row-group
  min/max stats become selective for range predicates on the sort key
  (the poor man's Z-order; one column is the common case).

The write itself stays a single narrow stage after one repartition
shuffle — no collect, no driver-side looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "write_partitioned",
    "compact_partitioned",
    "source_dir_col",
    "write_shuffled_shards",
]


def source_dir_col(col: str = "source") -> F.Column:
    """The derived hive-partition key for the violations layout —
    shared by the batch sink (cli.py) and the streaming sink
    (streaming/violations.py). Derived because hive encoding maps both
    NULL and '' to __HIVE_DEFAULT_PARTITION__, which would destroy the
    empty-vs-null source distinction the cascade separates; the raw
    ``source`` column stays in the data files untouched."""
    return (
        F.when(F.col(col).isNull(), F.lit("__null__"))
        .when(F.col(col) == "", F.lit("__empty__"))
        .otherwise(F.col(col))
    )


def dir_key_value(v: str | None) -> str:
    """Python-side twin of :func:`source_dir_col` for single values —
    use it to translate manifest-domain partition names (where NULL is
    already '__null__' but '' is verbatim) into the hive-safe dir
    domain before filtering a dir-partitioned table."""
    if v is None:
        return "__null__"
    if v == "":
        return "__empty__"
    return v


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("source",),
    files_per_partition: int = 4,
    sort_within: str | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    dynamic: bool = False,
    shuffle: bool = True,
) -> None:
    """One shuffle keyed by (partition cols, file bucket), optional
    within-task sort, then a hive-partitioned parquet write.

    ``files_per_partition`` is the file-count target per partition
    value (exact when every bucket is non-empty); tune it so
    file size ≈ partition bytes / files_per_partition lands near the
    128-512 MB sweet spot. ``max_records_per_file`` is the hard
    backstop against a skewed-hot partition producing an oversized
    file (Spark splits the file, not the task).

    ``shuffle=False`` is the INLINE layout: skip the repartition and
    let every scan task write directly into the dirs it touches
    (within-task sort preserved). File count becomes scan_tasks ×
    touched_dirs instead of dirs × files_per_partition — the right
    trade when that product is small, because the exchange is a full
    extra serialize/spill/deserialize pass over the table being
    written (measured: the certified-table write drops ~2.5× with the
    exchange removed at 1M rows; cli.py picks the mode from the
    measured task × dir product). Iceberg's write.distribution-mode
    none/hash is the managed form of the same toggle.
    """
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    if not shuffle:
        out = df
        if sort_within:
            out = out.sortWithinPartitions(*partition_by, sort_within)
        writer = out.write.mode(mode).partitionBy(*partition_by)
        if dynamic:
            writer = writer.option("partitionOverwriteMode", "dynamic")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(path)
        return
    # the bucket hash must vary WITHIN a partition value — hashing a
    # partition column would collapse every partition dir to one file.
    # sort_within is the natural spread key when given; otherwise hash
    # the remaining (data) columns.
    spread_cols = (
        [sort_within]
        if sort_within
        else [c for c in df.columns if c not in partition_by]
    )
    bucket = (
        F.pmod(
            F.xxhash64(*[F.col(c) for c in spread_cols]),
            F.lit(files_per_partition),
        )
        if spread_cols
        else F.lit(0)
    )
    parts = [F.col(c) for c in partition_by]
    # explicit numPartitions: a bare repartition(cols) exchange gets
    # COALESCED by AQE on small inputs (verified: 3k rows → 1 task →
    # 1 file per dir regardless of bucket), silently voiding the
    # file-count contract; AQE leaves user-specified counts alone.
    # Bucket-combo collisions within a task only merge files (fewer,
    # larger) — never break the per-dir bound.
    conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "")
    try:
        n_out = int(conf)
    except ValueError:  # e.g. "auto" on AQE-managed platforms
        n_out = df.sparkSession.sparkContext.defaultParallelism
    shuffled = df.repartition(n_out, *parts, bucket)
    if sort_within:
        shuffled = shuffled.sortWithinPartitions(*partition_by, sort_within)
    writer = shuffled.write.mode(mode).partitionBy(*partition_by)
    if dynamic:
        # overwrite only the partition dirs present in df (the
        # key-index/states convention) — a resume-scoped write replaces
        # re-validated partitions and leaves the rest in place
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def compact_partitioned(
    spark,
    path: str,
    partition_by: tuple[str, ...] = ("source",),
    files_per_partition: int = 4,
    sort_within: str | None = None,
) -> dict:
    """Rewrite an append-accumulated partitioned table back to the
    bounded-file-count layout.

    Every ``mode="append"`` validation run adds up to
    ``files_per_partition`` files per partition dir (cli.py violations
    sink), so a long-lived warehouse accretes small files until
    listing and task scheduling dominate reads. Compaction re-runs the
    same size-controlled write into a staging directory and swaps it
    in via two directory renames — the local stand-in for Iceberg's
    ``rewrite_data_files`` (which makes the swap a single atomic
    snapshot commit; the brief rename window is the cost of raw
    parquet). Returns {files_before, files_after, rows}.
    """
    import os
    import shutil

    def _count_files(p: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(p):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    before = _count_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    staging = path.rstrip("/") + "__compact"
    shutil.rmtree(staging, ignore_errors=True)
    write_partitioned(
        df,
        staging,
        partition_by=partition_by,
        files_per_partition=files_per_partition,
        sort_within=sort_within,
        mode="overwrite",
    )
    old = path.rstrip("/") + "__precompact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return {"files_before": before, "files_after": _count_files(path), "rows": rows}


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    seed: int = 0,
    n_shards: int = 32,
    order_col: str = "shuffle_ord",
    mode: str = "overwrite",
) -> None:
    """Globally pseudo-random, DETERMINISTIC training-order write: rows
    are ordered by ``xxhash64(key, seed)`` and carved into ``n_shards``
    contiguous range shards (one file per shard). Reading the shards in
    file order replays one fixed permutation of the corpus — the
    shuffled-dataset contract every training job needs (and the
    reference's ORDER BY ingest, processor.py:41-47, generalized to a
    content-defined order).

    Determinism properties (pinned in tests/test_writer.py):
    * the order is a pure function of (key values, seed) — independent
      of input partitioning, task scheduling, and cluster size;
    * a different ``seed`` yields a different permutation (epoch
      reshuffle = rewrite with seed+1, or cheaper: readers re-sort
      shard-locally by a second hash);
    * hash order also de-clusters the input (adjacent source/time rows
      scatter across shards), so a sequential reader sees an
      interleaved source mix — the actual point of shuffling.

    Scale: one range exchange (repartitionByRange samples the hash to
    plan balanced boundaries — no global sort bottleneck, no driver
    materialization) + an in-task sort; the 64-bit hash is effectively
    collision-free ordering, and uniform, so shard sizes track row
    counts. ``order_col`` is persisted so readers can merge-sort shards
    or verify the order without recomputing the hash.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    ordered = df.withColumn(
        order_col, F.xxhash64(F.col(key), F.lit(seed))
    )
    (
        ordered.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .parquet(path)
    )
