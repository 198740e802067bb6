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

__all__ = ["write_partitioned"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("source",),
    files_per_partition: int = 4,
    sort_within: str | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """One shuffle keyed by (partition cols, file bucket), optional
    within-task sort, then a hive-partitioned parquet write.

    ``files_per_partition`` is the file-count target per partition
    value (exact when every bucket is non-empty); tune it so
    file size ≈ partition bytes / files_per_partition lands near the
    128-512 MB sweet spot. ``max_records_per_file`` is the hard
    backstop against a skewed-hot partition producing an oversized
    file (Spark splits the file, not the task).
    """
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    bucket_key = sort_within if sort_within else partition_by[-1]
    bucket = F.pmod(F.xxhash64(F.col(bucket_key)), F.lit(files_per_partition))
    parts = [F.col(c) for c in partition_by]
    shuffled = df.repartition(*parts, bucket)
    if sort_within:
        shuffled = shuffled.sortWithinPartitions(*partition_by, sort_within)
    writer = shuffled.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
