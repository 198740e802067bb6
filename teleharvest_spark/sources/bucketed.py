"""Bucketed managed tables — co-located joins without a shuffle.

The engine's heaviest recurring joins are keyed by ``doc_id`` (dup-key
verification, metrics refresh upsert, split/components attach). On a
10^12-row fact table every such join costs a full shuffle of both
sides UNLESS the storage layout already clusters the key: writing the
table bucketed by ``doc_id`` makes Spark's scan report a
HashPartitioning on the bucket key, so an equi-join of two tables
bucketed the same way (same key, same bucket count) plans with ZERO
Exchange operators — the shuffle is paid once at write time and
amortized over every subsequent join (the plan-shape test pins this).

This is the parquet-warehouse form; Iceberg's ``bucket(N, doc_id)``
hidden partitioning (sources/iceberg.py) is the managed-catalog form
of the same layout contract.

Reference analogue: the store-side PK index on (id, channel)
(``/root/reference/models/message.py:34-36``) — the reference pays the
lookup-clustering cost at INSERT time the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str = "doc_id",
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a managed table bucketed (and optionally sorted)
    by ``key``. Bucket count must match on BOTH sides of a join to
    avoid the shuffle — fix it once per warehouse (a power of two
    sized so bucket ≈ 128-512 MB at the target scale) and treat it as
    part of the table contract.
    """
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a managed (bucketed) table back; the bucket spec travels
    with the catalog entry, so joins on the bucket key pick up the
    co-location automatically."""
    return spark.table(name)
