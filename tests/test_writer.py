"""Partitioned size-controlled parquet sink."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.sources.writer import write_partitioned


def _files(base, pattern):
    return [p for p in glob.glob(os.path.join(base, pattern)) if p.endswith(".parquet")]


def test_layout_roundtrip_and_file_counts(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i * 1.5) for i in range(3000)],
        "doc_id long, source string, v double",
    )
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=("source",), files_per_partition=3)
    # hive dirs exist, data round-trips exactly
    back = spark.read.parquet(out)
    assert back.count() == 3000
    assert {r["source"] for r in back.select("source").distinct().collect()} == {
        "s0", "s1", "s2",
    }
    assert back.groupBy().agg(F.sum("doc_id")).collect()[0][0] == sum(range(3000))
    for s in ("s0", "s1", "s2"):
        n = len(_files(out, f"source={s}/*"))
        # the spread must actually happen: >1 file per 1000-row
        # partition (a constant bucket would collapse to exactly 1)
        assert 2 <= n <= 3, (s, n)


def test_partition_pruning_in_plan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    out = str(tmp_path / "t2")
    write_partitioned(df, out, files_per_partition=2)
    plan = (
        spark.read.parquet(out)
        .where(F.col("source") == "s1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "s1" in plan


def test_max_records_per_file_backstop(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "hot") for i in range(1000)], "doc_id long, source string"
    )
    out = str(tmp_path / "t3")
    write_partitioned(
        df, out, files_per_partition=1, max_records_per_file=250
    )
    assert len(_files(out, "source=hot/*")) >= 4


def test_sort_within_orders_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "s", (i * 7919) % 1000) for i in range(1000)],
        "doc_id long, source string, k long",
    )
    out = str(tmp_path / "t4")
    write_partitioned(df, out, files_per_partition=2, sort_within="k")
    for f in _files(out, "source=s/*"):
        ks = [r["k"] for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks)


def test_rejects_bad_file_count(spark, tmp_path):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError):
        write_partitioned(df, str(tmp_path / "x"), files_per_partition=0)
