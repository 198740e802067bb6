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


def test_inline_layout_no_exchange_same_rows(spark, tmp_path):
    """shuffle=False: no repartition exchange, every scan task streams
    into the dirs it touches — file count ≤ tasks × dirs, rows and
    within-file sort order identical to the clustered layout."""
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", i * 1.5) for i in range(3000)],
        "doc_id long, source string, v double",
    ).repartition(4)
    n_tasks = df.rdd.getNumPartitions()
    out = str(tmp_path / "inline")
    write_partitioned(
        df, out, partition_by=("source",), sort_within="doc_id",
        shuffle=False,
    )
    back = spark.read.parquet(out)
    assert back.count() == 3000
    assert back.groupBy().agg(F.sum("doc_id")).collect()[0][0] == sum(range(3000))
    for s in ("s0", "s1", "s2"):
        n = len(_files(out, f"source={s}/*"))
        assert 1 <= n <= n_tasks, (s, n)
    # row-set equality vs the clustered layout
    out2 = str(tmp_path / "clustered")
    write_partitioned(
        df, out2, partition_by=("source",), sort_within="doc_id",
        files_per_partition=3,
    )
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in spark.read.parquet(out2).collect()}
    assert a == b
    # within-file ordering: each parquet file individually sorted
    for f in _files(out, "source=s0/*"):
        ids = [r["doc_id"] for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)


def test_certify_inline_layout_parity(spark, tmp_path):
    """cli emit_valid picks the inline layout for small task × dir
    products and the certified row set matches the clustered path
    exactly (the layout gate must never change WHAT is certified)."""
    from teleharvest_spark import cli, datagen
    from teleharvest_spark.config import CheckSuite

    suite = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 6000, suite).write.parquet(inp)
    cert_a, cert_b = str(tmp_path / "inline"), str(tmp_path / "clustered")
    rep = cli.run(
        spark, inp, str(tmp_path / "wh_a"), suite, run_id="r1",
        emit_valid=cert_a,
    )
    assert rep["certified_layout"] == "inline"  # tiny input → inline
    import unittest.mock as mock

    with mock.patch.object(cli, "CERTIFY_INLINE_FILE_CAP", 0):
        rep2 = cli.run(
            spark, inp, str(tmp_path / "wh_b"), suite, run_id="r1",
            emit_valid=cert_b,
        )
    assert rep2["certified_layout"] == "clustered"
    a = {r["doc_id"] for r in spark.read.parquet(cert_a).collect()}
    b = {r["doc_id"] for r in spark.read.parquet(cert_b).collect()}
    assert a == b and rep["certified_rows"] == rep2["certified_rows"] == len(a)


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


def test_compact_partitioned_restores_file_bound(spark, tmp_path):
    """Three append runs triple the per-partition file count;
    compaction restores the bound and preserves every row."""
    from teleharvest_spark.sources.writer import compact_partitioned, write_partitioned

    path = str(tmp_path / "acc")
    rows = [(f"d{i}", f"src{i % 3}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, source string, v int")
    for _ in range(3):
        write_partitioned(
            df, path, partition_by=("source",), files_per_partition=2,
            sort_within="doc_id", mode="append",
        )
    import os

    def files_in(p):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    assert len(files_in(path)) > 2 * 3  # accreted small files
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    rep = compact_partitioned(
        spark, path, partition_by=("source",), files_per_partition=2,
        sort_within="doc_id",
    )
    assert rep["rows"] == 900
    assert rep["files_after"] <= 2 * 3  # bound restored per partition dir
    assert rep["files_after"] < rep["files_before"]
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before  # lossless


def test_write_shuffled_shards_deterministic_global_order(spark, tmp_path):
    """The shuffled-training-order contract: file-order replay is one
    fixed permutation, a pure function of (keys, seed) — identical
    under different input partitionings; a new seed re-permutes."""
    import os

    from teleharvest_spark.sources.writer import write_shuffled_shards

    rows = [(i, f"src{i % 5}") for i in range(2_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def replay(p):
        files = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )
        out = []
        for fp in files:
            out.extend(
                r["doc_id"]
                for r in spark.read.parquet(fp).orderBy("shuffle_ord").collect()
            )
        return out

    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    write_shuffled_shards(df.repartition(13), p1, seed=7, n_shards=8)
    write_shuffled_shards(df.repartition(1), p2, seed=7, n_shards=8)
    write_shuffled_shards(df, p3, seed=8, n_shards=8)

    seq1, seq2, seq3 = replay(p1), replay(p2), replay(p3)
    assert seq1 == seq2                       # partitioning-independent
    assert sorted(seq1) == list(range(2_000))  # a permutation, lossless
    assert seq1 != list(range(2_000))          # actually shuffled
    assert seq3 != seq1                        # seed re-permutes

    # hash order de-clusters: adjacent rows mix sources (no long runs)
    srcs = [
        r["source"]
        for r in spark.read.parquet(p1).orderBy("shuffle_ord").collect()
    ]
    longest = run = 1
    for a, b in zip(srcs, srcs[1:]):
        run = run + 1 if a == b else 1
        longest = max(longest, run)
    assert longest < 10

    # range carve balances shards (uniform 64-bit hash)
    sizes = [
        spark.read.parquet(fp).count()
        for fp in sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(p1)
            for f in fs
            if f.endswith(".parquet")
        )
    ]
    assert len(sizes) == 8 and min(sizes) > 0
    assert max(sizes) / min(sizes) < 3
