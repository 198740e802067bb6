"""Bucketed managed tables: co-located joins without a shuffle."""

from __future__ import annotations

import contextlib
import io

from teleharvest_spark.sources import bucketed


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    """Same-key same-bucket-count tables join with NO Exchange in the
    plan (the write-time shuffle is amortized over every join); the
    identical join over plain parquet pays two."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.createDataFrame(
            [(i, f"t{i}") for i in range(1000)], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(i, i * 2) for i in range(500)], "doc_id long, score long"
        )
        bucketed.write_bucketed(a, "tb_fact", buckets=4)
        bucketed.write_bucketed(b, "tb_dim", buckets=4)
        j = bucketed.read_table(spark, "tb_fact").join(
            bucketed.read_table(spark, "tb_dim"), "doc_id"
        )
        assert j.count() == 500
        plan = _plan_of(j)
        assert plan.count(") Exchange") == 0, plan
        # contrast: unbucketed parquet pays the shuffle on both sides
        a.write.mode("overwrite").parquet(str(tmp_path / "ua"))
        b.write.mode("overwrite").parquet(str(tmp_path / "ub"))
        ju = spark.read.parquet(str(tmp_path / "ua")).join(
            spark.read.parquet(str(tmp_path / "ub")), "doc_id"
        )
        assert _plan_of(ju).count(") Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS tb_fact")
        spark.sql("DROP TABLE IF EXISTS tb_dim")


def test_bucketed_join_values_match_plain_join(spark):
    a = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], "doc_id long, x long"
    )
    b = spark.createDataFrame(
        [(i, i % 5) for i in range(0, 200, 2)], "doc_id long, y long"
    )
    bucketed.write_bucketed(a, "tb_a2", buckets=3)
    bucketed.write_bucketed(b, "tb_b2", buckets=3)
    try:
        got = sorted(
            map(
                tuple,
                bucketed.read_table(spark, "tb_a2")
                .join(bucketed.read_table(spark, "tb_b2"), "doc_id")
                .collect(),
            )
        )
        want = sorted(map(tuple, a.join(b, "doc_id").collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_a2")
        spark.sql("DROP TABLE IF EXISTS tb_b2")
