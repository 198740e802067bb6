from __future__ import annotations

from teleharvest_spark.operators import asof


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_picks_latest_at_or_before(spark):
    left = _ts(
        spark,
        [("u1", 10, "a"), ("u1", 25, "b"), ("u2", 5, "c")],
        "user string, ts long, tag string",
    )
    right = _ts(
        spark,
        [("u1", 10, 100.0), ("u1", 20, 200.0), ("u1", 30, 300.0), ("u2", 9, 900.0)],
        "user string, ts long, value double",
    )
    got = {
        (r["user"], r["ts"]): (r["ts_asof"], r["value_asof"])
        for r in asof.asof_join(left, right, key="user", left_ts="ts", right_ts="ts").collect()
    }
    assert got[("u1", 10)] == (10, 100.0)   # tie: right at equal ts matches
    assert got[("u1", 25)] == (20, 200.0)   # latest <= 25, not the later 30
    assert got[("u2", 5)] == (None, None)   # no prior right row → left-outer NULLs


def test_asof_is_left_total(spark):
    left = _ts(spark, [("u", i, "x") for i in range(50)], "user string, ts long, tag string")
    right = _ts(spark, [("u", 25, 1.0)], "user string, ts long, value double")
    out = asof.asof_join(left, right, key="user").collect()
    assert len(out) == 50
    assert sum(1 for r in out if r["value_asof"] is not None) == 25  # ts 25..49
