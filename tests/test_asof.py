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


def test_asof_atomic_struct_fill(spark):
    """The matched right row is taken ATOMICALLY: when the latest right
    row has a NULL payload field, that NULL must be carried — not
    back-filled from an older right row (a row that never existed)."""
    left = _ts(spark, [("u", 10, "x")], "user string, ts long, tag string")
    right = _ts(
        spark,
        [("u", 5, 1.0), ("u", 8, None)],
        "user string, ts long, value double",
    )
    row = asof.asof_join(left, right, key="user").collect()[0]
    assert row["ts_asof"] == 8
    assert row["value_asof"] is None  # NOT 1.0 stitched from the ts=5 row


def test_asof_deterministic_on_duplicate_right_ts(spark):
    """Duplicate right rows at the same (key, ts): the greatest payload
    struct wins — a pure function of the data, independent of
    partitioning."""
    left = _ts(spark, [("u", 10, "x")], "user string, ts long, tag string")
    right = _ts(
        spark,
        [("u", 8, 1.0), ("u", 8, 2.0), ("u", 8, None)],
        "user string, ts long, value double",
    )
    for _ in range(3):  # repeat — the pick must be stable
        row = asof.asof_join(left, right.repartition(7), key="user").collect()[0]
        assert (row["ts_asof"], row["value_asof"]) == (8, 2.0)


def test_asof_null_key_left_rows_unmatched(spark):
    """NULL-key left rows come through UNMATCHED (join semantics: NULL
    never equals NULL) — they must not absorb payload from NULL-key
    right rows via the window's NULL-grouping (ADVICE r2)."""
    left = _ts(
        spark,
        [(None, 10, "a"), ("u", 10, "b")],
        "user string, ts long, tag string",
    )
    right = _ts(
        spark,
        [(None, 5, 9.0), ("u", 5, 1.0)],
        "user string, ts long, value double",
    )
    rows = {r["tag"]: r for r in asof.asof_join(left, right, key="user").collect()}
    assert rows["a"]["value_asof"] is None and rows["a"]["ts_asof"] is None
    assert rows["b"]["value_asof"] == 1.0
