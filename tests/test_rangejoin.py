from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from teleharvest_spark.operators import rangejoin


def test_windowed_count_exact_boundaries(spark):
    """Half-open [left−W, left): a right row exactly W before counts,
    one exactly AT the left timestamp does not."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, "u", s(0)), (2, "u", s(7200)), (3, "v", s(0))],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("u", s(-3600)),  # exactly W before left 1 → counts
            ("u", s(-10)),    # counts for left 1
            ("u", s(0)),      # AT left 1's ts → excluded (half-open)
            ("u", s(3601)),   # inside left 2's window
        ],
        "user_id string, ts timestamp_ntz",
    )
    got = {
        r["event_id"]: r["n"]
        for r in rangejoin.windowed_count(
            left, right, key="user_id", window_seconds=3600, out_col="n"
        ).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0}


def test_windowed_count_duplicate_left_rows(spark):
    """Identical left rows must each keep their OWN count (not a merged
    group's sum fanned back out)."""
    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00")] * 2,
        "user string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:30:00")], "user string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rangejoin.windowed_count(left, right, key="user", window_seconds=3600).collect()
    assert len(out) == 2
    assert [r["n_in_window"] for r in out] == [1, 1]


def test_windowed_count_null_left_payload(spark):
    """A NULL in a non-key left column must not zero the count (the old
    full-row join-back used null-unsafe equality)."""
    left = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", None), ("u", "2024-01-01 11:30:00", "p")],
        "user string, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 09:30:00")], "user string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rangejoin.windowed_count(left, right, key="user", window_seconds=3600)
    got = {r["payload"]: r["n_in_window"] for r in out.collect()}
    assert got[None] == 1   # in-window match kept despite NULL payload
    assert got["p"] == 0    # 11:30 looks back to 10:30 — no match
