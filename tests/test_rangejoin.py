from __future__ import annotations

import datetime as dt

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
