"""Range (interval) join — bucketed, not theta.

``windowed_count``: for each left event, how many right events of the
same key fall in the half-open window ``[left_ts - window, left_ts)``.

A naive inequality join is a per-key cross product (O(|L|·|R|) within
key — fatal for hot keys at 10^12 rows). Instead both sides bucket
their timestamps by the window length; a right row can only affect
left rows in its own bucket or the next one, so the left side probes
exactly two bucket keys — an equi-join on (key, bucket) with the exact
range predicate applied during the hash-join probe. Work is linear in
the true match volume, and AQE's skew-join splitting applies because
it IS an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_US = 1_000_000


def windowed_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    out_col: str = "n_in_window",
) -> DataFrame:
    """All left rows + the count of right rows in [left_ts − W, left_ts).

    Timestamps may be TIMESTAMP_NTZ (session TZ pinned UTC makes the
    epoch cast a pure reinterpretation).
    """
    w_us = window_seconds * _US
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp_ltz"))

    l = left.select("*", l_us.alias("_l_us"), F.floor(l_us / w_us).alias("_bucket"))
    r = right.select(
        F.col(key).alias("_rkey"),
        r_us.alias("_r_us"),
        F.floor(r_us / w_us).alias("_rbucket"),
    )
    # probe the right's own bucket and the next (left looks back one window)
    probe = l.select(
        "*", F.explode(F.array(F.col("_bucket") - 1, F.col("_bucket"))).alias("_pbucket")
    )
    hits = (
        probe.join(
            r,
            (F.col(key) == F.col("_rkey"))
            & (F.col("_pbucket") == F.col("_rbucket"))
            & (F.col("_r_us") >= F.col("_l_us") - F.lit(w_us))
            & (F.col("_r_us") < F.col("_l_us")),
            "inner",
        )
        .groupBy(*[F.col(c) for c in left.columns])
        .agg(F.count(F.lit(1)).alias(out_col))
    )
    # left-total: rows with zero matches come back with count 0
    return (
        left.join(hits, on=left.columns, how="left")
        .fillna({out_col: 0})
    )
