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

Result assembly: each left row is tagged with a surrogate row id
BEFORE the probe and the per-row count is aggregated on that id alone
(LEFT join + count of matched probes, one shuffle keyed by the unique
id). The previous join-back on all of ``left.columns`` was wrong in
two ways: duplicate left rows merged into one group and each copy got
the summed count, and a NULL in any left column broke the equality
join so the row silently got 0. The surrogate id makes both cases
exact and removes the second full shuffle of the left side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_US = 1_000_000
_RID = "_rj_rowid"


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
    epoch cast a pure reinterpretation). Duplicate and NULL-bearing
    left rows each keep their own exact count.
    """
    w_us = window_seconds * _US
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp_ltz"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp_ltz"))

    l = left.select(
        "*",
        F.monotonically_increasing_id().alias(_RID),
        l_us.alias("_l_us"),
        F.floor(l_us / w_us).alias("_bucket"),
    )
    r = right.select(
        F.col(key).alias("_rkey"),
        r_us.alias("_r_us"),
        F.floor(r_us / w_us).alias("_rbucket"),
    )
    # probe the right's own bucket and the next (left looks back one window)
    probe = l.select(
        "*", F.explode(F.array(F.col("_bucket") - 1, F.col("_bucket"))).alias("_pbucket")
    )
    # LEFT join keeps unmatched probe rows, so zero-match left rows
    # survive to the aggregate with count 0 — no second pass over left.
    # Group on the surrogate id ALONE (left columns ride along via
    # first(): identical within a group, and non-groupable types like
    # maps would break a multi-column groupBy).
    return (
        probe.join(
            r,
            (F.col(key) == F.col("_rkey"))
            & (F.col("_pbucket") == F.col("_rbucket"))
            & (F.col("_r_us") >= F.col("_l_us") - F.lit(w_us))
            & (F.col("_r_us") < F.col("_l_us")),
            "left",
        )
        .groupBy(_RID)
        .agg(
            *[F.first(c, ignorenulls=False).alias(c) for c in left.columns],
            F.count(F.col("_r_us")).alias(out_col),
        )
        .drop(_RID)
    )
