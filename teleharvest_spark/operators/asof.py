"""As-of (point-in-time) join — an operator Spark's API lacks.

For each left row, attach the LATEST right row with ``right_ts <=
left_ts`` within the same key (left-outer semantics: no prior right row
→ NULLs). The reference has no as-of join, but its watermark pattern
(latest stored id per channel, models/message.py:75-89) is the
degenerate per-key form.

Distributed strategy: UNION the two sides tagged, ONE shuffle on the
key, and forward-fill the right payload with ``last(ignorenulls)`` over
the event-time order — the standard union-window as-of, linear in
|left| + |right|, no per-row range scan and no join explosion. Ties
(right_ts == left_ts) count as matches: right rows sort before left
rows at equal timestamps.

At 10^12 rows the single key-shuffle is the floor for a general as-of;
when both sides are bucketed/sorted by (key, ts) in Iceberg, the
shuffle drops out (storage-partitioned join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_TAG = "_asof_side"  # 0 = right (visible to later lefts), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left-outer as-of join on ``key`` with ``right_ts <= left_ts``.

    Returns every left row plus ``<right_ts><suffix>`` and
    ``<col><suffix>`` for each of ``right_cols`` (default: every right
    column except the key and timestamp).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    left_payload = [c for c in left.columns if c not in (key, left_ts)]
    r_out = [right_ts] + right_cols

    l_side = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in r_out],
    )
    r_side = right.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in r_out],
    )

    w = (
        W.partitionBy(key)
        .orderBy(F.col("_asof_ts"), F.col(_TAG))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l_side.unionByName(r_side)
    for c in r_out:
        filled = filled.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        filled.where(F.col(_TAG) == 1)
        .select(
            key,
            F.col("_asof_ts").alias(left_ts),
            *left_payload,
            *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in r_out],
        )
    )
