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

Two correctness properties the naive per-column fill gets wrong:

* **Atomicity**: the matched right row is carried as ONE struct and
  unpacked after the fill. Filling each column independently with
  ``last(ignorenulls)`` stitches fields from *different* right rows
  whenever the matched row has a NULL field (that field would be
  pulled from an older row while ``ts_asof`` comes from the newer one
  — a row that never existed). The struct itself is non-null for every
  right row even when its fields are NULL, so ``last(ignorenulls)``
  over the struct picks the matched row wholesale.
* **Determinism under duplicate (key, right_ts)**: ties are broken by
  the greatest payload struct (field-order comparison), so which
  duplicate wins is a pure function of the data, not of partitioning.
  Requires the right payload columns to be orderable types (Spark
  structs compare field-by-field; arrays are orderable, maps are not).

At 10^12 rows the single key-shuffle is the floor for a general as-of;
when both sides are bucketed/sorted by (key, ts) in Iceberg, the
shuffle drops out (storage-partitioned join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_TAG = "_asof_side"  # 0 = right (visible to later lefts), 1 = left
_PAYLOAD = "_asof_r"  # struct of all carried right columns


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

    # NULL keys never match in join semantics (oracle: `l.k = r.k` is
    # NULL-safe-false), but Window.partitionBy groups all NULL keys into
    # one partition — a NULL-key left row would pick up payload from
    # NULL-key right rows. Exclude NULL keys from the fill and emit
    # those left rows unmatched (ADVICE r2).
    null_left = left.where(F.col(key).isNull())
    left = left.where(F.col(key).isNotNull())
    right = right.where(F.col(key).isNotNull())

    left_payload = [c for c in left.columns if c not in (key, left_ts)]
    r_out = [right_ts] + right_cols
    r_dtypes = dict(right.dtypes)
    struct_type = "struct<" + ",".join(f"`{c}`:{r_dtypes[c]}" for c in r_out) + ">"

    l_side = left.select(
        F.col(key),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_TAG),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_type).alias(_PAYLOAD),
    )
    r_side = right.select(
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in r_out]).alias(_PAYLOAD),
    )

    # Right rows (tag 0) sort before left rows (tag 1) at equal ts so a
    # tie counts as a match; among duplicate right rows the struct is
    # the final key, so last() deterministically takes the max payload.
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_asof_ts"), F.col(_TAG), F.col(_PAYLOAD))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l_side.unionByName(r_side).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    matched = (
        filled.where(F.col(_TAG) == 1)
        .select(
            key,
            F.col("_asof_ts").alias(left_ts),
            *left_payload,
            *[F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}") for c in r_out],
        )
    )
    unmatched = null_left.select(
        key,
        F.col(left_ts),
        *left_payload,
        *[F.lit(None).cast(r_dtypes[c]).alias(f"{c}{suffix}") for c in r_out],
    )
    return matched.unionByName(unmatched)
