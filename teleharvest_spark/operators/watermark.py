"""Watermark / top-k / incremental-scan operators (SURVEY.md §2.1, §2.5).

Reference analogues: per-channel high-water mark ``get_last_message_id``
(models/message.py:75-89, ORDER BY id DESC LIMIT 1), bounded lookback
``get_first_message_id`` (models/message.py:91-110, first `limit` ids
ascending → min), incremental fetch with (min_id, max_id] bounds
(services/telegram_service.py:19-39), and the is-last-message flag
(processor.py:76-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def high_water_marks(df: DataFrame, key: str = "source", seq: str = "doc_seq") -> DataFrame:
    """Per-key max sequence id (A1). One partial-agg shuffle of |keys| rows."""
    return df.groupBy(key).agg(F.max(seq).alias("last_seq"))


def lookback_floor(df: DataFrame, key: str = "source", seq: str = "doc_seq", limit: int = 1000) -> DataFrame:
    """Per-key lookback floor (A2/O2) — matches message.py:91-110.

    The reference computes min over the ascending-LIMIT page of ids;
    since the first ``limit`` ascending ids always contain the global
    minimum, that is identically the per-key MIN for any limit ≥ 1 —
    so the faithful implementation is one partial-agg groupBy, not a
    window + row_number pass (which an earlier revision ran: a full
    per-key sort for a value the map-side partials already produce).
    ``limit`` is kept in the signature for call-site parity with the
    reference's API.
    """
    del limit  # semantically inert — see docstring
    return df.groupBy(key).agg(F.min(seq).alias("first_seq"))


def incremental_scan(
    df: DataFrame,
    watermarks: DataFrame,
    key: str = "source",
    seq: str = "doc_seq",
) -> DataFrame:
    """Rows strictly above each key's watermark (S1/J4).

    Watermarks are config-sized → broadcast; keys absent from the
    watermark table scan from the beginning (left join, coalesce -inf).
    At scale the seq predicate prunes parquet row groups via min/max
    stats — the Spark form of the reference's `min_id` API bound.

    Null-safe key join: high_water_marks' groupBy emits a NULL-key
    watermark as a real group, so the scan must match it — a plain
    equality join would coalesce the NULL group to -inf and re-emit
    all of its already-seen rows on every incremental run.
    """
    wm = watermarks.select(F.col(key).alias("_wmk"), F.col("last_seq"))
    return (
        df.join(F.broadcast(wm), F.col(key).eqNullSafe(F.col("_wmk")), "left")
        .where(F.col(seq) > F.coalesce(F.col("last_seq"), F.lit(-(1 << 62))))
        .drop("_wmk", "last_seq")
    )


def with_latest_flag(df: DataFrame, key: str = "source", seq: str = "doc_seq") -> DataFrame:
    """is_latest = the row carrying its key's high-water mark (O3).

    Feeds the F6 exemption: the newest row per channel is exempt from
    the engagement-rate check (processor.py:76-78, 116-119).

    Implemented as ``seq == max(seq) per key`` via one partial-agg
    aggregate + a broadcast join back (|keys| rows), NOT a window:
    ``row_number() == 1 over desc(seq)`` shuffles AND sorts the whole
    table into |keys| window partitions — with a handful of keys (the
    channel dimension) the sort serializes on a few tasks, the exact
    skew shape AQE cannot split for windows. Equivalent wherever
    ``seq`` is unique per key (the sequence-id contract both here and
    in the reference's ORDER BY id DESC LIMIT 1); with a tied max
    every tied row is flagged (deterministic), and an all-NULL-seq
    group flags none — the window form flagged one
    partitioning-dependent arbitrary row there, which no caller could
    rely on. NULL keys are real groups (eqNullSafe, matching
    incremental_scan); NULL seq rows are never latest.
    """
    wm = df.groupBy(key).agg(F.max(seq).alias("_last_seq")).select(
        F.col(key).alias("_lfk"), F.col("_last_seq")
    )
    return (
        df.join(F.broadcast(wm), F.col(key).eqNullSafe(F.col("_lfk")), "left")
        .withColumn(
            "is_latest",
            F.coalesce(F.col(seq) == F.col("_last_seq"), F.lit(False)),
        )
        .drop("_lfk", "_last_seq")
    )


def top_k_per_group(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """Generic per-group top-k (O1/O2).

    Pass ``tiebreak`` (a unique column) whenever ``order_col`` can
    repeat within a group — row_number over a non-unique ordering is
    otherwise partitioning-dependent.

    ``salt=None`` is one window shuffle keyed by ``key`` — correct,
    but a HOT group (one key holding a large fraction of the table)
    serializes through a single window task; AQE cannot split a skewed
    window partition the way it splits skewed joins. ``salt=S`` runs
    the salted two-phase form: phase 1 windows over ``(key, salt)``
    with the salt derived from ``xxhash64(tiebreak or order_col)`` —
    spreading the hot group over S tasks — and keeps each cell's local
    top-k (any global top-k row is also top-k in its cell, so this is
    lossless); phase 2 re-windows only the ≤ S·k survivors per group.
    Two shuffles, but no task ever sees more than |group|/S + S·k
    rows. Pick S ≈ cluster parallelism / |hot groups|.
    """
    ordering = [F.asc(order_col) if ascending else F.desc(order_col)]
    if tiebreak is not None:
        ordering.append(F.asc(tiebreak))
    if salt is not None:
        if salt < 1:
            raise ValueError("salt must be >= 1")
        cell = F.pmod(F.xxhash64(F.col(tiebreak or order_col)), F.lit(salt))
        w1 = W.partitionBy(F.col(key), cell).orderBy(*ordering)
        df = (
            df.withColumn("_crk", F.row_number().over(w1))
            .where(F.col("_crk") <= k)
            .drop("_crk")
        )
    w = W.partitionBy(key).orderBy(*ordering)
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
