"""Engagement-rate check (F6) + late-data metrics refresh (F10, entry
point 3).

Reference semantics reproduced here:

* **F6 engagement rate** (processor.py:116-119, settings.py:12-14):
  ``er = (reactions + forwards) / views if views else 0``; a row FAILS
  when ``er < min_er AND views > min_views AND NOT last_message`` —
  the newest row per channel is exempt because its metrics haven't
  settled (``is_last_message``, processor.py:76-78).
* **F10 metrics validity** (processor.py:147-157, truth table
  tests/test_processor.py:311-407): a fetched row is eligible for a
  metric update only when ``views`` is truthy AND ``reactions`` is
  truthy — Python truthiness, so NULL and 0 both fail either leg.
* **Entry point 3** ``fetch_and_update_metrics`` (processor.py:65-71):
  per channel, lookback floor = ``get_first_message_id(channel,
  limit)`` (models/message.py:91-110), bounded re-fetch of the
  exclusive window ``(floor, watermark)`` (telethon min_id/max_id are
  both exclusive, telegram_service.py:32-39), F10 filter, then a keyed
  update of exactly views/reactions/forwards (processor.py:81-88).

Spark shape: the per-key bounds table is |keys| rows → broadcast; the
fresh scan is pruned by the seq-range predicate (parquet/Iceberg
min-max stats skip files outside the lookback window — the bounded
refresh cost cap the reference gets from its id-range API call); the
final upsert is one equi-join (Iceberg MERGE INTO in production,
merge.merge_upsert emulation locally). No extra shuffle beyond the
merge join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import CheckSuite
from . import merge
from .cascade import Check


def engagement_rate(
    views: Column, reactions: Column, forwards: Column
) -> Column:
    """``(reactions + forwards) / views if views else 0`` — C4 guarded
    division, NOT try_divide: NULL/0 views must yield er = 0.0, not
    NULL (processor.py:116)."""
    num = F.coalesce(reactions, F.lit(0)) + F.coalesce(forwards, F.lit(0))
    return F.when(
        views.isNotNull() & (views != 0), num.cast("double") / views.cast("double")
    ).otherwise(F.lit(0.0))


def engagement_check(suite: CheckSuite, latest_col: str = "is_latest") -> Check:
    """F6 as a cascade Check. Expects metric columns plus the
    ``is_latest`` exemption flag (watermark.with_latest_flag)."""
    er = engagement_rate(F.col("views"), F.col("reactions"), F.col("forwards"))
    fails = (
        (er < F.lit(float(suite.min_er)))
        & (F.col("views") > F.lit(suite.min_views))
        & (~F.col(latest_col))
    )
    return Check(
        "low_engagement",
        fails,
        F.concat(
            F.lit("er="), F.round(er, 6).cast("string"), F.lit(f" < {suite.min_er}")
        ),
    )


def metrics_validity(views: Column, reactions: Column) -> Column:
    """F10: TRUE iff both metrics are truthy (NOT NULL and != 0) —
    processor.py:147-157; 0 and None fail both legs of the truth table
    (tests/test_processor.py:311-407)."""
    return (
        views.isNotNull()
        & (views != 0)
        & reactions.isNotNull()
        & (reactions != 0)
    )


def metrics_refresh(
    stored: DataFrame,
    fresh: DataFrame,
    key: str = "source",
    seq: str = "doc_seq",
    metric_cols: tuple[str, ...] = ("views", "reactions", "forwards"),
    limit: int = 1000,
    validity_cols: tuple[str, str] = ("views", "reactions"),
) -> DataFrame:
    """The full late-data refresh pipeline over a stored fact table.

    ``limit`` is kept for call-site parity with the reference's
    lookback API and is SEMANTICALLY INERT — the floor (min of the
    first ``limit`` ids ascending) equals the per-key global min for
    any limit ≥ 1, so no value of it changes the window (the same
    documented inertness as watermark.lookback_floor).

    1. Per-key bounds from STORED state: lookback floor (A2) and
       high-water mark (A1) — both tiny aggregates.
    2. Bounded window: fresh rows with ``floor < seq < watermark``
       (exclusive both ends, matching telethon's min_id/max_id;
       only *old* rows are refreshed — processor.py:70).
    3. F10 validity filter on the FRESH metrics.
    4. Keyed update of exactly ``metric_cols`` (merge_upsert: matched
       rows updated, absent keys skipped, other columns untouched —
       processor.py:87-88).

    Returns the merged stored table.
    """
    # ONE partial-agg pass for both bounds: the lookback floor —
    # min of the first ``limit`` ids ascending, both here
    # (watermark.lookback_floor) and in the reference
    # (models/message.py:91-110 takes min over the ascending LIMIT
    # page) — is identically the per-key global min for any limit ≥ 1,
    # so the floor needs no window/limit pass at all and the two
    # separate stored scans (window+agg for floor, agg for watermark)
    # collapse into a single column-pruned scan with map-side partials.
    # lookback_floor stays as the standalone parity operator (A2/O2).
    del limit  # semantically inert — see docstring
    bounds = stored.groupBy(key).agg(
        F.min(seq).alias("first_seq"), F.max(seq).alias("last_seq")
    )  # |keys| rows

    windowed = (
        fresh.join(F.broadcast(bounds), key)
        .where((F.col(seq) > F.col("first_seq")) & (F.col(seq) < F.col("last_seq")))
        .drop("first_seq", "last_seq")
    )
    valid = windowed.where(
        metrics_validity(F.col(validity_cols[0]), F.col(validity_cols[1]))
    )
    updates = valid.select(key, seq, *metric_cols)
    return merge.merge_upsert(stored, updates, keys=[key, seq], update_cols=list(metric_cols))
