"""F6 engagement-rate check + F10 metrics validity + metrics refresh.

Pins the reference's exact semantics:
* F10 truth table — reference tests/test_processor.py:311-407
  (views/reactions: None and 0 both fail either leg).
* F6 — reference processor.py:116-119: er = (reactions+forwards)/views
  if views else 0; fail iff er < min_er AND views > min_views AND NOT
  last message (strict comparisons on both thresholds).
* Entry point 3 — processor.py:65-71: exclusive (floor, watermark)
  window, F10 filter, update of exactly views/reactions/forwards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators import refresh
from teleharvest_spark.operators.cascade import FIRST_FAIL_COL, apply_cascade


# ---------------------------------------------------------------------------
# F10 metrics validity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "views,reactions,valid",
    [
        (10, 5, True),
        (10, 0, False),
        (10, None, False),
        (0, 5, False),
        (None, 5, False),
        (0, 0, False),
        (None, None, False),
        (0, None, False),
        (None, 0, False),
    ],
)
def test_metrics_validity_truth_table(spark, views, reactions, valid):
    df = spark.createDataFrame([(views, reactions)], "views int, reactions int")
    got = df.where(refresh.metrics_validity(F.col("views"), F.col("reactions"))).count()
    assert (got == 1) is valid


# ---------------------------------------------------------------------------
# F6 engagement rate
# ---------------------------------------------------------------------------

def _er_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "id int, views int, reactions int, forwards int, is_latest boolean"
    )
    annotated = apply_cascade(df, [refresh.engagement_check(CheckSuite())])
    return {r["id"]: r[FIRST_FAIL_COL] for r in annotated.collect()}


def test_engagement_rate_guarded_division(spark):
    df = spark.createDataFrame(
        [(1, 0, 10, 10), (2, None, 10, 10), (3, 100, 2, 3)],
        "id int, views int, reactions int, forwards int",
    )
    got = {
        r["id"]: r["er"]
        for r in df.select(
            "id",
            refresh.engagement_rate(
                F.col("views"), F.col("reactions"), F.col("forwards")
            ).alias("er"),
        ).collect()
    }
    assert got[1] == 0.0  # views=0 → er=0, not NULL / not error
    assert got[2] == 0.0  # views NULL → er=0
    assert got[3] == pytest.approx(0.05)


def test_engagement_check_semantics(spark):
    # suite defaults: min_er=0.025, min_views=50
    got = _er_rows(
        spark,
        [
            (1, 100, 1, 0, False),   # er=0.01 < 0.025, views>50, not latest → FAIL
            (2, 100, 1, 0, True),    # same but latest → exempt (pass)
            (3, 100, 2, 1, False),   # er=0.03 >= min_er → pass
            (4, 50, 0, 0, False),    # views == min_views (not >) → pass
            (5, 100, 2, 0, False),   # er == 0.02 < 0.025 → FAIL
            (6, 0, 0, 0, False),     # views=0 → er=0 but views>50 false → pass
            (7, 1000, 25, 0, False), # er == 0.025 exactly — NOT < min_er → pass
        ],
    )
    assert got[1] == "low_engagement"
    assert got[2] is None
    assert got[3] is None
    assert got[4] is None
    assert got[5] == "low_engagement"
    assert got[6] is None
    assert got[7] is None


# ---------------------------------------------------------------------------
# metrics refresh pipeline (entry point 3)
# ---------------------------------------------------------------------------

def test_metrics_refresh_end_to_end(spark):
    # stored: one channel, seqs 1..6; floor over first 3 asc = 1,
    # watermark = 6 → exclusive window (1, 6) = seqs 2..5 refreshable.
    stored = spark.createDataFrame(
        [("ch", s, 1, 1, 1, f"payload{s}") for s in range(1, 7)],
        "source string, doc_seq int, views int, reactions int, forwards int, extra string",
    )
    fresh = spark.createDataFrame(
        [
            ("ch", 1, 100, 10, 5),    # at the floor → excluded (exclusive)
            ("ch", 2, 200, 20, 6),    # valid update
            ("ch", 3, 0, 30, 7),      # views=0 → F10 fails
            ("ch", 4, 400, None, 8),  # reactions NULL → F10 fails
            ("ch", 5, 500, 50, 9),    # valid update
            ("ch", 6, 600, 60, 10),   # at the watermark → excluded
            ("zz", 2, 700, 70, 11),   # key absent from stored → skipped
        ],
        "source string, doc_seq int, views int, reactions int, forwards int",
    )
    out = refresh.metrics_refresh(
        stored, fresh, key="source", seq="doc_seq", limit=3
    )
    rows = {r["doc_seq"]: r for r in out.collect()}
    assert len(rows) == 6  # merge is target-total: every stored row survives
    assert (rows[2]["views"], rows[2]["reactions"], rows[2]["forwards"]) == (200, 20, 6)
    assert (rows[5]["views"], rows[5]["reactions"], rows[5]["forwards"]) == (500, 50, 9)
    for s in (1, 3, 4, 6):  # excluded or invalid → stale metrics kept
        assert (rows[s]["views"], rows[s]["reactions"], rows[s]["forwards"]) == (1, 1, 1)
    # non-metric columns untouched by the update
    assert all(rows[s]["extra"] == f"payload{s}" for s in range(1, 7))


def test_metrics_refresh_updates_only_metric_cols(spark):
    stored = spark.createDataFrame(
        [("ch", s, 1, 1, 1, 99) for s in range(1, 5)],
        "source string, doc_seq int, views int, reactions int, forwards int, score int",
    )
    fresh = spark.createDataFrame(
        [("ch", 2, 200, 20, 6)],
        "source string, doc_seq int, views int, reactions int, forwards int",
    )
    out = refresh.metrics_refresh(stored, fresh, key="source", seq="doc_seq", limit=1)
    row = {r["doc_seq"]: r for r in out.collect()}[2]
    assert row["views"] == 200 and row["score"] == 99
