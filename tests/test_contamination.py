"""Train/eval contamination scan (VERDICT r3 item 7)."""

from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark.operators import contamination

TRAIN = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # contains the eval benchmark verbatim mid-document:
    (2, "noise prefix words the exact benchmark question and answer text here suffix noise"),
    (3, "totally unrelated content about spark catalyst and tungsten engines"),
    (4, None),
]
EVAL = [
    (100, "the exact benchmark question and answer text here"),
    (101, "some other eval item with no training twin whatsoever today"),
]


def _dfs(spark):
    t = spark.createDataFrame(TRAIN, "doc_id long, text string")
    e = spark.createDataFrame(EVAL, "doc_id long, text string")
    return t, e


def test_planted_contamination_found(spark):
    t, e = _dfs(spark)
    rows = {
        (r["doc_id"], r["eval_id"]): r
        for r in contamination.contamination_scan(t, e, k=3, min_overlap=2).collect()
    }
    assert (2, 100) in rows
    hit = rows[(2, 100)]
    # eval doc 100 has 8 words -> 6 distinct 3-shingles, ALL inside doc 2
    assert hit["n_eval"] == 6
    assert hit["n_overlap"] == 6
    assert hit["overlap_frac"] == 1.0
    # the clean eval item matches nothing; unrelated/NULL train rows clean
    assert not any(eid == 101 for (_, eid) in rows)
    assert not any(d in (1, 3, 4) for (d, _) in rows)


def test_min_overlap_gates_single_shingle_noise(spark):
    t, e = _dfs(spark)
    # with min_overlap=1 a single shared shingle would flag; default 2 must not
    one = contamination.contamination_scan(
        spark.createDataFrame(
            [(9, "zz qq ww the exact benchmark rr tt yy uu ii")],
            "doc_id long, text string",
        ),
        e,
        k=3,
        min_overlap=2,
    ).collect()
    assert one == []


def test_plan_broadcasts_eval_dimension(spark):
    """The 100 TB contract: the train side streams through a broadcast
    hash join — no shuffle of the corpus on the join."""
    t, e = _dfs(spark)
    plan = contamination.contamination_scan(t, e)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fixture_split_non_vacuous(spark):
    """The driver-gated query's mod-97 split yields real contamination
    pairs on the fixture (the oracle checks values, this pins the
    scenario isn't empty)."""
    import __spark_entry__ as E

    assert E.q_contamination(spark, "/root/testdata/sf0.001").count() > 0
