from __future__ import annotations

from teleharvest_spark.operators import referential


def _fact(spark):
    return spark.createDataFrame(
        [
            ("d1", [1], 1, "a"),
            ("d2", [2], 1, "b"),
            ("d3", [3], 1, "zz"),
            ("d4", [4], 1, None),
            ("d5", [5], 1, ""),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def _dim(spark):
    return spark.createDataFrame([("a",), ("b",)], "source string")


def test_semi_join_keeps_members(spark):
    kept = referential.allowed_rows(_fact(spark), _dim(spark))
    assert sorted(r["doc_id"] for r in kept.collect()) == ["d1", "d2"]


def test_anti_join_catches_rogue_null_empty(spark):
    v = referential.referential_violations(_fact(spark), _dim(spark))
    rows = {r["doc_id"]: r for r in v.collect()}
    assert set(rows) == {"d3", "d4", "d5"}
    assert rows["d4"]["reason"] == "source=NULL not in allowed dimension"
    assert rows["d3"]["check_name"] == "unknown_source"
    # token arrays ride along
    assert rows["d3"]["tokens"] == [3]


def test_broadcast_plan(spark):
    """The dimension must be the broadcast side — no shuffle of the fact."""
    plan = referential.allowed_rows(_fact(spark), _dim(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
