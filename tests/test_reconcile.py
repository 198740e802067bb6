from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from teleharvest_spark.operators import reconcile


def _base(spark):
    rows = [
        Row(doc_id=f"d{i}", source=["web", "books", None][i % 3], tokens=[i, i + 1], n_tok=2)
        for i in range(30)
    ]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------- checksum


def test_checksum_order_and_partitioning_independent(spark):
    df = _base(spark)
    a = reconcile.table_checksum(df, "source")
    # reversed row order, different partitioning
    b = reconcile.table_checksum(
        df.orderBy(F.desc("doc_id")).repartition(7), "source"
    )
    key = lambda t: (t[0] is None, t)  # None sorts first, stably
    assert sorted(map(tuple, a.collect()), key=key) == sorted(
        map(tuple, b.collect()), key=key
    )
    # NULL partition key is a partition like any other
    assert any(r.source is None for r in a.collect())


def test_reconcile_statuses(spark):
    old = _base(spark)
    # change one value in 'books', add a row to 'web', leave NULL alone
    new = (
        old.withColumn(
            "n_tok",
            F.when(F.col("doc_id") == "d1", F.lit(99)).otherwise(F.col("n_tok")),
        )
        .unionByName(
            spark.createDataFrame(
                [Row(doc_id="dX", source="web", tokens=[1], n_tok=1)]
            )
        )
    )
    v = {r.source: r.status for r in reconcile.reconcile_tables(old, new, "source").collect()}
    assert v == {"web": "count_mismatch", "books": "content_mismatch", None: "match"}


def test_reconcile_only_sides(spark):
    old = _base(spark).where(F.col("source").isNotNull())
    new = _base(spark).where(~F.col("source").eqNullSafe(F.lit("web")))
    v = {r.source: r.status for r in reconcile.reconcile_tables(old, new, "source").collect()}
    assert v["web"] == "only_left"
    assert v[None] == "only_right"
    assert v["books"] == "match"


def test_checksum_count_mismatch_beats_content(spark):
    old = _base(spark)
    # drop a row AND change a value in the same partition → count wins
    new = old.where(F.col("doc_id") != "d0").withColumn(
        "n_tok", F.when(F.col("doc_id") == "d3", F.lit(7)).otherwise(F.col("n_tok"))
    )
    v = {r.source: r.status for r in reconcile.reconcile_tables(old, new, "source").collect()}
    assert v["web"] == "count_mismatch"


# ---------------------------------------------------------------- diff


@pytest.mark.parametrize("method", ["exact", "hash"])
def test_snapshot_diff_statuses(spark, method):
    old = _base(spark)
    new = (
        old.where(F.col("doc_id") != "d5")  # removed
        .withColumn(
            "tokens",
            F.when(F.col("doc_id") == "d7", F.array(F.lit(0))).otherwise(
                F.col("tokens")
            ),
        )  # changed (array payload)
        .unionByName(
            spark.createDataFrame([Row(doc_id="dZ", source="web", tokens=[9], n_tok=1)])
        )  # added
    )
    out = {
        r.doc_id: r.status
        for r in reconcile.snapshot_diff(old, new, ("doc_id",), method=method).collect()
    }
    assert out == {"d5": "removed", "d7": "changed", "dZ": "added"}


@pytest.mark.parametrize("method", ["exact", "hash"])
def test_snapshot_diff_null_key_and_null_values(spark, method):
    old = spark.createDataFrame(
        [Row(k=None, v="a"), Row(k="x", v=None), Row(k="y", v="same")]
    )
    # NULL key row changes value; NULL value row unchanged; y removed
    new = spark.createDataFrame([Row(k=None, v="b"), Row(k="x", v=None)])
    out = {r.k: r.status for r in reconcile.snapshot_diff(old, new, ("k",), method=method).collect()}
    assert out == {None: "changed", "y": "removed"}


def test_snapshot_diff_identical_is_empty(spark):
    df = _base(spark)
    assert reconcile.snapshot_diff(df, df.repartition(5)).count() == 0


def test_snapshot_diff_compare_cols_subset(spark):
    old = _base(spark)
    new = old.withColumn(
        "n_tok", F.when(F.col("doc_id") == "d2", F.lit(42)).otherwise(F.col("n_tok"))
    )
    # comparing only tokens → the n_tok change is invisible
    assert (
        reconcile.snapshot_diff(old, new, ("doc_id",), compare_cols=["tokens"]).count()
        == 0
    )


def test_snapshot_diff_bad_method(spark):
    df = _base(spark)
    with pytest.raises(ValueError, match="method"):
        reconcile.snapshot_diff(df, df, method="fuzzy")


# ---------------------------------------------------------------- targeted


def test_targeted_diff_restricts_to_touched_partitions(spark):
    old = _base(spark)
    new = old.withColumn(
        "n_tok", F.when(F.col("doc_id") == "d1", F.lit(99)).otherwise(F.col("n_tok"))
    )  # d1 is in 'books'
    verdicts, diff = reconcile.targeted_diff(old, new, "source", ("doc_id",))
    v = {r.source: r.status for r in verdicts.collect()}
    assert v["books"] == "content_mismatch" and v["web"] == "match"
    rows = diff.collect()
    assert {r.doc_id for r in rows} == {"d1"}
    assert rows[0].status == "changed"
    # plan: the restriction semi-join broadcasts the partition verdicts
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_targeted_diff_equals_full_diff(spark):
    old = _base(spark)
    new = (
        old.where(~F.col("doc_id").isin("d5", "d6"))
        .withColumn(
            "tokens",
            F.when(F.col("doc_id") == "d8", F.array(F.lit(1))).otherwise(F.col("tokens")),
        )
        .unionByName(
            spark.createDataFrame(
                [("dN", None, [2], 1)],
                "doc_id string, source string, tokens array<bigint>, n_tok bigint",
            )
        )
    )
    _, targeted = reconcile.targeted_diff(old, new, "source", ("doc_id",))
    full = reconcile.snapshot_diff(
        old, new, ("doc_id",), compare_cols=["tokens", "n_tok"]
    )
    assert sorted(map(tuple, targeted.select("doc_id", "status").collect())) == sorted(
        map(tuple, full.collect())
    )


# ------------------------------------------------------- column drilldown


def test_reconcile_columns_names_the_changed_column(spark):
    old = _base(spark)
    new = old.withColumn(
        "n_tok", F.when(F.col("doc_id") == "d1", F.lit(99)).otherwise(F.col("n_tok"))
    )  # d1 ∈ books; tokens untouched
    out = {
        (r.source, r.column): r.status
        for r in reconcile.reconcile_columns(old, new, "source").collect()
    }
    assert out[("books", "n_tok")] == "content_mismatch"
    assert out[("books", "tokens")] == "match"
    assert out[("books", "doc_id")] == "match"
    assert out[("web", "n_tok")] == "match"
    assert out[(None, "n_tok")] == "match"


def test_reconcile_columns_count_and_only_statuses(spark):
    old = _base(spark).where(F.col("source").isNotNull())
    new = _base(spark).where(
        ~F.col("source").eqNullSafe(F.lit("web"))
    ).where(F.col("doc_id") != "d1")  # books loses a row; web gone; NULL appears
    out = {
        (r.source, r.column): r.status
        for r in reconcile.reconcile_columns(old, new, "source").collect()
    }
    assert out[("books", "doc_id")] == "count_mismatch"
    assert out[("web", "doc_id")] == "only_left"
    assert out[(None, "doc_id")] == "only_right"


def test_column_checksums_identical_values_distinct_columns(spark):
    # two columns with IDENTICAL values: a change in one must not be
    # maskable by the name-salted checksum of the other
    df = spark.createDataFrame([(s, v, v) for s, v in [("a", 1), ("a", 2)]],
                               "source string, x bigint, y bigint")
    cs = {
        r.column: r.content_sum
        for r in reconcile.column_checksums(df, "source").collect()
    }
    assert cs["x"] != cs["y"]


# ------------------------------------------------- review-fix regressions


def test_targeted_diff_catches_key_only_change(spark):
    """Review fix: the partition checksum must cover KEY columns — a
    re-keyed row (same content, new doc_id) must not certify 'match'
    nor vanish from the targeted diff."""
    old = _base(spark)
    new = old.withColumn(
        "doc_id",
        F.when(F.col("doc_id") == "d1", F.lit("d_rekeyed")).otherwise(F.col("doc_id")),
    )  # d1 ∈ books; tokens/n_tok unchanged
    verdicts, diff = reconcile.targeted_diff(old, new, "source", ("doc_id",))
    v = {r.source: r.status for r in verdicts.collect()}
    assert v["books"] == "content_mismatch"
    got = {r.doc_id: r.status for r in diff.collect()}
    assert got == {"d1": "removed", "d_rekeyed": "added"}
    full = {
        r.doc_id: r.status
        for r in reconcile.snapshot_diff(
            old, new, ("doc_id",), compare_cols=["tokens", "n_tok"]
        ).collect()
    }
    assert got == full


def test_column_checksums_weird_column_names(spark):
    """Review fix: stack() args are escaped/index-aliased — column
    names with spaces and quotes must not break the drill-down."""
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y")], ["source", "my col", "it's"]
    )
    out = {r.column for r in reconcile.column_checksums(df, "source").collect()}
    assert out == {"my col", "it's"}
    got = reconcile.reconcile_columns(df, df, "source").collect()
    assert all(r.status == "match" for r in got)
