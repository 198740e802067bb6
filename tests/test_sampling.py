"""Deterministic hash split + stratified sampling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from teleharvest_spark.operators import sampling


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_split_matches_python_md5_model(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"] for r in sampling.split_assign(df).collect()}
    for i in range(300):
        b = int(_md5(str(i))[:4], 16)
        want = "train" if b < 52428 else ("val" if b < 58981 else "test")
        assert got[i] == want, (i, b, got[i], want)


def test_split_stable_under_repartition(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in sampling.split_assign(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(df.repartition(13)).collect()
    }
    assert a == b


def test_split_null_key_gets_null_split(spark):
    df = spark.createDataFrame([(None,), ("x",)], "doc_id string")
    rows = {r["doc_id"]: r["split"] for r in sampling.split_assign(df).collect()}
    assert rows[None] is None and rows["x"] in {"train", "val", "test"}


def test_split_rejects_bad_fractions(spark):
    import pytest

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.split_assign(df, train=0.9, val=0.2)


def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    s1 = sampling.stratified_sample(df, k=4)
    got1 = sorted((r["source"], r["doc_id"]) for r in s1.collect())
    # exactly k per group
    per = {}
    for src, _ in got1:
        per[src] = per.get(src, 0) + 1
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic under different parallelism
    s2 = sampling.stratified_sample(df.repartition(17), k=4)
    got2 = sorted((r["source"], r["doc_id"]) for r in s2.collect())
    assert got1 == got2
    # matches the python md5-rank model
    for src in ("s0", "s1", "s2"):
        ids = [i for i, s in rows if s == src]
        want = sorted(ids, key=lambda i: (_md5(str(i)), i))[:4]
        assert sorted(i for s, i in got1 if s == src) == sorted(want)


def test_leakage_safe_split_clusters_are_atomic(spark):
    from teleharvest_spark.operators import components

    docs = spark.createDataFrame(
        [(i, "s") for i in range(40)], "doc_id long, source string"
    )
    # clusters {0,1,2} and {10,11}; everything else singleton
    edges = spark.createDataFrame([(0, 1), (1, 2), (10, 11)], "src long, dst long")
    comp = components.connected_components(edges)
    out = sampling.leakage_safe_split(docs, comp)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 40
    # cluster members share the split of their canonical label
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    # clustered docs use the COMPONENT hash (doc 1's own hash may differ)
    b = int(_md5("0")[:4], 16)
    want = "train" if b < 52428 else ("val" if b < 58981 else "test")
    assert got[0] == want
    # singletons match plain split_assign
    plain = {
        r["doc_id"]: r["split"] for r in sampling.split_assign(docs).collect()
    }
    for i in range(3, 10):
        assert got[i] == plain[i]


def test_leakage_safe_split_rejects_bad_fractions(spark):
    import pytest

    from teleharvest_spark.operators import components

    docs = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    comp = components.connected_components(
        spark.createDataFrame([(1, 2)], "src long, dst long")
    )
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(docs, comp, train=0.99, val=0.5)


def test_salted_topk_matches_plain(spark):
    """The lossless salted two-phase rank returns byte-identical
    results to the single-window form, on skewed data with ties."""
    from teleharvest_spark.operators.watermark import top_k_per_group

    rows = [(i, "hot" if i % 10 != 9 else f"s{i % 3}", (i * 13) % 50) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    plain = top_k_per_group(df, key="source", order_col="v", k=7, tiebreak="doc_id")
    salted = top_k_per_group(
        df, key="source", order_col="v", k=7, tiebreak="doc_id", salt=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    import pytest

    with pytest.raises(ValueError):
        top_k_per_group(df, key="source", order_col="v", k=7, salt=0)


def test_stratified_sample_salted_matches_plain(spark):
    rows = [(i, f"s{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(map(tuple, sampling.stratified_sample(df, k=6).collect()))
    b = sorted(map(tuple, sampling.stratified_sample(df, k=6, salt=16).collect()))
    assert a == b


def test_stratified_sample_small_group_returns_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string")
    got = sampling.stratified_sample(df, k=10).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"a": 2, "b": 1}


def test_leakage_and_plain_split_share_null_key_rule(spark):
    """Both split forms emit NULL split for NULL keys (the shared
    _carve rule — review finding: the hand-rolled duplicates had
    drifted on exactly this branch)."""
    from teleharvest_spark.operators import components

    docs = spark.createDataFrame([(None, "s"), (7, "s")], "doc_id long, source string")
    comp = components.connected_components(
        spark.createDataFrame([(1, 2)], "src long, dst long")
    )
    plain = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs).collect()}
    safe = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_split(docs, comp).collect()
    }
    assert plain[None] is None and safe[None] is None
    assert plain[7] == safe[7] is not None


def test_token_budget_sample(spark):
    """Prefix-by-hash budget sampling: deterministic under
    partitioning, never overshoots, undershoots by < one doc, groups
    without a budget pass through, NULL strata drop."""
    from teleharvest_spark.operators.sampling import token_budget_sample

    rows = [(i, "web", 10) for i in range(100)]
    rows += [(1000 + i, "books", 7) for i in range(50)]
    rows += [(2000 + i, "code", 5) for i in range(20)]
    rows += [(3000, None, 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")

    budgets = {"web": 333, "books": 70}
    out = token_budget_sample(df, budgets)
    got = out.groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("tok")
    ).collect()
    by = {r["source"]: (r["n"], r["tok"]) for r in got}
    assert by["web"] == (33, 330)     # 333 // 10 docs, <= budget
    assert by["books"] == (10, 70)    # exact hit
    assert by["code"] == (20, 100)    # no budget -> keep all
    assert None not in by             # NULL stratum dropped

    # identical selection under different partitionings and a changed
    # selection under a different seed
    ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())
    a = ids(token_budget_sample(df.repartition(17), budgets))
    b = ids(token_budget_sample(df.repartition(1), budgets))
    c = ids(token_budget_sample(df, budgets, seed=9))
    assert a == b
    assert a != c and len(a) == len(c) == 63

    # default_budget applies to unlisted groups
    d = token_budget_sample(df, budgets, default_budget=25)
    by2 = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by2["code"] == 5  # 25 // 5

    # NULL sizes count 0 (kept for free, never charge the budget)
    df2 = spark.createDataFrame(
        [(1, "g", None), (2, "g", 4)], "doc_id long, source string, n_tok long"
    )
    out2 = token_budget_sample(df2, {"g": 4})
    assert out2.count() == 2


def test_upsample_mixture_counts_and_determinism(spark):
    from teleharvest_spark.operators.sampling import upsample_mixture

    rows = [(i, "books" if i % 2 else "web") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = upsample_mixture(df, {"books": 2.5, "web": 0.25}, seed=1)

    per = (
        out.groupBy("doc_id", "source")
        .agg(F.count("*").alias("n"), F.collect_set("copy").alias("copies"))
        .collect()
    )
    books = [r for r in per if r["source"] == "books"]
    web = [r for r in per if r["source"] == "web"]
    # every books doc gets exactly 2 or 3 copies with dense 0-based copy ids
    assert len(books) == 200
    assert all(r["n"] in (2, 3) and sorted(r["copies"]) == list(range(r["n"])) for r in books)
    # fractional picks are neither all nor none (expectation 100 of 200)
    n3 = sum(1 for r in books if r["n"] == 3)
    assert 50 < n3 < 150
    # web is subsampled: kept docs have exactly copy 0; expectation 50 of 200
    assert all(r["n"] == 1 and r["copies"] == [0] for r in web)
    assert 20 < len(web) < 80

    # content-defined: identical under repartitioning, re-rolled by seed
    key = lambda d: sorted((r["doc_id"], r["copy"]) for r in d.collect())
    assert key(out) == key(
        upsample_mixture(df.repartition(13), {"books": 2.5, "web": 0.25}, seed=1)
    )
    assert key(out) != key(upsample_mixture(df, {"books": 2.5, "web": 0.25}, seed=2))


def test_upsample_mixture_identity_zero_and_defaults(spark):
    from teleharvest_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "doc_id long, source string"
    )
    # default weight 1.0 -> identity plus copy=0 (NULL group included)
    out = upsample_mixture(df, {}).collect()
    assert sorted((r["doc_id"], r["copy"]) for r in out) == [(1, 0), (2, 0), (3, 0)]
    # integer weight -> exact copies, no hash lottery; 0 drops the group
    out2 = upsample_mixture(df, {"a": 3.0, "b": 0.0}).collect()
    assert sorted((r["doc_id"], r["copy"]) for r in out2) == [
        (1, 0), (1, 1), (1, 2), (3, 0)
    ]
    import pytest as _pt
    with _pt.raises(ValueError):
        upsample_mixture(df, {"a": -1.0})


def test_upsample_mixture_zero_shuffle_plan(spark):
    from teleharvest_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = upsample_mixture(df, {"a": 2.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
