from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark import datagen
from teleharvest_spark.operators import drift


def test_drifted_partition_flagged(spark, sequences, suite):
    clean = sequences.where(
        F.col("source").isin([s for s in datagen.SOURCES if s != datagen.DRIFTED_SOURCE])
    )
    base = drift.ntok_histogram(clean).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    m = drift.drift_verdicts(
        drift.drift_metrics(drift.ntok_histogram(sequences), base), suite
    )
    rows = {r["source"]: r for r in m.collect()}
    assert rows[datagen.DRIFTED_SOURCE]["drift_verdict"] == "fail"
    assert rows[datagen.DRIFTED_SOURCE]["ks"] > suite.max_ks
    for s in datagen.SOURCES[:7]:
        assert rows[s]["drift_verdict"] == "pass", (s, rows[s]["ks"], rows[s]["psi"])


def test_identical_distribution_zero_drift(spark, suite):
    df = spark.createDataFrame(
        [(f"d{i}", [1] * (i % 7 + 1), i % 7 + 1, "x") for i in range(200)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    hist = drift.ntok_histogram(df)
    base = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    m = drift.drift_metrics(hist, base).collect()
    assert abs(m[0]["ks"]) < 1e-12
    assert abs(m[0]["psi"]) < 1e-9


def test_ks_bounds(spark, sequences):
    base = drift.ntok_histogram(sequences).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    m = drift.drift_metrics(drift.ntok_histogram(sequences), base).collect()
    for r in m:
        assert 0.0 <= r["ks"] <= 1.0
        assert r["psi"] >= 0.0 or r["psi"] != r["psi"]  # psi ≥ 0 (or NaN never)


def test_token_id_histogram_total(spark):
    df = spark.createDataFrame(
        [("d1", [0, 1, 49000], 3, "x"), ("d2", [5], 1, "x")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    h = drift.token_id_histogram(df).collect()
    assert sum(r["cnt"] for r in h) == 4


def test_run_suite_drift_vs_global_flags_drifted_source(spark, sequences, suite):
    """drift_vs_global: the planted src_07 (n_tok mean ×2) must fail
    the KS/PSI check against the pooled corpus histogram."""
    from teleharvest_spark.plans import suite as suite_plan

    res = suite_plan.run_suite(sequences, suite, drift_vs_global=True)
    rows = {r["source"]: r for r in res.verdicts.collect()}
    res.cleanup()
    assert rows["src_07"]["drift_verdict"] == "fail"
    assert rows["src_07"]["verdict"] == "fail"
    # a non-drifted mid-size source passes the drift dimension
    assert rows["src_03"]["drift_verdict"] == "pass"


def test_token_id_drift_flags_drifted_source(spark, sequences, suite):
    """PSI on token-id buckets: src_07 draws from half the vocab
    (FIXTURES.md T1 'token-id histogram reweighted') and must be the
    partition the token-level drift check flags."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import drift

    hist = drift.token_id_histogram(sequences)
    base = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    rows = {r["source"]: r for r in drift.drift_metrics(hist, base).collect()}
    assert rows["src_07"]["psi"] > suite.max_psi
    assert rows["src_03"]["psi"] <= suite.max_psi


def test_w1_hand_computed(spark):
    """Earth-mover distance over bucket indices, hand-checked.

    hist:    bucket0=3, bucket1=1   -> p = [.75, .25], CDF [.75, 1]
    baseline bucket0=1, bucket1=3   -> q = [.25, .75], CDF [.25, 1]
    W1 = |.75-.25| + |1-1| = 0.5 bucket units; KS = 0.5.
    A shift TWO buckets away at the same mass doubles W1 but not KS.
    """
    hist = spark.createDataFrame(
        [("x", 0, 3), ("x", 1, 1)], "source string, bucket int, cnt long"
    )
    base = spark.createDataFrame([(0, 1), (1, 3)], "bucket int, cnt long")
    m = drift.drift_metrics(hist, base, include_w1=True).collect()[0]
    assert abs(m["w1"] - 0.5) < 1e-12
    assert abs(m["ks"] - 0.5) < 1e-12

    # all mass at bucket 1 vs baseline at bucket 0: W1 = 1 bucket
    near = drift.drift_metrics(
        spark.createDataFrame([("x", 1, 1)], "source string, bucket int, cnt long"),
        spark.createDataFrame([(0, 1)], "bucket int, cnt long"),
        include_w1=True,
    ).collect()[0]
    # all mass at bucket 2 vs baseline at bucket 0: W1 = 2 buckets even
    # though bucket 1 has no row on either side (span-weighted gaps)
    far = drift.drift_metrics(
        spark.createDataFrame([("x", 2, 1)], "source string, bucket int, cnt long"),
        spark.createDataFrame([(0, 1)], "bucket int, cnt long"),
        include_w1=True,
    ).collect()[0]
    # same KS (1.0), but the far shift moves the mass twice the distance
    assert abs(near["ks"] - far["ks"]) < 1e-12
    assert abs(near["w1"] - 1.0) < 1e-12
    assert abs(far["w1"] - 2.0) < 1e-12


def test_w1_default_schema_unchanged(spark):
    hist = spark.createDataFrame([("x", 0, 1)], "source string, bucket int, cnt long")
    base = spark.createDataFrame([(0, 1)], "bucket int, cnt long")
    assert drift.drift_metrics(hist, base).columns == ["source", "ks", "psi"]
    empty = drift.drift_metrics(
        spark.createDataFrame([("x", 0, 0)], "source string, bucket int, cnt long"),
        base,
        include_w1=True,
    ).collect()[0]
    assert empty["w1"] == float("inf")


def _unfused_loo(hist, pooled=None):
    """The pre-round-6 leave-one-out chain — the equivalence oracle for
    loo_drift_metrics."""
    loo = drift.leave_one_out_baseline(hist, pooled)
    scored = (
        loo.groupBy("source")
        .agg(F.sum("cnt").alias("_rest"))
        .where(F.col("_rest") > 0)
        .select(F.col("source").alias("_rs"))
    )
    cond = F.col("source").eqNullSafe(F.col("_rs"))
    return drift.drift_metrics(
        hist.join(F.broadcast(scored), cond, "semi"),
        loo.join(F.broadcast(scored), cond, "semi"),
    )


def test_loo_drift_metrics_matches_unfused_chain(spark, sequences):
    hist = drift.ntok_histogram(sequences).persist()
    hist.count()
    want = {r["source"]: r for r in _unfused_loo(hist).collect()}
    got = {r["source"]: r for r in drift.loo_drift_metrics(hist).collect()}
    assert set(got) == set(want)
    for s in want:
        assert got[s]["ks"] == want[s]["ks"], s
        assert got[s]["psi"] == want[s]["psi"], s
    hist.unpersist()


def test_loo_drift_metrics_single_source_excluded(spark):
    df = spark.createDataFrame(
        [(f"d{i}", [1] * 5, 5, "only") for i in range(50)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    hist = drift.ntok_histogram(df)
    # rest-mass is zero for a single-source corpus: excluded, not flagged
    assert drift.loo_drift_metrics(hist).collect() == []
    assert _unfused_loo(hist).collect() == []


def test_loo_drift_metrics_external_stale_pool(spark):
    # external pool MISSING one of the source's own buckets (stale):
    # the own-only bucket must still enter the dense domain with rest 0
    hist = spark.createDataFrame(
        [("a", 0, 30), ("a", 5, 10), ("b", 0, 25), ("b", 1, 15)],
        "source string, bucket int, cnt long",
    )
    pooled = spark.createDataFrame(
        [(0, 55), (1, 15)], "bucket int, cnt long"  # bucket 5 absent
    )
    want = {r["source"]: r for r in _unfused_loo(hist, pooled).collect()}
    got = {r["source"]: r for r in drift.loo_drift_metrics(hist, pooled).collect()}
    assert set(got) == set(want)
    for s in want:
        assert got[s]["ks"] == want[s]["ks"], s
        assert got[s]["psi"] == want[s]["psi"], s


def _psi_close(a, b):
    # the driver-side twin replays the SQL operation sequence, but
    # Math.log (JVM) and math.log (libm) may differ in the final ulp —
    # observed 2-ulp psi drift on the bench fixture; ks (no log) is
    # exactly equal
    import math

    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def test_loo_drift_rows_matches_sql_kernel(spark, sequences):
    hist = drift.ntok_histogram(sequences).persist()
    hist.count()
    want = {r["source"]: r for r in drift.loo_drift_metrics(hist).collect()}
    got = {s: (ks, psi) for s, ks, psi in drift.loo_drift_rows(hist.collect())}
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s]["ks"], s
        assert _psi_close(got[s][1], want[s]["psi"]), s
    # external-pool form, including a stale pool missing an own bucket
    pool = [
        {"bucket": r["bucket"], "cnt": r["cnt"]}
        for r in hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).collect()
        if r["bucket"] != 0
    ]
    pooled_df = spark.createDataFrame(
        [(p["bucket"], p["cnt"]) for p in pool], "bucket int, cnt long"
    )
    want2 = {r["source"]: r for r in drift.loo_drift_metrics(hist, pooled_df).collect()}
    got2 = {s: (ks, psi) for s, ks, psi in drift.loo_drift_rows(hist.collect(), pool)}
    assert set(got2) == set(want2)
    for s in want2:
        assert got2[s][0] == want2[s]["ks"], s
        assert _psi_close(got2[s][1], want2[s]["psi"]), s
    hist.unpersist()
