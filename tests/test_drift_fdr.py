from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from teleharvest_spark.operators import drift

HIST_SCHEMA = "source string, bucket int, cnt bigint"


# ------------------------------------------------------------- p-values


def test_kolmogorov_published_critical_values():
    # two-sided KS critical λ at α = .10 / .05 / .01 (published tables)
    q = drift._kolmogorov_sf(np.array([1.224, 1.358, 1.628]))
    assert abs(q[0] - 0.10) < 0.005
    assert abs(q[1] - 0.05) < 0.003
    assert abs(q[2] - 0.01) < 0.002
    # boundaries + monotonicity
    assert drift._kolmogorov_sf(np.array([0.0]))[0] == 1.0
    assert drift._kolmogorov_sf(np.array([5.0]))[0] < 1e-9
    lams = np.linspace(0.01, 3.0, 50)
    vals = drift._kolmogorov_sf(lams)
    assert np.all(np.diff(vals) <= 1e-12)


def test_ks_pvalue_edges():
    # identical samples → p = 1; maximal D with real mass → p ≈ 0
    p = drift.ks_pvalue_arrays(
        np.array([0.0, 1.0, 0.5]), np.array([500.0, 500.0, 0.0]), np.array([500.0, 500.0, 100.0])
    )
    assert p[0] == 1.0
    assert p[1] < 1e-12
    # empty side = maximal drift by engine convention
    assert p[2] == 0.0


def test_ks_pvalue_sample_size_sharpens():
    # same D, more data → smaller p (the whole point of the correction)
    d = np.full(3, 0.08)
    n = np.array([100.0, 1000.0, 10000.0])
    p = drift.ks_pvalue_arrays(d, n, n)
    assert p[0] > p[1] > p[2]


# ------------------------------------------------------------------ BH


def _pframe(spark, ps):
    return spark.createDataFrame(
        [(f"s{i}", float(p)) for i, p in enumerate(ps)], "source string, p_value double"
    )


def test_bh_stepup_rejects_through_failed_intermediate_ranks(spark):
    # rank 2/3 fail their own thresholds but rank 4 passes → ALL rejected
    out = drift.bh_reject(_pframe(spark, [0.01, 0.04, 0.03, 0.05]), alpha=0.05)
    rows = out.collect()
    assert all(r.reject for r in rows)
    assert {r.n_tests for r in rows} == {4}


def test_bh_only_strongest_survives(spark):
    out = {r.source: r.reject for r in drift.bh_reject(
        _pframe(spark, [0.01, 0.2, 0.3, 0.4]), alpha=0.05
    ).collect()}
    assert out == {"s0": True, "s1": False, "s2": False, "s3": False}


def test_bh_none_rejected(spark):
    out = drift.bh_reject(_pframe(spark, [0.3, 0.5, 0.9]), alpha=0.05)
    assert out.where(F.col("reject")).count() == 0


def test_bh_tie_group_shares_fate(spark):
    # p = [.02, .02] at α=.03: rank 1 fails its own threshold (.015),
    # rank 2 passes (.03) → step-up rejects both
    out = drift.bh_reject(_pframe(spark, [0.02, 0.02]), alpha=0.03)
    assert all(r.reject for r in out.collect())


# ------------------------------------------------------- drift_fdr e2e


def _stable_hist(spark, sources, n_per_bucket=100, buckets=10):
    rows = [(s, b, n_per_bucket) for s in sources for b in range(buckets)]
    return spark.createDataFrame(rows, HIST_SCHEMA)


def test_drift_fdr_flags_only_planted_shift(spark):
    sources = [f"src_{i:02d}" for i in range(40)]
    hist = _stable_hist(spark, sources[:-1])
    # the planted source: all mass collapsed into bucket 0
    shifted = spark.createDataFrame([(sources[-1], 0, 1000)], HIST_SCHEMA)
    hist = hist.unionByName(shifted)
    base = spark.createDataFrame([(None, b, 4000) for b in range(10)], HIST_SCHEMA).select(
        F.col("bucket"), F.col("cnt")
    )
    out = drift.drift_fdr(hist, base, alpha=0.05)
    rows = {r.source: r for r in out.collect()}
    assert rows[sources[-1]].drift_verdict == "fail"
    assert rows[sources[-1]].p_value < 1e-6
    stable = [r for s, r in rows.items() if s != sources[-1]]
    assert all(r.drift_verdict == "pass" for r in stable)
    # identical proportions → ks = 0 → p = 1 on every stable source
    assert all(r.p_value == 1.0 for r in stable)
    assert {r.n_tests for r in rows.values()} == {40}
    assert rows[sources[-1]].base_n == 40000 and rows[sources[-1]].n == 1000


def test_drift_fdr_stable_corpus_zero_rejects(spark):
    hist = _stable_hist(spark, [f"s{i}" for i in range(20)])
    base = spark.createDataFrame(
        [(b, 2000) for b in range(10)], "bucket int, cnt bigint"
    )
    out = drift.drift_fdr(hist, base, alpha=0.05)
    assert out.where(F.col("drift_verdict") == "fail").count() == 0


def test_drift_pvalues_per_source_baseline_sizes(spark):
    hist = _stable_hist(spark, ["a", "b"], n_per_bucket=50)
    base = _stable_hist(spark, ["a", "b"], n_per_bucket=200)
    out = {r.source: r for r in drift.drift_pvalues(hist, base).collect()}
    assert out["a"].n == 500 and out["a"].base_n == 2000
    assert out["a"].p_value == 1.0  # identical proportions


# ----------------------------------------------------- chi² mix shift


def test_chi2_sf_published_critical_values():
    # χ² upper critical values at α=.05: dof 1→3.841, 2→5.991,
    # 5→11.070, 10→18.307 (published tables)
    p = drift.chi2_sf_arrays(
        np.array([3.841, 5.991, 11.070, 18.307]), np.array([1.0, 2.0, 5.0, 10.0])
    )
    assert np.all(np.abs(p - 0.05) < 0.001)
    # α=.01 spot check: dof 1 → 6.635
    assert abs(drift.chi2_sf_arrays(np.array([6.635]), np.array([1.0]))[0] - 0.01) < 0.001
    # edges
    assert drift.chi2_sf_arrays(np.array([0.0]), np.array([3.0]))[0] == 1.0
    assert drift.chi2_sf_arrays(np.array([1000.0]), np.array([1.0]))[0] < 1e-12


def test_mix_shift_hand_computed(spark):
    # obs [60, 40] vs baseline proportions [.5, .5]: χ² = 4, dof = 1,
    # p = Q(1/2, 2) ≈ 0.0455
    obs = spark.createDataFrame([("a", 60), ("b", 40)], "source string, cnt bigint")
    base = spark.createDataFrame([("a", 500), ("b", 500)], "source string, cnt bigint")
    row = drift.source_mix_shift(obs, base).collect()[0]
    assert abs(row.chi2 - 4.0) < 1e-9
    assert row.dof == 1
    assert abs(row.p_value - 0.0455) < 0.001
    assert row.mix_verdict == "fail"
    assert row.n == 100 and row.base_n == 1000


def test_mix_shift_stable_and_novel(spark):
    stable = spark.createDataFrame(
        [(f"s{i}", "x") for i in range(300) for _ in (0,)], "source string, v string"
    )
    # raw-row inputs, identical mixes → χ² = 0, p = 1
    row = drift.source_mix_shift(stable, stable).collect()[0]
    assert row.chi2 == 0.0 and row.p_value == 1.0 and row.mix_verdict == "pass"
    # novel category in obs → degenerate, p = 0
    novel = stable.unionByName(
        spark.createDataFrame([("brand_new", "x")], "source string, v string")
    )
    row = drift.source_mix_shift(novel, stable).collect()[0]
    assert row.p_value == 0.0 and row.mix_verdict == "fail"


def test_mix_shift_null_key_is_a_category(spark):
    obs = spark.createDataFrame(
        [(None, 50), ("a", 50)], "source string, cnt bigint"
    )
    base = spark.createDataFrame(
        [(None, 500), ("a", 500)], "source string, cnt bigint"
    )
    row = drift.source_mix_shift(obs, base).collect()[0]
    assert row.chi2 == 0.0 and row.mix_verdict == "pass"


# ------------------------------------------------- review-fix regressions


def test_gammainc_converges_at_large_dof():
    """Review fix: the fixed-256-iteration series diverged for
    dof ≳ 2·10^4 — the budget now scales with √a. Pins: sf at the
    mean for huge dof ≈ just under 0.5 (Wilson–Hilferty cross-check),
    monotonicity in x."""
    p = drift.chi2_sf_arrays(
        np.array([20000.0, 100000.0]), np.array([20000.0, 99999.0])
    )
    assert abs(p[0] - 0.4987) < 1e-3
    assert abs(p[1] - 0.4985) < 1e-3
    xs = np.linspace(19000.0, 21000.0, 41)
    vals = drift.chi2_sf_arrays(xs, np.full_like(xs, 20000.0))
    assert np.all(np.diff(vals) < 0)


def test_drift_fdr_restrict_to_prevents_family_contamination(spark):
    """Review fix: baseline-only sources (p=0) must leave the BH family
    BEFORE the step-up — their ranks would otherwise loosen every real
    source's threshold. Fixture: one borderline source (p ≈ 0.036, not
    rejectable in a 2-test family at α=.05) plus 30 vanished baseline
    sources whose p=0 rows would push it over the line."""
    # source A: identical to its baseline; source B: CDF sup-gap 0.063
    a_hist = [("A", b, 100) for b in range(10)]
    b_hist = [("B", 0, 163), ("B", 1, 37)] + [("B", b, 100) for b in range(2, 10)]
    hist = spark.createDataFrame(a_hist + b_hist, HIST_SCHEMA)
    base = spark.createDataFrame(
        [(s, b, 100) for s in ["A", "B"] + [f"gone{i}" for i in range(30)]
         for b in range(10)],
        HIST_SCHEMA,
    )
    observed = hist.select("source").distinct()
    ok = drift.drift_fdr(hist, base, alpha=0.05, restrict_to=observed)
    rows = {r.source: r for r in ok.collect()}
    assert set(rows) == {"A", "B"}
    assert 0.026 < rows["B"].p_value < 0.048  # genuinely borderline
    assert rows["B"].n_tests == 2
    assert not rows["B"].reject
    # without the restriction the vanished sources contaminate the
    # family: n_tests=32 and the borderline source flips to rejected
    bad = {r.source: r for r in drift.drift_fdr(hist, base, alpha=0.05).collect()}
    assert bad["B"].n_tests == 32
    assert bad["B"].reject


def test_kolmogorov_critical_inverse():
    # published critical λ at common α
    assert abs(drift.kolmogorov_critical(0.05) - 1.358) < 0.002
    assert abs(drift.kolmogorov_critical(0.01) - 1.628) < 0.002
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        drift.kolmogorov_critical(0.0)


def test_min_detectable_ks_power_disclosure(spark):
    big = _stable_hist(spark, ["big"], n_per_bucket=10_000)   # n = 100k
    tiny = spark.createDataFrame([("tiny", 0, 50)], HIST_SCHEMA)  # n = 50
    hist = big.unionByName(tiny)
    base = spark.createDataFrame(
        [(b, 100_000) for b in range(10)], "bucket int, cnt bigint"
    )
    out = {r.source: r for r in drift.drift_pvalues(hist, base).collect()}
    # D_min ≈ λ/√n when base_n ≫ n: 1.358/√50 ≈ 0.192; 1.358/√1e5 ≈ 0.0043
    assert 0.15 < out["tiny"].min_detectable_ks < 0.25
    assert out["big"].min_detectable_ks < 0.006


# -------------------------------------------------- PSI decomposition


def test_drift_contributions_localize_planted_shift(spark):
    # baseline uniform over 4 buckets; the source moved bucket 0's
    # mass into bucket 3 — the decomposition must name exactly those
    # two buckets, with directions
    hist = spark.createDataFrame(
        [("s0", 1, 100), ("s0", 2, 100), ("s0", 3, 200)], HIST_SCHEMA
    )
    base = spark.createDataFrame(
        [(b, 100) for b in range(4)], "bucket int, cnt bigint"
    )
    out = drift.drift_contributions(hist, base, top_k=2).collect()
    got = {(r.bucket, r.direction) for r in out}
    assert got == {(0, "lost"), (3, "gained")}
    assert all(r.psi_term > 0 for r in out)
    top = max(out, key=lambda r: r.psi_term)
    assert abs(top.share_now - (0.5 if top.bucket == 3 else 0.0)) < 1e-12


def test_drift_contributions_sum_to_psi(spark):
    # full decomposition (top_k=None) sums to drift_metrics' psi under
    # the same epsilon clamps — the losslessness pin
    sources = [f"s{i}" for i in range(3)]
    hist = _stable_hist(spark, sources[:2])
    hist = hist.unionByName(
        spark.createDataFrame(
            [("s2", b, (b + 1) * 37) for b in range(10)], HIST_SCHEMA
        )
    )
    base = spark.createDataFrame(
        [(b, 500 + 13 * b) for b in range(10)], "bucket int, cnt bigint"
    )
    psi = {r.source: r.psi for r in drift.drift_metrics(hist, base).collect()}
    contrib = drift.drift_contributions(hist, base, top_k=None).collect()
    import collections

    sums: dict = collections.defaultdict(float)
    for r in contrib:
        sums[r.source] += r.psi_term
    for s in sources:
        assert abs(sums[s] - psi[s]) < 1e-9


def test_drift_contributions_restrict_and_topk(spark):
    hist = _stable_hist(spark, ["a", "b"])
    base = spark.createDataFrame(
        [(b, 100) for b in range(10)], "bucket int, cnt bigint"
    )
    only_a = spark.createDataFrame([("a",)], "source string")
    out = drift.drift_contributions(hist, base, top_k=3, restrict_to=only_a)
    rows = out.collect()
    assert {r.source for r in rows} == {"a"} and len(rows) == 3


def test_drift_fdr_pass_writes_bucket_decomposition(spark, tmp_path):
    from teleharvest_spark.cli import drift_fdr_pass

    sources = [f"src_{i:02d}" for i in range(10)]
    hist = _stable_hist(spark, sources[:-1])
    hist = hist.unionByName(
        spark.createDataFrame([(sources[-1], 0, 1000)], HIST_SCHEMA)
    )
    # per-source stored baseline (uniform for every source): a pooled
    # global baseline would be contaminated by the planted shift and
    # legitimately reject every source
    base = _stable_hist(spark, sources)
    rep = drift_fdr_pass(
        spark, None, str(tmp_path), "r1", alpha=0.05,
        baseline_hist=base, hist=hist,
    )
    assert rep["drift_fdr_rejected"] == 1
    assert rep["drift_buckets_rows"] == 5
    stored = spark.read.parquet(str(tmp_path / "drift_buckets" / "r1"))
    assert {r.source for r in stored.collect()} == {sources[-1]}
    # bucket 0 gained everything — it must head the decomposition
    top = stored.orderBy(F.col("psi_term").desc()).first()
    assert top.bucket == 0 and top.direction == "gained"


def test_drift_contributions_new_source_mirrors_infinite_psi(spark):
    # a source absent from the per-source baseline: psi = inf in
    # drift_metrics — the decomposition must carry inf terms (sum ≡
    # psi at inf), not finite eps-clamped ones
    hist = spark.createDataFrame(
        [("new", 2, 300), ("new", 7, 100), ("old", 0, 100)], HIST_SCHEMA
    )
    base = spark.createDataFrame(
        [("old", 0, 100)], HIST_SCHEMA
    )
    psi = {r.source: r.psi for r in drift.drift_metrics(hist, base).collect()}
    assert psi["new"] == float("inf")
    rows = [
        r for r in drift.drift_contributions(hist, base, top_k=None).collect()
        if r.source == "new"
    ]
    inf_rows = [r for r in rows if r.psi_term == float("inf")]
    assert {r.bucket for r in inf_rows} == {2, 7}
    assert all(r.direction == "gained" for r in inf_rows)
    # heaviest bucket first among the inf ties
    top = drift.drift_contributions(hist, base, top_k=1).where(
        F.col("source") == "new"
    ).first()
    assert top.bucket == 2


def test_drift_fdr_pass_zero_reject_replay_overwrites_buckets(spark, tmp_path):
    from teleharvest_spark.cli import drift_fdr_pass

    sources = [f"s{i}" for i in range(6)]
    base = _stable_hist(spark, sources)
    shifted = _stable_hist(spark, sources[:-1]).unionByName(
        spark.createDataFrame([(sources[-1], 0, 1000)], HIST_SCHEMA)
    )
    rep1 = drift_fdr_pass(spark, None, str(tmp_path), "r1", alpha=0.05,
                          baseline_hist=base, hist=shifted)
    assert rep1["drift_buckets_rows"] == 5
    # replay the SAME run_id on fixed (stable) data: the stale
    # decomposition must be overwritten with an empty table
    rep2 = drift_fdr_pass(spark, None, str(tmp_path), "r1", alpha=0.05,
                          baseline_hist=base, hist=base)
    assert rep2["drift_fdr_rejected"] == 0
    assert rep2["drift_buckets_rows"] == 0
    stored = spark.read.parquet(str(tmp_path / "drift_buckets" / "r1"))
    assert stored.count() == 0
