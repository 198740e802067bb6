"""Cross-run metric anomaly detection (plans/history.py).

The manifest accumulates one metrics map per (partition, run); these
tests build small histories in memory and pin the band semantics:
z-score and relative-change detectors, direction gating, min-history
gating, constant-history (std = 0) behavior, default rules for unknown
metrics, and first-run silence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from teleharvest_spark.plans import history as H
from teleharvest_spark.schema import MANIFEST


def _manifest(spark, rows):
    """rows: (partition, run, {metric: value})"""
    data = [
        (p, hash((p, r)) % (1 << 40), f"flh_{p}_{r}", "suite0", "pass", m, r)
        for p, r, m in rows
    ]
    return spark.createDataFrame(data, MANIFEST)


def _report(df, run_id, **kw):
    return {
        (r["partition"], r["metric"]): r.asDict()
        for r in H.anomaly_report(df, run_id, **kw).collect()
    }


def test_zscore_fires_on_spike_and_stable_partition_silent(spark):
    rows = []
    for i, v in enumerate([0.010, 0.012, 0.011, 0.009]):
        rows.append(("a", f"r{i}", {"null_rate": v, "row_count": 1000.0 + i}))
        rows.append(("b", f"r{i}", {"null_rate": v, "row_count": 1000.0 + i}))
    rows.append(("a", "cur", {"null_rate": 0.2, "row_count": 1004.0}))
    rows.append(("b", "cur", {"null_rate": 0.0105, "row_count": 1004.0}))
    rep = _report(_manifest(spark, rows), "cur")
    assert rep[("a", "null_rate")]["anomaly"] is True
    assert "zscore" in rep[("a", "null_rate")]["reason"]
    assert rep[("a", "null_rate")]["hist_n"] == 4
    assert rep[("b", "null_rate")]["anomaly"] is False
    # row_count GROWTH is not an anomaly (lower-direction rule)
    assert rep[("a", "row_count")]["anomaly"] is False


def test_rel_change_fires_on_row_count_drop_not_growth(spark):
    rows = [("a", f"r{i}", {"row_count": float(v)})
            for i, v in enumerate([1000, 1010, 990])]
    m = _manifest(spark, rows + [("a", "cur", {"row_count": 400.0})])
    rep = _report(m, "cur")
    assert rep[("a", "row_count")]["anomaly"] is True
    assert "rel_change" in rep[("a", "row_count")]["reason"]
    m2 = _manifest(spark, rows + [("a", "cur", {"row_count": 2000.0})])
    assert _report(m2, "cur")[("a", "row_count")]["anomaly"] is False


def test_constant_history_rel_detector_covers_std_zero(spark):
    """null_rate 0.0 for every prior run, 0.05 today: the z-score is
    undefined (std = 0) and the relative detector must carry the case
    (mean 0 ⇒ unbounded relative change)."""
    rows = [("a", f"r{i}", {"null_rate": 0.0}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"null_rate": 0.05})])
    r = _report(m, "cur")[("a", "null_rate")]
    assert r["anomaly"] is True and "rel_change" in r["reason"]
    assert r["zscore"] is None


def test_min_history_gates_both_detectors(spark):
    rows = [("a", "r0", {"null_rate": 0.01}), ("a", "r1", {"null_rate": 0.01})]
    m = _manifest(spark, rows + [("a", "cur", {"null_rate": 0.9})])
    assert _report(m, "cur")[("a", "null_rate")]["anomaly"] is False


def test_first_run_and_novel_partition_silent(spark):
    m = _manifest(spark, [("new", "cur", {"null_rate": 0.5, "row_count": 10.0})])
    rep = _report(m, "cur")
    assert all(not r["anomaly"] for r in rep.values())
    assert rep[("new", "null_rate")]["hist_n"] == 0


def test_unknown_metric_takes_default_rule(spark):
    rows = [("a", f"r{i}", {"custom_metric": 5.0 + 0.1 * i}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"custom_metric": 50.0})])
    r = _report(m, "cur")[("a", "custom_metric")]
    # default rule: both directions, zscore 3, no rel detector
    assert r["anomaly"] is True and "zscore" in r["reason"]
    m2 = _manifest(spark, rows + [("a", "cur", {"custom_metric": -50.0})])
    assert _report(m2, "cur")[("a", "custom_metric")]["anomaly"] is True


def test_suite_hash_filter_and_custom_rules(spark):
    rows = [("a", f"r{i}", {"null_rate": 0.01}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"null_rate": 0.05})])
    # history pinned to a different suite hash -> no band -> silent
    rep = _report(m, "cur", suite_hash="other_suite")
    assert rep == {}  # current row itself filtered out too
    # tighter custom rule fires where the default would
    tight = {"null_rate": H.AnomalyRule("upper", 1.0, 0.5, min_history=2)}
    assert _report(m, "cur", rules=tight)[("a", "null_rate")]["anomaly"] is True


def test_anomaly_verdicts_rollup(spark):
    rows = []
    for i, v in enumerate([0.01, 0.012, 0.011]):
        rows.append(("a", f"r{i}", {"null_rate": v, "row_count": 1000.0}))
        rows.append(("b", f"r{i}", {"null_rate": v, "row_count": 1000.0}))
    rows.append(("a", "cur", {"null_rate": 0.4, "row_count": 100.0}))
    rows.append(("b", "cur", {"null_rate": 0.011, "row_count": 1000.0}))
    rep = H.anomaly_report(_manifest(spark, rows), "cur")
    verd = {r["partition"]: r.asDict() for r in H.anomaly_verdicts(rep).collect()}
    assert verd["a"]["history_verdict"] == "anomalous"
    assert verd["a"]["anomalous_metrics"] == 2
    assert sorted(verd["a"]["flagged"]) == ["null_rate", "row_count"]
    assert verd["b"]["history_verdict"] == "normal" and verd["b"]["flagged"] == []


def test_metrics_history_shape(spark):
    m = _manifest(spark, [("a", "r0", {"x": 1.0, "y": 2.0})])
    got = {(r["partition"], r["metric"], r["value"])
           for r in H.metrics_history(m).collect()}
    assert got == {("a", "x", 1.0), ("a", "y", 2.0)}


def test_viol_prefix_absent_is_zero_flags_fresh_check(spark):
    """A check that NEVER fired in 4 prior runs (key absent from every
    metrics map = observed 0) and fires 50 times today must flag — the
    zero-filled band, not an empty history."""
    rows = [("a", f"r{i}", {"row_count": 1000.0}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"row_count": 1000.0,
                                               "viol_null_payload": 50.0})])
    r = _report(m, "cur")[("a", "viol_null_payload")]
    assert r["anomaly"] is True and "rel_change" in r["reason"]
    assert r["hist_n"] == 4 and r["hist_mean"] == 0.0
    assert r["hist_min"] == 0.0 and r["hist_max"] == 0.0


def test_viol_prefix_zero_fill_rebases_partial_history(spark):
    """Key present in SOME prior runs: the band averages over all runs
    with zeros filled for the clean ones, and a stable recurrence does
    not flag while a surge does."""
    rows = [
        ("a", "r0", {"viol_banned_token": 10.0}),
        ("a", "r1", {}),  # clean run: key absent = 0
        ("a", "r2", {"viol_banned_token": 8.0}),
        ("a", "r3", {"viol_banned_token": 6.0}),
    ]
    m = _manifest(spark, rows + [("a", "cur", {"viol_banned_token": 9.0})])
    r = _report(m, "cur")[("a", "viol_banned_token")]
    assert r["hist_n"] == 4 and r["hist_mean"] == 6.0  # (10+0+8+6)/4
    assert r["hist_min"] == 0.0
    assert r["anomaly"] is False  # 9 is inside both bands
    m2 = _manifest(spark, rows + [("a", "cur", {"viol_banned_token": 200.0})])
    assert _report(m2, "cur")[("a", "viol_banned_token")]["anomaly"] is True


def test_viol_prefix_improvement_never_flags(spark):
    rows = [("a", f"r{i}", {"viol_too_short": 100.0}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"viol_too_short": 0.5})])
    # upper-direction family rule: failures FALLING is an improvement
    assert _report(m, "cur")[("a", "viol_too_short")]["anomaly"] is False


def test_exact_rule_wins_over_prefix(spark):
    rows = [("a", f"r{i}", {"viol_x": 10.0 + i}) for i in range(4)]
    m = _manifest(spark, rows + [("a", "cur", {"viol_x": 0.0})])
    # exact lower-direction rule overrides the upper-only family rule
    lower = {"viol_x": H.AnomalyRule("lower", 3.0, 0.5)}
    assert _report(m, "cur", rules=lower)[("a", "viol_x")]["anomaly"] is True
    assert _report(m, "cur")[("a", "viol_x")]["anomaly"] is False
