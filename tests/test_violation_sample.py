"""Bounded violation sampling (plans/suite.sample_violations): the
written diagnostic is capped per (source, check) by a deterministic
content-hash sample while the verdicts keep EXACT counts — the guard
against a systematic failure writing a corpus-sized violations table
at 10^12 rows."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from teleharvest_spark import datagen
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.plans import suite as suite_plan


def _suite():
    # min_n_tok high enough that a large fraction of every source
    # fails too_short — the systematic-failure shape
    return CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
        min_n_tok=600,
    )


def _rows(df):
    return {
        (r["doc_id"], r["source"], r["check_name"], r["reason"])
        for r in df.collect()
    }


def test_cap_bounds_groups_and_preserves_small_ones(spark):
    check = _suite()
    seqs = datagen.generate_sequences(spark, 6000, check)
    full = suite_plan.run_suite(seqs, check)
    capped = suite_plan.run_suite(seqs, check, violation_sample=7)

    full_counts = {
        (r["source"], r["check_name"]): r["n"]
        for r in full.violations.groupBy("source", "check_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cap_counts = {
        (r["source"], r["check_name"]): r["n"]
        for r in capped.violations.groupBy("source", "check_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert any(n > 7 for n in full_counts.values())  # non-vacuous
    # every group capped at 7; groups under the cap kept complete
    assert set(cap_counts) == set(full_counts)
    for g, n_full in full_counts.items():
        assert cap_counts[g] == min(n_full, 7)
    # the sampled rows are a SUBSET of the real violations
    assert _rows(capped.violations) <= _rows(full.violations)
    full.cleanup()
    capped.cleanup()


def test_verdicts_identical_under_cap(spark):
    """Exact per-check counts and every verdict column must be
    untouched by the cap — sampling changes only what is written."""
    check = _suite()
    seqs = datagen.generate_sequences(spark, 6000, check)
    full = suite_plan.run_suite(seqs, check, drift_vs_global=True)
    capped = suite_plan.run_suite(
        seqs, check, drift_vs_global=True, violation_sample=3
    )
    cols = sorted(full.verdicts.columns)

    def snap(res):
        return sorted(
            tuple(r[c] for c in cols) for r in res.verdicts.collect()
        )

    assert snap(full) == snap(capped)
    full.cleanup()
    capped.cleanup()


def test_sample_deterministic_under_partitioning(spark):
    check = _suite()
    seqs = datagen.generate_sequences(spark, 6000, check)
    a = suite_plan.run_suite(seqs.repartition(3), check, violation_sample=5)
    b = suite_plan.run_suite(seqs.repartition(17), check, violation_sample=5)
    assert _rows(a.violations) == _rows(b.violations)
    a.cleanup()
    b.cleanup()


def test_cli_violation_sample_report(spark, tmp_path, capsys):
    from teleharvest_spark import cli

    check = _suite()
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 6000, check).write.parquet(inp)
    sj = tmp_path / "suite.json"
    sj.write_text(
        json.dumps(
            {
                "min_n_tok": 600,
                "banned_tokens": list(datagen.BANNED_IDS),
                "allowed_sources": list(datagen.SOURCES),
            }
        )
    )
    out = str(tmp_path / "wh")
    rc = cli.main(
        [
            "--input", inp,
            "--output", out,
            "--suite-json", str(sj),
            "--run-id", "r1",
            "--violation-sample", "4",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # exact total reported, bounded subset written
    assert rep["violation_sample"] == 4
    assert rep["violations_written"] < rep["violations"]
    written = spark.read.parquet(f"{out}/violations")
    assert written.count() == rep["violations_written"]
    per_group = (
        written.groupBy("source", "check_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert per_group <= 4
    # verdicts carry the exact counts the written set no longer does
    verd = spark.read.parquet(f"{out}/verdicts/r1")
    assert (
        verd.agg(F.sum("violation_rows")).first()[0] == rep["violations"]
    )
