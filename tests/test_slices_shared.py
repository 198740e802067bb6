"""Shared-scan suite+slices (VERDICT r4 item 4): one token decode
serves both the violation materialization and the slice report's
numerator; the denominator is a token-free column-pruned aggregate.
Exactness pins: per-row fail bits (not doc_id joins), violations
byte-identical with and without slice_dims."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from teleharvest_spark import cli, datagen
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.plans import suite as suite_plan


def _suite():
    return CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )


def _gen(spark, tmp_path, n=8000):
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, n, _suite()).write.parquet(inp)
    return inp


def test_combined_slices_match_standalone(spark, tmp_path):
    inp = _gen(spark, tmp_path)
    suite = _suite()
    spec = ("source", "n_tok:64")
    rep = cli.run(
        spark, inp, str(tmp_path / "wh_a"), suite, run_id="r1",
        slice_spec=spec,
    )
    assert rep["slices"]["slices_scored"] > 0
    standalone = cli.slice_pass(
        spark, inp, str(tmp_path / "wh_b"), "r1", spec=spec, suite=suite
    )
    a = (
        spark.read.parquet(f"{tmp_path}/wh_a/slices/run_id=r1")
        .orderBy("slice")
        .collect()
    )
    b = (
        spark.read.parquet(f"{tmp_path}/wh_b/slices/run_id=r1")
        .orderBy("slice")
        .collect()
    )
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["slice"] == rb["slice"]
        assert ra["n"] == rb["n"], ra["slice"]
        assert ra["violations"] == rb["violations"], ra["slice"]
        assert ra["flagged"] == rb["flagged"], ra["slice"]
        assert abs((ra["z"] or 0) - (rb["z"] or 0)) < 1e-9


def test_combined_slices_per_row_exact_on_divergent_dup(spark, tmp_path):
    """A duplicated doc_id whose two rows differ in cascade outcome AND
    land in different dim buckets: the failing row's bucket (only)
    must carry the cascade violation — a failing-ids join would smear
    it over both buckets."""
    suite = _suite()
    rows = [
        ("dup", None, None, "src_00"),               # fails null_payload, band ∅
        ("dup", list(range(120)), 120, "src_00"),    # cascade-clean, band 64
        ("ok1", list(range(130)), 130, "src_00"),
        ("ok2", list(range(140)), 140, "src_00"),
    ]
    inp = str(tmp_path / "seqs")
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).write.parquet(inp)
    spec = ("n_tok:64",)
    cli.run(
        spark, inp, str(tmp_path / "wh_a"), suite, run_id="r1",
        slice_spec=spec, slice_min_support=1,
    )
    cli.slice_pass(
        spark, inp, str(tmp_path / "wh_b"), "r1", spec=spec, suite=suite,
        min_support=1,
    )
    get = lambda p: {
        r["slice"]: (r["n"], r["violations"])
        for r in spark.read.parquet(p).collect()
    }
    a = get(f"{tmp_path}/wh_a/slices/run_id=r1")
    b = get(f"{tmp_path}/wh_b/slices/run_id=r1")
    assert a == b
    # the clean dup row's band (labeled by its inclusive lower edge)
    # has zero CASCADE violations
    assert a["n_tok_band=64"][1] == 0


def test_run_suite_slice_dims_leaves_violations_identical(spark, tmp_path):
    inp = _gen(spark, tmp_path, 6000)
    seqs = spark.read.parquet(inp)
    suite = _suite()
    r1 = suite_plan.run_suite(seqs, suite)
    plain = {
        (r["doc_id"], r["check_name"], r["reason"], tuple(r["tokens"] or []))
        for r in r1.violations.collect()
    }
    r1.cleanup()
    r2 = suite_plan.run_suite(seqs, suite, slice_dims=("source", "n_tok"))
    shared = {
        (r["doc_id"], r["check_name"], r["reason"], tuple(r["tokens"] or []))
        for r in r2.violations.collect()
    }
    # numerator rides the SAME persisted parent: after materializing
    # violations, the failing_dim_rows plan reads the cache, not the
    # parquet fact (the one-decode pin)
    plan = (
        r2.failing_dim_rows._jdf.queryExecution().executedPlan().toString()
    )
    r2.cleanup()
    assert plain == shared and len(plain) > 0
    assert "InMemoryTableScan" in plan, plan
    # the OPERATIVE plan (everything before the cached relation's
    # printed lineage) must be a projection over the cache — no live
    # parquet scan; FileScans after "InMemoryRelation" are just the
    # cache's recorded child plan, which never re-executes
    assert "FileScan" not in plan.split("InMemoryRelation")[0], plan


def test_run_suite_slice_dims_capped_mode_exact_counts(spark, tmp_path):
    """violation_sample + slice_dims: the numerator comes from the
    UNCAPPED narrow key set — counts match an uncapped run."""
    inp = _gen(spark, tmp_path, 6000)
    seqs = spark.read.parquet(inp)
    suite = _suite()
    r_full = suite_plan.run_suite(seqs, suite, slice_dims=("source",))
    full_counts = {
        r["source"]: r["c"]
        for r in r_full.failing_dim_rows.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    r_full.cleanup()
    r_cap = suite_plan.run_suite(
        seqs, suite, slice_dims=("source",), violation_sample=2
    )
    cap_counts = {
        r["source"]: r["c"]
        for r in r_cap.failing_dim_rows.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_written = r_cap.violations.count()
    r_cap.cleanup()
    assert cap_counts == full_counts and sum(full_counts.values()) > 0
    assert n_written < sum(full_counts.values())  # the sample IS capped


def test_slice_spec_refused_under_preflight(spark, tmp_path):
    inp = _gen(spark, tmp_path, 1000)
    with pytest.raises(ValueError, match="slice_spec"):
        cli.run(
            spark, inp, str(tmp_path / "wh"), _suite(), run_id="r1",
            sample_frac=0.5, slice_spec=("source",),
        )


def test_slice_dims_unknown_column_fails_fast(spark, tmp_path):
    inp = _gen(spark, tmp_path, 1000)
    seqs = spark.read.parquet(inp)
    with pytest.raises(ValueError, match="slice_dims"):
        suite_plan.run_suite(seqs, _suite(), slice_dims=("nope",))
    with pytest.raises(ValueError, match="not in table"):
        cli.run(
            spark, inp, str(tmp_path / "wh"), _suite(), run_id="r1",
            slice_spec=("nope",),
        )
