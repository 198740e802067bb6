"""Declarative custom checks (CheckSuite.custom_checks): arbitrary SQL
boolean predicates composed into the cascade — TRUE fails, NULL passes,
built-in precedence preserved, suite-hash sensitive."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators import cascade
from teleharvest_spark.plans import suite as suite_plan


def _df(spark):
    return spark.createDataFrame(
        [
            ("d1", [1, 2, 3], 3, "src_00"),      # clean
            ("d2", [7, 7, 7, 7], 4, "src_00"),   # fails custom all_same
            ("d3", None, None, "src_00"),        # fails null_payload first
            ("d4", [5], 1, None),                # NULL source: custom NULL → pass
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def test_custom_check_flags_and_precedence(spark):
    suite = CheckSuite(
        min_n_tok=1,
        custom_checks=(
            ("all_same_token", "size(array_distinct(tokens)) = 1 AND size(tokens) > 3"),
            ("odd_source_suffix", "substring(source, -1) = '1'"),
        ),
    )
    out = cascade.apply_cascade(_df(spark), cascade.sequence_checks(suite))
    got = {
        r["doc_id"]: (r[cascade.FIRST_FAIL_COL], r[cascade.REASON_COL])
        for r in out.collect()
    }
    assert got["d1"] == (None, None)
    assert got["d2"][0] == "all_same_token"
    assert "custom:" in got["d2"][1]
    # built-in null_payload wins over any custom check
    assert got["d3"][0] == "null_payload"
    # NULL source → substring(NULL) is NULL → custom check passes;
    # null_key is a built-in and fires first anyway for NULL sources
    assert got["d4"][0] == "null_key"


def test_custom_check_null_result_is_pass(spark):
    df = spark.createDataFrame(
        [("d1", [1], 1, "src_00")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    suite = CheckSuite(
        min_n_tok=1, custom_checks=(("never", "CAST(NULL AS BOOLEAN)"),)
    )
    out = cascade.apply_cascade(df, cascade.sequence_checks(suite))
    assert out.where(F.col(cascade.FIRST_FAIL_COL).isNotNull()).count() == 0


def test_custom_check_name_collision_raises(spark):
    suite = CheckSuite(custom_checks=(("null_payload", "1 = 1"),))
    with pytest.raises(ValueError, match="collides"):
        cascade.sequence_checks(suite)
    dup = CheckSuite(custom_checks=(("x", "1 = 1"), ("x", "2 = 2")))
    with pytest.raises(ValueError, match="collides"):
        cascade.sequence_checks(dup)


def test_suite_hash_covers_custom_checks():
    base = CheckSuite()
    custom = CheckSuite(custom_checks=(("x", "n_tok > 5"),))
    edited = CheckSuite(custom_checks=(("x", "n_tok > 6"),))
    assert base.suite_hash() != custom.suite_hash()
    assert custom.suite_hash() != edited.suite_hash()
    # adding the field didn't change the DEFAULT hash (manifest
    # stability contract: default-valued fields are excluded)
    assert base.suite_hash() == CheckSuite(custom_checks=()).suite_hash()


def test_build_suite_json_roundtrip(tmp_path):
    from teleharvest_spark.cli import build_suite

    p = tmp_path / "suite.json"
    p.write_text(
        json.dumps(
            {
                "min_n_tok": 2,
                "custom_checks": [["dense", "n_tok > 100"]],
                "max_violation_frac": 0.05,
                "check_tolerances": [["banned_token", 0.5]],
            }
        )
    )
    suite = build_suite(str(p))
    assert suite.custom_checks == (("dense", "n_tok > 100"),)
    assert suite.min_n_tok == 2
    assert suite.max_violation_frac == 0.05
    assert suite.check_tolerances == (("banned_token", 0.5),)


def test_run_suite_counts_custom_violations(spark):
    suite = CheckSuite(
        min_n_tok=1,
        custom_checks=(("all_same_token", "size(array_distinct(tokens)) = 1 AND size(tokens) > 3"),),
    )
    res = suite_plan.run_suite(_df(spark), suite)
    by_check = {
        r["check_name"]: r["n"]
        for r in res.violations.groupBy("check_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_check.get("all_same_token") == 1
    verd = {r["source"]: r for r in res.verdicts.collect()}
    assert verd["src_00"]["viol_by_check"]["all_same_token"] == 1
    assert verd["src_00"]["verdict"] == "fail"
    res.cleanup()
