"""Suite suggestion (plans/suggest.py): one-pass profile → bootstrap
CheckSuite whose thresholds pass today's data with headroom, JSON
round-trips through cli.build_suite, CLI writes the overrides file."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.plans import suggest as sg
from teleharvest_spark.plans import suite as suite_plan


def _clean(spark, n=5000):
    """Deterministic clean table: n_tok uniform 10..100, ids in
    [0, 500), 4 sources."""
    df = spark.range(n)
    n_tok = (F.abs(F.xxhash64("id", F.lit(1))) % 91 + 10).cast("int")
    return (
        df.withColumn("n_tok", n_tok)
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda j: (F.abs(F.xxhash64(F.col("id"), j)) % 500).cast("int"),
            ),
        )
        .withColumn(
            "source",
            F.concat(
                F.lit("s"), (F.abs(F.xxhash64("id", F.lit(2))) % 4).cast("string")
            ),
        )
        .withColumn("doc_id", F.concat(F.lit("d"), F.col("id")))
        .select("doc_id", "tokens", "n_tok", "source")
    )


def test_suggested_suite_passes_clean_data(spark):
    df = _clean(spark)
    suite, overrides = sg.suggest_suite(df)
    assert suite.min_n_tok == 10
    assert suite.max_n_tok >= 100  # headroom above the observed max
    assert suite.vocab_size is not None and 400 < suite.vocab_size <= 500
    assert suite.forbid_null_token is True
    assert suite.allowed_sources == ("s0", "s1", "s2", "s3")
    assert suite.min_distinct_frac is not None
    assert suite.max_token_run is not None
    res = suite_plan.run_suite(df, suite)
    assert res.violations.count() == 0
    res.cleanup()
    # overrides are the JSON form of exactly the suggested fields
    assert overrides["min_n_tok"] == 10
    assert overrides["allowed_sources"] == ["s0", "s1", "s2", "s3"]


def test_vocab_omitted_on_negative_ids_and_null_elements_detected(spark):
    df = spark.createDataFrame(
        [
            ("d1", [1, -5, 3], 3, "a"),
            ("d2", [2, None, 4], 3, "a"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    suite, overrides = sg.suggest_suite(df)
    assert suite.vocab_size is None
    assert "vocab_size" not in overrides
    assert suite.forbid_null_token is False


def test_source_cap_leaves_allowed_open(spark):
    df = _clean(spark).withColumn(
        "source", F.concat(F.lit("u"), F.col("doc_id"))
    )
    suite, overrides = sg.suggest_suite(df, source_cap=10)
    assert suite.allowed_sources == ()
    assert "allowed_sources" not in overrides


def test_cli_suggest_roundtrip(spark, tmp_path, capsys):
    from teleharvest_spark import cli

    inp = str(tmp_path / "seqs")
    _clean(spark).write.parquet(inp)
    out_json = str(tmp_path / "suite.json")
    rc = cli.main(
        [
            "--input", inp,
            "--output", str(tmp_path / "wh"),
            "--run-id", "r1",
            "--suggest-suite", out_json,
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["suite"]["min_n_tok"] == 10
    assert rep["evidence"]["rows"] == 5000
    # the written overrides feed straight back into a validation run
    suite = cli.build_suite(out_json)
    assert suite.min_n_tok == 10
    assert suite.allowed_sources == ("s0", "s1", "s2", "s3")
    assert suite.suite_hash() == rep["suite_hash"]
