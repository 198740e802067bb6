"""Embedding-payload validation (operators/embcheck.py)."""

from __future__ import annotations

import math

from teleharvest_spark.operators import embcheck


def _fixture(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], "a"),
        (2, None, "a"),                      # null_vector
        (3, [], "a"),                        # empty_vector
        (4, [1.0, 2.0], "a"),                # wrong_dim (dim=3)
        (5, [1.0, float("nan"), 2.0], "b"),  # nonfinite (NaN)
        (6, [float("inf"), 0.0, 0.0], "b"),  # nonfinite (Inf)
        (7, [0.0, 0.0, 0.0], "b"),           # zero_norm
        # wrong dim AND NaN: cascade order → wrong_dim reported
        (8, [float("nan")], "b"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, source string"
    )


def test_validate_embeddings_first_fail(spark):
    df = _fixture(spark)
    got = {
        r["vec_id"]: (r["check_name"], r["reason"])
        for r in embcheck.validate_embeddings(df, dim=3).collect()
    }
    assert 1 not in got
    assert got[2] == ("null_vector", "embedding is NULL")
    assert got[3] == ("empty_vector", "embedding is empty")
    assert got[4] == ("wrong_dim", "dim=2 != 3")
    assert got[5] == ("nonfinite_element", "1 non-finite element(s)")
    assert got[6] == ("nonfinite_element", "1 non-finite element(s)")
    assert got[7] == ("zero_norm", "all-zero vector")
    assert got[8][0] == "wrong_dim"


def test_null_element_is_caught_not_waved_through(spark):
    """A NULL element makes every numeric predicate three-valued
    (isnan(NULL) is NULL → exists() is NULL → cascade coalesce would
    pass the row through EVERY check) — the null_element check must
    catch it first, and with the exact count."""
    df = spark.createDataFrame(
        [
            (1, [1.0, None, 2.0]),
            (2, [None, None, None]),
            (3, [1.0, 2.0, 3.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["check_name"], r["reason"])
        for r in embcheck.validate_embeddings(df, dim=3).collect()
    }
    assert got[1] == ("null_element", "1 NULL element(s)")
    assert got[2] == ("null_element", "3 NULL element(s)")
    assert 3 not in got
    stats = embcheck.embedding_stats(df, dim=3).collect()[0]
    assert stats["n_null_element"] == 2 and stats["n_violations"] == 2


def test_embedding_stats_counts(spark):
    df = _fixture(spark)
    per_src = {
        r["source"]: r.asDict()
        for r in embcheck.embedding_stats(df, dim=3, key="source").collect()
    }
    a, b = per_src["a"], per_src["b"]
    assert (a["n_rows"], a["n_null_vector"], a["n_empty_vector"], a["n_wrong_dim"]) == (4, 1, 1, 1)
    assert a["n_violations"] == 3
    assert (b["n_rows"], b["n_nonfinite"], b["n_zero_norm"], b["n_wrong_dim"]) == (4, 2, 1, 1)
    assert b["n_violations"] == 4
    glob = embcheck.embedding_stats(df, dim=3).collect()[0]
    assert glob["n_rows"] == 8 and glob["n_violations"] == 7


def test_embedding_checks_optional_parts(spark):
    """dim=None skips the dim check; forbid_zero_norm=False lets
    all-zero vectors pass — and a NaN norm is never reported as zero."""
    df = _fixture(spark)
    got = {
        r["vec_id"]: r["check_name"]
        for r in embcheck.validate_embeddings(
            df, dim=None, forbid_zero_norm=False
        ).collect()
    }
    assert 4 not in got and 7 not in got          # dim + zero-norm off
    assert got[8] == "nonfinite_element"          # NaN now first to fire
    assert got[2] == "null_vector"


def test_real_embeddings_table_clean(spark):
    """The synthetic embeddings fixture is well-formed: the validator
    agrees (0 violations at dim 64) — the real-testdata front door."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = embcheck.embedding_stats(df, dim=64).collect()[0]
    assert stats["n_rows"] == df.count()
    assert stats["n_violations"] == 0
