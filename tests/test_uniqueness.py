from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark.operators import uniqueness


def test_duplicate_keys_matches_naive_semantics(spark, sequences):
    got = {
        r["doc_id"]: r["dup_count"]
        for r in uniqueness.duplicate_keys(sequences, key="doc_id").collect()
    }
    plain = {
        r["doc_id"]: r["cnt"]
        for r in sequences.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .collect()
    }
    assert got == plain
    assert len(got) > 0  # datagen plants ~0.1% dups


def test_salted_partials_merge_to_exact_counts(spark, sequences):
    """The opt-in salted phase (for non-algebraic aggregates) must
    merge back to the exact per-key counts."""
    merged = {
        r["doc_id"]: r["n"]
        for r in uniqueness.salted_partial_counts(sequences, key="doc_id")
        .groupBy("doc_id")
        .agg(F.sum("_partial").alias("n"))
        .where(F.col("n") > 1)
        .collect()
    }
    plain = {
        r["doc_id"]: r["dup_count"]
        for r in uniqueness.duplicate_keys(sequences, key="doc_id").collect()
    }
    assert merged == plain


def test_violations_cover_every_row_of_dup_keys(spark):
    df = spark.createDataFrame(
        [
            ("k1", [1], 1, "a"),
            ("k1", [2], 1, "b"),
            ("k1", [3], 1, "a"),
            ("k2", [4], 1, "a"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    v = uniqueness.uniqueness_violations(df, key="doc_id").collect()
    assert len(v) == 3  # all three k1 rows, not just the extras
    assert all(r["doc_id"] == "k1" for r in v)
    assert all(r["reason"] == "doc_id seen 3 times" for r in v)
    # token arrays preserved per-row
    assert sorted(tuple(r["tokens"]) for r in v) == [(1,), (2,), (3,)]


def test_no_false_positives(spark):
    df = spark.createDataFrame(
        [(f"k{i}", [i], 1, "a") for i in range(50)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    assert uniqueness.duplicate_keys(df).count() == 0
