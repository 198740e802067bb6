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


# --- cross-partition key index (resume-scope uniqueness) ---------------

SEQ_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _rows(src, ids):
    return [(d, list(range(20)), 20, src) for d in ids]


def _seq(spark, rows):
    return spark.createDataFrame(rows, SEQ_DDL)


def test_cross_partition_counts_operator(spark, tmp_path):
    out = str(tmp_path / "wh")
    v1 = _seq(spark, _rows("a", ["X", "a1", "a2"]) + _rows("b", ["X", "X", "b1"]))
    uniqueness.write_key_index(v1, out)
    idx = uniqueness.read_key_index(spark, out)
    batch = _seq(spark, _rows("c", ["X", "c1"]))
    got = {
        r["doc_id"]: r["n_stored"]
        for r in uniqueness.cross_partition_counts(batch, idx, ["c"]).collect()
    }
    assert got == {"X": 3}  # 1 in a + 2 in b; c1 is novel
    # pending partitions' own (stale) index rows are excluded
    got_excl = {
        r["doc_id"]: r["n_stored"]
        for r in uniqueness.cross_partition_counts(batch, idx, ["b", "c"]).collect()
    }
    assert got_excl == {"X": 1}
    # folds into duplicate_keys with full-run totals
    dups = uniqueness.duplicate_keys(
        batch, stored_counts=uniqueness.cross_partition_counts(batch, idx, ["c"])
    ).collect()
    assert {(r["doc_id"], r["dup_count"]) for r in dups} == {("X", 4)}


def test_write_key_index_dynamic_overwrite(spark, tmp_path):
    """A re-validated partition atomically REPLACES its index rows
    (dynamic partition overwrite); untouched partitions keep theirs —
    stale counts are impossible."""
    out = str(tmp_path / "wh")
    uniqueness.write_key_index(
        _seq(spark, _rows("a", ["X", "a1"]) + _rows("b", ["b1"])), out
    )
    # 'a' re-validated without X; 'b' absent from this run
    uniqueness.write_key_index(_seq(spark, _rows("a", ["a1", "a2"])), out)
    idx = {
        (r["partition"], r["doc_id"]): r["n"]
        for r in uniqueness.read_key_index(spark, out).collect()
    }
    assert idx == {("a", "a1"): 1, ("a", "a2"): 1, ("b", "b1"): 1}
    # NULL source lands under __null__, empty string under __empty__
    # (hive maps both to the default partition otherwise — they must
    # stay distinct and re-readable)
    uniqueness.write_key_index(
        _seq(spark, _rows(None, ["n1"]) + _rows("", ["e1"])), out
    )
    parts = {
        (r["partition"], r["doc_id"])
        for r in uniqueness.read_key_index(spark, out).collect()
    }
    assert {("__null__", "n1"), ("__empty__", "e1")} <= parts
    # exclusion accepts manifest-domain names ('' verbatim)
    batch = _seq(spark, _rows("x", ["e1"]))
    idx = uniqueness.read_key_index(spark, out)
    assert uniqueness.cross_partition_counts(batch, idx, ["", "x"]).count() == 0
    got = {
        r["doc_id"]: r["n_stored"]
        for r in uniqueness.cross_partition_counts(batch, idx, ["x"]).collect()
    }
    assert got == {"e1": 1}


def test_resume_key_index_full_run_parity(spark, tmp_path):
    """End to end through cli.run: a doc_id duplicated between a NEW
    partition and an already-validated one is flagged on the resume
    run, with the same (doc_id, check_name, reason) rows a full run
    from scratch produces restricted to the pending partition — and
    without --key-index the duplicate passes silently (the documented
    default gap)."""
    from teleharvest_spark import cli
    from teleharvest_spark.config import CheckSuite

    suite = CheckSuite()
    v1 = _rows("src_a", ["X", "a1", "a2"]) + _rows("src_b", ["b1", "b2"])
    v2 = v1 + _rows("src_c", ["X", "c1"])

    inp1, inp2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    _seq(spark, v1).write.parquet(inp1)
    _seq(spark, v2).write.parquet(inp2)

    out = str(tmp_path / "wh")
    r1 = cli.run(spark, inp1, out, suite, run_id="r1", drift=False, key_index=True)
    assert r1["violations"] == 0  # X appears once in v1
    r2 = cli.run(
        spark, inp2, out, suite, run_id="r2", drift=False,
        resume=True, key_index=True,
    )
    assert r2["skipped"] is False and r2["partitions"] == 1  # only src_c pending

    viol = spark.read.parquet(f"{out}/violations").where(
        F.col("source_dir") == "src_c"
    )
    got = {(r["doc_id"], r["check_name"], r["reason"]) for r in viol.collect()}

    # full run from scratch over v2, restricted to src_c
    out_full = str(tmp_path / "wh_full")
    cli.run(spark, inp2, out_full, suite, run_id="f1", drift=False)
    want = {
        (r["doc_id"], r["check_name"], r["reason"])
        for r in spark.read.parquet(f"{out_full}/violations")
        .where(F.col("source_dir") == "src_c")
        .collect()
    }
    assert got == want == {("X", "duplicate_key", "doc_id seen 2 times")}

    # src_c verdict is fail on the resume run
    verd = {
        r["source"]: r["verdict"]
        for r in spark.read.parquet(f"{out}/verdicts/r2").collect()
    }
    assert verd == {"src_c": "fail"}

    # control: same flow WITHOUT key_index misses the cross dup
    out_nk = str(tmp_path / "wh_nokey")
    cli.run(spark, inp1, out_nk, suite, run_id="r1", drift=False)
    r2nk = cli.run(spark, inp2, out_nk, suite, run_id="r2", drift=False, resume=True)
    assert r2nk["violations"] == 0


def test_duplicate_keys_stored_counts_null_safe_fold(spark):
    """Review fix: the stored-count fold joins null-safely — a NULL key
    seen once this run and once in the resume key index is a
    cross-partition duplicate, exactly as a full run would report."""
    from pyspark.sql import functions as F

    from teleharvest_spark.operators import uniqueness

    df = spark.createDataFrame(
        [(None, "a"), ("d1", "a")], "doc_id string, source string"
    )
    stored = spark.createDataFrame(
        [(None, 1), ("d1", 1)], "doc_id string, n_stored int"
    )
    got = {
        r.doc_id: r.dup_count
        for r in uniqueness.duplicate_keys(df, "doc_id", stored_counts=stored).collect()
    }
    assert got == {None: 2, "d1": 2}
