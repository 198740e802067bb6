"""Pins for the round-5 continuation review fixes.

Each test pins one defect surfaced by the full-repo review pass:
NULL-key equality joins dropping the NULL key group the engine
elsewhere treats as a real key value, the stats mirror ignoring
per-source bound overrides, the violation-sample zero-survivor tail,
leave-one-out drift (dominant-source self-masking), the word_psi
phantom empty token, and null-safe histogram alignment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators import drift, uniqueness
from teleharvest_spark.plans import suite as suite_plan

SEQ_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _seq(spark, rows):
    return spark.createDataFrame(rows, SEQ_DDL)


def _row(doc_id, n, src):
    return (doc_id, list(range(n)), n, src)


# ---------------------------------------------------------------- NULL keys


def test_suite_flags_null_doc_id_duplicates(spark):
    """Two NULL-doc_id rows are a duplicate pair: duplicate_keys groups
    NULL as a real key, and the suite's dup join must be null-safe so
    both rows materialize duplicate_key violations (the cascade's
    null_key check guards the source key, not doc_id — uniqueness is
    the only check that can see a NULL doc_id)."""
    suite = CheckSuite(allowed_sources=("a",))
    df = _seq(
        spark,
        [_row(None, 20, "a"), _row(None, 21, "a"), _row("ok", 22, "a")],
    )
    res = suite_plan.run_suite(df, suite)
    viol = res.violations.collect()
    res.cleanup()
    dup = [r for r in viol if r["check_name"] == "duplicate_key"]
    assert len(dup) == 2
    assert all(r["doc_id"] is None for r in dup)
    assert all("seen 2 times" in r["reason"] for r in dup)
    # no other violation class fires for these rows (doc_id is not the
    # cascade's key column; tokens/n_tok/source are all valid)
    assert len(viol) == 2


def test_uniqueness_violations_null_key_rows(spark):
    df = _seq(spark, [_row(None, 20, "a"), _row(None, 20, "a"), _row("x", 20, "a")])
    rows = uniqueness.uniqueness_violations(df).collect()
    assert len(rows) == 2
    assert all(r["doc_id"] is None for r in rows)
    assert all("seen 2 times" in r["reason"] for r in rows)


def test_cross_partition_counts_null_key(spark, tmp_path):
    """A stored NULL-key occurrence must fold into a pending NULL-key
    row's dup count on resume — the semi join is null-safe like the
    grouping and the stored-count fold it feeds."""
    out = str(tmp_path / "wh")
    v1 = _seq(spark, [_row(None, 20, "a"), _row("a1", 20, "a")])
    uniqueness.write_key_index(v1, out)
    idx = uniqueness.read_key_index(spark, out)
    batch = _seq(spark, [_row(None, 20, "b"), _row("b1", 20, "b")])
    stored = uniqueness.cross_partition_counts(batch, idx, ["b"])
    got = [(r["doc_id"], r["n_stored"]) for r in stored.collect()]
    assert got == [(None, 1)]
    dups = uniqueness.duplicate_keys(batch, stored_counts=stored).collect()
    assert {(r["doc_id"], r["dup_count"]) for r in dups} == {(None, 2)}


# ------------------------------------------------- per-source stats mirror


def test_stats_mirror_respects_source_bounds(spark):
    """A row allowed by a WIDER per-source bound must not fail its
    partition through the global-threshold stats mirror: the mirror
    compares against the same effective bounds the cascade used."""
    suite = CheckSuite(min_n_tok=16, allowed_sources=("a", "b"))
    dim = spark.createDataFrame(
        [("a", 8, 8192)], "source string, min_n_tok int, max_n_tok int"
    )
    df = _seq(
        spark,
        [
            _row("a1", 10, "a"),  # ok under a's min=8, short under global 16
            _row("a2", 20, "a"),
            _row("b1", 10, "b"),  # b has no override → still too_short
            _row("b2", 20, "b"),
        ],
    )
    res = suite_plan.run_suite(df, suite, source_dim=dim)
    verd = {r["source"]: r for r in res.verdicts.collect()}
    viol = res.violations.collect()
    res.cleanup()
    assert [r["doc_id"] for r in viol if r["check_name"] == "too_short"] == ["b1"]
    assert verd["a"]["stats_verdict"] == "pass"
    assert verd["a"]["verdict"] == "pass"
    assert verd["b"]["stats_verdict"] == "fail"
    assert "min_n_tok" in verd["b"]["failed_stat_checks"]
    assert verd["b"]["verdict"] == "fail"


# ------------------------------------------------------- violation sample


def test_sample_violations_small_limit_nonempty(spark):
    """limit=1, oversample=4 over a 5000-row group: the bare expected
    survivor count would be Poisson(4) (empty with p≈e⁻⁴≈1.8%); the
    32-candidate floor drives that to e⁻³². The sample must be exactly
    one row and deterministic across invocations."""
    n = 5000
    viol = spark.createDataFrame(
        [("d%04d" % i, "a", "too_short", "r", [1, 2]) for i in range(n)],
        "doc_id string, source string, check_name string, reason string, tokens array<int>",
    )
    counts = spark.createDataFrame(
        [("a", "too_short", n)], "source string, check_name string, check_cnt long"
    )
    got1 = suite_plan.sample_violations(viol, counts, limit=1).collect()
    got2 = suite_plan.sample_violations(viol, counts, limit=1).collect()
    assert len(got1) == 1
    assert [r["doc_id"] for r in got1] == [r["doc_id"] for r in got2]


# ------------------------------------------------------------------ drift


def test_leave_one_out_baseline_arithmetic(spark):
    hist = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("b", 1, 5), ("b", 3, 7)],
        "source string, bucket int, cnt long",
    )
    loo = {
        (r["source"], r["bucket"]): r["cnt"]
        for r in drift.leave_one_out_baseline(hist).collect()
    }
    assert loo == {
        ("a", 1): 5, ("a", 2): 0, ("a", 3): 7,
        ("b", 1): 10, ("b", 2): 30, ("b", 3): 0,
    }


def test_dominant_source_drift_not_self_masked(spark):
    """A 90%-of-rows source whose n_tok distribution diverges from the
    rest: vs the self-inclusive pool its metrics stay under threshold
    (the pool IS mostly itself — the masking the fix removes); vs the
    leave-one-out rest it must fail."""
    suite = CheckSuite(allowed_sources=("big", "small"))
    rows = (
        [_row("big%03d" % i, 300, "big") for i in range(171)]
        + [_row("bigs%02d" % i, 20, "big") for i in range(9)]
        + [_row("small%02d" % i, 20, "small") for i in range(20)]
    )
    df = _seq(spark, rows).cache()
    hist = drift.ntok_histogram(df)
    pool = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    self_inclusive = {
        r["source"]: r for r in drift.drift_metrics(hist, pool).collect()
    }
    # masking: vs the pool, big is under both thresholds
    assert self_inclusive["big"]["ks"] <= suite.max_ks
    assert self_inclusive["big"]["psi"] <= suite.max_psi
    res = suite_plan.run_suite(df, suite, drift_vs_global=True)
    verd = {r["source"]: r for r in res.verdicts.collect()}
    res.cleanup()
    df.unpersist()
    assert verd["big"]["drift_verdict"] == "fail"
    assert verd["big"]["verdict"] == "fail"


def test_single_source_corpus_drift_passes(spark):
    """One source and no explicit baseline: there is no 'rest' to
    diverge from — the source is excluded from drift scoring and the
    partition passes instead of failing on a degenerate zero
    baseline."""
    suite = CheckSuite(allowed_sources=("a",))
    df = _seq(spark, [_row("d%d" % i, 20, "a") for i in range(10)])
    res = suite_plan.run_suite(df, suite, drift_vs_global=True)
    verd = res.verdicts.collect()
    res.cleanup()
    assert len(verd) == 1
    assert verd[0]["drift_verdict"] is None
    assert verd[0]["verdict"] == "pass"


def test_word_psi_ignores_empty_texts(spark):
    """NULL/whitespace-only texts must not inject a phantom '' word:
    two sources with identical word distributions score psi≈0 even
    when one of them carries extra NULL/blank rows."""
    rows = [("x", "alpha beta gamma"), ("x", "alpha beta"), ("x", "gamma")]
    rows += [("y", "alpha beta gamma"), ("y", "alpha beta"), ("y", "gamma")]
    rows += [("y", None), ("y", ""), ("y", "   \t\n")]
    df = spark.createDataFrame(rows, "source string, text string")
    psi = {r["source"]: r["psi"] for r in drift.word_psi(df).collect()}
    assert abs(psi["x"]) < 1e-9
    assert abs(psi["y"]) < 1e-9


def test_align_hist_null_safe_per_source_baseline(spark):
    """A NULL source key aligns null-safely against a per-source
    baseline: identical distributions score ks=psi≈0 instead of the
    corrupted-CDF result a plain equality join produces."""
    hist = spark.createDataFrame(
        [(None, 0, 10), (None, 1, 10), ("a", 0, 10), ("a", 1, 10)],
        "source string, bucket int, cnt long",
    )
    base = spark.createDataFrame(
        [(None, 0, 20), (None, 1, 20), ("a", 0, 20), ("a", 1, 20)],
        "source string, bucket int, cnt long",
    )
    rows = drift.drift_metrics(hist, base).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["ks"] < 1e-9, r
        assert abs(r["psi"]) < 1e-9, r


# ------------------------------------------------------------ key index IO


def test_read_key_index_missing_path_is_empty(spark, tmp_path):
    idx = uniqueness.read_key_index(spark, str(tmp_path / "nope"))
    assert idx.count() == 0


# ------------------------------------------------- watermark / scan NULLs


def test_incremental_scan_null_key_watermark(spark):
    """The NULL-key group's watermark must apply: without a null-safe
    join its last_seq coalesces to -inf and every already-seen
    NULL-key row is re-emitted on each incremental run."""
    from teleharvest_spark.operators import watermark

    old = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 1), (None, 5)], "source string, doc_seq long"
    )
    now = spark.createDataFrame(
        [("a", 2), ("a", 3), (None, 4), (None, 6)], "source string, doc_seq long"
    )
    wm = watermark.high_water_marks(old)
    got = {(r["source"], r["doc_seq"]) for r in watermark.incremental_scan(now, wm).collect()}
    assert got == {("a", 3), (None, 6)}


def test_dedup_lines_global_null_scope_removes_hot_lines(spark):
    """Boilerplate shared by NULL-scope docs is counted by hot_lines'
    NULL group and must also be REMOVED — the hot-line join back is
    null-safe on the scope key."""
    from teleharvest_spark.operators import dedup

    df = spark.createDataFrame(
        [
            ("d1", "BOILER\nunique one", None),
            ("d2", "BOILER\nunique two", None),
            ("d3", "BOILER\nkept here", "s1"),
        ],
        "doc_id string, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines_global(
            df, scope_col="source", min_count=2
        ).collect()
    }
    # NULL scope: BOILER occurs twice → removed from both docs
    assert out["d1"]["n_removed_lines"] == 1
    assert "BOILER" not in out["d1"]["clean_text"]
    assert out["d2"]["n_removed_lines"] == 1
    # s1 scope: BOILER occurs once there → kept (scoping respected)
    assert out["d3"]["n_removed_lines"] == 0
    assert "BOILER" in out["d3"]["clean_text"]


# ------------------------------------------------------------- LSH banding


def test_band_buckets_rejects_invalid_banding(spark):
    from teleharvest_spark.operators import dedup

    sigs = spark.createDataFrame(
        [("d1", [1] * 64)], "doc_id string, sig array<long>"
    )
    with pytest.raises(ValueError, match="divisor"):
        dedup.band_buckets(sigs, bands=100)  # > n_perm: empty slices
    with pytest.raises(ValueError, match="divisor"):
        dedup.band_buckets(sigs, bands=48)  # non-divisor: silent tail drop


# --------------------------------------------------------- source_dim guard


def test_with_source_bounds_duplicate_dim_raises(spark):
    from teleharvest_spark.operators import cascade

    seq = _seq(spark, [_row("d1", 20, "a")])
    dim = spark.createDataFrame(
        [("a", 8, 100), ("a", 16, 200)],
        "source string, min_n_tok int, max_n_tok int",
    )
    with pytest.raises(ValueError, match="duplicate"):
        cascade.with_source_bounds(seq, dim)


# ------------------------------------------------------------ span stats


def test_duplicated_token_stats_clamps_padded_spans(spark):
    """A padded span extending past the doc's end must not report
    dup_tok_frac > 1.0."""
    from teleharvest_spark.operators import dedup

    df = spark.createDataFrame(
        [("d1", list(range(10)))], "doc_id string, tokens array<int>"
    )
    spans = spark.createDataFrame(
        [("d1", 0, 14)], "doc_id string, start int, end int"
    )
    row = dedup.duplicated_token_stats(df, spans).collect()[0]
    assert row["n_dup_tok"] == 10
    assert row["dup_tok_frac"] == 1.0


# --------------------------------------------------------- index durability


def test_write_dedup_index_commit_marker(spark, tmp_path):
    import os

    from teleharvest_spark.operators import dedup

    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [("d%d" % i, "some text %d here for shingles" % i) for i in range(8)],
        "doc_id string, text string",
    )
    dedup.write_dedup_index(df, path, mode="overwrite")
    assert os.path.exists(os.path.join(path, "_index_commit"))
    # torn write: marker gone → append refuses instead of silently
    # joining against a bucket table missing the half-written batch
    os.remove(os.path.join(path, "_index_commit"))
    df2 = spark.createDataFrame(
        [("e1", "fresh append text for the second batch")],
        "doc_id string, text string",
    )
    with pytest.raises(ValueError, match="commit marker"):
        dedup.write_dedup_index(df2, path, mode="append")
    # rebuild clears the torn state
    dedup.write_dedup_index(df, path, mode="overwrite")
    dedup.write_dedup_index(df2, path, mode="append")
    sigs, _ = dedup.read_dedup_index(spark, path)
    assert sigs.count() == 9


def test_write_dedup_index_rejects_object_store_paths(spark):
    from teleharvest_spark.operators import dedup

    df = spark.createDataFrame([("d1", "text")], "doc_id string, text string")
    with pytest.raises(NotImplementedError, match="local filesystem"):
        dedup.write_dedup_index(df, "s3a://bucket/idx")


# ------------------------------------------------------ fixture/contract


def test_generate_sequences_rejects_degenerate_min_n_tok(spark):
    from teleharvest_spark import datagen

    with pytest.raises(ValueError, match="min_n_tok"):
        datagen.generate_sequences(spark, 100, CheckSuite(min_n_tok=1))


def test_schema_diff_tolerates_struct_field_metadata():
    """A struct field carrying metadata (parquet/Iceberg comments) must
    not produce a type_mismatch whose expected and observed
    simpleStrings are identical."""
    from pyspark.sql import types as T

    from teleharvest_spark.plans import contract as ct

    with_meta = T.StructType(
        [
            T.StructField(
                "s",
                T.StructType(
                    [T.StructField("x", T.IntegerType(), True, {"comment": "hi"})]
                ),
                True,
            )
        ]
    )
    spec = (ct.ColumnSpec("s", "struct<x:int>"),)
    diffs = ct.schema_diff(with_meta, spec, allow_widening=False)
    assert diffs == []


# ---------------------------------------------------- operator hardening 2


def test_merge_upsert_applies_null_updates(spark):
    """A MATCHED update row's NULL value must be WRITTEN (reference
    setattr semantics; Iceberg MERGE `t.c = s.c`) — coalesce would
    keep the stale target value and the local emulation would diverge
    from the production path."""
    from teleharvest_spark.operators import merge

    tgt = spark.createDataFrame(
        [("k1", 5, 50), ("k2", 6, 60)], "k string, a int, b int"
    )
    upd = spark.createDataFrame([("k1", None, 99)], "k string, a int, b int")
    got = {
        r["k"]: (r["a"], r["b"])
        for r in merge.merge_upsert(tgt, upd, keys=["k"]).collect()
    }
    assert got["k1"] == (None, 99)   # NULL applied, not coalesced away
    assert got["k2"] == (6, 60)      # unmatched row untouched


def test_merge_upsert_rejects_typoed_update_cols(spark):
    from teleharvest_spark.operators import merge

    tgt = spark.createDataFrame([("k1", 5)], "k string, views int")
    upd = spark.createDataFrame([("k1", 9)], "k string, views int")
    with pytest.raises(ValueError, match="veiws"):
        merge.merge_upsert(tgt, upd, keys=["k"], update_cols=["veiws"])


def test_bloom_rejects_degenerate_params(spark):
    from teleharvest_spark.operators import bloom

    df = spark.createDataFrame([("a", 1)], "x string, y int")
    with pytest.raises(ValueError, match="m_bits"):
        bloom.bloom_build(df, ["x", "y"], m_bits=0)
    with pytest.raises(ValueError, match="m_bits"):
        bloom.bloom_build(df, ["x"], m_bits=1024, k=0)


def test_write_bloom_overwrite_retires_old_meta_first(spark, tmp_path):
    """Overwrite with changed params removes the old meta BEFORE the
    words write: a crash in between must leave 'no complete bloom'
    (fail-safe), never new bits under stale params (silent false
    negatives)."""
    import os

    from teleharvest_spark.operators import bloom

    path = str(tmp_path / "bl")
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    b1 = bloom.bloom_build(df, ["x"], m_bits=1024)
    bloom.write_bloom(b1, path, 1024, 5, ["x"], mode="overwrite")
    assert bloom.bloom_meta_of(path)["m_bits"] == 1024
    # simulate the crash window: overwrite already removed the meta,
    # words not yet rewritten → readers must see no complete bloom
    os.remove(os.path.join(path, bloom.BLOOM_META))
    assert bloom.bloom_meta_of(path) is None
    # a completed overwrite under NEW params reads back consistently
    b2 = bloom.bloom_build(df, ["x"], m_bits=2048)
    bloom.write_bloom(b2, path, 2048, 5, ["x"], mode="overwrite")
    words, meta = bloom.read_bloom(spark, path)
    assert meta["m_bits"] == 2048
    kept = bloom.bloom_prefilter(df, words, ["x"], meta["m_bits"], meta["k"])
    assert kept.count() == 2  # zero false negatives under the new params


def test_frame_sample_zero_frame_assets_emit_no_rows(spark):
    from teleharvest_spark import multimodal

    assets = spark.createDataFrame(
        [
            ("v1", "video", bytearray(b"payload-bytes-1")),
            ("v0", "video", None),           # undecodable → n_frames 0
            ("i1", "image", bytearray(b"img")),  # filtered pre-decode
        ],
        "asset_id string, modality string, payload binary",
    )
    rows = multimodal.frame_sample(assets, every_n=1).collect()
    ids = {r["asset_id"] for r in rows}
    assert "v0" not in ids      # no phantom frame 0
    assert "i1" not in ids
    assert all(r["frame_idx"] >= 0 for r in rows)


def test_targeted_diff_reports_moved_partition_rows(spark):
    """A row whose ONLY change is its partition value must appear in
    the row-level diff, not just as two count_mismatch verdicts."""
    from teleharvest_spark.operators import reconcile

    old = spark.createDataFrame(
        [("X", "A", 1), ("Y", "A", 2)], "doc_id string, source string, v int"
    )
    new = spark.createDataFrame(
        [("X", "B", 1), ("Y", "A", 2)], "doc_id string, source string, v int"
    )
    verdicts, diff = reconcile.targeted_diff(old, new, "source", keys=("doc_id",))
    drows = {r["doc_id"]: r for r in diff.collect()}
    assert "X" in drows
    assert "Y" not in drows


def test_score_lattice_refuses_multi_group_frame():
    import pandas as pd

    from teleharvest_spark.operators import slices

    pdf = pd.DataFrame(
        {
            "slice": ["a=1", "a=1"],
            "arity": [1, 1],
            "n": [10, 12],
            "k": [2, 3],
            "rate": [0.2, 0.25],
            "global_rate": [0.1, 0.1],
            "lift": [2.0, 2.5],
            "_pieces": [["a=1"], ["a=1"]],
            "window": [1, 2],
        }
    )
    with pytest.raises(ValueError, match="multi-group"):
        slices.score_lattice(pdf)
    # with group_keys the same frame scores per group
    out = slices.score_lattice(pdf, group_keys=("window",))
    assert len(out) == 2


# ---------------------------------------------------- streaming hardening


def test_stateful_high_water_intra_batch_replays(spark, tmp_path):
    """An original and its re-drop often land in the SAME micro-batch
    (both files present when the query starts) — emit-once must hold
    there too, not only across batches."""
    from teleharvest_spark.streaming import ingest

    drop = tmp_path / "hw2"
    rows = [("a", s) for s in range(1, 6)] + [("b", 10)]
    for _ in range(2):  # original + full re-drop, one batch
        spark.createDataFrame(rows, "source string, seq long").write.mode(
            "append"
        ).parquet(str(drop))
    stream = spark.readStream.schema("source string, seq long").parquet(str(drop))
    hw = ingest.stateful_high_water(stream, key="source", seq="seq")
    q = (
        hw.writeStream.outputMode("append")
        .format("memory")
        .queryName("hw_intra")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r["source"], r["seq"])
            for r in spark.sql("SELECT * FROM hw_intra").collect()
        ]
    finally:
        q.stop()
    assert sorted(got) == sorted(set(rows))  # each (key, seq) exactly once


def test_refresh_sink_deterministic_winner_without_obs_seq(spark, tmp_path):
    """Duplicate (key, seq) observations in one batch WITHOUT an
    _obs_seq column: the stored winner must be content-determined, not
    partition-order-determined — two runs over the same data (however
    partitioned) store the same metrics."""
    from teleharvest_spark.streaming import refresh as srefresh

    batch_rows = [("ch", 3, 300, 1, 1), ("ch", 3, 333, 2, 2), ("ch", 4, 7, 1, 1)]
    ddl = "source string, doc_seq int, views int, reactions int, forwards int"
    # update-only semantics: observations upsert EXISTING rows
    stored_rows = [("ch", 3, 1, 1, 1), ("ch", 4, 1, 1, 1)]

    def run(tgt, parts):
        spark.createDataFrame(stored_rows, ddl).write.parquet(tgt)
        batch = spark.createDataFrame(batch_rows, ddl).repartition(parts)
        srefresh.refresh_sink(spark, tgt)(batch, 0)
        return {
            (r["source"], r["doc_seq"]): (r["views"], r["reactions"], r["forwards"])
            for r in srefresh.read_stored(spark, tgt).collect()
        }

    a = run(str(tmp_path / "t1"), 1)
    b = run(str(tmp_path / "t2"), 7)
    assert a == b
    # merge_upsert's shared winner rule: greatest metric struct
    assert a[("ch", 3)] == (333, 2, 2)
    assert a[("ch", 4)] == (7, 1, 1)


# ------------------------------------------------- text/vector hardening


def test_text_functions_whitespace_edges(spark):
    """F.trim strips only ASCII spaces — the text helpers must not
    emit phantom tokens or distinct fingerprints for texts differing
    only in edge tabs/newlines."""
    from teleharvest_spark.functions import text as TXT

    df = spark.createDataFrame(
        [("a", "hello\n"), ("b", "\t\n"), ("c", "a b"), ("d", "a b\n"),
         ("e", None), ("f", "\nx\ty ")],
        "id string, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            TXT.token_count(F.col("t")).alias("n"),
            TXT.fingerprint(F.col("t")).alias("fp"),
            TXT.hash_tokens(F.col("t")).alias("toks"),
        ).collect()
    }
    assert out["a"]["n"] == 1 and len(out["a"]["toks"]) == 1
    assert out["b"]["n"] == 0 and out["b"]["toks"] == []
    assert out["e"]["n"] == 0 and out["e"]["toks"] == []
    assert out["f"]["n"] == 2 and len(out["f"]["toks"]) == 2
    # trailing newline must not change the normalized fingerprint
    assert out["c"]["fp"] == out["d"]["fp"]


def test_stop_word_check_literal_metacharacters(spark):
    from teleharvest_spark.functions import text as TXT

    df = spark.createDataFrame(
        [("1", "we know c++ here"), ("2", "abc only"), ("3", "a.c literal")],
        "id string, t string",
    )
    hit = {
        r["id"]: r["hit"]
        for r in df.select(
            "id", TXT.stop_word_check(F.col("t"), ["c++", "a.c"]).alias("hit")
        ).collect()
    }
    assert hit["1"] == "c++"   # regex metachars match literally
    assert hit["2"] is None    # 'a.c' must NOT pattern-match 'abc'
    assert hit["3"] == "a.c"


def test_cosine_null_propagation(spark):
    from teleharvest_spark.functions import vectors as V

    df = spark.createDataFrame(
        [("ok", [1.0, 0.0], [1.0, 0.0]),
         ("zero", [0.0, 0.0], [1.0, 0.0]),
         ("nullb", [1.0, 0.0], None)],
        "id string, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: (r["c"], r["cu"])
        for r in df.select(
            "id",
            V.cosine(F.col("a"), F.col("b")).alias("c"),
            V.cosine_udf(F.col("a"), F.col("b")).alias("cu"),
        ).collect()
    }
    assert rows["ok"][0] == pytest.approx(1.0)
    assert rows["ok"][1] == pytest.approx(1.0)
    assert rows["zero"][0] == 0.0 and rows["zero"][1] == 0.0
    # NULL input → NULL out (unscorable ≠ orthogonal), and the batched
    # UDF must not crash on the NULL in its Arrow batch
    assert rows["nullb"][0] is None
    assert rows["nullb"][1] is None


def test_lm_training_ignores_null_token_elements(spark):
    from pyspark.sql import Row

    from teleharvest_spark.operators.lm import train_unigram_lm

    df = spark.createDataFrame(
        [Row(doc_id=0, tokens=[1, None, 2]), Row(doc_id=1, tokens=[1])],
        "doc_id long, tokens array<int>",
    )
    lm, meta = train_unigram_lm(df)
    assert meta["vocab_size"] == 2      # NULL is not a vocab entry
    assert meta["total_tokens"] == 3
    assert {r["token"] for r in lm.collect()} == {1, 2}


def test_scorer_client_cache_shared_across_rehydrated_factories():
    """Tasks deserialize fresh factory objects — content-keyed caching
    must share one client across them while keeping differently-
    configured same-shaped closures apart."""
    from pyspark import cloudpickle

    from teleharvest_spark.operators import scoring

    scoring._CLIENTS.clear()

    def make(fail_every):
        return lambda: scoring.StubScorer(fail_every=fail_every)

    f0 = make(0)
    # simulate two tasks rehydrating the same serialized factory
    t1 = cloudpickle.loads(cloudpickle.dumps(f0))
    t2 = cloudpickle.loads(cloudpickle.dumps(f0))
    c1, c2 = scoring._client(t1), scoring._client(t2)
    assert c1 is c2
    # same-shaped closure, different captured config → different client
    c3 = scoring._client(make(7))
    assert c3 is not c1
    assert len(scoring._CLIENTS) == 2


def test_score_stage_rejects_reserved_columns(spark):
    from teleharvest_spark.operators import scoring

    df = spark.createDataFrame(
        [("d1", "text", 1.0)], "doc_id string, text string, score double"
    )
    with pytest.raises(ValueError, match="already exist"):
        scoring.score_stage(df, lambda: scoring.StubScorer())


# ------------------------------------------------- orchestration hardening


def test_content_digest_detects_paired_identical_edits(spark):
    """xor-based digests cancel under even multiplicity: a duplicated
    row edited identically in BOTH copies left count and xor unchanged.
    The decimal-sum digest must move."""
    from teleharvest_spark import pipeline
    from teleharvest_spark.plans import manifest as mf

    a = spark.createDataFrame(
        [("d1", 5, "s"), ("d1", 5, "s"), ("d2", 9, "s")],
        "doc_id string, n_tok int, source string",
    )
    b = spark.createDataFrame(
        [("d1", 7, "s"), ("d1", 7, "s"), ("d2", 9, "s")],
        "doc_id string, n_tok int, source string",
    )
    assert pipeline.content_digest(a) != pipeline.content_digest(b)
    snap_a = mf.snapshot_of_partitions(a).collect()[0]
    snap_b = mf.snapshot_of_partitions(b).collect()[0]
    assert snap_a["snapshot_id"] != snap_b["snapshot_id"]
    # and identical content still matches (order-independent)
    assert (
        pipeline.content_digest(a.orderBy(F.desc("n_tok")))
        == pipeline.content_digest(a)
    )


def test_hot_tokens_resume_refused(spark, suite, tmp_path):
    from teleharvest_spark import cli

    with pytest.raises(ValueError, match="hot-tokens.*incompatible"):
        cli.run(
            spark, str(tmp_path / "x"), str(tmp_path / "o"), suite,
            run_id="h1", resume=True, hot_tokens=True,
        )


def test_sample_frac_verdicts_go_to_preflight(spark, suite, tmp_path):
    import os

    from teleharvest_spark import cli, datagen

    inp, out = str(tmp_path / "seqs"), str(tmp_path / "out")
    datagen.generate_sequences(spark, 2_000, suite).write.parquet(inp)
    cli.run(spark, inp, out, suite, run_id="pf1", sample_frac=0.5)
    assert os.path.isdir(f"{out}/verdicts_preflight/pf1")
    assert not os.path.isdir(f"{out}/verdicts/pf1")


def test_run_all_validate_digest_covers_drift_and_source_dim(
    spark, suite, tmp_path
):
    from teleharvest_spark import cli, datagen, pipeline

    inp, out = str(tmp_path / "seqs"), str(tmp_path / "out")
    dimp = str(tmp_path / "dim")
    datagen.generate_sequences(spark, 1_000, suite).write.parquet(inp)
    spark.createDataFrame(
        [("src_01", 8, 8192)], "source string, min_n_tok int, max_n_tok int"
    ).write.parquet(dimp)
    kw = dict(stages=("validate",), source_dim_path=dimp)
    r1 = pipeline.run_all(spark, inp, out, suite, "ra1", **kw)
    assert r1["stages"]["validate"] != {"skipped": True}
    r2 = pipeline.run_all(spark, inp, out, suite, "ra2", **kw)
    assert r2["stages"]["validate"] == {"skipped": True}
    # toggling drift must re-validate, not skip
    r3 = pipeline.run_all(spark, inp, out, suite, "ra3", drift=False, **kw)
    assert r3["stages"]["validate"] != {"skipped": True}
    # editing the source_dim CONTENT must re-validate, not skip
    spark.createDataFrame(
        [("src_01", 32, 8192)], "source string, min_n_tok int, max_n_tok int"
    ).write.mode("overwrite").parquet(dimp)
    r4 = pipeline.run_all(spark, inp, out, suite, "ra4", drift=False, **kw)
    assert r4["stages"]["validate"] != {"skipped": True}


def test_cli_main_refuses_run_all_with_unplumbed_flags(tmp_path):
    from teleharvest_spark import cli

    with pytest.raises(SystemExit):
        cli.main([
            "--input", str(tmp_path / "i"), "--output", str(tmp_path / "o"),
            "--run-id", "x", "--run-all", "--emit-valid",
            str(tmp_path / "c"),
        ])
    with pytest.raises(SystemExit):
        cli.main([
            "--input", str(tmp_path / "i"), "--output", str(tmp_path / "o"),
            "--run-id", "x", "--corpus-stats",
        ])


def test_drift_fdr_resume_uses_full_baseline(spark, suite, tmp_path):
    """Under --resume with the global baseline, the FDR pass must score
    pending sources against the reconstructed FULL pool — re-pooling
    the pending-only histogram would compare the drifted source against
    itself (p≈1) and never reject."""
    from teleharvest_spark import cli, datagen

    inp, out = str(tmp_path / "seqs"), str(tmp_path / "out")
    seqs = datagen.generate_sequences(spark, 5_000, suite)
    seqs.write.parquet(inp)
    cli.run(spark, inp, out, suite, run_id="f1", drift_fdr_alpha=0.05)

    seqs.where(F.col("source") == "src_07").write.mode("append").parquet(inp)
    r2 = cli.run(
        spark, inp, out, suite, run_id="f2", resume=True,
        drift_fdr_alpha=0.05,
    )
    assert r2["partitions"] == 1
    rows = spark.read.parquet(f"{out}/drift_fdr/f2").collect()
    assert len(rows) == 1 and rows[0]["source"] == "src_07"
    # datagen plants src_07 at mean ×2 — vs the full pool it must
    # reject; self-comparison would give p ≈ 1
    assert rows[0]["reject"] is True


def test_prep_mixture_packs_carry_copy(spark, tmp_path):
    """Upsampled copies must stay distinguishable in the packs table:
    pack on (doc_id, copy) per upsample_mixture's contract."""
    from teleharvest_spark import pipeline

    inp, out = str(tmp_path / "docs"), str(tmp_path / "wh")
    def _text(prefix, i):
        return " ".join(f"{prefix}{i}w{j}" for j in range(24 + i))

    docs = spark.createDataFrame(
        [("b%02d" % i, _text("book", i), "books") for i in range(8)]
        + [("w%02d" % i, _text("web", i), "web") for i in range(8)],
        "doc_id string, text string, source string",
    )
    docs.write.parquet(inp)
    pipeline.prep_corpus(
        spark, inp, out, run_id="m1", capacity=64, train=0.8, val=0.1,
        mixture_weights={"books": 2.0},
        stages=("quality", "dedup", "tokenize", "split", "mixture", "pack"),
    )
    packs = spark.read.parquet(f"{out}/packs")
    assert "copy" in packs.columns
    # only the TRAIN split is mixture-weighted; val/test ride with copy 0
    books = packs.where(
        (F.col("source_dir") == "books") & (F.col("split") == "train")
    )
    # weight 2.0 → every train books doc exactly twice, distinct by copy
    assert books.count() == 2 * books.select("doc_id").distinct().count()
    assert (
        books.select("doc_id", "copy").distinct().count() == books.count()
    )
    # full pack rows unique — (group, split, key, copy) is a key again
    assert packs.distinct().count() == packs.count()


# ------------------------------------------------------- span batch caching


def test_brute_force_topk_excludes_null_embeddings(spark):
    """NULL-embedding corpus rows score cosine 0.0 (guarded division),
    which would outrank genuinely negative true neighbors and corrupt
    the ANN ground truth — they must not appear in the exact top-k."""
    from teleharvest_spark.operators import similarity

    rows = [("p", [1.0, 0.0])] + [
        ("n%d" % i, [-1.0, 0.01 * i]) for i in range(3)
    ] + [("null%d" % i, None) for i in range(2)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = similarity.brute_force_topk(
        df.where(F.col("vec_id") == "p"), df, k=5
    ).collect()
    ids = {r["neighbor_id"] for r in got}
    assert ids == {"n0", "n1", "n2"}
    assert all(r["sim"] < 0 for r in got)


def test_train_centroids_tolerates_ragged_embeddings(spark):
    """A wrong-dim or empty embedding landing in the driver sample must
    not crash training with a numpy inhomogeneous-shape error."""
    import numpy as np

    from teleharvest_spark.operators import similarity

    rows = [("v%d" % i, [float(i), 1.0]) for i in range(10)]
    rows += [("bad1", []), ("bad2", [1.0, 2.0, 3.0]), ("bad3", None)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    cents = similarity.train_centroids(df, dim=2, n_cells=2)
    assert cents.shape[1] == 2
    assert np.isfinite(cents).all()


def test_lsh_scan_fraction_counts_zero_candidate_probes(spark):
    """A probe whose buckets match nothing scans 0 rows and must pull
    the mean DOWN, not vanish from it."""
    from teleharvest_spark.operators import similarity

    corpus = spark.createDataFrame(
        [("c%d" % i, [1.0, 0.0, 0.0, 0.0]) for i in range(4)],
        "vec_id string, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [("hit", [1.0, 0.0, 0.0, 0.0]), ("miss", [-1.0, 0.0, 0.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    frac = similarity.lsh_scan_fraction(
        probes, corpus, dim=4, n_planes=12, n_tables=2
    )
    # identical vector shares every bucket (scans 4/4); the negated
    # vector flips every plane sign (scans 0) → mean 0.5, not 1.0
    assert abs(frac - 0.5) < 1e-9


def test_repetition_blank_separators_not_duplicate_lines(spark):
    """Ordinary multi-paragraph prose must not fail the Gopher
    dup-line gate through its blank separator lines."""
    from pyspark.sql import Row

    from teleharvest_spark.operators import quality

    df = spark.createDataFrame(
        [Row(doc_id=0, text="p1\n\np2\n\np3\n\np4\n\np5")]
    )
    sig = quality.repetition_signals(df).collect()[0]
    assert sig["n_lines"] == 9
    assert sig["n_dup_lines"] == 0
    frac = quality.repetition_fractions(df).collect()[0]
    assert frac["dup_line_frac"] == 0.0


def test_contamination_short_eval_whole_text_hit(spark):
    """An eval answer shorter than k words yields ONE whole-text
    shingle; a verbatim short training doc must flag (effective
    threshold least(min_overlap, n_eval)) while empty texts never do
    (degenerate '' shingle excluded)."""
    from teleharvest_spark.operators import contamination

    train = spark.createDataFrame(
        [("t1", "foo bar"), ("t2", "completely different words here"), ("t3", "")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "foo bar"), ("e2", ""), ("e3", None)],
        "doc_id string, text string",
    )
    got = contamination.contamination_scan(train, ev, k=3, min_overlap=2).collect()
    assert [(r["doc_id"], r["eval_id"], r["n_overlap"], r["n_eval"]) for r in got] == [
        ("t1", "e1", 1, 1)
    ]


def test_semantic_contamination_mixed_dim_eval_raises(spark):
    from teleharvest_spark.operators import contamination

    train = spark.createDataFrame(
        [("t1", [1.0, 0.0])], "doc_id string, embedding array<double>"
    )
    ev = spark.createDataFrame(
        [("e1", [1.0, 0.0, 0.0]), ("e2", [1.0, 0.0])],
        "eval_id string, embedding array<double>",
    )
    with pytest.raises(ValueError, match="mixed dimensions"):
        contamination.semantic_contamination(train, ev)


def test_semdedup_null_embeddings_kept_verbatim(spark):
    from teleharvest_spark.operators import semdedup

    rows = [("v%d" % i, [float(i % 3), 1.0]) for i in range(12)]
    rows += [("null1", None), ("bad1", [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup.semdedup(df, dim=2, tau=0.99).collect()}
    assert len(out) == 14
    for vid in ("null1", "bad1"):
        assert out[vid]["cell"] == -1
        assert out[vid]["kept"] is True
        assert out[vid]["centroid_sim"] is None


def test_samplers_exclude_null_keys(spark):
    """NULL-key rows hash to NULL (sorts first, ties completely) —
    the deterministic samplers exclude them instead of letting the
    kept set become partition-order dependent."""
    from teleharvest_spark.operators import sampling

    df = spark.createDataFrame(
        [("d%d" % i, "a", 10) for i in range(20)]
        + [(None, "a", 10), (None, "a", 10)],
        "doc_id string, source string, n_tok int",
    )
    strat = sampling.stratified_sample(df, k=5).collect()
    assert len(strat) == 5
    assert all(r["doc_id"] is not None for r in strat)
    kept = sampling.token_budget_sample(df, {"a": 50}).collect()
    assert len(kept) == 5
    assert all(r["doc_id"] is not None for r in kept)


def test_batch_duplicated_spans_cache_handles(spark):
    from teleharvest_spark.operators import dedup

    docs = spark.createDataFrame(
        [("d%d" % i, list(range(10 * i, 10 * i + 30))) for i in range(6)]
        + [("dupA", list(range(100))), ("dupB", list(range(100)))],
        "doc_id string, tokens array<int>",
    )
    stored = dedup.repeated_grams(docs, k=8)
    base_spans, base_new = dedup.batch_duplicated_spans(docs, stored, k=8)
    handles: list = []
    spans, new = dedup.batch_duplicated_spans(
        docs, stored, k=8, cache_handles=handles
    )
    assert len(handles) == 2
    key = lambda r: (r["doc_id"], r["start"], r["end"])
    assert sorted(map(key, spans.collect())) == sorted(map(key, base_spans.collect()))
    assert new.count() == base_new.count()
    for h in handles:
        h.unpersist()
