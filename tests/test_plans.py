"""Physical-plan regression guards — the scale properties the engine
promises must be visible in `.explain`, not just fast today."""

from __future__ import annotations

import io
import contextlib

import pyspark.sql.functions as F

from teleharvest_spark.operators import uniqueness
from teleharvest_spark.plans import suite as suite_plan


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_suite_violations_join_is_broadcast_not_smj(spark, suite, tmp_path):
    """The fused dup-key join must broadcast the (tiny) dup set — a
    SortMergeJoin here would shuffle-write the whole fact including the
    tokens arrays."""
    from teleharvest_spark import datagen

    path = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 5_000, suite).write.parquet(path)
    stored = spark.read.parquet(path)
    res = suite_plan.run_suite(stored, suite)
    plan = _plan_of(res.violations)
    res.cleanup()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_duplicate_keys_scan_prunes_wide_columns(spark, tmp_path):
    """Uniqueness detection must not decode payload columns: the
    ReadSchema of its parquet scan carries just the key, never the
    tokens array."""
    path = str(tmp_path / "wide")
    spark.createDataFrame(
        [("d1", [1, 2], 2, "a", 1.5)],
        "doc_id string, tokens array<int>, n_tok int, source string, extra double",
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    plan = _plan_of(uniqueness.duplicate_keys(stored, key="doc_id"))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, plan
    assert all("tokens" not in l for l in read_schemas), read_schemas


def test_referential_stats_single_shuffle(spark, suite, tmp_path):
    """partition_stats is one partial+final aggregate: exactly one
    exchange above the scan (map-side combine does the heavy lifting —
    at 10^12 rows the shuffle carries |sources| × sketch rows)."""
    from teleharvest_spark import datagen
    from teleharvest_spark.operators import stats

    path = str(tmp_path / "seqs2")
    datagen.generate_sequences(spark, 2_000, suite).write.parquet(path)
    stored = spark.read.parquet(path)
    plan = _plan_of(stats.partition_stats(stored))
    n_exchanges = sum(1 for l in plan.splitlines() if l.strip().startswith("(") and "Exchange" in l and "Reused" not in l)
    assert n_exchanges == 1, plan


def test_metrics_refresh_broadcasts_bounds_and_updates(spark, tmp_path):
    """The refresh pipeline must never sort-merge-join the fact table:
    per-key bounds (|keys| rows) and the windowed update set (≤ limit
    rows/key) are both broadcast; the stored side streams."""
    from teleharvest_spark.operators import refresh

    path = str(tmp_path / "stored")
    spark.createDataFrame(
        [("ch", s, s % 5, s % 3, s % 2) for s in range(2000)],
        "source string, doc_seq int, views int, reactions int, forwards int",
    ).write.parquet(path)
    stored = spark.read.parquet(path)
    fresh = stored.select(
        "source", "doc_seq",
        (F.col("views") + 1).alias("views"),
        (F.col("reactions") + 1).alias("reactions"),
        (F.col("forwards") + 1).alias("forwards"),
    )
    out = refresh.metrics_refresh(stored, fresh, key="source", seq="doc_seq", limit=100)
    plan = _plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_split_assign_adds_no_exchange(spark, tmp_path):
    """The hash split is a pure projection: zero exchanges above the
    scan — assigning 10^12 rows costs one narrow pass."""
    from teleharvest_spark.operators import sampling

    path = str(tmp_path / "docs_split")
    spark.createDataFrame(
        [(1, "s", "t")], "doc_id long, source string, text string"
    ).write.parquet(path)
    plan = _plan_of(sampling.split_assign(spark.read.parquet(path)))
    assert "Exchange" not in plan, plan


def test_pivot_conditional_agg_single_exchange(spark, tmp_path):
    """The conditional-count pivot form is one partial+final hash
    aggregate (a single exchange). `.pivot(values).count()` plans two
    exchanges (pre-aggregate by (key, pivot col) then pivotfirst) —
    this test pins that the query uses the cheaper shape."""
    path = str(tmp_path / "ev_pivot")
    spark.createDataFrame(
        [(1, "click"), (1, "view"), (2, "click")], "user_id long, event_type string"
    ).write.parquet(path)
    wide = spark.read.parquet(path).groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
    )
    plan = _plan_of(wide)
    # each physical node appears once as "(N) Exchange" in the detail
    # section (the tree rendering would double-count it)
    assert plan.count(") Exchange") == 1, plan


def test_quantile_trim_broadcasts_bounds(spark, tmp_path):
    """The per-key bounds side is partition-cardinality — it must come
    back as a broadcast join, never a shuffle of the fact table."""
    from teleharvest_spark.operators.stats import quantile_trim

    path = str(tmp_path / "docs_trim")
    spark.createDataFrame(
        [(i, "s", i * 10) for i in range(50)], "doc_id long, source string, n_chars long"
    ).write.parquet(path)
    plan = _plan_of(quantile_trim(spark.read.parquet(path), value_col="n_chars"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_writer_shuffle_is_single_repartition(spark, tmp_path):
    """write_partitioned plans exactly one exchange (the layout
    repartition) above the scan."""
    from teleharvest_spark.sources.writer import write_partitioned
    import glob

    path = str(tmp_path / "w_src")
    spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(100)], "doc_id long, source string"
    ).write.parquet(path)
    out = str(tmp_path / "w_out")
    write_partitioned(spark.read.parquet(path), out, files_per_partition=2)
    # layout contract visible on disk: at most 2 files per partition dir
    for d in glob.glob(f"{out}/source=*"):
        n = len([f for f in glob.glob(f"{d}/*") if f.endswith(".parquet")])
        assert 1 <= n <= 2, (d, n)


def test_repeated_suite_runs_leave_no_persisted_rdds(spark, suite):
    """Block-manager hygiene regression pin (r2 fixed persist leaks):
    after N suite runs each followed by cleanup(), the CacheManager
    holds nothing from the suite (localCheckpoint residue is reclaimed
    by the ContextCleaner on GC and is excluded via storage-level
    check — persisted DataFrames use MEMORY_AND_DISK deserialized,
    localCheckpoints use the serialized replicated level)."""
    from teleharvest_spark import datagen
    from teleharvest_spark.plans import suite as suite_plan

    def persisted_ids():
        # persistentRdds includes localCheckpoint RDDs; track only the
        # deserialized MEMORY_AND_DISK ones (the persist() signature).
        # Compare by RDD-id SET, not count: a pre-existing cache from
        # another test may be released asynchronously mid-test, which
        # would make a count delta spuriously negative.
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        ids = set()
        while it.hasNext():
            e = it.next()  # scala Tuple2[int, RDD]
            sl = e._2().getStorageLevel()
            if sl.deserialized() and sl.useMemory():
                ids.add(e._1())
        return ids

    # set delta, not absolute: the session is shared across the test
    # run and other tests may hold legitimate caches
    before = persisted_ids()
    df = datagen.generate_sequences(spark, 1_000, suite)
    for _ in range(3):
        res = suite_plan.run_suite(df, suite, drift_vs_global=True)
        res.materialize()
        res.cleanup()
    assert persisted_ids() - before == set()


def test_spans_from_grams_broadcasts_stored_gram_dimension(spark, tmp_path):
    """The incremental span path's scale contract: the corpus's
    repeated-gram dimension (duplication-bounded, 8 B/row) must reach
    the positional join as the BROADCAST side — a SortMergeJoin here
    would shuffle-write every (id, pos, gram) fingerprint of the batch,
    i.e. ~n_tok rows of the fact."""
    from teleharvest_spark.operators import dedup

    path = str(tmp_path / "grams")
    docs = spark.createDataFrame(
        [("d%d" % i, list(range(10 * i, 10 * i + 30))) for i in range(40)]
        + [("dupA", list(range(100))), ("dupB", list(range(100)))],
        "doc_id string, tokens array<int>",
    )
    dedup.repeated_grams(docs, k=8).write.parquet(path)
    stored = spark.read.parquet(path)
    spans, _ = dedup.batch_duplicated_spans(docs.limit(10), stored, k=8)
    plan = _plan_of(spans)
    assert "BroadcastHashJoin" in plan, plan


def _tol_rows(spec):
    """spec: [(source, n_banned, n_flagged, n_ok)] → sequence rows.
    Row-level-ONLY violations (the partition stats verdict mirrors the
    n_tok bounds, so length violations can't demonstrate tolerance):
    banned rows contain token 999; flagged rows have an ``xx_``-prefixed
    doc_id for a custom check; ok rows have 20 clean tokens."""
    rows = []
    for src, n_banned, n_flagged, n_ok in spec:
        for i in range(n_banned):
            rows.append((f"{src}_b{i}", list(range(19)) + [999], 20, src))
        for i in range(n_flagged):
            rows.append((f"xx_{src}_f{i}", list(range(20)), 20, src))
        for i in range(n_ok):
            rows.append((f"{src}_k{i}", list(range(20)), 20, src))
    return rows


def _tol_df(spark, spec):
    return spark.createDataFrame(
        _tol_rows(spec),
        "doc_id string, tokens array<int>, n_tok int, source string",
    )


def test_violation_tolerance_partition_verdicts(spark):
    """max_violation_frac: a partition passes when every check's
    violation fraction is AT or below the tolerance (strict >), fails
    when any exceeds it; violation_rows stays the exact total and
    failing_ids still lists every tolerated row (row-level
    certification is unaffected by partition-level tolerance)."""
    from teleharvest_spark.config import CheckSuite

    suite = CheckSuite(banned_tokens=(999,), max_violation_frac=0.2)
    # src_a: 1/10 banned (0.1 ≤ 0.2) → pass; src_b: 3/10 (0.3) → fail;
    # src_c: 2/10 banned — exactly at tolerance → pass
    df = _tol_df(
        spark, [("src_a", 1, 0, 9), ("src_b", 3, 0, 7), ("src_c", 2, 0, 8)]
    )
    res = suite_plan.run_suite(df, suite)
    v = {r["source"]: r for r in res.verdicts.collect()}
    assert v["src_a"]["verdict"] == "pass"
    assert v["src_a"]["violation_rows"] == 1  # exact count preserved
    assert v["src_b"]["verdict"] == "fail"
    assert v["src_c"]["verdict"] == "pass"
    fids = {r["doc_id"] for r in res.failing_ids.collect()}
    assert "src_a_b0" in fids  # tolerated row is still not certifiable
    res.cleanup()

    # default suite (max_violation_frac=0.0): same data, all three fail
    res0 = suite_plan.run_suite(df, CheckSuite(banned_tokens=(999,)))
    assert {
        r["verdict"] for r in res0.verdicts.collect()
    } == {"fail"}
    res0.cleanup()


def test_per_check_tolerance_overrides_global(spark):
    """check_tolerances: the named check gets its own fraction; every
    other check keeps the global one (default 0.0 = strict)."""
    from teleharvest_spark.config import CheckSuite

    suite = CheckSuite(
        banned_tokens=(999,),
        custom_checks=(("bad_prefix", "doc_id LIKE 'xx_%'"),),
        check_tolerances=(("banned_token", 0.5),),
    )
    # src_a: 2/10 banned, tolerated (0.2 ≤ 0.5) → pass
    # src_b: 2/10 banned tolerated BUT 1 bad_prefix row at the strict
    # global 0.0 → fail
    df = _tol_df(spark, [("src_a", 2, 0, 8), ("src_b", 2, 1, 7)])
    res = suite_plan.run_suite(df, suite)
    v = {r["source"]: r for r in res.verdicts.collect()}
    assert v["src_a"]["verdict"] == "pass"
    assert v["src_b"]["verdict"] == "fail"
    res.cleanup()


def test_tolerance_is_suite_hash_sensitive_and_default_stable(spark):
    from teleharvest_spark.config import CheckSuite

    base = CheckSuite(min_n_tok=10)
    assert (
        CheckSuite(min_n_tok=10, max_violation_frac=0.0).suite_hash()
        == base.suite_hash()
    )
    assert CheckSuite(min_n_tok=10, max_violation_frac=0.1).suite_hash() != base.suite_hash()
    assert (
        CheckSuite(min_n_tok=10, check_tolerances=(("too_short", 0.5),)).suite_hash()
        != base.suite_hash()
    )


def test_length_tolerance_defers_stats_mirror(spark):
    """With a tolerance covering too_short, the partition-level
    min_n_tok stats mirror defers — the exact row-level count under its
    budget passes the partition (without the deferral one tolerated
    short row failed it through the stats side)."""
    from teleharvest_spark.config import CheckSuite

    rows = (
        [(f"a{i}", list(range(5)), 5, "src_a") for i in range(1)]
        + [(f"ak{i}", list(range(20)), 20, "src_a") for i in range(9)]
        + [(f"b{i}", list(range(5)), 5, "src_b") for i in range(4)]
        + [(f"bk{i}", list(range(20)), 20, "src_b") for i in range(6)]
    )
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    suite = CheckSuite(
        min_n_tok=10, check_tolerances=(("too_short", 0.2),)
    )
    res = suite_plan.run_suite(df, suite)
    v = {r["source"]: r for r in res.verdicts.collect()}
    assert v["src_a"]["verdict"] == "pass"   # 0.1 ≤ 0.2, mirror deferred
    assert "min_n_tok" not in v["src_a"]["failed_stat_checks"]
    assert v["src_b"]["verdict"] == "fail"   # 0.4 > 0.2
    res.cleanup()


def test_unknown_tolerance_name_raises(spark):
    from teleharvest_spark.config import CheckSuite
    import pytest

    df = spark.createDataFrame(
        [("d1", [1] * 20, 20, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    suite = CheckSuite(check_tolerances=(("banned-token", 0.1),))  # typo
    with pytest.raises(ValueError, match="match no check"):
        suite_plan.run_suite(df, suite)
