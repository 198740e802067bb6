"""Violation hotspot slicing (operators/slices.py) — planted-slice
recovery, NULL-value vs not-grouped distinction, support/arity knobs,
parent dominance, and the CLI pass."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from teleharvest_spark.operators import slices as sl


def _frame(spark, rows):
    return spark.createDataFrame(rows, "source string, band int, fail boolean")


@pytest.fixture(scope="module")
def planted(spark):
    """4 sources × 5 bands × 200 rows. Baseline: exactly 4 fails per
    (source, band) cell (2%); the planted hot cell (s3, band=2) fails
    120/200 (60%)."""
    rows = []
    for s in ["s0", "s1", "s2", "s3"]:
        for b in range(5):
            hot = s == "s3" and b == 2
            k = 120 if hot else 4
            rows += [(s, b, i < k) for i in range(200)]
    return _frame(spark, rows).cache()


def test_planted_pair_slice_tops_and_counts(planted):
    pdf = sl.violation_slices(planted, ["source", "band"], fail="fail")
    top = pdf.iloc[0]
    assert top["slice"] == "source=s3 & band=2"
    assert top["n"] == 200 and top["violations"] == 120
    assert top["flagged"] and not top["dominated"]
    assert top["rate"] == pytest.approx(0.6)
    # global baseline is exact: (19·4 + 120) / 4000
    assert top["global_rate"] == pytest.approx(196 / 4000)
    # both parents are hot too (the pair drives them) but carry less
    # evidence than the concentrated pair
    parents = pdf[pdf["slice"].isin(["source=s3", "band=2"])]
    assert len(parents) == 2 and (parents["z"] < top["z"]).all()


def test_uniform_parent_dominates_pairs(spark):
    # failure uniform across s2's bands: every (s2, band) pair carries
    # no evidence beyond the parent source=s2
    rows = []
    for s in ["s0", "s1", "s2"]:
        for b in range(4):
            k = 100 if s == "s2" else 2
            rows += [(s, b, i < k) for i in range(200)]
    pdf = sl.violation_slices(_frame(spark, rows), ["source", "band"], fail="fail")
    parent = pdf[pdf["slice"] == "source=s2"].iloc[0]
    assert parent["flagged"]
    pairs = pdf[(pdf["arity"] == 2) & pdf["slice"].str.contains("source=s2")]
    assert len(pairs) == 4 and pairs["dominated"].all()


def test_null_dim_value_is_its_own_slice(spark):
    rows = [(None, 0, i < 80) for i in range(100)]
    rows += [("s0", 0, False) for _ in range(400)]
    pdf = sl.violation_slices(_frame(spark, rows), ["source"], fail="fail", min_support=10)
    null_slice = pdf[pdf["slice"] == "source=∅"]
    assert len(null_slice) == 1
    assert null_slice.iloc[0]["n"] == 100 and null_slice.iloc[0]["violations"] == 80
    assert null_slice.iloc[0]["flagged"]


def test_min_support_prunes_micro_slices(planted):
    # every 1-dim slice has ≥ 1000 rows; pairs have 200
    pdf = sl.violation_slices(planted, ["source", "band"], fail="fail", min_support=500)
    assert (pdf["arity"] == 1).all()
    pdf2 = sl.violation_slices(planted, ["source", "band"], fail="fail", min_support=200)
    assert (pdf2["arity"] == 2).any()


def test_max_arity_cap(planted):
    pdf = sl.violation_slices(planted, ["source", "band"], fail="fail", max_arity=1)
    assert (pdf["arity"] == 1).all()
    assert set(pdf["slice"]) == {f"source=s{i}" for i in range(4)} | {
        f"band={b}" for b in range(5)
    }


def test_all_pass_corpus_flags_nothing(spark):
    rows = [("s0", b, False) for b in range(3) for _ in range(100)]
    pdf = sl.violation_slices(_frame(spark, rows), ["source", "band"], fail="fail")
    assert len(pdf) and not pdf["flagged"].any()
    assert (pdf["z"] == 0).all()


def test_zero_baseline_slice_with_fails_is_infinite_evidence(spark):
    # global rate > 0 always when any fail exists, so force the
    # degenerate p0=0 path via the scorer directly
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "slice": ["a=1", "a=2"],
            "_pieces": [["a=1"], ["a=2"]],
            "arity": [1, 1],
            "n": [100, 100],
            "violations": [5, 0],
            "rate": [0.05, 0.0],
            "global_rate": [0.0, 0.0],
            "lift": [None, None],
        }
    )
    scored = sl._score_pdf(pdf, alpha=1e-3)
    assert np.isposinf(scored["z"].iloc[0]) and scored["p_value"].iloc[0] == 0.0
    assert scored["flagged"].iloc[0]
    assert scored["z"].iloc[1] == 0.0 and not scored["flagged"].iloc[1]


def test_default_fail_reads_cascade_verdict(spark, suite):
    from teleharvest_spark import datagen
    from teleharvest_spark.operators import cascade

    seqs = datagen.generate_sequences(spark, 3000, suite)
    flagged = cascade.apply_cascade(seqs, cascade.sequence_checks(suite))
    pdf = sl.violation_slices(flagged, ["source"], min_support=1)
    exact = (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~F.col(cascade.VERDICT_COL)).cast("long")).alias("v"),
        )
        .collect()
    )
    got = {r["slice"]: (r["n"], r["violations"]) for _, r in pdf.iterrows()}
    for r in exact:
        key = f"source={r['source'] if r['source'] is not None else '∅'}"
        assert got[key] == (r["n"], r["v"])


def test_bucketized_bands(spark):
    df = spark.createDataFrame(
        [(0,), (63,), (64,), (127,), (-1,), (-64,), (None,)], "x int"
    ).select(sl.bucketized("x", 64).alias("b"))
    assert [r["b"] for r in df.collect()] == [0, 0, 64, 64, -64, -64, None]
    with pytest.raises(ValueError):
        sl.bucketized("x", 0)


def test_input_validation(planted):
    with pytest.raises(ValueError, match="duplicate"):
        sl.slice_profile(planted, ["source", "source"], fail="fail")
    with pytest.raises(ValueError, match="at least one"):
        sl.slice_profile(planted, [], fail="fail")
    with pytest.raises(ValueError, match="check_verdict"):
        sl.slice_profile(planted.drop("fail"), ["source"])


def test_cli_slice_pass(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 3000, suite).write.parquet(inp)
    rep = slice_pass(
        spark,
        inp,
        str(tmp_path / "out"),
        "r1",
        spec=("source", "n_tok:64"),
        suite=suite,
        min_support=5,
    )
    assert rep["dims"] == ["source", "n_tok_band"]
    assert rep["slices_scored"] > 0
    stored = spark.read.parquet(str(tmp_path / "out" / "slices" / "run_id=r1"))
    assert stored.count() == rep["slices_scored"]
    # the datagen fixture plants violations in specific sources — at
    # least one slice must flag, and the report surfaces it
    assert rep["slices_flagged"] >= 1 and len(rep["top_slices"]) >= 1


def test_slice_pass_validation_fails_before_any_job(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 500, suite).write.parquet(inp)
    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="not in table"):
        slice_pass(spark, inp, out, "r1", spec=("soruce",), suite=suite)
    with pytest.raises(ValueError, match="not in table"):
        slice_pass(spark, inp, out, "r1", spec=("nope:64",), suite=suite)
    with pytest.raises(ValueError, match="not an int"):
        slice_pass(spark, inp, out, "r1", spec=("n_tok:64x",), suite=suite)
    with pytest.raises(ValueError, match="width must be positive"):
        slice_pass(spark, inp, out, "r1", spec=("n_tok:0",), suite=suite)


def test_cli_sample_frac_refused_for_slice_and_zorder(spark, suite, tmp_path):
    from teleharvest_spark import cli, datagen

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 500, suite).write.parquet(inp)
    base = ["--input", inp, "--output", str(tmp_path / "o"), "--run-id", "r1"]
    with pytest.raises(SystemExit):
        cli.main(base + ["--slice-report", "source", "--sample-frac", "0.01"])
    with pytest.raises(SystemExit):
        cli.main(base + ["--zorder", "n_tok", "--sample-frac", "0.01"])


def test_violation_slices_top_k_none_keeps_full_lattice(planted):
    full = sl.violation_slices(planted, ["source", "band"], fail="fail", top_k=None)
    capped = sl.violation_slices(planted, ["source", "band"], fail="fail", top_k=5)
    assert len(full) == 29  # 4 sources + 5 bands + 20 pairs
    assert len(capped) == 5
    assert list(capped["slice"]) == list(full.head(5)["slice"])


def test_slice_pass_per_check_fail_bit(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 20_000, suite).write.parquet(inp)
    out = str(tmp_path / "out")
    # banned tokens are planted uniformly (slot on row id), so the
    # per-check report must NOT flag the sources the any-failure
    # report flags for unknown_source
    rep_any = slice_pass(spark, inp, out, "ra", spec=("source",), suite=suite,
                         min_support=5)
    rep_banned = slice_pass(spark, inp, out, "rb", spec=("source",), suite=suite,
                            min_support=5, check="banned_token")
    assert rep_any["check"] is None and rep_banned["check"] == "banned_token"
    any_slices = {t["slice"] for t in rep_any["top_slices"]}
    banned_slices = {t["slice"] for t in rep_banned["top_slices"]}
    assert "source=src_rogue" in any_slices      # 100% unknown_source
    assert "source=src_rogue" not in banned_slices
    # per-check totals match an exact count
    from pyspark.sql import functions as F
    from teleharvest_spark.operators import cascade

    flagged = cascade.apply_cascade(
        spark.read.parquet(inp), cascade.sequence_checks(suite)
    )
    n_banned = flagged.where(
        F.array_contains(F.col(cascade.FAILED_ALL_COL), "banned_token")
    ).count()
    stored = spark.read.parquet(f"{out}/slices/run_id=rb")
    got = (
        stored.where(F.col("arity") == 1)
        .agg(F.sum("violations").alias("v"))
        .first()["v"]
    )
    assert got == n_banned
    with pytest.raises(ValueError, match="matches no check"):
        slice_pass(spark, inp, out, "rc", spec=("source",), suite=suite,
                   check="nope")


def test_min_lift_floor_separates_practical_from_statistical(spark):
    # 100k rows/slice: a ~1.14x lift is statistically certain but below
    # the practical floor; the planted 3x slice flags either way
    rows = []
    for s, k in (("mild", 2000), ("hot", 3000), ("base1", 1000), ("base2", 1000)):
        rows += [(s, 0, i < k) for i in range(100_000)]
    df = _frame(spark, rows)
    strict = sl.violation_slices(df, ["source"], fail="fail", top_k=None)
    loose = sl.violation_slices(
        df, ["source"], fail="fail", top_k=None, min_lift=1.0
    )
    s_flag = set(strict[strict["flagged"]]["slice"])
    l_flag = set(loose[loose["flagged"]]["slice"])
    assert "source=hot" in s_flag and "source=mild" not in s_flag
    assert {"source=hot", "source=mild"} <= l_flag
    # z/p are untouched by the floor — only the flag moves
    assert strict.set_index("slice")["z"].equals(loose.set_index("slice")["z"])


def test_slice_pass_rejects_non_numeric_band_column(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 500, suite).write.parquet(inp)
    with pytest.raises(ValueError, match="must be numeric"):
        slice_pass(spark, inp, str(tmp_path / "o"), "r1",
                   spec=("source:64",), suite=suite)


def test_cli_sample_frac_refused_for_all_standalone_passes(spark, suite, tmp_path):
    from teleharvest_spark import cli, datagen

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 500, suite).write.parquet(inp)
    base = ["--input", inp, "--output", str(tmp_path / "o"), "--run-id", "r1",
            "--sample-frac", "0.01"]
    for extra in (["--skew-report", "source"],
                  ["--reconcile-against", inp],
                  ["--suggest-suite"],
                  ["--run-all"]):
        with pytest.raises(SystemExit):
            cli.main(base + extra)


def test_slice_profile_plan_scans_input_once(spark, planted):
    # the global baseline rides a whole-frame window over the cube —
    # a second cube branch would re-execute the full-table scan
    # subtree (caught in .explain during development; pinned here)
    prof = sl.slice_profile(planted, ["source", "band"], fail="fail")
    plan = prof._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan ExistingRDD") + plan.count("Scan parquet")
    assert n_scans <= 1, plan[:2000]
    assert plan.count("Expand") == 1


def test_slice_transitions_classes_and_deltas(spark):
    # run A: hot cell (s3,2); run B: that cell recovered, a NEW cell
    # (s1,4) went hot, and band=9 exists only in B
    def corpus(hot):
        rows = []
        for s in ["s0", "s1", "s2", "s3"]:
            for b in range(5):
                k = 120 if (s, b) == hot else 4
                rows += [(s, b, i < k) for i in range(200)]
        return _frame(spark, rows)

    a = sl.violation_slices(corpus(("s3", 2)), ["source", "band"],
                            fail="fail", top_k=None)
    b_df = corpus(("s1", 4)).unionByName(
        _frame(spark, [("s0", 9, False) for _ in range(100)])
    )
    b = sl.violation_slices(b_df, ["source", "band"], fail="fail", top_k=None)
    t = sl.slice_transitions(b, a).set_index("slice")
    assert t.loc["source=s1 & band=4", "transition"] == "quiet->hot"
    assert t.loc["source=s3 & band=2", "transition"] == "hot->quiet"
    assert t.loc["band=9", "transition"] == "absent->quiet"
    assert t.loc["source=s1 & band=4", "rate_delta"] > 0.5
    # regressions sort first
    assert sl.slice_transitions(b, a).iloc[0]["transition"] in (
        "quiet->hot", "absent->hot"
    )


def test_slice_transitions_missing_columns_raise(spark):
    import pandas as pd

    good = pd.DataFrame({"slice": ["a=1"], "rate": [0.1], "z": [1.0],
                         "flagged": [True], "n": [10]})
    with pytest.raises(ValueError, match="missing columns"):
        sl.slice_transitions(good, good.drop(columns=["z"]))


def test_cli_slice_compare_e2e(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 5000, suite).write.parquet(inp)
    out = str(tmp_path / "out")
    slice_pass(spark, inp, out, "r1", spec=("source",), suite=suite, min_support=5)
    rep = slice_pass(spark, inp, out, "r2", spec=("source",), suite=suite,
                     min_support=5, compare_to="r1")
    # identical corpus → every slice keeps its state, no regressions
    assert rep["compare_to"] == "r1"
    assert all(
        k in ("hot->hot", "quiet->quiet") for k in rep["transitions"]
    ), rep["transitions"]
    assert rep["new_hot"] == []
    stored = spark.read.parquet(f"{out}/slice_diff/run_id=r2")
    assert stored.where("rate_delta != 0").count() == 0
    with pytest.raises(ValueError, match="no stored slice lattice"):
        slice_pass(spark, inp, out, "r3", spec=("source",), suite=suite,
                   min_support=5, compare_to="nope")


def test_slice_compare_refuses_truncated_lattice(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 1000, suite).write.parquet(inp)
    out = str(tmp_path / "out")
    slice_pass(spark, inp, out, "r1", spec=("source",), suite=suite, min_support=5)
    with pytest.raises(ValueError, match="full lattice"):
        slice_pass(spark, inp, out, "r2", spec=("source",), suite=suite,
                   min_support=5, top_k=3, compare_to="r1")


def test_capped_dim_bounds_cardinality(spark):
    # one hot value, a long tail, NULLs: cap keeps the hot value, the
    # tail folds to __other__, NULL stays its own slice value
    rows = [("hot", 0, True)] * 50 + [
        (f"tail{i}", 0, False) for i in range(200)
    ] + [(None, 0, True)] * 5
    df = _frame(spark, rows)
    capped, col = sl.capped_dim(df, "source", k=1)
    assert col == "source_top"
    got = {r[col]: r["n"] for r in capped.groupBy(col).count()
           .withColumnRenamed("count", "n").collect()}
    assert got["hot"] == 50 and got["__other__"] == 200 and got[None] == 5
    # and the slice report over the capped dim localizes the hot value
    pdf = sl.violation_slices(capped, [col], fail="fail", min_support=5, top_k=None)
    idx = pdf.set_index("slice")
    assert idx.loc["source_top=hot", "flagged"]
    assert idx.loc["source_top=∅", "flagged"]
    assert not idx.loc["source_top=__other__", "flagged"]
    with pytest.raises(ValueError, match=">= 1"):
        sl.capped_dim(df, "source", k=0)


def test_cli_topk_cap_syntax(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 3000, suite).write.parquet(inp)
    rep = slice_pass(spark, inp, str(tmp_path / "o"), "r1",
                     spec=("source:top3",), suite=suite, min_support=5)
    assert rep["dims"] == ["source_top"]
    stored = spark.read.parquet(str(tmp_path / "o" / "slices" / "run_id=r1"))
    vals = {r["slice"] for r in stored.collect()}
    assert any(s.startswith("source_top=") for s in vals)
    assert len(vals) <= 6  # ≤ 3 kept + __other__ + ∅ + empty-string
    with pytest.raises(ValueError, match="not topK"):
        slice_pass(spark, inp, str(tmp_path / "o"), "r2",
                   spec=("source:topX",), suite=suite)


def test_capped_dim_binary_and_collision_guards(spark):
    # binary dims: the sketch runs on the string CAST, so the hot
    # value survives (review repro: str(bytearray) never matched the
    # cast and everything folded to __other__)
    rows = [(b"hot",)] * 50 + [(bytes([i]),) for i in range(30)]
    df = spark.createDataFrame(rows, "v binary")
    capped, col = sl.capped_dim(df, "v", k=1)
    got = {r[col]: r["count"] for r in capped.groupBy(col).count().collect()}
    assert got.get("hot") == 50 and got.get("__other__") == 30
    # double dims cap too (any type via the cast)
    dd = spark.createDataFrame([(1.5,)] * 10 + [(float(i),) for i in range(20)],
                               "v double")
    capped2, col2 = sl.capped_dim(dd, "v", k=1)
    got2 = {r[col2]: r["count"] for r in capped2.groupBy(col2).count().collect()}
    assert got2.get("1.5") == 10
    # a literal '__other__' in the top-K refuses loudly
    oth = spark.createDataFrame([("__other__",)] * 20 + [("x",)] * 5, "v string")
    with pytest.raises(ValueError, match="__other__"):
        sl.capped_dim(oth, "v", k=2)
    # output-column collision refuses
    from pyspark.sql import functions as SF

    coll = df.withColumn("v_top", SF.lit("boom"))
    with pytest.raises(ValueError, match="overwrite existing"):
        sl.capped_dim(coll, "v", k=1)


def test_slice_compare_refuses_cross_spec(spark, suite, tmp_path):
    from teleharvest_spark import datagen
    from teleharvest_spark.cli import slice_pass

    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 1000, suite).write.parquet(inp)
    out = str(tmp_path / "out")
    slice_pass(spark, inp, out, "r1", spec=("source", "n_tok:64"),
               suite=suite, min_support=5)
    with pytest.raises(ValueError, match="diff refused"):
        slice_pass(spark, inp, out, "r2", spec=("source",), suite=suite,
                   min_support=5, compare_to="r1")
    # same spec still compares fine
    rep = slice_pass(spark, inp, out, "r3", spec=("source", "n_tok:64"),
                     suite=suite, min_support=5, compare_to="r1")
    assert rep["compare_to"] == "r1"
