"""Certified-rows output (cli.run emit_valid): passing rows persist,
failing rows are skipped — the reference's insert path (S4) — with
dynamic-partition-overwrite consistency under --resume and correctness
under violation sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark import cli, datagen
from teleharvest_spark.config import CheckSuite


def _suite():
    return CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )


def test_emit_valid_excludes_every_failing_row(spark, tmp_path):
    suite = _suite()
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 8000, suite).write.parquet(inp)
    out, cert = str(tmp_path / "wh"), str(tmp_path / "certified")
    rep = cli.run(spark, inp, out, suite, run_id="r1", emit_valid=cert)
    certified = spark.read.parquet(cert)
    assert rep["certified_rows"] == certified.count() > 0
    viol_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/violations").collect()
    }
    cert_ids = {r["doc_id"] for r in certified.collect()}
    assert not (cert_ids & viol_ids)
    # duplicated keys: BOTH copies are skipped (neither certifiable)
    assert certified.groupBy("doc_id").count().agg(F.max("count")).first()[0] == 1
    # exact partition: certified + failing rows = all rows
    n_failing = (
        spark.read.parquet(inp)
        .join(
            spark.read.parquet(f"{out}/violations")
            .select(F.col("doc_id").alias("_f"))
            .distinct(),
            F.col("doc_id").eqNullSafe(F.col("_f")),
            "left_semi",
        )
        .count()
    )
    assert rep["certified_rows"] + n_failing == rep["validated_rows"]
    # schema: original columns + the hive source_dir key
    assert set(certified.columns) == {
        "doc_id", "tokens", "n_tok", "source", "source_dir"
    }


def test_emit_valid_under_sampling_uses_uncapped_failures(spark, tmp_path):
    """With violation_sample the WRITTEN violations are a subset — the
    certified table must still exclude every failing row."""
    suite = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
        min_n_tok=600,  # systematic failure: most rows fail too_short
    )
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 4000, suite).write.parquet(inp)
    out, cert = str(tmp_path / "wh"), str(tmp_path / "cert")
    rep = cli.run(
        spark, inp, out, suite, run_id="r1",
        emit_valid=cert, violation_sample=3,
    )
    assert rep["violations_written"] < rep["violations"]
    certified = spark.read.parquet(cert)
    # no certified row may fail ANY check: re-run the cascade on them
    from teleharvest_spark.operators import cascade

    ann = cascade.apply_cascade(
        certified.drop("source_dir"), cascade.sequence_checks(suite)
    )
    assert ann.where(F.col(cascade.FIRST_FAIL_COL).isNotNull()).count() == 0
    assert rep["certified_rows"] == certified.count()


def test_emit_valid_resume_overwrites_only_pending_partition(spark, tmp_path):
    suite = _suite()
    v1 = datagen.generate_sequences(spark, 8000, suite)
    inp1 = str(tmp_path / "v1")
    v1.write.parquet(inp1)
    suite2 = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES) + ("src_new",),
    )
    newp = (
        v1.where(F.col("source") == "src_03")
        .withColumn("source", F.lit("src_new"))
        .withColumn("doc_id", F.concat(F.lit("new_"), F.col("doc_id")))
    )
    inp2 = str(tmp_path / "v2")
    spark.read.parquet(inp1).unionByName(newp).write.parquet(inp2)

    out, cert = str(tmp_path / "wh"), str(tmp_path / "cert")
    cli.run(spark, inp1, out, suite2, run_id="r1", emit_valid=cert)
    before = {
        r["doc_id"]
        for r in spark.read.parquet(cert)
        .where(F.col("source_dir") == "src_00")
        .collect()
    }
    rep2 = cli.run(
        spark, inp2, out, suite2, run_id="r2", resume=True, emit_valid=cert
    )
    after = spark.read.parquet(cert)
    # the new partition's certified rows landed...
    assert after.where(F.col("source_dir") == "src_new").count() > 0
    assert rep2["certified_rows"] > 0
    # ...and untouched partitions' certified dirs were NOT rewritten
    assert {
        r["doc_id"]
        for r in after.where(F.col("source_dir") == "src_00").collect()
    } == before


def test_certified_anti_join_broadcasts_failing_ids(spark, tmp_path):
    """Scale contract: the certified write's anti-join must broadcast
    the (usually tiny) failing-id set — a sort-merge anti-join here
    would shuffle-write the whole fact including the token arrays. AQE
    resolves the join at runtime, so the pin reads the FINAL adaptive
    plan after an action."""
    from teleharvest_spark import datagen
    from teleharvest_spark.plans import suite as suite_plan
    from teleharvest_spark.sources.writer import source_dir_col

    suite = _suite()
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 8000, suite).write.parquet(inp)
    sequences = spark.read.parquet(inp)
    res = suite_plan.run_suite(sequences, suite)
    fid = res.failing_ids.select(F.col("doc_id").alias("_fid"))
    valid = sequences.join(
        fid, F.col("doc_id").eqNullSafe(F.col("_fid")), "left_anti"
    ).withColumn("source_dir", source_dir_col())
    assert valid.count() > 0
    plan = valid._jdf.queryExecution().executedPlan().toString()
    res.cleanup()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_emit_valid_empty_certified_set_completes(spark, tmp_path):
    """Every row failing + emit_valid must complete the run (verdicts +
    manifest written) with certified_rows == 0 — AQE's empty-relation
    propagation eliminates the observe node, which must not crash the
    count retrieval."""
    suite = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=("nothing_matches",),  # every row unknown_source
    )
    inp = str(tmp_path / "seqs")
    datagen.generate_sequences(spark, 500, _suite()).write.parquet(inp)
    out, cert = str(tmp_path / "wh"), str(tmp_path / "cert")
    rep = cli.run(spark, inp, out, suite, run_id="r1", emit_valid=cert)
    assert rep["certified_rows"] == 0
    assert spark.read.parquet(f"{out}/verdicts/r1").count() > 0  # run completed
    import glob

    assert not glob.glob(f"{cert}/source_dir=*/*.parquet")


def test_emit_valid_resume_clears_now_failing_partition(spark, tmp_path):
    """A re-validated partition whose rows ALL fail now must lose its
    stale certified dir (dynamic overwrite alone writes nothing for an
    empty partition); untouched partitions keep theirs."""
    suite = _suite()
    v1 = datagen.generate_sequences(spark, 6000, suite)
    inp1 = str(tmp_path / "v1")
    v1.write.parquet(inp1)
    out, cert = str(tmp_path / "wh"), str(tmp_path / "cert")
    cli.run(spark, inp1, out, suite, run_id="r1", emit_valid=cert)
    before = spark.read.parquet(cert)
    assert before.where(F.col("source_dir") == "src_03").count() > 0
    n_before_00 = before.where(F.col("source_dir") == "src_00").count()

    # re-deliver src_03 fully corrupt (NULL payload on every row)
    corrupt = (
        v1.where(F.col("source") == "src_03")
        .withColumn("tokens", F.lit(None).cast("array<int>"))
        .withColumn("n_tok", F.lit(None).cast("int"))
    )
    inp2 = str(tmp_path / "v2")
    v1.where(F.col("source") != "src_03").unionByName(corrupt).write.parquet(inp2)
    rep = cli.run(
        spark, inp2, out, suite, run_id="r2", resume=True, emit_valid=cert
    )
    after = spark.read.parquet(cert)
    assert after.where(F.col("source_dir") == "src_03").count() == 0
    assert after.where(F.col("source_dir") == "src_00").count() == n_before_00


def test_emit_valid_full_run_drops_removed_source_dir(spark, tmp_path):
    """A full (non-resume) run statically overwrites the certified
    table — a source absent from the new input leaves no stale dir."""
    suite = _suite()
    v1 = datagen.generate_sequences(spark, 6000, suite)
    inp1, inp2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(inp1)
    v1.where(F.col("source") != "src_03").write.parquet(inp2)
    out, cert = str(tmp_path / "wh"), str(tmp_path / "cert")
    cli.run(spark, inp1, out, suite, run_id="r1", emit_valid=cert)
    assert (
        spark.read.parquet(cert).where(F.col("source_dir") == "src_03").count()
        > 0
    )
    cli.run(spark, inp2, str(tmp_path / "wh2"), suite, run_id="r2", emit_valid=cert)
    assert (
        spark.read.parquet(cert).where(F.col("source_dir") == "src_03").count()
        == 0
    )
