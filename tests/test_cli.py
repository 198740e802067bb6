from __future__ import annotations

import json

from pyspark.sql import functions as F

from teleharvest_spark import cli, datagen
from teleharvest_spark.config import CheckSuite


def test_cli_run_and_resume(spark, suite, tmp_path):
    """Full job → outputs land; immediate re-run with resume skips
    everything (reference analogue: watermark re-derivation means a
    second run fetches nothing, processor.py:60-63)."""
    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    datagen.generate_sequences(spark, 5_000, suite).write.parquet(inp)

    r1 = cli.run(spark, inp, out, suite, run_id="r1")
    assert r1["validated_rows"] == 5_000
    assert r1["violations"] > 0
    assert not r1["skipped"]
    assert spark.read.parquet(f"{out}/violations").count() == r1["violations"]
    assert spark.read.parquet(f"{out}/verdicts/r1").count() == r1["partitions"]

    r2 = cli.run(spark, inp, out, suite, run_id="r2", resume=True)
    assert r2["skipped"] and r2["validated_rows"] == 0


def test_cli_resume_revalidates_changed_suite(spark, suite, tmp_path):
    """A threshold change invalidates the manifest (suite hash differs)
    → everything re-runs."""
    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    datagen.generate_sequences(spark, 2_000, suite).write.parquet(inp)
    cli.run(spark, inp, out, suite, run_id="r1")

    tighter = CheckSuite(
        banned_tokens=suite.banned_tokens,
        allowed_sources=suite.allowed_sources,
        min_n_tok=suite.min_n_tok + 1,
    )
    r2 = cli.run(spark, inp, out, tighter, run_id="r2", resume=True)
    assert not r2["skipped"]
    assert r2["validated_rows"] == 2_000


def test_suite_json_roundtrip(tmp_path):
    p = tmp_path / "suite.json"
    p.write_text(json.dumps({"min_n_tok": 32, "banned_tokens": [1, 2]}))
    s = cli.build_suite(str(p))
    assert s.min_n_tok == 32
    assert s.banned_tokens == (1, 2)
    assert cli.build_suite(None) == CheckSuite()


def test_cli_resume_drift_uses_full_baseline(spark, suite, tmp_path):
    """On resume, the drift_vs_global baseline must pool the FULL table
    — a single pending partition compared against itself would give
    KS/PSI ≈ 0 and silently pass the gate."""
    from pyspark.sql import functions as F

    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    seqs = datagen.generate_sequences(spark, 5_000, suite)
    seqs.write.parquet(inp)
    cli.run(spark, inp, out, suite, run_id="r1")

    # late data lands in the drifted partition only → it alone re-queues
    seqs.where(F.col("source") == "src_07").write.mode("append").parquet(inp)
    r2 = cli.run(spark, inp, out, suite, run_id="r2", resume=True)
    assert not r2["skipped"]
    assert r2["partitions"] == 1

    verd = spark.read.parquet(f"{out}/verdicts/r2").collect()
    assert len(verd) == 1 and verd[0]["source"] == "src_07"
    # src_07's n_tok is drifted (mean ×2, datagen) — vs the full-table
    # baseline KS must be clearly nonzero; self-compare would be ~0.
    assert verd[0]["ks"] > 0.05


def test_temporal_drift_baseline(spark, suite, tmp_path):
    """drift_baseline='previous': run 2 compares each source against
    ITS OWN run-1 histogram — a shifted source fails, stable sources
    pass, and the stored baseline advances run-over-run."""
    from pyspark.sql import functions as F

    inp1 = str(tmp_path / "seqs1")
    inp2 = str(tmp_path / "seqs2")
    out = str(tmp_path / "out")
    base = datagen.generate_sequences(spark, 3_000, suite)
    base.write.parquet(inp1)
    # run 2 input: same distribution EXCEPT src_01 shifts n_tok up 8x
    base.withColumn(
        "n_tok",
        F.when(F.col("source") == "src_01", F.col("n_tok") * 8).otherwise(
            F.col("n_tok")
        ),
    ).write.parquet(inp2)

    r1 = cli.run(
        spark, inp1, out, suite, run_id="t1", drift_baseline="previous"
    )
    assert not r1["skipped"]
    # baseline stored and pointer live
    assert (tmp_path / "out" / "_drift_baseline" / "_LATEST").exists()

    r2 = cli.run(
        spark, inp2, out, suite, run_id="t2", drift_baseline="previous"
    )
    v2 = {
        r["source"]: r
        for r in spark.read.parquet(f"{out}/verdicts/t2").collect()
        if r["source"] is not None
    }
    assert v2["src_01"]["drift_verdict"] == "fail"  # temporal shift caught
    assert v2["src_01"]["ks"] > suite.max_ks
    # a stable hot source matches its own previous histogram ~exactly
    assert v2["src_00"]["drift_verdict"] == "pass"
    assert v2["src_00"]["ks"] < 0.05

    # identical re-run vs the NEW baseline (which now holds run-2
    # histograms): every source self-compares → all pass
    r3 = cli.run(
        spark, inp2, out, suite, run_id="t3", drift_baseline="previous"
    )
    v3 = {
        r["source"]: r
        for r in spark.read.parquet(f"{out}/verdicts/t3").collect()
        if r["source"] is not None
    }
    assert all(v["drift_verdict"] == "pass" for v in v3.values())


def test_temporal_token_drift(spark, suite, tmp_path):
    """--token-drift: pass 1 stores the vocab baseline (no metrics);
    pass 2 on a vocab-shifted source fails that source only."""
    from pyspark.sql import functions as F

    inp1 = str(tmp_path / "tseqs1")
    inp2 = str(tmp_path / "tseqs2")
    out = str(tmp_path / "tout")
    base = datagen.generate_sequences(spark, 2_000, suite)
    base.write.parquet(inp1)
    # collapse src_01's vocab into the first histogram bucket (a
    # uniform cyclic shift would be histogram-invisible)
    base.withColumn(
        "tokens",
        F.when(
            F.col("source") == "src_01",
            F.transform("tokens", lambda t: F.pmod(t, F.lit(700)).cast("int")),
        ).otherwise(F.col("tokens")),
    ).write.parquet(inp2)

    r1 = cli.run(spark, inp1, out, suite, run_id="k1", token_drift=True)
    assert r1["token_drift_baseline"] is False  # first pass: baseline only
    assert (tmp_path / "tout" / "_token_drift_baseline" / "_LATEST").exists()

    r2 = cli.run(spark, inp2, out, suite, run_id="k2", token_drift=True)
    assert r2["token_drift_baseline"] is True
    rows = {
        r["source"]: r
        for r in spark.read.parquet(f"{out}/token_drift/k2").collect()
    }
    assert rows["src_01"]["drift_verdict"] == "fail"
    assert rows["src_00"]["drift_verdict"] == "pass"
    assert r2["token_drift_failed"] >= 1


def test_token_drift_resume_skips_untouched_sources(spark, suite, tmp_path):
    """ADVICE r3 (cli.py): under --resume, sources skipped this run are
    in the stored vocab baseline but absent from the run's histogram —
    they must NOT surface as ks=1.0/psi=inf failures. Only revalidated
    sources appear in the token_drift output."""
    from pyspark.sql import functions as F

    inp1 = str(tmp_path / "rseqs1")
    inp2 = str(tmp_path / "rseqs2")
    out = str(tmp_path / "rout")
    base = datagen.generate_sequences(spark, 2_000, suite)
    base.write.parquet(inp1)
    r1 = cli.run(spark, inp1, out, suite, run_id="v1", token_drift=True)
    assert r1["token_drift_baseline"] is False

    # mutate ONLY src_01: collapse its vocab (drift) and append a token
    # so n_tok moves and the manifest re-queues exactly that partition
    shifted = F.concat(
        F.transform("tokens", lambda t: F.pmod(t, F.lit(700)).cast("int")),
        F.array(F.lit(0).cast("int")),
    )
    base.withColumn(
        "tokens",
        F.when(F.col("source") == "src_01", shifted).otherwise(F.col("tokens")),
    ).withColumn(
        "n_tok",
        F.when(F.col("source") == "src_01", F.col("n_tok") + 1).otherwise(
            F.col("n_tok")
        ),
    ).write.parquet(inp2)

    r2 = cli.run(spark, inp2, out, suite, run_id="v2", resume=True, token_drift=True)
    assert r2["token_drift_baseline"] is True
    rows = {
        r["source"]: r
        for r in spark.read.parquet(f"{out}/token_drift/v2").collect()
    }
    # untouched sources were not revalidated -> not reported at all
    assert "src_00" not in rows
    assert set(rows) == {"src_01"}
    assert rows["src_01"]["drift_verdict"] == "fail"
    assert r2["token_drift_failed"] == 1


def test_quality_pass_writes_partitioned_violations(spark, tmp_path):
    """Document-side Gopher gate through the CLI: failures land in the
    shared partitioned violations layout (source_dir hive key, NULL and
    '' sources kept distinct), clean docs don't, and the report's
    per-rule counts reconcile with the written rows."""
    from pyspark.sql import Row

    repetitive = "spam spam\n" * 40                 # dup_line_frac ~ 1
    # every word distinct -> every line and every bigram unique
    clean = "\n".join(f"w{i}a w{i}b w{i}c w{i}d" for i in range(40))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=repetitive, source="web"),
            Row(doc_id=1, text=clean, source="web"),
            Row(doc_id=2, text=repetitive, source=None),
            Row(doc_id=3, text=repetitive, source=""),
        ]
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    docs.write.parquet(inp)

    rep = cli.quality_pass(spark, inp, out, run_id="q1")
    assert rep["docs"] == 4
    assert rep["quality_failed"] == 3
    assert rep["quality_failed_by_rule"].get("dup_line_frac") == 3

    written = spark.read.parquet(f"{out}/quality_violations")
    got = {r["doc_id"]: r for r in written.collect()}
    assert set(got) == {0, 2, 3}
    assert got[0]["source_dir"] == "web"
    assert got[2]["source_dir"] == "__null__"
    assert got[3]["source_dir"] == "__empty__"
    # raw source column survives inside the files, un-mangled
    assert got[2]["source"] is None and got[3]["source"] == ""
    assert all(r["run_id"] == "q1" for r in got.values())


def test_quality_pass_families_composed(spark, tmp_path):
    """families= widens the gate to the composed cascade: encoding
    failures get their own rule rows with encoding signal columns in
    the violation files, and legacy flat thresholds still mean
    repetition overrides."""
    from pyspark.sql import Row

    clean = "\n".join(f"w{i}a w{i}b w{i}c w{i}d" for i in range(40))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="bad � decode", source="web"),
            Row(doc_id=1, text=clean, source="web"),
            Row(doc_id=2, text="spam spam\n" * 40, source="web"),
        ]
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    docs.write.parquet(inp)

    rep = cli.quality_pass(
        spark, inp, out, run_id="qf", families=("encoding", "repetition")
    )
    assert rep["quality_failed"] == 2
    assert rep["quality_failed_by_rule"] == {
        "replacement_chars": 1, "dup_line_frac": 1,
    }
    written = spark.read.parquet(f"{out}/quality_violations")
    got = {r["doc_id"]: r for r in written.collect()}
    assert set(got) == {0, 2}
    # both families' signal columns are carried in the rows
    assert got[0]["n_replacement"] == 1
    assert got[2]["dup_line_frac"] > 0.3

    # legacy flat dict -> repetition thresholds (loosened: no failures
    # from repetition; doc 0 still fails encoding)
    rep2 = cli.quality_pass(
        spark, inp, str(tmp_path / "out2"), run_id="qf2",
        families=("encoding", "repetition"),
        thresholds={"max_dup_line_frac": 2.0, "max_dup_line_char_frac": 2.0,
                    "max_top_bigram_frac": 2.0},
    )
    assert rep2["quality_failed_by_rule"] == {"replacement_chars": 1}


def test_cli_main_quality_only(spark, tmp_path, capsys):
    """--quality-docs without --input runs the gate standalone."""
    from pyspark.sql import Row

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [Row(doc_id=0, text="x\n" * 30, source="s")]
    ).write.parquet(inp)
    rc = cli.main(
        ["--quality-docs", inp, "--output", out, "--run-id", "q2"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["quality_failed"] == 1


def test_cli_prep_docs_with_clean_and_mix_flags(spark, tmp_path, capsys):
    """--prep-docs + --prep-clean/--prep-mix drive the optional stages."""
    from pyspark.sql import Row

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    rows = [
        Row(
            doc_id=i,
            text="\n".join(
                [(f"unique sentence s{i}w{j} carries enough words to pass checks."
                  if j % 2 else
                  f"another thought t{i}x{j} brings fresh material for review here.")
                 for j in range(10)]
                + [f"mail person{i}@example.com about topic t{i} please now."]
            ),
            source="web" if i % 2 else "books",
        )
        for i in range(10)
    ]
    spark.createDataFrame(rows).write.parquet(inp)
    rc = cli.main([
        "--prep-docs", inp, "--output", out, "--run-id", "pc1",
        "--prep-clean", '{"pii": true}',
        "--prep-mix", '{"weights": {"books": 2.0}}',
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "clean" in rep["stages"] and "mixture" in rep["stages"]
    cleaned = spark.read.parquet(f"{out}/cleaned_docs")
    assert cleaned.where(F.col("text").contains("@example.com")).count() == 0
    mixed = spark.read.parquet(f"{out}/corpus_mixed")
    assert "copy" in mixed.columns


def test_cli_validate_embeddings_standalone(spark, tmp_path, capsys):
    """--validate-embeddings without --input: violations land in
    <out>/embedding_violations/run_id=<id> (overwrite = replay-
    idempotent) and the report counts by rule."""
    inp = str(tmp_path / "emb")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, None),
            (3, [1.0, 2.0, 3.0]),          # wrong dim (expect 2)
            (4, [float("nan"), 1.0]),
        ],
        "vec_id long, embedding array<float>",
    ).write.parquet(inp)
    args = [
        "--validate-embeddings", inp, "--emb-dim", "2",
        "--output", out, "--run-id", "e1",
    ]
    assert cli.main(args) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["embeddings"]
    assert rep["vectors"] == 4 and rep["embedding_failed"] == 3
    assert rep["embedding_failed_by_rule"] == {
        "null_vector": 1, "wrong_dim": 1, "nonfinite_element": 1,
    }
    # replay: same run_id overwrites, no duplicate rows
    assert cli.main(args) == 0
    capsys.readouterr()
    stored = spark.read.parquet(f"{out}/embedding_violations/run_id=e1")
    assert stored.count() == 3


def test_cli_history_anomalies(spark, suite, tmp_path):
    """Three clean runs build the per-partition metric history; a
    fourth run with a planted null-token burst in ONE source flags that
    source's null_rate (and only anomalies land in metric_anomalies/)."""
    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    seqs = datagen.generate_sequences(spark, 3_000, suite)
    seqs.write.parquet(inp)
    for rid in ("r1", "r2", "r3"):
        # non-resume: every partition appends a manifest row per run
        cli.run(spark, inp, out, suite, run_id=rid, drift=False)
    # under the 3-run minimum history nothing can flag yet (r3 itself
    # ran with only 2 prior rows, so a history pass there is silent)
    from teleharvest_spark.plans import history as H, manifest as mf

    rep3 = H.anomaly_report(mf.read_manifest(spark, out), "r3")
    assert rep3.where(F.col("anomaly")).count() == 0

    burst = (
        seqs.where(F.col("source") == "src_03")
        .withColumn("tokens", F.lit(None).cast("array<int>"))
        .withColumn("doc_id", F.concat(F.lit("burst_"), F.col("doc_id")))
    )
    seqs.unionByName(burst).write.mode("overwrite").parquet(inp)
    r4 = cli.run(
        spark, inp, out, suite, run_id="r4", drift=False,
        history_anomalies=True,
    )
    assert r4["anomalous_partitions"] >= 1
    flagged = spark.read.parquet(f"{out}/metric_anomalies/run_id=r4")
    rows = {(r["partition"], r["metric"]) for r in flagged.collect()}
    assert ("src_03", "null_rate") in rows
    # the per-check breakdown flows verdicts → manifest metrics →
    # history bands: the burst's null_payload count is ITS OWN anomaly
    # (absent from every clean run = zero-filled band)
    assert ("src_03", "viol_null_payload") in rows
    # every persisted row IS an anomaly; untouched sources stay silent
    assert flagged.where(~F.col("anomaly")).count() == 0
    assert ("src_01", "null_rate") not in rows
    assert not any(p == "src_01" for p, _ in rows)


def test_cli_skew_report(spark, tmp_path, capsys):
    """--skew-report profiles hot keys on --input and writes the
    evidence table under <out>/skew_profile/run_id=<id>."""
    from pyspark.sql import Row

    inp = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    rows = [Row(doc_id=f"d{i}", tokens=[1], n_tok=1, source="hot") for i in range(450)]
    rows += [
        Row(doc_id=f"c{i}", tokens=[1], n_tok=1, source=f"cold_{i}") for i in range(550)
    ]
    spark.createDataFrame(rows).repartition(4).write.parquet(inp)
    rc = cli.main(
        [
            "--input", inp, "--output", out, "--run-id", "sk1",
            "--skew-report", "source,doc_id", "--skew-min-share", "0.05",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hot = [k for k in rep["hot_keys"] if k["column"] == "source"]
    assert [k["key"] for k in hot] == ["hot"]
    assert hot[0]["share_lo"] >= 0.40 and hot[0]["suggested_salt"] >= 1
    # doc_id is unique -> no hot keys at a 5% share floor
    assert not [k for k in rep["hot_keys"] if k["column"] == "doc_id"]
    # persisted evidence table, replay-idempotent dir
    stored = spark.read.parquet(f"{out}/skew_profile/run_id=sk1")
    assert stored.count() == 1


def test_hot_tokens_churn(spark, tmp_path):
    """Cross-run hot-token churn: first pass stores the head, an
    identical pass holds it at overlap 1.0, a head shift is named
    entered/exited; the stored baseline advances each pass."""
    out = str(tmp_path / "wh")

    def seqs(hot_id):
        rows = [
            (f"d{i}", [hot_id, hot_id, i % 7], "s") for i in range(50)
        ]
        return spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, source string"
        )

    r1 = cli.hot_tokens_pass(spark, seqs(999), out, "h1", k=4)
    assert r1 == {"hot_tokens_baseline": False}

    r2 = cli.hot_tokens_pass(spark, seqs(999), out, "h2", k=4)
    assert r2["hot_tokens_baseline"] is True
    assert r2["hot_tokens_entered"] == 0 and r2["hot_tokens_exited"] == 0
    assert r2["hot_tokens_overlap"] == 1.0

    r3 = cli.hot_tokens_pass(spark, seqs(555), out, "h3", k=4)
    assert r3["hot_tokens_entered"] >= 1 and r3["hot_tokens_exited"] >= 1
    rows = spark.read.parquet(f"{out}/hot_tokens/h3").collect()
    by = {r["token"]: r["status"] for r in rows}
    assert by[555] == "entered" and by[999] == "exited"
    # baseline advanced: a fourth identical pass holds again
    r4 = cli.hot_tokens_pass(spark, seqs(555), out, "h4", k=4)
    assert r4["hot_tokens_overlap"] == 1.0


def test_cli_run_with_hot_tokens_flag(spark, suite, tmp_path):
    """--hot-tokens rides the validation run: first run stores the
    baseline, second reports churn keys in the merged report."""
    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    datagen.generate_sequences(spark, 2_000, suite).write.parquet(inp)
    r1 = cli.run(spark, inp, out, suite, run_id="t1", hot_tokens=True)
    assert r1["hot_tokens_baseline"] is False
    # second pass must NOT resume-skip (same data, new run) — force it
    r2 = cli.run(spark, inp, out, suite, run_id="t2", hot_tokens=True)
    assert r2["hot_tokens_baseline"] is True
    assert r2["hot_tokens_overlap"] == 1.0


def test_cli_drift_fdr_pass(spark, suite, tmp_path):
    """--drift-fdr writes per-source p-values + BH verdicts; a stable
    corpus whose sources share one distribution rejects nothing, a
    planted collapsed source is the only rejection."""
    from pyspark.sql import Row

    inp = str(tmp_path / "seq")
    out = str(tmp_path / "out")
    # a SMALL planted source: its 20 rows contaminate the pooled
    # baseline by only 0.5%, so the uniform sources' KS vs the pool
    # stays insignificant while the planted source's own KS ≈ 1
    rows = [
        Row(doc_id=f"d{s}_{i}", tokens=[1, 2], n_tok=(i % 10) * 128, source=f"s{s}")
        for s in range(8)
        for i in range(500)
    ]
    rows += [Row(doc_id=f"p{i}", tokens=[1], n_tok=9999, source="planted") for i in range(20)]
    spark.createDataFrame(rows).write.parquet(inp)

    rep = cli.run(
        spark, inp, out, suite, run_id="f1", drift_fdr_alpha=0.05
    )
    assert rep["drift_fdr_alpha"] == 0.05
    stored = spark.read.parquet(f"{out}/drift_fdr/f1")
    got = {r.source: r for r in stored.collect()}
    assert rep["drift_fdr_sources"] == 9
    # the uniform sources each hold 1/9 of the pool; the planted source
    # is the only one whose histogram diverges from the pooled baseline
    assert got["planted"].drift_verdict == "fail"
    rejected = {s for s, r in got.items() if r.reject}
    assert rejected == {"planted"}
    assert all(r.n_tests == 9 for r in got.values())


def test_cli_reconcile_pass(spark, tmp_path):
    """--reconcile-against: checksum verdicts name the touched
    partitions; the row diff covers exactly the touched slice."""
    from pyspark.sql import Row

    old_p = str(tmp_path / "old")
    new_p = str(tmp_path / "new")
    out = str(tmp_path / "out")
    rows = [
        Row(doc_id=f"d{i}", tokens=[i], n_tok=1, source=["a", "b", "c"][i % 3])
        for i in range(90)
    ]
    old = spark.createDataFrame(rows)
    old.write.parquet(old_p)
    # change one row in 'b', drop one row from 'c', leave 'a' alone
    old.withColumn(
        "tokens",
        F.when(F.col("doc_id") == "d1", F.array(F.lit(777))).otherwise(F.col("tokens")),
    ).where(F.col("doc_id") != "d2").write.parquet(new_p)

    rep = cli.reconcile_pass(spark, new_p, old_p, out, "rc1")
    assert rep["reconcile_by_status"] == {
        "match": 1, "content_mismatch": 1, "count_mismatch": 1
    }
    # drill-down names the changed column in the content-mismatch partition
    assert rep["changed_columns"] == ["tokens"]
    cols = {
        (r.source, r.column): r.status
        for r in spark.read.parquet(f"{out}/reconcile_columns/rc1").collect()
    }
    assert cols == {("b", "tokens"): "content_mismatch"}
    diff = {
        r.doc_id: r.status
        for r in spark.read.parquet(f"{out}/reconcile_diff/rc1").collect()
    }
    assert diff == {"d1": "changed", "d2": "removed"}

    # main() wiring, standalone mode
    rc = cli.main(
        [
            "--input", new_p, "--output", out, "--run-id", "rc2",
            "--reconcile-against", old_p,
        ]
    )
    assert rc == 0


def test_cli_drift_fdr_temporal_baseline_mix_shift(spark, suite, tmp_path):
    """--drift-fdr with --drift-baseline previous: run 2 scores vs run
    1's stored per-source baseline — identical data → zero FDR
    rejections AND a passing categorical mix-shift line; a doubled
    source in run 3 fails the mix test."""
    from pyspark.sql import Row

    inp = str(tmp_path / "seq")
    inp3 = str(tmp_path / "seq3")
    out = str(tmp_path / "out")
    rows = [
        Row(doc_id=f"d{s}_{i}", tokens=[1, 2], n_tok=(i % 10) * 128, source=f"s{s}")
        for s in range(4)
        for i in range(300)
    ]
    spark.createDataFrame(rows).write.parquet(inp)
    # run 3 input: source s0 quadrupled (mix shift, same per-source shape)
    extra = [
        Row(doc_id=f"x{i}", tokens=[1, 2], n_tok=(i % 10) * 128, source="s0")
        for i in range(900)
    ]
    spark.createDataFrame(rows + extra).write.parquet(inp3)

    r1 = cli.run(spark, inp, out, suite, run_id="t1", drift_baseline="previous")
    assert "mix_verdict" not in r1  # no FDR pass requested
    r2 = cli.run(
        spark, inp, out, suite, run_id="t2",
        drift_baseline="previous", drift_fdr_alpha=0.05,
    )
    assert r2["drift_fdr_rejected"] == 0
    assert r2["mix_verdict"] == "pass" and r2["mix_chi2"] == 0.0
    r3 = cli.run(
        spark, inp3, out, suite, run_id="t3",
        drift_baseline="previous", drift_fdr_alpha=0.05,
    )
    assert r3["mix_verdict"] == "fail"
    # the per-source SHAPES are unchanged → FDR should not reject s0
    assert r3["drift_fdr_rejected"] == 0


def test_cli_preflight_sample(spark, suite, tmp_path):
    """--sample-frac: deterministic content-hash pre-flight — sampled
    rows validate, estimates scale by 1/frac, and NO durable state a
    full run would trust is written (no manifest, no real-violations
    append, preflight dir run-keyed)."""
    import os

    import pytest

    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    datagen.generate_sequences(spark, 5_000, suite).write.parquet(inp)

    r1 = cli.run(spark, inp, out, suite, run_id="p1", sample_frac=0.2)
    assert 0 < r1["validated_rows"] < 5_000
    assert r1["sample_frac"] == 0.2
    assert r1["estimated_rows"] == round(r1["validated_rows"] / 0.2)
    assert r1["estimated_violations"] == round(r1["violations"] / 0.2)
    # determinism: the same carve twice
    r2 = cli.run(spark, inp, out, suite, run_id="p2", sample_frac=0.2)
    assert r2["validated_rows"] == r1["validated_rows"]
    # durable-state contract
    assert os.path.exists(f"{out}/violations_preflight/p1")
    assert not os.path.exists(f"{out}/violations")
    assert not os.path.exists(f"{out}/_manifest")
    # a later FULL run starts from a clean manifest: resume revalidates
    r3 = cli.run(spark, inp, out, suite, run_id="full", resume=True)
    assert not r3["skipped"] and r3["validated_rows"] == 5_000

    # stateful options refused
    with pytest.raises(ValueError, match="pre-flight"):
        cli.run(spark, inp, out, suite, run_id="x", sample_frac=0.2, resume=True)
    with pytest.raises(ValueError, match="pre-flight"):
        cli.run(
            spark, inp, out, suite, run_id="x", sample_frac=0.2,
            drift_baseline="previous",
        )
    with pytest.raises(ValueError, match="sample_frac"):
        cli.run(spark, inp, out, suite, run_id="x", sample_frac=1.5)


def test_cli_main_slices_with_suite(spark, tmp_path, capsys):
    """--slices runs the slice report inside the validate run (shared
    decode) and the report + stored lattice land like --slice-report."""
    suite = CheckSuite(
        banned_tokens=datagen.BANNED_IDS,
        allowed_sources=tuple(datagen.SOURCES),
    )
    inp, out = str(tmp_path / "seqs"), str(tmp_path / "wh")
    datagen.generate_sequences(spark, 4000, suite).write.parquet(inp)
    sj = str(tmp_path / "suite.json")
    with open(sj, "w") as f:
        json.dump(
            {
                "banned_tokens": list(suite.banned_tokens),
                "allowed_sources": list(suite.allowed_sources),
            },
            f,
        )
    rc = cli.main(
        [
            "--input", inp, "--output", out, "--run-id", "r1",
            "--suite-json", sj, "--slices", "source,n_tok:64",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["slices"]["slices_scored"] > 0
    stored = spark.read.parquet(f"{out}/slices/run_id=r1")
    assert stored.count() == rep["slices"]["slices_scored"]
    assert {r["spec"] for r in stored.select("spec").distinct().collect()} == {
        "source,n_tok:64"
    }
