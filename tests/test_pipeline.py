"""Composed run-all pipeline: one warehouse, kill-between-stages
resume, idempotency (VERDICT r2 item 2; reference main.py:18-29)."""

from __future__ import annotations

import hashlib
import os

import pyspark.sql.functions as F

from teleharvest_spark import datagen, pipeline
from teleharvest_spark.streaming import refresh as vsink


def _seed(spark, suite, tmp_path):
    inp = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    embp = str(tmp_path / "emb")
    obsp = str(tmp_path / "obs")
    datagen.generate_sequences(spark, 3_000, suite).write.parquet(inp)
    import numpy as np

    rng = np.random.RandomState(11)
    emb_rows = [
        (int(i), rng.randn(8).astype(float).tolist(), int(i % 10)) for i in range(60)
    ]
    spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(embp)
    # stored metrics seed + fresh observations (metrics stage merges
    # fresh into stored within the (floor, watermark) window)
    stored = [("ch", s, 1, 1, 1) for s in range(10)]
    spark.createDataFrame(
        stored, "source string, doc_seq int, views int, reactions int, forwards int"
    ).write.parquet(str(tmp_path / "out" / "metrics"))
    fresh = [("ch", s, 100 + s, 10, 2) for s in range(1, 9) if s != 3] + [
        ("ch", 3, 0, 0, 0)  # F10-invalid: must not land
    ]
    spark.createDataFrame(
        fresh, "source string, doc_seq int, views int, reactions int, forwards int"
    ).write.parquet(obsp)
    return inp, out, embp, obsp


def _state_hash(spark, out: str) -> str:
    """Deterministic digest of the warehouse's final data state."""
    parts = []
    viol = spark.read.parquet(f"{out}/violations")
    parts.append(
        str(sorted((r["doc_id"], r["check_name"]) for r in viol.collect()))
    )
    sim = spark.read.parquet(f"{out}/similarity")
    parts.append(str(sorted((r["vec_id"], r["max_sim"]) for r in sim.collect())))
    met = vsink.read_stored(spark, f"{out}/metrics")
    parts.append(
        str(sorted(tuple(r) for r in met.select(
            "source", "doc_seq", "views", "reactions", "forwards").collect()))
    )
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def test_run_all_one_shot_then_idempotent(spark, suite, tmp_path):
    inp, out, embp, obsp = _seed(spark, suite, tmp_path)
    r1 = pipeline.run_all(
        spark, inp, out, suite, "p1", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert not r1["stages"]["validate"].get("skipped")
    assert r1["stages"]["similarity"]["rows"] == 30  # labels 5..9
    assert r1["stages"]["metrics"]["rows"] == 10
    h1 = _state_hash(spark, out)

    # metrics semantics: window (floor, watermark) exclusive + F10
    met = {r["doc_seq"]: r for r in vsink.read_stored(spark, f"{out}/metrics").collect()}
    assert met[0]["views"] == 1  # floor row untouched
    assert met[9]["views"] == 1  # watermark row untouched
    assert met[4]["views"] == 104  # in-window valid update applied
    assert met[3]["views"] == 1  # F10-invalid observation skipped

    # second run: every stage digest matches → all skipped, state unchanged
    r2 = pipeline.run_all(
        spark, inp, out, suite, "p2", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert all(s.get("skipped") for s in r2["stages"].values())
    assert _state_hash(spark, out) == h1


def test_run_all_kill_between_stages_resumes(spark, suite, tmp_path):
    """Die after stage 1; the re-run must skip validate (digest
    unchanged), run the remaining stages, and converge to the SAME
    final state as a one-shot run."""
    inp, out, embp, obsp = _seed(spark, suite, tmp_path)

    # reference one-shot warehouse for the expected final state
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    inp2, out2, embp2, obsp2 = _seed(spark, suite, ref_dir)
    pipeline.run_all(
        spark, inp2, out2, suite, "ref", embeddings_path=embp2, metrics_obs_path=obsp2
    )
    want = _state_hash(spark, out2)

    # "crash" after stage 1 only
    r1 = pipeline.run_all(
        spark, inp, out, suite, "p1",
        embeddings_path=embp, metrics_obs_path=obsp, stages=("validate",),
    )
    assert "similarity" not in r1["stages"]
    assert os.path.exists(f"{out}/_pipeline_state/validate.json")
    assert not os.path.exists(f"{out}/_pipeline_state/similarity.json")

    # resume: full pipeline
    r2 = pipeline.run_all(
        spark, inp, out, suite, "p2", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert r2["stages"]["validate"].get("skipped")
    assert r2["stages"]["similarity"]["rows"] == 30
    assert _state_hash(spark, out) == want


def test_run_all_input_change_requeues_stage(spark, suite, tmp_path):
    """A changed embeddings table re-runs ONLY the similarity stage."""
    inp, out, embp, obsp = _seed(spark, suite, tmp_path)
    pipeline.run_all(
        spark, inp, out, suite, "p1", embeddings_path=embp, metrics_obs_path=obsp
    )
    # append one more unpublished embedding
    spark.createDataFrame(
        [(999, [1.0] * 8, 9)], "vec_id long, embedding array<float>, label int"
    ).write.mode("append").parquet(embp)
    r2 = pipeline.run_all(
        spark, inp, out, suite, "p2", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert r2["stages"]["validate"].get("skipped")
    assert r2["stages"]["metrics"].get("skipped")
    assert r2["stages"]["similarity"]["rows"] == 31


def test_run_all_value_change_requeues_metrics(spark, suite, tmp_path):
    """ADVICE r3 (pipeline digests): refreshed observations covering the
    SAME (key, seq) pairs but new metric VALUES must re-run the merge —
    a key-only digest silently skipped it."""
    inp, out, embp, obsp = _seed(spark, suite, tmp_path)
    pipeline.run_all(
        spark, inp, out, suite, "p1", embeddings_path=embp, metrics_obs_path=obsp
    )
    # overwrite obs: identical (source, doc_seq) keys, bigger view counts
    fresh = [("ch", s, 500 + s, 20, 4) for s in range(1, 9) if s != 3] + [
        ("ch", 3, 0, 0, 0)
    ]
    spark.createDataFrame(
        fresh, "source string, doc_seq int, views int, reactions int, forwards int"
    ).write.mode("overwrite").parquet(obsp)
    r2 = pipeline.run_all(
        spark, inp, out, suite, "p2", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert not r2["stages"]["metrics"].get("skipped")
    met = {r["doc_seq"]: r for r in vsink.read_stored(spark, f"{out}/metrics").collect()}
    assert met[4]["views"] == 504  # the NEW values landed
    # and a third run with nothing changed skips again
    r3 = pipeline.run_all(
        spark, inp, out, suite, "p3", embeddings_path=embp, metrics_obs_path=obsp
    )
    assert r3["stages"]["metrics"].get("skipped")
