"""External-scorer enrichment stage (U3/U4): batched mapInPandas
scoring with retry/rate-limit handling, lazy rewrite (reference
processor.py:124-135), and the F9 degraded probe path wired through
pipeline.run_all."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from teleharvest_spark import pipeline
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.operators import cascade, scoring
from teleharvest_spark.operators.scoring import (
    RateLimited,
    Scorer,
    StubScorer,
    _call_with_retry,
    _stub_score,
    probe_scorer,
    score_stage,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 13 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 17 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("document  body "), F.col("id")))
        .alias("text"),
        (F.col("id") % 5).cast("string").alias("source"),
    )


def test_stub_score_deterministic_and_null_on_empty():
    s = StubScorer()
    a = s.score_batch(["hello world", None, "", "hello world"])
    assert a[0] == a[3] and a[0] is not None
    assert a[1] is None and a[2] is None
    assert 0.0 <= a[0] <= 100.0
    # rewrite: whitespace-normalized, None/empty passthrough to None
    r = s.rewrite_batch(["a   b\t c", None, ""])
    assert r == ["improved: a b c", None, None]


def test_score_stage_schema_and_determinism(spark):
    docs = _docs(spark)
    out = score_stage(docs, StubScorer, min_score=None).orderBy("doc_id")
    assert out.columns == ["doc_id", "text", "source", "score", "alt_text", "score_alt"]
    rows = out.collect()
    # NULL/empty text → NULL score and NULL alt (reference empty-text
    # short-circuit)
    for r in rows:
        if r["text"]:
            assert r["score"] == pytest.approx(_stub_score(r["text"]))
            assert r["alt_text"].startswith("improved: ")
            assert r["score_alt"] == pytest.approx(_stub_score(r["alt_text"]))
        else:
            assert r["score"] is None and r["alt_text"] is None
    # stable across runs (per-executor client, no RNG)
    again = score_stage(docs, StubScorer, min_score=None).orderBy("doc_id").collect()
    assert [r["score"] for r in again] == [r["score"] for r in rows]


def test_score_stage_lazy_rewrite_only_above_threshold(spark):
    """processor.py:124-135: alt/score_alt are computed ONLY for rows
    whose first score clears min_score (strict <= fails)."""
    docs = _docs(spark)
    thr = 50.0
    out = score_stage(docs, StubScorer, min_score=thr).collect()
    for r in out:
        if r["score"] is not None and r["score"] > thr:
            assert r["alt_text"] is not None and r["score_alt"] is not None
        else:
            assert r["alt_text"] is None and r["score_alt"] is None
    assert any(r["alt_text"] is not None for r in out)
    assert any(r["score"] is not None and r["alt_text"] is None for r in out)


def test_retry_backoff_recovers_and_exhausts():
    calls = {"n": 0}

    def flaky(texts):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RateLimited("429")
        return [1.0] * len(texts)

    out = _call_with_retry(flaky, ["a", "b"], max_retries=5, base_backoff=0.001)
    assert out == [1.0, 1.0] and calls["n"] == 3
    # exhausted retries → NULL scores, not a task failure (a hot quota
    # must not kill a 10^12-row job)
    def always(texts):
        raise RateLimited("429")

    assert _call_with_retry(always, ["a"], max_retries=2, base_backoff=0.001) == [None]


def test_score_stage_survives_rate_limited_client(spark):
    """A client that rate-limits every 3rd call still scores every row
    (the stage retries the same batch; StubScorer.calls advances so the
    retry succeeds)."""

    def factory():
        return StubScorer(fail_every=3)

    docs = _docs(spark, 100)
    out = score_stage(
        docs, factory, min_score=None, batch_size=16, base_backoff=0.001
    ).collect()
    scored = [r for r in out if r["text"]]
    assert scored and all(r["score"] is not None for r in scored)


def test_rate_gate_spaces_calls():
    import time

    gate = scoring._RateGate(max_calls_per_sec=100)
    t0 = time.monotonic()
    for _ in range(5):
        gate.wait()
    assert time.monotonic() - t0 >= 0.04  # ≥4 intervals of 10 ms
    # no cap → no sleep
    g2 = scoring._RateGate(None)
    t0 = time.monotonic()
    for _ in range(100):
        g2.wait()
    assert time.monotonic() - t0 < 0.05


def test_probe_scorer_handles_unavailable_and_errors():
    assert probe_scorer(StubScorer) is True
    assert probe_scorer(lambda: StubScorer(available=False)) is False

    class Broken(Scorer):
        def probe(self):
            raise RateLimited("out of credits")

    assert probe_scorer(Broken) is False


def test_run_all_score_stage_end_to_end(spark, tmp_path):
    """F7/F8 run end-to-end through the batched stage: violations are
    exactly the rows a driver-side cascade over the scored table
    flags."""
    docs_path = str(tmp_path / "docs")
    _docs(spark, 300).write.parquet(docs_path)
    suite = CheckSuite(min_score=40, min_score_alt=40)
    out = str(tmp_path / "wh")
    rep = pipeline.run_all(
        spark, docs_path, out, suite, run_id="r1",
        stages=("score",), scorer_factory=StubScorer,
        score_input_path=docs_path,
    )
    st = rep["stages"]["score"]
    assert st["rows"] == 300 and st["degraded"] is False
    scored = spark.read.parquet(f"{out}/scored")
    ann = cascade.apply_cascade(scored, cascade.scored_checks(suite))
    expect = ann.where(F.col(cascade.FIRST_FAIL_COL).isNotNull()).count()
    assert st["violations"] == expect > 0
    got = spark.read.parquet(f"{out}/score_violations")
    assert got.count() == expect
    assert set(got.columns) == {"doc_id", "check_name", "reason"}
    # resume: identical input + suite + availability → skipped
    rep2 = pipeline.run_all(
        spark, docs_path, out, suite, run_id="r2",
        stages=("score",), scorer_factory=StubScorer,
        score_input_path=docs_path,
    )
    assert rep2["stages"]["score"] == {"skipped": True}


def test_run_all_score_stage_degraded_probe(spark, tmp_path):
    """Probe fails → F9: rows pass UNSCORED (NULL columns, zero
    violations), and the degraded state does NOT satisfy resume once
    the scorer comes back."""
    docs_path = str(tmp_path / "docs")
    _docs(spark, 100).write.parquet(docs_path)
    suite = CheckSuite(min_score=40, min_score_alt=40)
    out = str(tmp_path / "wh")

    rep = pipeline.run_all(
        spark, docs_path, out, suite, run_id="r1",
        stages=("score",),
        scorer_factory=lambda: StubScorer(available=False),
        score_input_path=docs_path,
    )
    st = rep["stages"]["score"]
    assert st["degraded"] is True and st["violations"] == 0
    scored = spark.read.parquet(f"{out}/scored")
    assert scored.where(F.col("score").isNotNull()).count() == 0
    assert set(scored.columns) == {
        "doc_id", "text", "source", "score", "alt_text", "score_alt"
    }
    # scorer recovers → same input re-scores (digest includes health)
    rep2 = pipeline.run_all(
        spark, docs_path, out, suite, run_id="r2",
        stages=("score",), scorer_factory=StubScorer,
        score_input_path=docs_path,
    )
    assert rep2["stages"]["score"]["degraded"] is False
    assert rep2["stages"]["score"]["violations"] > 0
