"""Pins for bench.py's fresh-JVM suite measurement (fresh_suite_bench).

The headline seq_per_sec in the BENCH record comes from this path at
full suite scale, so its two contracts need pins: (a) any subprocess
failure degrades to None (bench falls back to the in-bench figure,
never crashes), and (b) a healthy child produces the documented shape —
`timed` samples, matching ext_cores, median/seq_per_sec arithmetic.
"""
from __future__ import annotations

import bench


def test_fresh_suite_falls_back_on_child_death(monkeypatch, tmp_path):
    # child dies before READY → None, quickly (no deadline wait)
    from teleharvest_spark import benchproto

    monkeypatch.setattr(benchproto, "CHILD_SOURCE", "import sys; sys.exit(3)")
    out = bench.fresh_suite_bench(str(tmp_path / "nope.parquet"), 2, 1000)
    assert out is None


def test_fresh_suite_falls_back_on_garbage_output(monkeypatch, tmp_path):
    # child that never prints READY but exits cleanly → None
    from teleharvest_spark import benchproto

    monkeypatch.setattr(benchproto, "CHILD_SOURCE", "print('not-ready')")
    out = bench.fresh_suite_bench(str(tmp_path / "nope.parquet"), 2, 1000)
    assert out is None


def test_fresh_suite_happy_path_shape(monkeypatch, spark, suite, tmp_path):
    # real child JVM over a tiny table: protocol shape, not throughput.
    # Stub the child to skip Spark entirely would defeat the pin — but a
    # full child JVM on 1k rows costs ~40 s; keep it to ONE test and the
    # minimum timed count that still exercises the median path.
    from teleharvest_spark import datagen

    data = str(tmp_path / "seqs.parquet")
    datagen.generate_sequences(spark, 1_000, suite).write.parquet(data)
    out = bench.fresh_suite_bench(data, 2, 1_000, warm_max=2, timed=2)
    assert out is not None, "healthy child must not fall back"
    assert len(out["samples_sec"]) == 2
    assert len(out["ext_cores"]) == 2
    assert out["rows"] == 1_000 and out["cores"] == 2
    # samples_sec is rounded to 2 dp, median_sec to 3 dp, and
    # seq_per_sec is computed from the UNROUNDED median — compare with
    # tolerances, not equality, or 3-dp rounding flakes the assert
    import statistics
    assert abs(out["median_sec"] - statistics.median(out["samples_sec"])) < 0.01
    assert abs(out["seq_per_sec"] - 1_000 / out["median_sec"]) < 1.0
    assert out["seq_per_sec_best"] >= out["seq_per_sec"]
