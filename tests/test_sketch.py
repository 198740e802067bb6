"""Misra-Gries heavy hitters: guarantee pins + skew profile."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.operators import sketch


def _exact_counts(rows):
    return Counter(r for r in rows if r is not None)


@pytest.fixture(scope="module")
def skewed_rows():
    # Zipf-ish: key_0 dominates, long tail of singletons.
    rows = []
    for i in range(40):
        rows.extend([f"key_{i}"] * max(1, 400 // (i + 1)))
    rows.extend(f"tail_{i}" for i in range(200))
    rows.append(None)
    return rows


def test_exact_when_capacity_sufficient(spark, skewed_rows):
    df = spark.createDataFrame([(r,) for r in skewed_rows], "k string").repartition(6)
    out = sketch.heavy_hitters(df, "k", k=10, capacity=10_000).collect()
    exact = _exact_counts(skewed_rows)
    assert out[0]["err_bound"] == 0
    assert out[0]["n_obs"] == sum(exact.values())
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["k"], r["est_lo"]) for r in out] == top
    assert all(r["est_hi"] == r["est_lo"] for r in out)


@pytest.mark.parametrize("parts", [1, 7])
def test_bounds_under_pressure(spark, skewed_rows, parts):
    df = spark.createDataFrame([(r,) for r in skewed_rows], "k string").repartition(parts)
    exact = _exact_counts(skewed_rows)
    n = sum(exact.values())
    out = sketch.heavy_hitters(df, "k", k=10_000, capacity=8).collect()
    err = out[0]["err_bound"]
    assert 0 < err <= n // 9 + parts  # D <= n_obs/(capacity+1), summed per partition
    for r in out:
        true = exact[r["k"]]
        assert r["est_lo"] <= true <= r["est_hi"], r
    # presence guarantee: every key with true count > D surfaces
    found = {r["k"] for r in out}
    for key, c in exact.items():
        if c > err:
            assert key in found, (key, c, err)


def test_all_equal_counts_drain_to_sentinel(spark):
    # 3 distinct singletons at capacity 2 in ONE partition: the third
    # insert decrements everything to zero -> empty summary, dec carried
    # on the NULL-key sentinel row; the API returns no keys, not a crash.
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "k string").coalesce(1)
    out = sketch.heavy_hitters(df, "k", k=10, capacity=2)
    assert out.count() == 0
    summ = sketch.mg_summaries(df.coalesce(1), "k", capacity=2).collect()
    assert len(summ) == 1 and summ[0]["k"] is None
    assert summ[0]["__mg_dec"] == 1 and summ[0]["__mg_n_obs"] == 3


def test_empty_and_all_null(spark):
    empty = spark.createDataFrame([], "k string")
    assert sketch.heavy_hitters(empty, "k", k=5).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "k string")
    assert sketch.heavy_hitters(nulls, "k", k=5).count() == 0


def test_token_heavy_hitters_vs_exact(spark):
    rows = []
    for i in range(300):
        toks = [7, 7, i % 50, 100 + i % 11]
        rows.append((f"d{i}", toks))
    rows.append(("dnull", None))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>").repartition(5)
    out = sketch.token_heavy_hitters(df, k=5, capacity=4096).collect()
    exact = Counter()
    for _, toks in rows:
        exact.update(toks or [])
    assert out[0]["tokens"] == 7 and out[0]["est_lo"] == exact[7]
    assert out[0]["err_bound"] == 0
    top5 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["tokens"], r["est_lo"]) for r in out] == top5


def test_token_bounds_under_pressure(spark):
    rows = [(f"d{i}", [i % 97, 7, (i * 13) % 211]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>").repartition(4)
    exact = Counter()
    for _, toks in rows:
        exact.update(toks)
    out = sketch.token_heavy_hitters(df, k=1000, capacity=16).collect()
    err = out[0]["err_bound"]
    assert err > 0
    for r in out:
        assert r["est_lo"] <= exact[r["tokens"]] <= r["est_hi"]
    found = {r["tokens"] for r in out}
    for tok, c in exact.items():
        if c > err:
            assert tok in found


def test_skew_profile_detects_hot_key(spark):
    rows = [("hot",)] * 500 + [(f"cold_{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "source string").repartition(6)
    prof = sketch.skew_profile(
        df, "source", capacity=64, min_share=0.05, target_parallelism=32
    ).collect()
    assert [r["source"] for r in prof] == ["hot"]
    r = prof[0]
    assert r["share_lo"] >= 0.40  # true share 0.5 minus MG slack
    assert r["suggested_salt"] >= 13  # ceil(share_lo * 32)


def test_rejects_bad_types(spark):
    df = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(ValueError, match="unsupported"):
        sketch.heavy_hitters(df, "x")
    df2 = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(ValueError, match="expected array"):
        sketch.heavy_hitters(df2, "x", flatten=True)
    with pytest.raises(ValueError, match="capacity"):
        sketch.heavy_hitters(df2, "x", capacity=0)


def test_streaming_token_heavy_hitters_state_carryover(spark, tmp_path):
    """Streaming twin: per-key MG state folds ACROSS micro-batches and
    query restarts — run 2 (same checkpoint, new files) emits counts
    cumulative over everything ingested so far, and only for keys the
    trigger touched (update semantics)."""
    from teleharvest_spark.streaming.sketch import streaming_token_heavy_hitters

    drop = tmp_path / "hh_drop"
    drop.mkdir()
    ckpt = str(tmp_path / "hh_ckpt")
    schema = "doc_id string, tokens array<int>, source string"

    def run(rows):
        # foreachBatch sink: the memory sink refuses checkpoint recovery,
        # and this test's whole point is the run-2 restart.
        spark.createDataFrame(rows, schema).write.mode("append").parquet(str(drop))
        stream = spark.readStream.schema(schema).parquet(str(drop))
        out = streaming_token_heavy_hitters(stream, capacity=64, k=4)
        got: list = []

        def sink(batch_df, _bid):
            got.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    got1 = run([("d1", [7, 7, 1], "a"), ("d2", [7, 2], "a"), ("d3", [9], "b")])
    by_key1 = {(r["source"], r["token"]): r for r in got1}
    assert by_key1[("a", 7)]["est_lo"] == 3
    assert by_key1[("a", 7)]["err_bound"] == 0
    assert by_key1[("b", 9)]["est_lo"] == 1

    # second run, same checkpoint: only the new file is processed; key
    # "a" folds onto its stored summary, key "b" is untouched (no rows)
    got2 = run([("d4", [7, 7, 7, 2], "a")])
    assert {r["source"] for r in got2} == {"a"}
    by_tok2 = {r["token"]: r for r in got2}
    assert by_tok2[7]["est_lo"] == 6  # 3 from run 1 + 3 new
    assert by_tok2[2]["est_lo"] == 2
    assert by_tok2[7]["n_obs"] == 9  # all tokens for "a" so far
    # deterministic ordering inside the emitted top-k: est desc, id asc
    assert [r["token"] for r in got2] == [7, 2, 1]


def test_int64_keys_survive_nulls_exactly(spark):
    """xxhash64-scale keys (> 2^53) must come back bit-exact even when
    NULL rows/elements share the scan — a NULL reaching the Arrow→
    pandas boundary turns the long column float64 and ROUNDS the keys
    (2^60+1 and 2^60+2 collide); the JVM-side null filter prevents it."""
    a, b = (1 << 60) + 1, (1 << 60) + 2
    rows = [(a,)] * 3 + [(b,)] * 2 + [(None,)]
    df = spark.createDataFrame(rows, "k long").coalesce(1)
    out = {r["k"]: r["est_lo"] for r in sketch.heavy_hitters(df, "k", k=5).collect()}
    assert out == {a: 3, b: 2}

    arr = spark.createDataFrame(
        [([a, None, a],), ([b],), (None,)], "ks array<long>"
    ).coalesce(1)
    got = {
        r["ks"]: r["est_lo"]
        for r in sketch.heavy_hitters(arr, "ks", k=5, flatten=True).collect()
    }
    assert got == {a: 2, b: 1}


def test_reserved_key_names_raise(spark):
    df = spark.createDataFrame([(1,)], "est long")
    with pytest.raises(ValueError, match="collides"):
        sketch.heavy_hitters(df, "est")


def test_streaming_drain_emits_bounds_sentinel():
    """A trigger that drains a key's summary must still emit a row
    (NULL token, current bounds) — update-mode sinks would otherwise
    retain the previous trigger's stale top-k for that key."""
    import pandas as pd

    from teleharvest_spark.streaming.sketch import _hh_update_fn

    class _FakeState:
        def __init__(self):
            self._v, self.exists = None, False

        def update(self, v):
            self._v, self.exists = v, True

        @property
        def get(self):
            return self._v

    fn = _hh_update_fn("source", "tokens", capacity=2, k=4)
    state = _FakeState()
    # 3 distinct singletons at capacity 2 -> everything decrements away
    batch = pd.DataFrame({"tokens": [[1], [2], [3]]})
    out = list(fn(("a",), iter([batch]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["token"] is None or pd.isna(row["token"])
    assert row["est_lo"] == 0 and row["err_bound"] == 1 and row["n_obs"] == 3
    assert state.get == ([], [], 1, 3)
    # a later healthy trigger emits real rows again, folding the state
    out2 = list(fn(("a",), iter([pd.DataFrame({"tokens": [[7, 7]]})]), state))
    r2 = {r["token"]: r for _, r in out2[0].iterrows()}
    assert r2[7]["est_lo"] == 2 and r2[7]["est_hi"] == 3  # + carried dec
