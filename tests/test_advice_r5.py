"""Pins for the round-5 ADVICE fixes (applied in the round-6
optimization pass): stop-word literal matching without a quoting hole,
dedup-index append refusal across semantics versions, scorer-client
close-on-eviction, and the streaming drift sink's legacy-layout guard.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def test_stop_word_check_backslash_e_literal(spark):
    """A stop word containing the literal '\\E' must match as a
    substring, not terminate a regex quote (the old \\Q...\\E hole)."""
    from teleharvest_spark.functions import text as TXT

    df = spark.createDataFrame(
        [
            ("1", r"path \E[0-9]+ here"),   # contains the literal word
            ("2", "E9 plain"),              # would match the LEAKED regex
            ("3", "nothing"),
        ],
        "id string, t string",
    )
    hit = {
        r["id"]: r["hit"]
        for r in df.select(
            "id",
            TXT.stop_word_check(F.col("t"), [r"\E[0-9]+"]).alias("hit"),
        ).collect()
    }
    assert hit["1"] == r"\E[0-9]+"  # literal containment matches
    assert hit["2"] is None         # no regex leak: 'E9' must NOT match
    assert hit["3"] is None


def test_dedup_index_append_refuses_cross_version(spark, tmp_path):
    from teleharvest_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "eta theta iota kappa lambda mu")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    dedup.write_dedup_index(docs, idx, k=3)
    marker = os.path.join(idx, "_index_commit")
    with open(marker, encoding="utf-8") as f:
        meta = json.load(f)
    assert meta["semantics"] == dedup.INDEX_SEMANTICS_VERSION

    # same params, same version → append fine
    more = spark.createDataFrame(
        [(3, "nu xi omicron pi rho sigma")], "doc_id long, text string"
    )
    dedup.write_dedup_index(more, idx, k=3, mode="append")

    # param mismatch → refused
    with pytest.raises(ValueError, match="mixed signature/token spaces"):
        dedup.write_dedup_index(more, idx, k=5, mode="append")

    # legacy marker without the version field reads as v1 → refused
    del meta["semantics"]
    with open(marker, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="mixed signature/token spaces"):
        dedup.write_dedup_index(more, idx, k=3, mode="append")


def test_scorer_client_closed_on_eviction():
    from teleharvest_spark.operators import scoring

    closed = []

    class FakeClient:
        def __init__(self, tag):
            self.tag = tag

        def close(self):
            closed.append(self.tag)

    old = dict(scoring._CLIENTS)
    scoring._CLIENTS.clear()
    try:
        def make_factory(tag):
            # distinct captured value → distinct cloudpickle bytes
            return lambda: FakeClient(tag)

        for i in range(scoring._CLIENTS_MAX + 2):
            scoring._client(make_factory(i))
        # two clients evicted, both closed in insertion order
        assert closed == [0, 1]
        assert len(scoring._CLIENTS) == scoring._CLIENTS_MAX
    finally:
        scoring._CLIENTS.clear()
        scoring._CLIENTS.update(old)


def test_windowed_drift_sink_rejects_legacy_flat_layout(spark, tmp_path):
    from teleharvest_spark.streaming import drift as sdrift

    sink = tmp_path / "sink"
    sink.mkdir()
    (sink / "part-00000-legacy.snappy.parquet").write_bytes(b"PAR1")
    baseline = spark.createDataFrame([(0, 10)], "bucket int, cnt long")
    with pytest.raises(ValueError, match="legacy append layout"):
        sdrift.windowed_drift_sink(spark, baseline, str(sink))
    # a fresh path (or batch_id-only tree) constructs fine
    ok = tmp_path / "sink2"
    sdrift.windowed_drift_sink(spark, baseline, str(ok))
