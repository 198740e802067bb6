from __future__ import annotations

import pyspark.sql.functions as F

from teleharvest_spark import datagen


def test_parallelism_independence(spark, suite):
    """Byte-identical output at different partition counts — the
    property that makes the two-cluster-size benchmark meaningful."""
    a = datagen.generate_sequences(spark, 5_000, suite, num_partitions=4)
    b = datagen.generate_sequences(spark, 5_000, suite, num_partitions=16)
    ha = a.select(F.sum(F.xxhash64("doc_id", "n_tok", "source") % 1000000007).alias("h")).collect()[0]["h"]
    hb = b.select(F.sum(F.xxhash64("doc_id", "n_tok", "source") % 1000000007).alias("h")).collect()[0]["h"]
    assert ha == hb
    # token payloads too
    ta = a.select(F.sum(F.xxhash64(F.to_json("tokens")) % 1000000007).alias("h")).collect()[0]["h"]
    tb = b.select(F.sum(F.xxhash64(F.to_json("tokens")) % 1000000007).alias("h")).collect()[0]["h"]
    assert ta == tb


def test_planted_rates(spark, sequences):
    n = sequences.count()
    dup = sequences.groupBy("doc_id").count().where(F.col("count") > 1).count()
    assert 0 < dup < n * 0.01
    nulls = sequences.where(F.col("tokens").isNull()).count()
    assert 0 < nulls < n * 0.01
    rogue = sequences.where(F.col("source") == datagen.ROGUE_SOURCE).count()
    assert 0 < rogue < n * 0.02


def test_hot_source_skew(spark, sequences):
    counts = {r["source"]: r["count"] for r in sequences.groupBy("source").count().collect()}
    total = sum(counts.values())
    assert counts[datagen.SOURCES[0]] / total > 0.4  # ~50% hot key


def test_n_tok_consistency_except_planted(spark, sequences):
    bad = sequences.where(
        F.col("tokens").isNotNull() & (F.col("n_tok") != F.size("tokens"))
    ).count()
    n = sequences.count()
    assert 0 < bad < n * 0.01  # only the planted inconsistent slot
