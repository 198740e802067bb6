"""Bloom prefilter (operators/bloom.py) — no-false-negative guarantee,
append/merge semantics, parameter identity, and bit-identical results
when wired into the incremental dedup index join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from teleharvest_spark.operators import bloom as BL, dedup

M = 1 << 14  # 16384 bits — ~16x the keys in these fixtures
K = 5


def _keys(spark, ids):
    return spark.createDataFrame([(i, i * 7 % 1000) for i in ids], "a int, b int")


def test_bloom_no_false_negatives_and_fpr(spark):
    """Every member survives the prefilter (exactness contract); and at
    16 bits/key most non-members drop (FPR sanity — generous bound,
    the analytic rate at 16 b/key, k=5 is ~0.06%)."""
    members = _keys(spark, range(0, 500))
    others = _keys(spark, range(500, 1500))
    bloom = BL.bloom_build(members, ["a", "b"], M, K)
    kept_members = BL.bloom_prefilter(members, bloom, ["a", "b"], M, K)
    assert kept_members.count() == 500
    fp = BL.bloom_prefilter(others, bloom, ["a", "b"], M, K).count()
    assert fp <= 50  # 5% of 1000 — far above the analytic ~0.06%


def test_bloom_prefilter_schema_and_plan(spark):
    """Output schema is the input's; the probes are broadcast hash
    joins (map-side — the whole point: zero shuffles of the probe)."""
    members = _keys(spark, range(50))
    bloom = BL.bloom_build(members, ["a", "b"], M, K)
    out = BL.bloom_prefilter(members, bloom, ["a", "b"], M, K)
    assert out.columns == ["a", "b"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # ONE broadcast build: the k probe joins share one canonical dim
    # plan (identical projection; only the subquery alias differs,
    # erased at analysis), so AQE's runtime stage reuse replaces the
    # other k-1 with ReusedExchange. Visible only in the FINAL
    # adaptive plan — execute THIS df (count() would plan separately)
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") >= K - 1, final


def test_bloom_write_read_append_fold(spark, tmp_path):
    """Two appended batch blooms fold to one filter covering both; a
    param-mismatched append is refused; meta round-trips."""
    p = str(tmp_path / "bloom")
    b1 = _keys(spark, range(0, 100))
    b2 = _keys(spark, range(100, 200))
    BL.write_bloom(BL.bloom_build(b1, ["a", "b"], M, K), p, M, K, ["a", "b"])
    BL.write_bloom(BL.bloom_build(b2, ["a", "b"], M, K), p, M, K, ["a", "b"])
    words, meta = BL.read_bloom(spark, p)
    assert meta == {"m_bits": M, "k": K, "cols": ["a", "b"]}
    both = _keys(spark, range(0, 200))
    assert BL.bloom_prefilter(both, words, ["a", "b"], M, K).count() == 200
    # folded: one row per word, not per (batch, word)
    assert words.groupBy("word").count().where("count > 1").count() == 0
    with pytest.raises(ValueError, match="param mismatch"):
        BL.write_bloom(BL.bloom_build(b1, ["a", "b"], M, 3), p, M, 3, ["a", "b"])


def test_index_bloom_coverage_invariant(spark, tmp_path):
    """<path>/bloom must cover EVERY key in <path>/buckets or the
    prefilter silently drops true candidates. write_dedup_index
    enforces it BEFORE any write: no bloomless append to a bloomed
    index, no bloom-introducing append to a bloomless one, no param
    drift — and mode='overwrite' retires a stale bloom."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    c1 = docs.where(F.pmod("doc_id", F.lit(4)) == 0)
    c2 = docs.where(F.pmod("doc_id", F.lit(4)) == 1)

    # (a) bloomless index + bloomed append → refused, nothing written
    idx_a = str(tmp_path / "idx_a")
    dedup.write_dedup_index(c1, idx_a, k=3)
    n_sigs = spark.read.parquet(f"{idx_a}/sigs").count()
    with pytest.raises(ValueError, match="has no bloom"):
        dedup.write_dedup_index(c2, idx_a, k=3, bloom_bits=1 << 20)
    assert spark.read.parquet(f"{idx_a}/sigs").count() == n_sigs

    # (b) bloomed index + bloomless append → refused, nothing written
    idx_b = str(tmp_path / "idx_b")
    dedup.write_dedup_index(c1, idx_b, k=3, bloom_bits=1 << 20)
    n_sigs = spark.read.parquet(f"{idx_b}/sigs").count()
    with pytest.raises(ValueError, match="stale"):
        dedup.write_dedup_index(c2, idx_b, k=3)
    assert spark.read.parquet(f"{idx_b}/sigs").count() == n_sigs

    # (c) param drift on append → refused BEFORE the sigs write
    with pytest.raises(ValueError, match="param mismatch"):
        dedup.write_dedup_index(c2, idx_b, k=3, bloom_bits=1 << 21)
    assert spark.read.parquet(f"{idx_b}/sigs").count() == n_sigs

    # (d) matching append maintains coverage: both batches' keys pass
    dedup.write_dedup_index(c2, idx_b, k=3, bloom_bits=1 << 20)
    words, meta = BL.read_bloom(spark, f"{idx_b}/bloom")
    all_buckets = spark.read.parquet(f"{idx_b}/buckets")
    kept = BL.bloom_prefilter(
        all_buckets, words, ["band", "bucket"], meta["m_bits"], meta["k"]
    )
    assert kept.count() == all_buckets.count()

    # (e) overwrite without bloom_bits retires the stale bloom...
    dedup.write_dedup_index(c1, idx_b, k=3, mode="overwrite")
    assert BL.bloom_meta_of(f"{idx_b}/bloom") is None
    # ...and overwrite may change params freely
    dedup.write_dedup_index(c1, idx_b, k=3, mode="overwrite", bloom_bits=1 << 18)
    assert BL.bloom_meta_of(f"{idx_b}/bloom")["m_bits"] == 1 << 18


def test_incremental_dedup_bloom_identical(spark, tmp_path):
    """incremental_dedup_pairs with the index bloom prefilter returns
    EXACTLY the pairs of the unfiltered path (no false negatives ⇒ no
    lost candidates; false positives die in the join) — on a fixture
    where most of the batch is novel, so the prefilter really drops
    rows."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where(F.pmod("doc_id", F.lit(3)) == 0)
    batch = docs.where(F.pmod("doc_id", F.lit(3)) == 1)
    idx = str(tmp_path / "dedup_index")
    dedup.write_dedup_index(corpus, idx, k=3, bloom_bits=1 << 20)
    sigs, buckets = dedup.read_dedup_index(spark, idx)
    words, meta = BL.read_bloom(spark, f"{idx}/bloom")

    def pairs(df):
        return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}

    plain = pairs(dedup.incremental_dedup_pairs(batch, sigs, buckets, k=3, threshold=0.5))
    bloomed = pairs(
        dedup.incremental_dedup_pairs(
            batch, sigs, buckets, k=3, threshold=0.5,
            index_bloom=words, bloom_meta=meta,
        )
    )
    assert bloomed == plain and len(plain) > 0

    # the prefilter actually prunes: batch bucket rows that survive the
    # bloom are strictly fewer than the full batch bucket count
    bsigs = dedup.minhash_signatures(batch, k=3)
    bbuckets = dedup.band_buckets(bsigs)
    n_all = bbuckets.count()
    n_kept = BL.bloom_prefilter(
        bbuckets, words, ["band", "bucket"], meta["m_bits"], meta["k"]
    ).count()
    assert n_kept < n_all

    # wrong/absent meta is refused (hashing params are the filter's identity)
    with pytest.raises(ValueError, match="bloom_meta"):
        dedup.incremental_dedup_pairs(
            batch, sigs, buckets, k=3, index_bloom=words, bloom_meta=None
        )
