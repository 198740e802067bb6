from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from teleharvest_spark import multimodal
from teleharvest_spark.config import CheckSuite
from teleharvest_spark.streaming import ingest


def test_streaming_violation_counts(spark, suite, tmp_path):
    """Drive the streaming cascade synchronously over a static drop."""
    from teleharvest_spark import datagen

    datagen.generate_sequences(spark, 2_000, suite).write.mode("overwrite").parquet(
        str(tmp_path / "drop")
    )
    stream = ingest.stream_sequences(spark, str(tmp_path / "drop"))
    agg = ingest.streaming_violation_counts(stream, suite)
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("viol_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM viol_counts").collect()
    finally:
        q.stop()
    by_check = {r["check_name"]: r["n_violations"] for r in rows}
    assert by_check.get("too_short", 0) > 0
    assert by_check.get("null_payload", 0) > 0


def _assets(spark):
    rows = [
        ("a1", "image", b"\x89PNGfake1", {"src": "cam0"}),
        ("a2", "video", b"RIFFfake2", {"src": "cam1"}),
        ("a3", "image", None, {}),
    ]
    return spark.createDataFrame(
        rows, "asset_id string, modality string, payload binary, meta map<string,string>"
    )


def test_decode_assets_schema_and_determinism(spark):
    out1 = {r["asset_id"]: r for r in multimodal.decode_assets(_assets(spark)).collect()}
    out2 = {r["asset_id"]: r for r in multimodal.decode_assets(_assets(spark)).collect()}
    assert set(out1) == {"a1", "a2", "a3"}
    assert out1["a1"]["width"] == out2["a1"]["width"]  # deterministic fake
    assert len(out1["a1"]["feature"]) == 8
    assert out1["a3"]["width"] == 0  # null payload handled
    assert out1["a2"]["n_frames"] >= 1


def test_frame_sample(spark):
    frames = multimodal.frame_sample(_assets(spark), every_n=5).collect()
    assert all(r["frame_idx"] % 5 == 0 for r in frames)
    assert all(r["asset_id"] == "a2" for r in frames)  # only video


def test_resize_is_stubbed(spark):
    if multimodal.pil_available():
        pytest.skip("pillow installed — stub gate not active")
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(_assets(spark), 224, 224)


def test_pil_codec_gated_cleanly(spark):
    """codec='pil' must fail at PLAN time (driver-side import check)
    without pillow — not as executor task retries."""
    if multimodal.pil_available():
        pytest.skip("pillow installed — gate not active")
    with pytest.raises(NotImplementedError, match="pillow"):
        multimodal.decode_assets(_assets(spark), codec="pil")
    with pytest.raises(ValueError):
        multimodal.decode_assets(_assets(spark), codec="ffmpeg")


@pytest.mark.skipif(
    not multimodal.pil_available(), reason="pillow not installed (optional)"
)
def test_pil_codec_real_decode_and_resize(spark):
    """Optional-dependency path: real PNG payloads decode to true
    dimensions and resize round-trips through the same mapInPandas
    plumbing (runs wherever pillow is present; auto-skips here)."""
    import io

    from PIL import Image

    def png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        ("p1", "image", png(20, 10, (255, 0, 0)), {}),
        ("p2", "image", b"not a png", {}),
        ("p3", "image", None, {}),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id string, modality string, payload binary, meta map<string,string>",
    )
    out = {
        r["asset_id"]: r
        for r in multimodal.decode_assets(assets, codec="pil").collect()
    }
    assert (out["p1"]["width"], out["p1"]["height"]) == (20, 10)
    assert len(out["p1"]["feature"]) == 8
    assert out["p2"]["width"] == 0  # corrupt payload degrades, no crash
    assert out["p3"]["width"] == 0
    rs = {
        r["asset_id"]: r
        for r in multimodal.resize_images(assets, 8, 8).collect()
    }
    with Image.open(io.BytesIO(rs["p1"]["payload"])) as im:
        assert im.size == (8, 8)
    assert rs["p2"]["payload"] is None and rs["p3"]["payload"] is None


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """Duplicate doc_ids arriving in a later drop are suppressed while
    the key is inside the watermark window."""
    drop = tmp_path / "dedup_drop"
    rows1 = [(f"doc_{i}", [1, 2, 3], 3, "src_00") for i in range(10)]
    spark.createDataFrame(
        rows1, "doc_id string, tokens array<int>, n_tok int, source string"
    ).write.mode("append").parquet(str(drop))

    from teleharvest_spark.streaming import ingest

    stream = ingest.stream_sequences(spark, str(drop))
    dd = ingest.streaming_dedup(stream, keys=["doc_id"], watermark="1 hour")
    q = dd.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try:
        q.processAllAvailable()
        # second drop: 5 replays + 5 new
        rows2 = [(f"doc_{i}", [9, 9, 9], 3, "src_00") for i in range(5)] + [
            (f"doc_{i}", [1, 2, 3], 3, "src_00") for i in range(10, 15)
        ]
        spark.createDataFrame(
            rows2, "doc_id string, tokens array<int>, n_tok int, source string"
        ).write.mode("append").parquet(str(drop))
        q.processAllAvailable()
        got = spark.sql("SELECT doc_id FROM dedup_out").collect()
    finally:
        q.stop()
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids)) == 15  # 10 originals + 5 new, replays dropped


def test_stateful_high_water_filters_replays(spark, tmp_path):
    """applyInPandasWithState watermark: rows at or below a key's
    high-water mark are dropped on later microbatches (reference
    semantics: fetch only id > last stored id, processor.py:60-62)."""
    drop = tmp_path / "hw_drop"
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10)], "source string, seq long"
    ).write.mode("append").parquet(str(drop))

    from teleharvest_spark.streaming import ingest

    stream = spark.readStream.schema("source string, seq long").parquet(str(drop))
    hw = ingest.stateful_high_water(stream, key="source", seq="seq")
    q = hw.writeStream.outputMode("append").format("memory").queryName("hw_out").start()
    try:
        q.processAllAvailable()
        # replays (a,1), (a,2), (b,10) + fresh (a,3), (b,11)
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 11)],
            "source string, seq long",
        ).write.mode("append").parquet(str(drop))
        q.processAllAvailable()
        got = {(r["source"], r["seq"]) for r in spark.sql("SELECT * FROM hw_out").collect()}
    finally:
        q.stop()
    assert got == {("a", 1), ("a", 2), ("b", 10), ("a", 3), ("b", 11)}


def test_streaming_metrics_refresh_two_microbatches(spark, tmp_path):
    """Entry point 3 in continuous mode: each micro-batch of metric
    observations upserts the stored table via foreachBatch; F10-invalid
    observations never land; within a batch the highest obs_seq wins."""
    from pyspark.sql import functions as F

    from teleharvest_spark.streaming import refresh as srefresh

    target = str(tmp_path / "stored")
    obs = tmp_path / "obs"
    obs.mkdir()
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("ch", s, 1, 1, 1) for s in range(4)],
        "source string, doc_seq int, views int, reactions int, forwards int",
    ).write.parquet(target)

    schema = (
        "source string, doc_seq int, views int, reactions int, forwards int, _obs_seq int"
    )

    def drop(rows, name):
        # append part-files into the WATCHED directory (the file source
        # does not recurse into non-partition subdirectories)
        spark.createDataFrame(rows, schema).write.mode("append").parquet(str(obs))
        q = srefresh.start_refresh_stream(
            spark, str(obs), schema, target, ckpt, key="source", seq="doc_seq"
        )
        q.awaitTermination()  # availableNow trigger drains and stops

    # batch 1: valid update for seq 1; invalid (views=0) for seq 2;
    # duplicate observations for seq 3 — higher _obs_seq must win
    drop(
        [
            ("ch", 1, 100, 10, 5, 1),
            ("ch", 2, 0, 20, 6, 1),
            ("ch", 3, 300, 30, 7, 1),
            ("ch", 3, 333, 33, 8, 2),
        ],
        "b1",
    )
    got = {r["doc_seq"]: r for r in srefresh.read_stored(spark, target).collect()}
    assert (got[1]["views"], got[1]["reactions"]) == (100, 10)
    assert got[2]["views"] == 1  # invalid observation skipped
    assert (got[3]["views"], got[3]["reactions"]) == (333, 33)  # latest obs wins

    # batch 2: late valid update for seq 2 arrives → now applied
    drop([("ch", 2, 200, 22, 9, 3)], "b2")
    got = {r["doc_seq"]: r for r in srefresh.read_stored(spark, target).collect()}
    assert (got[2]["views"], got[2]["reactions"]) == (200, 22)
    assert got[0]["views"] == 1  # untouched rows keep stale metrics
    assert len(got) == 4

    # single-write versioned sink (ADVICE r2): each applied batch wrote
    # the merged table ONCE to its own version dir and flipped _LATEST;
    # GC keeps the live + previous version only
    import os

    vdirs = sorted(
        d for d in os.listdir(target)
        if d.startswith("v") and os.path.isdir(os.path.join(target, d))
    )
    assert len(vdirs) == 2  # two applied batches, ≤ _KEEP_VERSIONS kept
    with open(os.path.join(target, "_LATEST"), encoding="utf-8") as f:
        assert f.read().strip() == vdirs[-1]
    # replaying an already-applied batch short-circuits (no new write)
    sink = srefresh.refresh_sink(spark, target, key="source", seq="doc_seq")
    mtime = os.path.getmtime(os.path.join(target, vdirs[-1]))
    sink(spark.createDataFrame([("ch", 2, 200, 22, 9, 3)], schema), int(vdirs[-1][1:]))
    assert os.path.getmtime(os.path.join(target, vdirs[-1])) == mtime


def test_stream_static_enrich_and_referential(spark, tmp_path):
    """Stream-static broadcast join: enrichment picks up the dimension,
    anti-join yields referential violations, and a SECOND drop is
    processed by the same query (multi-batch)."""
    from pyspark.sql import functions as F

    drop = tmp_path / "drop2"
    drop.mkdir()
    dim = spark.createDataFrame(
        [("src_00", "tier1"), ("src_01", "tier2")], "source string, tier string"
    )
    schema = "doc_id string, source string, n_tok int"
    spark.createDataFrame(
        [("d1", "src_00", 5), ("d2", "rogue", 7)], schema
    ).write.mode("overwrite").parquet(str(drop / "b1"))

    stream = spark.readStream.schema(schema).parquet(str(drop / "*"))
    enriched = ingest.enrich_with_dimension(stream, dim, how="left")
    viol = ingest.enrich_with_dimension(stream, dim, how="left_anti")
    q1 = enriched.writeStream.format("memory").queryName("enr").outputMode("append").start()
    q2 = viol.writeStream.format("memory").queryName("ref_viol").outputMode("append").start()
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        enr = {r["doc_id"]: r["tier"] for r in spark.sql("SELECT * FROM enr").collect()}
        assert enr == {"d1": "tier1", "d2": None}
        v = [r["doc_id"] for r in spark.sql("SELECT * FROM ref_viol").collect()]
        assert v == ["d2"]
        # second microbatch
        spark.createDataFrame(
            [("d3", "src_01", 9), ("d4", "ghost", 1)], schema
        ).write.mode("overwrite").parquet(str(drop / "b2"))
        q1.processAllAvailable()
        q2.processAllAvailable()
        enr = {r["doc_id"]: r["tier"] for r in spark.sql("SELECT * FROM enr").collect()}
        assert enr["d3"] == "tier2" and enr["d4"] is None
        v = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM ref_viol").collect())
        assert v == ["d2", "d4"]
    finally:
        q1.stop()
        q2.stop()


def test_streaming_checkpoint_restart_exactly_once(spark, tmp_path):
    """A stopped query restarted from its checkpoint resumes exactly
    where it left off: already-processed files are not re-emitted, new
    files are — the durability contract a continuous-ingest deployment
    leans on (reference analogue: watermark re-derivation on restart,
    processor.py:60-63)."""
    drop = tmp_path / "drop_ckpt"
    out = tmp_path / "out_ckpt"
    ckpt = tmp_path / "ckpt"
    drop.mkdir()
    schema = "doc_id string, source string, n_tok int"

    def start_query():
        stream = spark.readStream.schema(schema).parquet(str(drop / "*"))
        return (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .start()
        )

    spark.createDataFrame([("a", "s1", 1), ("b", "s1", 2)], schema).write.mode(
        "overwrite"
    ).parquet(str(drop / "b1"))
    q = start_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(str(out)).collect()
    ) == ["a", "b"]

    # second batch lands while the query is DOWN; restart must pick up
    # only the new file
    spark.createDataFrame([("c", "s2", 3)], schema).write.mode("overwrite").parquet(
        str(drop / "b2")
    )
    q2 = start_query()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(out)).collect())
    assert got == ["a", "b", "c"]  # no duplicates, nothing lost


def test_streaming_windowed_drift(spark, tmp_path):
    """Windowed KS/PSI in continuous mode: a window's metrics emit
    exactly once, AFTER the watermark finalizes it (append mode), and
    match the batch drift math on the same counts."""
    from teleharvest_spark.operators import drift as drift_ops
    from teleharvest_spark.streaming import drift as sdrift

    drop = tmp_path / "drift_drop"
    drop.mkdir()
    sink = str(tmp_path / "drift_metrics")
    ckpt = str(tmp_path / "drift_ckpt")
    schema = "doc_id string, n_tok int, source string, event_ts timestamp"

    # baseline: uniform-ish global histogram over two buckets
    baseline = spark.createDataFrame(
        [(0, 50), (1, 50)], "bucket int, cnt long"
    )

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(str(drop))
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sdrift.start_windowed_drift(
            spark, stream, baseline, sink, ckpt,
            window="1 minute", watermark="2 minutes",
        )
        q.awaitTermination()

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    late = dt.datetime(2024, 1, 1, 13, 0, 0)
    width = drift_ops.N_TOK_MAX_FOR_BUCKETS // drift_ops.N_TOK_BUCKETS
    # window [12:00, 12:01): src_a all in bucket 0 (heavy drift vs the
    # 50/50 baseline); NULL source excluded
    rows1 = [(f"d{i}", 10, "src_a", t0) for i in range(20)] + [
        ("dnull", 10, None, t0)
    ]
    run(rows1)
    # nothing finalized yet: watermark hasn't passed the window
    import glob as g

    assert not g.glob(f"{sink}/*.parquet")

    # a much later event advances the watermark past [12:00, 12:01)
    run([("dl", width + 5, "src_a", late)])
    got = spark.read.parquet(sink).collect()
    assert len(got) == 1  # exactly one finalized (window, source)
    r = got[0]
    assert r["source"] == "src_a"
    assert r["window_start"] == t0
    # batch-path parity: same counts through drift_metrics
    hist = spark.createDataFrame(
        [("src_a", 0, 20)], "source string, bucket int, cnt long"
    )
    want = drift_ops.drift_metrics(hist, baseline).collect()[0]
    assert abs(r["ks"] - want["ks"]) < 1e-9
    assert abs(r["psi"] - want["psi"]) < 1e-9
    assert r["ks"] > 0.4  # all-in-one-bucket vs 50/50 is heavy drift


def test_streaming_token_vocab_drift(spark, tmp_path):
    """Vocab-shift drift in continuous mode: a window whose token ids
    come from a different vocab region scores heavy PSI vs the
    baseline token histogram; emit-once semantics as in the n_tok
    path."""
    import datetime as dt

    from teleharvest_spark.operators import drift as drift_ops
    from teleharvest_spark.streaming import drift as sdrift

    drop = tmp_path / "vocab_drop"
    drop.mkdir()
    sink = str(tmp_path / "vocab_metrics")
    ckpt = str(tmp_path / "vocab_ckpt")
    schema = "doc_id string, tokens array<int>, source string, event_ts timestamp"
    width = max(1, 50257 // drift_ops.TOKEN_ID_BUCKETS)

    # baseline: tokens uniformly in buckets 0 and 1
    baseline = spark.createDataFrame(
        [(0, 50), (1, 50)], "bucket int, cnt long"
    )

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(str(drop))
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sdrift.start_windowed_drift(
            spark, stream, baseline, sink, ckpt,
            window="1 minute", watermark="2 minutes", histogram="tokens",
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    late = dt.datetime(2024, 1, 1, 13, 0, 0)
    # window [12:00, 12:01): all tokens land in bucket 5 — far from
    # the baseline's 0/1 mass
    rows1 = [(f"d{i}", [5 * width + 3] * 4, "src_a", t0) for i in range(10)]
    run(rows1)
    run([("dl", [1], "src_a", late)])  # advances the watermark

    got = [r for r in spark.read.parquet(sink).collect() if r["window_start"] == t0]
    assert len(got) == 1
    assert got[0]["ks"] == 1.0  # disjoint support → max drift
    assert got[0]["psi"] > 1.0


def test_streaming_windowed_drift_per_source_baseline(spark, tmp_path):
    """ADVICE r3 (streaming/drift.py): a PER-SOURCE baseline (source,
    bucket, cnt — the shape the temporal baseline store produces) must
    dense-align each source against ITS OWN baseline rows, not
    cross-join a duplicate source column. src_a matches its baseline
    (no drift); src_b's mass sits in a bucket its baseline lacks
    (heavy drift)."""
    import datetime as dt

    from teleharvest_spark.operators import drift as drift_ops
    from teleharvest_spark.streaming import drift as sdrift

    drop = tmp_path / "ps_drop"
    drop.mkdir()
    sink = str(tmp_path / "ps_metrics")
    ckpt = str(tmp_path / "ps_ckpt")
    schema = "doc_id string, n_tok int, source string, event_ts timestamp"
    width = drift_ops.N_TOK_MAX_FOR_BUCKETS // drift_ops.N_TOK_BUCKETS

    baseline = spark.createDataFrame(
        [("src_a", 0, 100), ("src_b", 1, 100)],
        "source string, bucket int, cnt long",
    )

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(str(drop))
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sdrift.start_windowed_drift(
            spark, stream, baseline, sink, ckpt,
            window="1 minute", watermark="2 minutes",
        )
        q.awaitTermination()

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    late = dt.datetime(2024, 1, 1, 13, 0, 0)
    # src_a: all bucket 0 (== its baseline); src_b: all bucket 0 while
    # its baseline is bucket 1 (disjoint support)
    rows1 = [(f"a{i}", 10, "src_a", t0) for i in range(10)] + [
        (f"b{i}", 10, "src_b", t0) for i in range(10)
    ]
    run(rows1)
    run([("dl", width + 5, "src_a", late), ("dl2", width + 5, "src_b", late)])

    got = {
        r["source"]: r
        for r in spark.read.parquet(sink).collect()
        if r["window_start"] == t0
    }
    assert set(got) == {"src_a", "src_b"}
    assert got["src_a"]["ks"] < 1e-9  # self-match: zero drift
    assert got["src_b"]["ks"] == 1.0  # disjoint support vs own baseline
    # batch-math parity for the per-source branch
    hist = spark.createDataFrame(
        [("src_a", 0, 10), ("src_b", 0, 10)],
        "source string, bucket int, cnt long",
    )
    want = {
        r["source"]: r for r in drift_ops.drift_metrics(hist, baseline).collect()
    }
    for s in ("src_a", "src_b"):
        assert abs(got[s]["ks"] - want[s]["ks"]) < 1e-9
        assert abs(got[s]["psi"] - want[s]["psi"]) < 1e-9


def test_streaming_violations_writer_layout_and_replay(spark, suite, tmp_path):
    """VERDICT r3 item 5: streaming violation rows land in the
    partitioned violations layout (batch_id= / source_dir= hive dirs,
    bounded files, NULL/'' sources in their own dirs) and a REPLAYED
    micro-batch rewrites its directory instead of duplicating rows."""
    import glob as g
    import os

    from teleharvest_spark import datagen
    from teleharvest_spark.streaming import ingest
    from teleharvest_spark.streaming import violations as sv

    drop = tmp_path / "vdrop"
    drop.mkdir()
    sink = str(tmp_path / "viol_table")
    ckpt = str(tmp_path / "viol_ckpt")

    def run():
        stream = ingest.stream_sequences(spark, str(drop))
        q = sv.start_violations_writer(spark, stream, suite, sink, ckpt)
        q.awaitTermination()

    # micro-batch 1: generated mix (contains too_short / null_payload /
    # unknown_source rows by construction)
    b1 = datagen.generate_sequences(spark, 1_000, suite)
    b1.write.mode("append").parquet(str(drop))
    run()
    rows1 = spark.read.parquet(sink)
    n1 = rows1.count()
    assert n1 > 0
    assert {"batch_id", "source_dir"} <= set(rows1.columns)  # hive keys
    # NULL source rows land in their own dir, not __HIVE_DEFAULT_PARTITION__
    assert rows1.where(F.col("source_dir") == "__null__").count() > 0
    assert not g.glob(f"{sink}/batch_id=*/__HIVE_DEFAULT_PARTITION__")

    # micro-batch 2: only new files are processed
    b2 = spark.createDataFrame(
        [("zz1", None, None, "src_00"), ("zz2", [1] * 400, 400, "rogue_src")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    b2.write.mode("append").parquet(str(drop))
    run()
    rows2 = spark.read.parquet(sink)
    n2 = rows2.count()
    assert n2 == n1 + 2  # null_payload + unknown_source
    assert rows2.where(F.col("doc_id") == "zz1").count() == 1

    # bounded file count per (batch, source_dir) leaf dir
    for d in g.glob(f"{sink}/batch_id=*/source_dir=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert 0 < len(files) <= 4, d

    # token-array parity: violation rows carry the original tokens
    zz2 = rows2.where(F.col("doc_id") == "zz2").collect()[0]
    assert zz2["tokens"] == [1] * 400
    assert zz2["check_name"] == "unknown_source"

    # replay batch 0: invoking the sink body again with the same
    # batch_id must leave the table row-count-identical (overwrite of
    # the same directory), not append duplicates. Read with a FRESH
    # plan — the overwrite swapped batch 0's files, so a pre-replay
    # DataFrame's file listing is stale (Iceberg's snapshot commit is
    # the managed fix; cf. compact_partitioned's rename caveat).
    sv.violations_sink(suite, sink)(b1, 0)
    assert spark.read.parquet(sink).count() == n2


def test_streaming_violations_sample_cap_and_replay_identical(
    spark, suite, tmp_path
):
    """violation_sample caps the per-micro-batch write at N per
    (source, check) and — because the sample is content-hash derived —
    a replayed batch rewrites the exact same rows."""
    from teleharvest_spark.streaming import violations as sv

    sink = str(tmp_path / "viol_capped")
    # 40 rows of one source all failing too_short (systematic failure)
    batch = spark.createDataFrame(
        [(f"d{i}", [1, 2], 2, "src_00") for i in range(40)]
        + [("ok1", [1] * 400, 400, "src_00")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    body = sv.violations_sink(suite, sink, violation_sample=5)
    body(batch, 0)
    rows = spark.read.parquet(sink)
    per_group = (
        rows.groupBy("source", "check_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= 5 for r in per_group)
    first = sorted(
        (r["doc_id"], r["check_name"]) for r in rows.collect()
    )
    assert len(first) == 5
    body(batch, 0)  # replay
    again = sorted(
        (r["doc_id"], r["check_name"])
        for r in spark.read.parquet(sink).collect()
    )
    assert again == first


def test_streaming_prep_ingest_grows_corpus_and_dedups(spark, tmp_path):
    """Continuous corpus ingestion: each micro-batch runs the
    idempotent incremental prep — fresh docs land, dups of earlier
    ingests drop, and a replayed batch (sink called again with the
    same data) is a recorded no-op."""
    from tests.test_prep_pipeline import _corpus
    from teleharvest_spark import pipeline
    from teleharvest_spark.streaming import prep as sprep

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _corpus(spark).write.parquet(inp)
    pipeline.prep_corpus(spark, inp, out, run_id="base", capacity=64)
    base_n = pipeline.read_prep_corpus(spark, out).count()

    schema = "doc_id long, text string, source string"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sprep.start_prep_ingest(spark, stream, out, ckpt, capacity=64)
        q.awaitTermination()

    # micro-batch 1: two fresh docs
    f1 = " ".join(f"s1w{j}" for j in range(40))
    f2 = " ".join(f"s2w{j}" for j in range(40))
    spark.createDataFrame(
        [(300, f1, "web"), (301, f2, "books")], schema
    ).write.mode("append").parquet(str(drop))
    run()
    assert pipeline.read_prep_corpus(spark, out).count() == base_n + 2

    # micro-batch 2: one dup of batch 1, one fresh — only new files read
    f3 = " ".join(f"s3w{j}" for j in range(40))
    spark.createDataFrame(
        [(302, f1, "web"), (303, f3, "web")], schema
    ).write.mode("append").parquet(str(drop))
    run()
    full = pipeline.read_prep_corpus(spark, out)
    ids = {r["doc_id"] for r in full.select("doc_id").collect()}
    assert full.count() == base_n + 3
    assert 303 in ids and 302 not in ids  # dup vs batch-1 index dropped

    # replay: calling the sink again with batch-2's data is a ledger
    # skip — warehouse unchanged (foreachBatch crash-replay semantics)
    d0 = pipeline.content_digest(full)
    batch2 = spark.createDataFrame([(302, f1, "web"), (303, f3, "web")], schema)
    sprep.prep_sink(out, capacity=64)(batch2, 99)
    assert pipeline.content_digest(pipeline.read_prep_corpus(spark, out)) == d0

    # empty micro-batch is a no-op, not an error
    sprep.prep_sink(out, capacity=64)(spark.createDataFrame([], schema), 100)


def test_streaming_prep_ingest_semantic_dedup_from_batch_embeddings(spark, tmp_path):
    """Streaming ingestion with inline embeddings: a micro-batch doc
    whose embedding shadows a stored survivor drops; a novel doc lands
    and extends the semantic index for the next micro-batch."""
    import numpy as np

    from pyspark.sql import Row

    from tests.test_prep_extended import _varied_doc
    from teleharvest_spark import pipeline
    from teleharvest_spark.streaming import prep as sprep

    inp = str(tmp_path / "docs")
    out = str(tmp_path / "wh")
    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")

    rng = np.random.RandomState(59)
    vecs = rng.randn(8, 16)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [
        Row(doc_id=i, text=_varied_doc(i), source="web") for i in range(8)
    ]
    spark.createDataFrame(rows).write.parquet(inp)
    embp = str(tmp_path / "emb")
    spark.createDataFrame(
        [Row(doc_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(8)]
    ).write.parquet(embp)
    pipeline.prep_corpus(
        spark, inp, out, run_id="sbase", capacity=64,
        semdedup_embeddings_path=embp, semdedup_tau=0.95,
        semdedup_n_cells=2, semdedup_dim=16,
    )
    base_n = pipeline.read_prep_corpus(spark, out).count()

    schema = "doc_id long, text string, source string, embedding array<float>"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(drop))
        q = sprep.start_prep_ingest(
            spark, stream, out, ckpt, capacity=64,
            semdedup_embeddings_path="batch", semdedup_dim=16,
        )
        q.awaitTermination()

    def jit(v):
        w = v + 0.001 * rng.randn(16)
        return [float(x) for x in (w / np.linalg.norm(w)).astype(np.float32)]

    novel = rng.randn(16); novel /= np.linalg.norm(novel)
    spark.createDataFrame(
        [
            (400, _varied_doc(400), "web", jit(vecs[0])),       # shadowed
            (401, _varied_doc(401), "web",
             [float(x) for x in novel.astype(np.float32)]),     # novel
        ],
        schema,
    ).write.mode("append").parquet(str(drop))
    run()
    ids = {
        r["doc_id"]
        for r in pipeline.read_prep_corpus(spark, out)
        .where(F.col("doc_id") >= 400).collect()
    }
    assert ids == {401}
    assert pipeline.read_prep_corpus(spark, out).count() == base_n + 1

    # micro-batch 2: near batch-1's survivor -> drops against the
    # index rows batch 1 appended
    spark.createDataFrame(
        [(500, _varied_doc(500), "web", jit(novel))], schema
    ).write.mode("append").parquet(str(drop))
    run()
    assert pipeline.read_prep_corpus(spark, out).where(
        F.col("doc_id") == 500
    ).count() == 0


def test_streaming_emit_valid_certifies_cascade_clean_rows(
    spark, suite, tmp_path
):
    """Streaming twin of cli --emit-valid: each micro-batch's
    cascade-clean rows land under <cert>/batch_id=<n> in the batch's
    own schema; certified + violating doc_ids partition the batch; the
    violation-sample cap never widens certification; replaying a batch
    is byte-idempotent for BOTH tables."""
    from teleharvest_spark import datagen
    from teleharvest_spark.streaming import ingest
    from teleharvest_spark.streaming import violations as sv

    drop = tmp_path / "cdrop"
    drop.mkdir()
    sink = str(tmp_path / "viol")
    cert = str(tmp_path / "cert")
    ckpt = str(tmp_path / "ckpt")

    b1 = datagen.generate_sequences(spark, 1_000, suite)
    b1.write.mode("append").parquet(str(drop))
    stream = ingest.stream_sequences(spark, str(drop))
    q = sv.start_violations_writer(
        spark, stream, suite, sink, ckpt, violation_sample=2, emit_valid=cert
    )
    q.awaitTermination()

    certified = spark.read.parquet(cert)
    assert {"batch_id", "source_dir"} <= set(certified.columns)
    assert certified.count() > 0
    # partition invariant vs the UNCAPPED failing set (sample=2 caps
    # the written diagnostic only)
    viol_full = sv.violation_rows(b1, suite)
    failing = {r["doc_id"] for r in viol_full.select("doc_id").distinct().collect()}
    cert_ids = {r["doc_id"] for r in certified.select("doc_id").collect()}
    assert not (cert_ids & failing)
    # distinct-id partition (datagen plants duplicate doc_ids — the
    # streaming sink is cascade-scoped, so both copies certify; the
    # cross-row dup check lives upstream in ingest.streaming_dedup)
    all_ids = {r["doc_id"] for r in b1.select("doc_id").collect()}
    assert cert_ids | failing == all_ids
    # written violations really are capped below the failing set
    assert spark.read.parquet(sink).count() < viol_full.count()

    # second micro-batch appends its own batch dir
    b2 = spark.createDataFrame(
        [("ok_new", [1] * 400, 400, "src_00"), ("bad_new", None, None, "src_00")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    b2.write.mode("append").parquet(str(drop))
    q = sv.start_violations_writer(
        spark,
        ingest.stream_sequences(spark, str(drop)),
        suite,
        sink,
        ckpt,
        violation_sample=2,
        emit_valid=cert,
    )
    q.awaitTermination()
    after = spark.read.parquet(cert)
    assert after.where(F.col("doc_id") == "ok_new").count() == 1
    assert after.where(F.col("doc_id") == "bad_new").count() == 0

    # replay batch 0: both tables stay row-identical (fresh plans —
    # the overwrite swapped the files)
    n_cert = after.count()
    n_viol = spark.read.parquet(sink).count()
    sv.violations_sink(suite, sink, violation_sample=2, emit_valid=cert)(b1, 0)
    assert spark.read.parquet(cert).count() == n_cert
    assert spark.read.parquet(sink).count() == n_viol
