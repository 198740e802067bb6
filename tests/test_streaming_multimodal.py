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
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(_assets(spark), 224, 224)
