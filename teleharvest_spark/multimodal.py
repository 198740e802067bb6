"""Multimodal column plumbing — binary payloads + typed metadata.

Image/audio/video ride as opaque ``binary`` columns with a
``map<string,string>`` metadata sidecar (schema.ASSETS). The Spark-side
plumbing (schema, partitioning, Arrow batch shape, UDF signatures) is
real and tested; the actual codec step is stubbed because the
image/audio libraries are not in this container — each stub is either
a deterministic fake (for pipeline tests) or a clearly-marked
``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "asset_id string, modality string, width int, height int, "
    "n_frames int, feature array<float>"
)


def _fake_decode(payload: bytes | None, modality: str) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions + an 8-dim feature vector
    derived from a sha256 of the payload. Stands in for PIL/ffmpeg
    (not installed here); the real implementation swaps this function
    only — batch shape and schema stay identical."""
    if payload is None:
        return 0, 0, 0, [0.0] * 8
    digest = hashlib.sha256(payload).digest()
    w = 64 + digest[0]
    h = 64 + digest[1]
    frames = 1 if modality == "image" else 1 + digest[2] % 32
    feat = (np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
    return w, h, frames, feat


def decode_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches.

    One python worker per partition, whole-batch numpy work — the
    pattern a real image decode (PIL → resize → embed) plugs into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
            }
            decoded = [
                _fake_decode(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in decoded], dtype="int32")
            out["feature"] = pd.Series([d[3] for d in decoded])
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=DECODE_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video assets: decode → explode sampled
    frame indices. Codec stubbed; the plan (explode of a sequence
    column, no Python in the row expansion) is the real design."""
    decoded = decode_assets(assets).where(F.col("modality") == "video")
    return decoded.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize needs PIL — not in this container."""
    raise NotImplementedError(
        "image resize requires PIL/opencv (not installed); "
        "plumbing path: decode_assets() mapInPandas with cv2.resize per batch"
    )
