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


def pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes | None, modality: str) -> tuple[int, int, int, list[float]]:
    """Real image decode (optional dependency): PIL opens the payload,
    reports true dimensions/frame count, and the feature vector is the
    mean intensity of a 2×4 grid of the grayscale thumbnail — cheap,
    deterministic, and the exact slot a learned embedding replaces.
    Non-image modalities and undecodable payloads degrade to zeros (a
    corrupt asset must not kill a partition-sized task)."""
    import io

    from PIL import Image

    if payload is None or modality != "image":
        return 0, 0, 0, [0.0] * 8
    try:
        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            frames = int(getattr(im, "n_frames", 1))
            g = np.asarray(
                im.convert("L").resize((4, 2), Image.BILINEAR),
                dtype=np.float32,
            )
        return w, h, frames, (g.reshape(-1) / 255.0).tolist()
    except Exception:
        return 0, 0, 0, [0.0] * 8


def decode_assets(assets: DataFrame, codec: str = "fake") -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches.

    One python worker per partition, whole-batch numpy work — the
    pattern a real image decode (PIL → resize → embed) plugs into.

    ``codec='fake'`` (default) is the deterministic stand-in;
    ``codec='pil'`` is the real image path behind the optional PIL
    dependency (import checked DRIVER-side so a missing library fails
    at plan time, not as 1000 executor task retries). Both produce the
    same schema and batch shape — swapping codecs changes zero
    plumbing."""
    if codec not in ("fake", "pil"):
        raise ValueError(f"unknown codec {codec!r} (fake|pil)")
    if codec == "pil" and not pil_available():
        raise NotImplementedError(
            "codec='pil' requires pillow (optional dependency, not in "
            "this container): pip install pillow"
        )
    decode = _fake_decode if codec == "fake" else _pil_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
            }
            decoded = [
                decode(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in decoded], dtype="int32")
            out["feature"] = pd.Series([d[3] for d in decoded])
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=DECODE_SCHEMA)


def frame_sample(
    assets: DataFrame, every_n: int = 10, codec: str = "fake"
) -> DataFrame:
    """Frame-sampling plan for video assets: filter → decode → explode
    sampled frame indices. Codec stubbed (``codec`` forwards to
    decode_assets so the real path is reachable); the plan (explode of
    a sequence column, no Python in the row expansion) is the real
    design.

    The modality filter runs BEFORE the decode: a filter after
    mapInPandas cannot be pushed through it, so a mixed asset table
    would ship every image/audio payload across the Arrow boundary
    and decode it just to drop the row — on a real corpus the decode
    IS the cost. Zero-frame assets (undecodable/NULL payloads decode
    to n_frames=0) emit NO rows — there is no frame 0 to sample."""
    decoded = decode_assets(
        assets.where(F.col("modality") == "video"), codec=codec
    )
    return decoded.where(F.col("n_frames") >= 1).select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


RESIZE_SCHEMA = "asset_id string, payload binary, width int, height int"


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Batch image resize → PNG-re-encoded payloads, behind the
    optional PIL dependency (NotImplementedError here, where pillow is
    not installed). Same mapInPandas shape as decode_assets: Arrow
    carries the binary column both ways, no per-row Python UDF, one
    client-library import per worker process. Undecodable payloads
    yield NULL output payloads rather than failing the task."""
    if not pil_available():
        raise NotImplementedError(
            "image resize requires pillow (optional dependency, not in "
            "this container): pip install pillow; "
            "plumbing path: mapInPandas with Image.resize per batch"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            payloads = []
            for p, m in zip(pdf["payload"], pdf["modality"]):
                if p is None or m != "image":
                    payloads.append(None)
                    continue
                try:
                    with Image.open(io.BytesIO(p)) as im:
                        buf = io.BytesIO()
                        im.resize((width, height), Image.BILINEAR).save(
                            buf, format="PNG"
                        )
                    payloads.append(buf.getvalue())
                except Exception:
                    payloads.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": pd.Series(payloads, dtype="object"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return assets.mapInPandas(batches, schema=RESIZE_SCHEMA)
