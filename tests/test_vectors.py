from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from teleharvest_spark.functions import vectors


def test_cosine_matches_numpy(spark):
    a, b = [1.0, 2.0, 3.0], [3.0, 2.0, 1.0]
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(vectors.cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    want = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(got - want) < 1e-6


def test_cosine_zero_norm_guarded(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    assert df.select(vectors.cosine(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] == 0.0


def test_embed_text_udf_contract(spark):
    """U1 stub: unit-norm vectors, deterministic, NULL/empty -> None
    (reference: empty text -> None, embedding_service.py:22-23,
    tests/services/test_embedding_service.py:48-54)."""
    df = spark.createDataFrame(
        [("hello world",), ("hello world",), ("",), (None,)], "text string"
    )
    emb = vectors.embed_text_udf(dim=16)
    rows = df.select(F.col("text"), emb(F.col("text")).alias("e")).collect()
    assert rows[0]["e"] == rows[1]["e"]  # deterministic
    assert abs(float(np.linalg.norm(rows[0]["e"])) - 1.0) < 1e-5
    assert rows[2]["e"] is None and rows[3]["e"] is None


def test_json_vector_roundtrip(spark):
    """C5 legacy boundary: JSON-string <-> array<float>
    (models/message.py:61, processor.py:142)."""
    df = spark.createDataFrame([('[1.5, 2.5]',)], "j string")
    arr = df.select(vectors.from_json_vector(F.col("j")).alias("v")).collect()[0]["v"]
    assert arr == [1.5, 2.5]
    back = spark.createDataFrame([(arr,)], "v array<float>").select(
        vectors.to_json_vector(F.col("v")).alias("j")
    ).collect()[0]["j"]
    assert back == "[1.5,2.5]"
