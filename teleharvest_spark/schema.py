"""Canonical schemas for the validation engine.

The fact table shape comes from BASELINE.json ``input_hint``:
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.
Reference analogues per SURVEY.md §1.3: doc_id ≈ post.id
(models/message.py:20), tokens ≈ text/embedding payload, n_tok ≈
len(text) (processor.py:107), source ≈ channel (models/message.py:21).
"""

from __future__ import annotations

from pyspark.sql import types as T

# T1 — canonical fact table of pre-tokenized training sequences.
SEQUENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# T2 — allowed-source referential dimension (broadcast side).
# Reference: TELEGRAM_CHANNELS allowed list, settings.py:28,32-34.
ALLOWED_SOURCES = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("min_n_tok", T.IntegerType(), False),
        T.StructField("max_n_tok", T.IntegerType(), False),
    ]
)

# T3 — disallowed token ids (stop-word analogue, settings.py:17-21).
BANNED_TOKENS = T.StructType(
    [
        T.StructField("token_id", T.IntegerType(), False),
        T.StructField("reason", T.StringType(), False),
    ]
)

# Violation rows — the engine's materialized failures. ``tokens`` is
# carried through so the per-row token-array-equality invariant vs the
# reference is testable (BASELINE.json input_hint).
VIOLATIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("reason", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    ]
)

# Per-partition verdict rows (one per `source` partition per run).
VERDICTS = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("verdict", T.StringType(), False),
        T.StructField("failed_checks", T.ArrayType(T.StringType()), False),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), False),
    ]
)

# T5 — checkpoint/lineage manifest (resume support). Reference
# analogue: per-channel watermark re-derivation, processor.py:60-62.
MANIFEST = T.StructType(
    [
        T.StructField("partition", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("file_list_hash", T.StringType(), False),
        T.StructField("suite_hash", T.StringType(), False),
        T.StructField("verdict", T.StringType(), False),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), False),
        T.StructField("validated_at_run", T.StringType(), False),
    ]
)

# Multimodal asset table — opaque binary payloads with typed metadata.
ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
