"""Greedy sequence packing — group short training sequences into
fixed-capacity packs (the "sample packing" step of an LLM data
pipeline: minimize pad tokens by concatenating documents up to the
context length).

Reference analogue: none (the reference trains nothing); this is one
of the beyond-reference training-pipeline operators. The semantics
implemented is the standard deterministic streaming greedy: scan the
group in a stable key order, open a new pack whenever the next
sequence would overflow ``capacity`` (an oversized single sequence
gets its own pack — truncation is the tokenizer's job, not the
packer's).

Why ``applyInPandas`` and not pure column expressions: greedy
reset-on-overflow is a sequential recurrence (pack boundary depends on
the full running state, not a prefix sum — ``floor(cumsum/cap)`` would
SPLIT documents across packs, which changes training semantics), so it
cannot be a window function. It CAN be a per-group fold, which is
exactly the grouped-map surface: Arrow ships each group as one
zero-copy batch, the fold is a tight numpy-array loop over int64s,
and groups run executor-parallel.

Scale notes (100 TB): parallelism == number of groups, so the group
key must be finer than ``source`` at real scale — pass
``shard_col`` (e.g. a hash-bucket of doc_id, `sampling.hash_bucket`)
to pack within (source, shard); packs never span shards, which costs
<1 pack of padding per shard and keeps every group executor-sized.
The single shuffle is the groupBy; the fold is O(group) with no
further exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["pack_sequences", "chunk_tokens"]


def pack_sequences(
    df: DataFrame,
    key: str = "doc_id",
    group: str = "source",
    size_col: str = "n_tok",
    capacity: int = 2048,
    shard_col: str | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """``(key, group[, shard][, carry...], pack_id)`` — pack id is
    dense per group (0, 1, 2, ...) in ascending ``key`` order; NULL
    sizes count as 0.

    Deterministic under any partitioning: the fold order is sorted
    (``key``, size) within each group, never task order. The size as a
    secondary sort key makes duplicate keys with different sizes fold
    in a data-determined order (ADVICE r2 — a key-only mergesort would
    leave dup-key ties in Arrow-batch order, so pack_id could vary
    under repartitioning); the oracle's recurrence orders by the same
    (key, n) pair.

    ``carry``: extra columns carried through to the output AND added
    to the fold-order sort key between ``key`` and size — the chunked-
    packing use, where rows are (doc_id, chunk_id) and the pack row
    must say which chunk landed where. With ``carry=()`` the fold
    order is byte-identical to the original two-key sort.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    group_cols = [group] + ([shard_col] if shard_col else [])
    # NULL group keys are upstream violations, not packable strata
    # (the engine-wide exclusion policy — see quantile_trim/top_terms)
    for c in group_cols:
        df = df.where(F.col(c).isNotNull())
    carry = tuple(carry)
    proj = df.select(
        *group_cols,
        F.col(key).alias("__key"),
        *[F.col(c) for c in carry],
        F.coalesce(F.col(size_col), F.lit(0)).cast("long").alias("__n"),
    )
    out_schema = ", ".join(
        f"`{c}` {proj.schema[c].dataType.simpleString()}" for c in group_cols
    ) + f", `{key}` {df.schema[key].dataType.simpleString()}" + "".join(
        f", `{c}` {df.schema[c].dataType.simpleString()}" for c in carry
    ) + ", pack_id bigint"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__key", *carry, "__n"], kind="mergesort")
        sizes = pdf["__n"].to_numpy()
        packs = np.zeros(len(sizes), dtype=np.int64)
        acc, pack = 0, 0
        for i, n in enumerate(sizes):  # sequential recurrence by design
            if i > 0 and acc + n > capacity:
                pack += 1
                acc = n
            else:
                acc += n
            packs[i] = pack
        out = pdf[group_cols].copy()
        out[key] = pdf["__key"].to_numpy()
        for c in carry:
            out[c] = pdf[c].to_numpy()
        out["pack_id"] = packs
        return out

    return proj.groupBy(*group_cols).applyInPandas(_pack, out_schema)


def chunk_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    chunk_len: int = 2048,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking: split each doc's token array into
    fixed-length windows — the step between tokenization and
    :func:`pack_sequences` for documents LONGER than the training
    context (packing fills capacity with whole short docs; chunking
    cuts long docs down to capacity).

    Output: ``(id_col, chunk_id, tokens, n_tok)`` with ``chunk_id``
    dense per doc in position order. Windows start at multiples of
    ``stride`` (default: ``chunk_len``, i.e. disjoint); the LAST
    window is re-aligned to end exactly at the doc's end, so every
    token is covered, every emitted chunk except a short-doc's single
    chunk is exactly ``chunk_len`` long, and no tiny tail chunks are
    emitted (the overlap absorbs the remainder — the standard sliding-
    window rule). A doc with ``n <= chunk_len`` yields itself as chunk
    0; NULL token arrays yield one empty chunk 0 (preserved, not
    dropped — an upstream violation is the cascade's call, not the
    chunker's).

    Scale: pure codegen — window starts are a per-row ``sequence`` +
    ``transform`` (O(n/stride) elements), ``posexplode`` + ``slice``
    materialize the chunks. No shuffle at all: chunking is
    embarrassingly row-parallel, and the output feeds pack_sequences'
    grouped fold, which brings its own shuffle.
    """
    if chunk_len < 1:
        raise ValueError("chunk_len must be >= 1")
    step = chunk_len if stride is None else stride
    if not 0 < step <= chunk_len:
        raise ValueError("stride must be in (0, chunk_len]")
    toks = F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
    n = F.size(toks)
    last = F.greatest(n - F.lit(chunk_len), F.lit(0))
    # start indices: 0, step, 2*step, ... clamped so the final window
    # ends at n; array_distinct collapses the clamp's collisions
    n_starts = F.floor(last.cast("double") / step).cast("int") + 1
    starts = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_starts),
            lambda i: F.least(i * step, last),
        )
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "__start"),
        toks.alias("__t"),
    ).select(
        id_col,
        "chunk_id",
        F.slice(F.col("__t"), F.col("__start") + 1, chunk_len).alias(tokens_col),
    )
    return out.withColumn("n_tok", F.size(tokens_col))
