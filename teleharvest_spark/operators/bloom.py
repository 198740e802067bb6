"""Bloom-filter prefilter for incremental index joins.

The 100 TB problem this solves: a daily ingest batch too large to
broadcast joined against a 10^12-row stored index (dedup band buckets,
exact-hash sets) forces a sort-merge join — i.e. a full shuffle of the
INDEX side, by far the biggest data movement in the pipeline. But most
of a real crawl batch is NOVEL: most probe keys hit nothing. A Bloom
filter over the index's join keys — a few MB for billions of keys —
broadcasts everywhere and drops definitely-absent probe rows map-side,
BEFORE any shuffle. If the surviving probe side becomes broadcastable
(the usual case), the index is never shuffled at all; false positives
only cost a harmless extra probe, and false negatives are impossible,
so downstream results are bit-identical (pinned).

Reference analogue: the reference re-checks only rows inside its
lookback window (``/root/reference/processor.py:60-71``) — this is the
same "don't touch what can't match" idea applied to set membership.

Representation: the classic k-hash Bloom bit array, stored as a
DataFrame of (word:long, bits:long) 64-bit words — at most
``m_bits/64`` rows, usually far fewer (only words with a set bit
materialize). Built with one explode + bit_or aggregate (pure codegen,
map-side partials); APPEND-friendly: blooms over two row sets merge by
re-aggregating the union (bit_or is idempotent/commutative), so an
incremental index just appends per-batch word tables and readers fold
them. Position j of a row = ``pmod(xxhash64(j, cols...), m_bits)`` —
deterministic across engines and partitionings.

Sizing (public formula): FPR ≈ (1 − e^(−k·n/m))^k; m = 16 bits/key
with k = 5 gives ≈ 0.06% — at 10^12 keys that is 2 TB of *bits* but
only set words materialize and the driver never holds it; pick
``m_bits`` ≈ 16–20× the expected distinct-key count. The prefilter
broadcasts the word table (≤ 8 B/word + key overhead); for indexes
whose bloom outgrows broadcast (≳ 10^9 keys) partition the key space
and prefilter per partition — or accept the sort-merge join, which is
what it replaces.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "bloom_build",
    "bloom_prefilter",
    "write_bloom",
    "read_bloom",
    "bloom_meta_of",
    "BLOOM_META",
]

BLOOM_META = "_bloom_meta.json"


def _positions(cols: list[Column], m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a row's key tuple. Seeding with the hash
    index as the FIRST xxhash64 argument makes the k hashes
    independent; pmod keeps positions non-negative."""
    if m_bits <= 0 or k < 1:
        # pmod(x, 0) is NULL (non-ANSI) — a zero m_bits would build a
        # word=NULL table whose prefilter drops EVERY probe row: total
        # silent false negatives, the one failure mode this module
        # promises away. Refuse loudly instead.
        raise ValueError(f"bloom needs m_bits > 0 and k >= 1 (got {m_bits}, {k})")
    return [
        F.pmod(F.xxhash64(F.lit(j), *cols), F.lit(int(m_bits))) for j in range(k)
    ]


def _word(pos: Column) -> Column:
    return (pos / 64).cast("long")


def bloom_build(
    df: DataFrame, cols: list[str], m_bits: int, k: int = 5
) -> DataFrame:
    """(word, bits) Bloom table over ``df``'s key tuples.

    One narrow projection → explode(k positions) → two-level bit_or
    hash aggregate on the uniform word key: map-side partials collapse
    almost everything (the word space is ≤ m_bits/64), one tiny
    shuffle. NULL key components hash like any value (xxhash64 folds
    NULLs deterministically), so NULL-keyed rows are representable —
    membership semantics match the equi-join only for non-NULL keys,
    which is fine for a *pre*filter that may only over-approximate.
    """
    key_cols = [F.col(c) for c in cols]
    pos = F.explode(F.array(*_positions(key_cols, m_bits, k))).alias("__pos")
    exploded = df.select(pos)
    return (
        exploded.select(
            _word(F.col("__pos")).alias("word"),
            F.expr("shiftleft(1L, CAST(pmod(__pos, 64) AS INT))").alias("__m"),
        )
        .groupBy("word")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    bloom: DataFrame,
    cols: list[str],
    m_bits: int,
    k: int = 5,
) -> DataFrame:
    """Rows of ``df`` that MAY be present in the key set ``bloom`` was
    built over — definitely-absent rows are dropped. Never drops a
    true member (no false negatives; pinned in tests): safe before any
    equi-join on ``cols`` as a pure cost cut.

    Shape: k broadcast-hash left joins against the (≤ m_bits/64-row)
    word table, each followed by a bit-test filter — all map-side,
    zero shuffles of ``df``, and each join shrinks the survivor set so
    later probes touch fewer rows. All k joins reference the SAME
    aliased dimension plan (projection identical, only the subquery
    alias differs — erased during analysis), so the physical plan
    builds ONE BroadcastExchange and the other k−1 are ReusedExchange
    nodes: the word table ships to executors once, not k times
    (plan-pinned in tests). Internal helper columns are dropped; the
    output schema is exactly ``df``'s.
    """
    key_cols = [F.col(c) for c in cols]
    dim_base = bloom.select("word", "bits")
    out = df
    for j, pos in enumerate(_positions(key_cols, m_bits, k)):
        b = f"__bloom{j}"
        dim = F.broadcast(dim_base.alias(b))
        # shiftleft's numBits arg must be a Column via SQL (the Python
        # wrapper only takes a literal int)
        mask = F.expr("shiftleft(1L, CAST(pmod(__pos, 64) AS INT))")
        out = (
            out.withColumn("__pos", pos)
            .withColumn("__w", _word(F.col("__pos")))
            .join(dim, F.col("__w") == F.col(f"{b}.word"), "left")
            .where(
                F.col(f"{b}.bits").isNotNull()
                & (F.col(f"{b}.bits").bitwiseAND(mask) != 0)
            )
            .drop("__pos", "__w")
            .drop(F.col(f"{b}.word"))
            .drop(F.col(f"{b}.bits"))
        )
    return out


def bloom_meta_of(path: str) -> dict | None:
    """Stored (m_bits, k, cols) params of a persisted bloom, or None
    when no (complete) bloom exists at ``path`` — meta is written last,
    so its presence certifies a whole filter."""
    meta_path = os.path.join(path, BLOOM_META)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path, encoding="utf-8") as f:
        return json.load(f)


def write_bloom(
    bloom: DataFrame, path: str, m_bits: int, k: int, cols: list[str],
    mode: str = "append",
) -> None:
    """Persist a Bloom word table + its hashing parameters. Parameters
    are part of the filter's identity — a probe hashed under different
    (m_bits, k, cols) is meaningless — so they are stored and verified
    on read, and APPENDS under mismatched params are refused (call
    :func:`bloom_meta_of` first if the write must be all-or-nothing
    with other artifacts). mode='overwrite' replaces the whole filter,
    params included — the old identity is retired with the old bits.
    meta is written LAST (the lm_store crash convention): a crash
    beforehand leaves an index readers ignore. On overwrite the OLD
    meta is removed FIRST — otherwise a crash between the words
    overwrite and the meta rewrite would pair NEW bits with STALE
    params, and probes hashed under the old (m_bits, k) against the
    new bit array would silently drop true members; with the meta
    gone, readers see 'no complete bloom' and fail safe. The meta
    itself lands via write-temp + atomic rename so a torn json can
    never be read as a valid meta."""
    meta_path = os.path.join(path, BLOOM_META)
    if mode == "append" and os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
        if (meta["m_bits"], meta["k"], meta["cols"]) != (m_bits, k, list(cols)):
            raise ValueError(
                f"bloom param mismatch at {path}: stored {meta}, "
                f"got m_bits={m_bits} k={k} cols={list(cols)}"
            )
    if mode == "overwrite" and os.path.exists(meta_path):
        os.remove(meta_path)
    bloom.write.mode(mode).parquet(os.path.join(path, "words"))
    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"m_bits": m_bits, "k": k, "cols": list(cols)}, f)
    os.replace(tmp, meta_path)


def read_bloom(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """(folded word table, meta). Appended per-batch word tables fold
    here by one bit_or re-aggregate — ≤ m_bits/64 rows either way."""
    meta_path = os.path.join(path, BLOOM_META)
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    words = (
        spark.read.parquet(os.path.join(path, "words"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    return words, meta
