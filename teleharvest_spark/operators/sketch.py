"""Mergeable frequent-items summaries (Misra-Gries) + skew profiling.

The missing member of the engine's sketch family: GK quantiles and
HLL++ distinct are Spark built-ins (operators/stats.py), but Spark has
no bounded-memory frequent-items aggregate — an exact top-k over an
UNBOUNDED key domain (line hashes, shingle fingerprints, URLs) is a
corpus-sized shuffle at 10^12 rows. This module computes guaranteed
heavy hitters with one narrow ``mapInPandas`` pass and a summary-sized
final aggregate.

Scale design: each input partition folds to a ≤capacity-row
Misra-Gries summary inside the Arrow kernel (whole-batch pandas
``value_counts`` + index-aligned adds — no per-row Python); the only
shuffle is the |partitions| × capacity summary table. Merging
summaries by summing estimates preserves the MG bounds (Agarwal et
al., "Mergeable Summaries", PODS 2012):

  - ``est_lo`` (the summed estimate) never exceeds the true count;
  - ``true − est_lo ≤ err_bound`` where ``err_bound`` is the total
    decrement mass D, and D ≤ n_obs / (capacity + 1);
  - any key with true count > D is guaranteed present in the summary
    (if it were absent from every partition summary its whole count
    was decremented away, which needs true ≤ Σ_p d_p = D).

Reference analogue: none (the reference's aggregates are per-channel
max/min, SURVEY.md §2.4); this is an engine addition in the same
family as the north rule's GK/HLL sketches. Skew profiling feeds the
north rule's "salting for hot source values" requirement with a
MEASURED hot-key table instead of a guess (uniqueness.py's salted
path, SURVEY.md §4 custom-work item 1).
"""

from __future__ import annotations

import math
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_SENTINEL_COLS = ("__mg_dec", "__mg_n_obs")
_RESERVED_COLS = ("est",) + _SENTINEL_COLS

_ALLOWED_KEY_TYPES = (
    T.StringType,
    T.BinaryType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
)


def _key_dtype(df: DataFrame, col: str, from_array: bool) -> str:
    """SQL type string for the summary's key column; atomic types only."""
    if col in _RESERVED_COLS:
        raise ValueError(
            f"column name {col!r} collides with the summary's own output "
            f"columns {_RESERVED_COLS} — rename it before sketching"
        )
    dt = df.schema[col].dataType
    if from_array:
        if not isinstance(dt, T.ArrayType):
            raise ValueError(f"column {col!r} is {dt.simpleString()}, expected array")
        dt = dt.elementType
    if not isinstance(dt, _ALLOWED_KEY_TYPES):
        raise ValueError(
            f"unsupported heavy-hitter key type {dt.simpleString()} for {col!r}"
        )
    return dt.simpleString()


def _batch_counts(col: pd.Series, flatten: bool) -> pd.Series | None:
    """value_counts of one Arrow batch's key column (arrays flattened
    in-kernel when ``flatten``); None when the batch holds no keys."""
    if flatten:
        arrs = [np.asarray(a) for a in col if a is not None and len(a)]
        if not arrs:
            return None
        vals = pd.Series(np.concatenate(arrs))
        vals = vals[vals.notna()]
    else:
        vals = col[col.notna()]
    if not len(vals):
        return None
    return vals.value_counts()


def _fold(
    acc: pd.Series | None, counts: pd.Series, capacity: int
) -> tuple[pd.Series, int]:
    """One Misra-Gries fold step: add a batch's counts, and when the
    summary exceeds capacity drop every entry by the (capacity+1)-th
    largest count d (non-positive entries fall out) — at least
    capacity+1 entries lose d each, so Σd ≤ n_obs/(capacity+1).
    Returns (summary, d)."""
    acc = counts if acc is None else acc.add(counts, fill_value=0)
    d = 0
    if len(acc) > capacity:
        arr = acc.to_numpy(dtype=np.int64)
        d = int(np.partition(arr, -(capacity + 1))[-(capacity + 1)])
        acc = acc[acc > d] - d
    return acc, d


def _mg_kernel(
    key: str, capacity: int, flatten: bool
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Per-partition Misra-Gries fold over Arrow batches.

    State is one pandas Series (count per key, ≤ ~capacity entries
    between compactions); each batch contributes a ``value_counts``.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        dec = 0
        n_obs = 0
        for pdf in batches:
            counts = _batch_counts(pdf[key], flatten)
            if counts is None:
                continue
            n_obs += int(counts.sum())
            acc, d = _fold(acc, counts, capacity)
            dec += d
        if acc is None or not len(acc):
            # every count was decremented away (all-equal-counts edge)
            # or the partition held only NULL keys / no rows: carry the
            # decrement + observation mass on a NULL-key sentinel row.
            if dec or n_obs:
                yield pd.DataFrame(
                    {key: [None], "est": [0], "__mg_dec": [dec], "__mg_n_obs": [n_obs]}
                )
            return
        out = pd.DataFrame({key: acc.index, "est": acc.to_numpy(dtype=np.int64)})
        out["__mg_dec"] = 0
        out["__mg_n_obs"] = 0
        out.loc[0, "__mg_dec"] = dec
        out.loc[0, "__mg_n_obs"] = n_obs
        yield out

    return fn


def mg_summaries(
    df: DataFrame, col: str, capacity: int = 4096, flatten: bool = False
) -> DataFrame:
    """Per-partition MG summary rows ``(col, est, __mg_dec, __mg_n_obs)``.

    ``flatten=True`` treats ``col`` as an array column and counts its
    elements (the token-frequency form) inside the kernel — no explode,
    no shuffle of element rows. Output size ≤ partitions × (capacity+1).
    NULL keys / NULL arrays are excluded from the count (a NULL key is
    a cascade violation, not a frequency observation — the drift-module
    exclusion policy).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    ktype = _key_dtype(df, col, flatten)
    schema = f"`{col}` {ktype}, est long, __mg_dec long, __mg_n_obs long"
    # NULL keys are excluded JVM-SIDE, not in the kernel: an Arrow
    # batch that still contains a NULL arrives in pandas as float64 +
    # NaN, and int64 keys above 2^53 (xxhash64 fingerprints — the
    # advertised use) round and COLLIDE silently. With nulls filtered
    # before the Python boundary, a long column stays int64 end to end.
    if flatten:
        narrowed = df.select(
            F.filter(F.col(col), lambda x: x.isNotNull()).alias(col)
        ).where(F.col(col).isNotNull())
    else:
        narrowed = df.select(col).where(F.col(col).isNotNull())
    return narrowed.mapInPandas(_mg_kernel(col, capacity, flatten), schema=schema)


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 64,
    capacity: int = 4096,
    flatten: bool = False,
) -> DataFrame:
    """Top-k frequent values of ``col`` with deterministic error bounds.

    Returns ``(col, est_lo, est_hi, err_bound, n_obs)`` ordered by
    ``est_lo`` descending (ties by key): ``est_lo ≤ true ≤ est_hi =
    est_lo + err_bound``, and every key with true count > err_bound is
    guaranteed to surface when ``k`` is large enough to admit it.
    Exact (err_bound = 0) whenever each partition's distinct count
    stays within ``capacity``.

    One corpus scan; the summary table is persisted (≤ partitions ×
    capacity rows — sketch-sized) while the 1-row totals collect and
    the final per-key aggregate both read it, then released: the top-k
    (≤ k rows, bounded by construction) is materialized eagerly so the
    returned frame holds no reference to the corpus plan or the cache.
    """
    summ = mg_summaries(df, col, capacity, flatten).persist()
    try:
        tot = summ.agg(
            F.coalesce(F.sum("__mg_dec"), F.lit(0)).alias("d"),
            F.coalesce(F.sum("__mg_n_obs"), F.lit(0)).alias("n"),
        ).collect()[0]  # bounded: one row, two scalars
        err, n_obs = int(tot["d"]), int(tot["n"])
        topk = (
            summ.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.sum("est").alias("est_lo"))
            .withColumn("est_hi", F.col("est_lo") + F.lit(err))
            .withColumn("err_bound", F.lit(err).cast("long"))
            .withColumn("n_obs", F.lit(n_obs).cast("long"))
            .orderBy(F.desc("est_lo"), col)
            .limit(k)
        )
        rows = topk.collect()  # bounded: ≤ k rows
        schema = topk.schema
    finally:
        summ.unpersist()
    from ..session import local_df

    return local_df(df.sparkSession, rows, schema)


def token_heavy_hitters(
    df: DataFrame, k: int = 64, capacity: int = 4096, tokens_col: str = "tokens"
) -> DataFrame:
    """Guaranteed most-frequent token ids over the north-rule payload.

    Flattens the arrays inside the Arrow kernel — the corpus-scale
    top-tokens profile without exploding 10^12 × n_tok element rows
    into an aggregate keyed on the full vocabulary.
    """
    return heavy_hitters(df, tokens_col, k=k, capacity=capacity, flatten=True)


def skew_profile(
    df: DataFrame,
    col: str,
    capacity: int = 4096,
    min_share: float = 0.01,
    target_parallelism: int | None = None,
) -> DataFrame:
    """Hot-key table for a prospective ``groupBy(col)`` / join on ``col``.

    Returns ``(col, est_lo, share_lo, suggested_salt)`` for keys whose
    guaranteed LOWER-bound share of observations is ≥ ``min_share`` —
    a measured input to the salting decision (SURVEY.md §4: AQE splits
    skewed join partitions but not skewed groupBy hot keys; manual salt
    required). ``suggested_salt`` = ceil(share_lo × target_parallelism)
    spreads the key's rows to ≈ one task's worth per salt bucket
    (defaults to ``spark.sparkContext.defaultParallelism``).

    share_lo underestimates by ≤ err_bound/n_obs ≤ 1/(capacity+1), so
    with the default capacity any key above ~1.03× min_share is
    guaranteed reported; keys below min_share may appear only if truly
    hot in some partition — harmless (salting a cold key costs one
    extra partial-agg row).
    """
    if target_parallelism is None:
        target_parallelism = df.sparkSession.sparkContext.defaultParallelism
    hh = heavy_hitters(df, col, k=max(1, int(math.ceil(2.0 / max(min_share, 1e-9)))),
                       capacity=capacity)
    share = F.col("est_lo").cast("double") / F.greatest(F.col("n_obs"), F.lit(1)).cast(
        "double"
    )
    return (
        hh.withColumn("share_lo", share)
        .where(F.col("share_lo") >= min_share)
        .withColumn(
            "suggested_salt",
            F.ceil(F.col("share_lo") * F.lit(float(target_parallelism))).cast("int"),
        )
        .select(col, "est_lo", "share_lo", "suggested_salt")
    )
