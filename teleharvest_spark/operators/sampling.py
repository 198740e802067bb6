"""Deterministic splitting and stratified sampling for training-data
pipelines.

A 100 TB corpus needs its train/val/test split and its eval samples to
be (a) reproducible across runs and engines, (b) stable under
re-partitioning, appends, and resumes, and (c) computable without a
global shuffle. ``rand()`` fails all three (seeded rand is
partition-layout dependent); Spark's ``sampleBy`` fails (a)/(b) the
same way. The standard fix is CONTENT-DEFINED assignment: hash the
stable row key and carve the hash space.

Reference analogue: the reference's only "sampling" is the bounded
lookback window (``/root/reference/models/message.py:91-110``); the
hash-split generalizes its determinism requirement (same rows → same
outcome on every re-run) to fractional assignment.

Scale notes: both operators are one narrow projection (md5 is a
codegen expression) — the split adds ZERO shuffles; the stratified
sample adds exactly one (the per-group top-k window on the hash),
which is the minimum for an exact per-group k. md5 over the key is
engine-portable (identical lowercase hex in Spark, DuckDB, Python
hashlib), which is what makes the assignment verifiable by an
independent oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = [
    "hash_bucket",
    "split_assign",
    "stratified_sample",
    "leakage_safe_split",
    "token_budget_sample",
    "upsample_mixture",
]

_BUCKETS = 65536  # 4 hex digits of the md5 — plenty of split resolution


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 65536) from the md5 of the key's
    string form. Content-defined: independent of partitioning, task
    order, Spark version, and engine (DuckDB: ``('0x' ||
    substr(md5(k), 1, 4))::INT``)."""
    hx = F.md5(F.encode(key.cast("string"), "UTF-8"))
    return F.conv(F.substring(hx, 1, 4), 16, 10).cast("int")


def _carve(key_col: Column, effective: Column, train: float, val: float) -> Column:
    """The ONE definition of the three-way hash carve (shared by
    ``split_assign`` and ``leakage_safe_split`` so boundary rounding
    and the NULL-key rule can never fork): NULL key → NULL split (a
    NULL doc_id is a cascade violation upstream, not silently
    'train'); otherwise carve ``hash_bucket(effective)``."""
    if not (0 < train < 1 and 0 < val < 1 and train + val < 1):
        raise ValueError("need 0 < train, val and train + val < 1")
    b = hash_bucket(effective)
    t_hi = int(train * _BUCKETS)
    v_hi = t_hi + int(val * _BUCKETS)
    return (
        F.when(key_col.isNull(), F.lit(None).cast("string"))
        .when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_assign(
    df: DataFrame,
    key: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` ∈ {'train','val','test'} by hash-carving.

    Boundaries are rounded to 1/65536 resolution; the exact fractions
    are ``floor(train*65536)/65536`` etc. — document the realized
    fraction, don't pretend to more precision than the bucket count.
    Rows with a NULL key get NULL split.
    """
    return df.withColumn(out_col, _carve(F.col(key), F.col(key), train, val))


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    key: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test split that keeps every near-duplicate CLUSTER on
    one side — the contamination guard: if a train doc has a near-dup
    in test, the eval leaks (memorization scores as generalization).

    ``components`` is ``operators.components.connected_components``
    output (``node``, ``component``). The split key becomes the
    cluster's canonical label for clustered docs and the doc's own key
    for singletons, then the same md5 carve as ``split_assign`` — so
    the split stays content-defined AND cluster-atomic.

    Cost: one left join against the components frame, then the same
    zero-shuffle hash projection. No broadcast hint on purpose:
    duplicate clusters are usually a small corpus fraction and AQE
    broadcasts them, but a pathologically duplicate-heavy corpus must
    degrade to a shuffle join on the uniformly-hashed key instead of
    OOMing a forced broadcast.
    """
    comp = components.select(
        F.col("node").alias(key), F.col("component").alias("__comp")
    )
    joined = df.join(comp, key, "left")
    effective = F.coalesce(F.col("__comp"), F.col(key))
    assignment = _carve(F.col(key), effective, train, val)
    return joined.withColumn(out_col, assignment).drop("__comp")


def stratified_sample(
    df: DataFrame,
    key: str = "doc_id",
    group: str = "source",
    k: int = 10,
    salt: int | None = None,
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen by md5
    rank — a deterministic per-stratum sample (same rows every run and
    on every engine). Ties on the full key are impossible (md5 of
    distinct strings collides with probability ~0); ``key`` breaks
    ties between equal keys' duplicates deterministically.

    NULL-``key`` rows are excluded: their md5 is NULL, which sorts
    FIRST under the ascending rank and ties completely (NULL tiebreak
    too), so which of them land in the sample would be partition-order
    dependent — the one thing this sampler promises away. Route NULL
    keys through the uniqueness/cascade checks; an unidentifiable row
    has no place in a reproducible sample.

    Delegates to ``watermark.top_k_per_group``: ``salt=None`` is one
    window shuffle by ``group``; pass ``salt=S`` when a group is hot
    (one source holding a large table fraction) to run the lossless
    salted two-phase rank — no task then sees more than
    |group|/S + S·k rows.
    """
    from .watermark import top_k_per_group

    hx = F.md5(F.encode(F.col(key).cast("string"), "UTF-8"))
    out = top_k_per_group(
        df.where(F.col(key).isNotNull()).withColumn("__h", hx),
        key=group,
        order_col="__h",
        k=k,
        ascending=True,
        tiebreak=key,
        salt=salt,
    )
    return out.withColumnRenamed("rank", "sample_rank").drop("__h")


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    key: str = "doc_id",
    group: str = "source",
    size_col: str = "n_tok",
    seed: int = 0,
    default_budget: int | None = None,
) -> DataFrame:
    """Data-mixture curation: per ``group``, keep a deterministic
    pseudo-random prefix of documents whose cumulative ``size_col``
    stays within that group's token budget — how a training mix is
    weighted ("200B web tokens, 50B books") without a second pass or a
    driver loop.

    Selection order is md5(key, seed) — content-defined, so the sample
    is stable under repartitioning and engines agree on it. A doc is
    kept iff its cumulative size INCLUDING itself is ≤ budget, so the
    realized total never overshoots; it undershoots by at most one
    document (the standard prefix rule — exact budget hits would
    require splitting a document, which is the packer's job, not the
    sampler's). Groups missing from ``budgets`` keep everything unless
    ``default_budget`` is given. NULL ``group`` rows are dropped (the
    engine-wide NULL-stratum exclusion), and so are NULL-``key`` rows
    — their selection hash is NULL, which sorts first and ties
    completely, making the kept set partition-order dependent (see
    stratified_sample). NULL sizes count 0.

    Scale: one window (partition by group, order by hash) — the same
    shuffle shape as sessionize/top-k; running sum is O(1) state per
    row. A pathologically hot group degrades to one big sorted
    partition; if that bites, pre-filter with a sacrificial hash range
    (keep hash < budget/total_tokens * 1.2 of the keyspace first),
    which bounds the window input — documented rather than automatic
    because it needs a group-size estimate.
    """
    from pyspark.sql import Window

    df = df.where(F.col(group).isNotNull() & F.col(key).isNotNull())
    hx = F.md5(F.concat(F.col(key).cast("string"), F.lit(f":{seed}")))
    w = (
        Window.partitionBy(group)
        .orderBy(F.col("__h"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_expr = F.lit(default_budget)
    for g, b in sorted(budgets.items()):
        budget_expr = F.when(F.col(group) == g, F.lit(b)).otherwise(budget_expr)
    out = (
        df.withColumn("__h", hx)
        .withColumn(
            "__cum", F.sum(F.coalesce(F.col(size_col), F.lit(0))).over(w)
        )
        .withColumn("__budget", budget_expr.cast("long"))
        .where(F.col("__budget").isNull() | (F.col("__cum") <= F.col("__budget")))
        .drop("__h", "__cum", "__budget")
    )
    return out


def upsample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    group: str = "source",
    seed: int = 0,
    default_weight: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Epoch-weighted data mixing: repeat each row ``weight(group)``
    times in expectation — the other half of mixture curation
    (:func:`token_budget_sample` trims a source DOWN to a budget; this
    weights a source UP, "3 epochs of books, 0.5 epochs of web", the
    published practice of non-integer dataset epochs in LLM training
    mixes).

    Exact-in-distribution and content-defined, not random: every row
    gets ``floor(w)`` guaranteed copies plus one more iff
    ``md5(key:copy:seed)`` falls in the fractional remainder — so a
    weight of 2.5 yields exactly 2 or 3 copies per doc (never 0 or 7),
    re-runs/engines/partitionings agree row-for-row, and ``seed``
    re-rolls only the fractional picks. ``copy_col`` (0-based) makes
    repeats distinct downstream — pack on ``(key, copy)`` so copies
    land in different sequences. Weights < 1 degrade to deterministic
    subsampling (0 guaranteed copies, keep iff hash < w); weight ≤ 0
    drops the group. Groups absent from ``weights`` (and NULL groups)
    use ``default_weight``; the 1.0 default makes the op an identity
    plus ``copy=0`` for unlisted sources.

    Scale: one ``explode(sequence(...))`` projection — zero shuffles,
    no window, no driver loop; output size = Σ ceil(w)·|group| before
    the hash filter. The hash threshold quantizes to 1/65536 (the
    engine-wide md5 bucket resolution).
    """
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}")
    w_expr = F.lit(float(default_weight))
    for g, w in sorted(weights.items()):
        w_expr = F.when(F.col(group) == g, F.lit(float(w))).otherwise(w_expr)
    n_copies = F.ceil(w_expr).cast("int")                 # candidate copies
    frac = w_expr - F.floor(w_expr)                       # fractional remainder
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0), n_copies - 1)
    ).otherwise(F.array().cast("array<int>"))
    keyed = F.concat_ws(
        ":", F.col(key).cast("string"), F.col(copy_col).cast("string"), F.lit(str(seed))
    )
    keep = (F.col(copy_col) < F.floor(w_expr)) | (
        (frac > 0)
        & (hash_bucket(keyed) < F.round(frac * _BUCKETS).cast("int"))
    )
    return (
        df.withColumn(copy_col, F.explode(copies))
        .where(keep)
    )
