"""Corpus-trained unigram language-model scoring over the tokenized
payload — the engine-native form of the CCNet perplexity filter
(Wenzek et al. 2019, public: score each document with a LM trained on
a trusted corpus; drop/bucket by perplexity). CCNet uses a KenLM
5-gram; a unigram model is the zero-dependency distributed baseline
with the same plumbing — the documented swap point for a real LM is
``score_unigram_lm``'s join: replace the broadcast (token, logp)
dimension with an Arrow-batched pandas UDF holding the external model
per executor (functions/vectors.py:55 documents the per-executor init
pattern).

Reference analogue: the reference's quality gate is an LLM call per
row (processor.py:120-134, excluded by design SURVEY §2.7); this is
the statistical stand-in that runs at 100 TB without a model server.

Shapes (both single-pass, north-rule ``tokens: array<int>`` payload):

* train: one explode → two-level hash aggregate on the uniform token
  id (Zipf-hot ids collapse map-side), then ONE bounded collect of two
  scalars (total count, vocab size) to close the Lidstone estimate —
  the (token, logp) dimension itself never leaves the cluster.
* score: explode docs → broadcast hash join against the vocab-sized
  lm dimension (|vocab| rows ≪ corpus; explicit ``F.broadcast``) →
  per-doc partial aggregate. Unseen tokens take the reserved
  smoothed-mass logp, so scoring a NEW corpus against a trained lm is
  well-defined (the incremental-batch use case).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "train_unigram_lm",
    "score_unigram_lm",
    "train_bigram_lm",
    "score_bigram_lm",
    "write_lm_store",
    "read_lm_store",
    "ppl_thresholds",
    "assign_ppl_bucket",
    "ppl_buckets",
]


def train_unigram_lm(
    df: DataFrame,
    tokens_col: str = "tokens",
    alpha: float = 0.5,
) -> tuple[DataFrame, dict]:
    """Lidstone-smoothed unigram LM from a token corpus: returns
    ``(lm, meta)`` where ``lm`` is a ``(token, logp)`` DataFrame
    (natural log) and ``meta`` carries ``total_tokens``, ``vocab_size``
    and ``unseen_logp`` — the log-probability reserved for any token id
    absent from the training corpus (one extra vocabulary slot in the
    denominator: ``logp(t) = ln((c_t + α) / (total + α·(V+1)))``).

    ``alpha`` must be > 0 (0 would send unseen tokens to -inf and make
    the filter reject any doc with one new id)."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    counts = (
        df.select(
            F.explode(
                F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
            ).alias("token")
        )
        # NULL elements never match the scoring join on `token`, so a
        # (NULL, logp) row would inflate vocab_size and the smoothing
        # denominator while the slot it reserves is unreachable —
        # probabilities would no longer sum consistently
        .where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = counts.agg(
        F.sum("__c").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).collect()[0]  # bounded: one row of two scalars
    total = int(tot["total"] or 0)
    vocab = int(tot["vocab"] or 0)
    if total == 0:
        # an empty training corpus would give unseen_logp = 0 —
        # p(unseen)=1, every later doc scores perplexity 1 and lands
        # in the most-fluent bucket with no hint anything is wrong
        # (misconfigured tokens_col, empty partition)
        raise ValueError(
            "train_unigram_lm: no tokens in the training corpus "
            f"(tokens_col={tokens_col!r}) — scoring against an empty "
            "model would rank every document maximally fluent"
        )
    denom = math.log(total + alpha * (vocab + 1))
    lm = counts.select(
        "token",
        (F.log(F.col("__c") + F.lit(float(alpha))) - F.lit(denom)).alias("logp"),
    )
    meta = {
        "total_tokens": total,
        "vocab_size": vocab,
        "alpha": alpha,
        "unseen_logp": math.log(alpha) - denom,
    }
    return lm, meta


def score_unigram_lm(
    df: DataFrame,
    lm: DataFrame,
    unseen_logp: float,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM score against a trained unigram model:
    ``(id, n_tok, n_unseen, mean_logp, ppl)`` with ``ppl =
    exp(-mean_logp)`` (token-level perplexity). Empty / NULL token
    arrays score NULL mean/ppl (nothing to judge — a length rule, not
    a fluency rule, handles them). ``lm`` rows beyond the doc's tokens
    cost nothing: the join direction is corpus→dimension. One row per
    distinct id (ids are assumed unique, the engine-wide contract).

    Shape: ``posexplode_outer`` keeps empty docs as one NULL-position
    row, so a SINGLE per-doc aggregate covers every input doc — no
    corpus-sized rejoin of the input to the aggregate (that join was a
    second shuffle + sort-merge at scale for nothing). The POSITION
    (not the token) distinguishes the empty-doc marker from a genuine
    NULL array element: a NULL element is a real token slot and scores
    as unseen (the same rule as :func:`score_bigram_lm`)."""
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode_outer(
                F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
            ).alias("pos", "token"),
        )
    )
    scored = toks.join(F.broadcast(lm), "token", "left")
    real = F.col("pos").isNotNull()
    per_doc = scored.groupBy(id_col).agg(
        F.sum(real.cast("int")).alias("n_tok"),
        F.sum((real & F.col("logp").isNull()).cast("int")).alias("n_unseen"),
        F.sum(
            F.when(~real, F.lit(0.0)).otherwise(
                F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))
            )
        ).alias("__sum"),
    )
    mean = F.when(
        F.col("n_tok") > 0, F.col("__sum") / F.col("n_tok")
    )
    return per_doc.select(
        id_col,
        "n_tok",
        "n_unseen",
        mean.alias("mean_logp"),
        F.exp(-mean).alias("ppl"),
    )


def train_bigram_lm(
    df: DataFrame,
    tokens_col: str = "tokens",
) -> DataFrame:
    """``(prev, cur, c_bi)`` bigram count dimension over the token
    corpus — the second half of an interpolated bigram LM (the unigram
    half comes from :func:`train_unigram_lm` on the SAME corpus; the
    context totals ``c(prev)`` are derived inside
    :func:`score_bigram_lm` by one more aggregate over this table, so
    the two can never disagree).

    Shape: one codegen ``zip_with`` pair expansion + explode + the
    uniform-key two-level hash aggregate — identical scan cost to the
    unigram fit. The dimension is bounded by DISTINCT OBSERVED bigrams
    (≪ V², Heaps-law sublinear in corpus size) but can still outgrow a
    broadcast at 100 TB — :func:`score_bigram_lm` size-gates the join
    strategy for exactly that reason."""
    toks = F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
    n = F.size(toks)
    pairs = F.when(n < 2, F.array().cast("array<struct<prev:int,cur:int>>")).otherwise(
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        )
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )


def score_bigram_lm(
    df: DataFrame,
    lm: DataFrame,
    bigram: DataFrame,
    unseen_logp: float,
    lam: float = 0.8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    broadcast_rows_max: int = 4_000_000,
) -> DataFrame:
    """Interpolated (Jelinek–Mercer, public) bigram scoring:

    * position 0: ``p = p_uni(t0)``
    * position i>0, context seen in training (``c(prev) > 0``):
      ``p = lam * c(prev,cur)/c(prev) + (1-lam) * p_uni(cur)``
    * position i>0, context UNSEEN: full backoff ``p = p_uni(cur)``

    where ``p_uni`` is the Lidstone unigram (``lm`` + ``unseen_logp``
    from :func:`train_unigram_lm`). The ``(1-lam) * p_uni`` floor keeps
    every log finite, so one novel pair never -inf's a document.
    Returns ``(id, n_tok, n_unseen_bi, mean_logp, ppl)`` — same
    contract as :func:`score_unigram_lm` (empty/NULL token arrays →
    NULL mean/ppl); ``n_unseen_bi`` counts i>0 positions whose exact
    pair was never observed.

    Scale: the unigram and context dimensions are |vocab|-bounded and
    always broadcast; the bigram dimension is counted once (bounded
    1-row collect over the already-needed fit) and broadcast only while
    ≤ ``broadcast_rows_max`` rows — beyond that the join falls back to
    a shuffle hash/sort-merge join on the uniform (prev, cur) key,
    which AQE handles without skew (hash-uniform key)."""
    if not (0.0 < lam < 1.0):
        raise ValueError("lam must be in (0, 1) — lam=1 would -inf unseen pairs")
    # deliberately NOT persisted here: the dimension is scanned three
    # times (count, ctx aggregate, join build) but it is ≤ |distinct
    # bigrams| rows — dimension-sized, not corpus-sized — and a persist
    # with no unpersist hook would leak one cached table per call in
    # repeated-call paths (every streaming micro-batch, every bench
    # sample). Callers that loop over ONE model may persist it themselves.
    n_bi = bigram.count()  # bounded: one scalar
    ctx = bigram.groupBy("prev").agg(F.sum("c_bi").alias("c_ctx"))

    # posexplode_outer keeps empty docs as one (NULL, NULL) row so ONE
    # per-doc aggregate covers every input doc — no corpus-sized
    # rejoin of the input to the aggregate (see score_unigram_lm)
    toks_arr = F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
    pos = df.select(
        F.col(id_col),
        toks_arr.alias("__toks"),
        F.posexplode_outer(toks_arr).alias("pos", "cur"),
    ).select(
        id_col,
        "pos",
        "cur",
        # element_at is 1-based: index `pos` IS the previous token for
        # pos >= 1 (NULL pos -> NULL prev, the empty-doc row)
        F.when(F.col("pos") == 0, F.lit(None).cast("int"))
        .otherwise(F.element_at(F.col("__toks"), F.col("pos")))
        .alias("prev"),
    )
    scored = (
        pos.join(F.broadcast(lm.withColumnRenamed("token", "cur")), "cur", "left")
        .join(F.broadcast(ctx), "prev", "left")
    )
    bi_side = bigram if n_bi > broadcast_rows_max else F.broadcast(bigram)
    scored = scored.join(bi_side, ["prev", "cur"], "left")

    real = F.col("pos").isNotNull()
    p_uni = F.exp(F.coalesce(F.col("logp"), F.lit(float(unseen_logp))))
    p = F.when(F.col("c_ctx").isNull(), p_uni).otherwise(
        F.lit(float(lam)) * F.coalesce(F.col("c_bi"), F.lit(0)) / F.col("c_ctx")
        + F.lit(1.0 - lam) * p_uni
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum(real.cast("int")).alias("n_tok"),
        F.sum(
            (real & (F.col("pos") > 0) & F.col("c_bi").isNull()).cast("int")
        ).alias("n_unseen_bi"),
        F.sum(F.when(~real, F.lit(0.0)).otherwise(F.log(p))).alias("__sum"),
    )
    mean = F.when(
        F.col("n_tok") > 0, F.col("__sum") / F.col("n_tok")
    )
    return per_doc.select(
        id_col,
        "n_tok",
        "n_unseen_bi",
        mean.alias("mean_logp"),
        F.exp(-mean).alias("ppl"),
    )


def write_lm_store(
    lm: DataFrame,
    meta: dict,
    path: str,
    bigram: DataFrame | None = None,
) -> None:
    """Persist a trained LM for scoring future batches against a FIXED
    reference distribution (the CCNet deployment shape: train once on
    the trusted corpus, score every crawl snapshot after). Layout:
    ``<path>/unigram`` (token, logp) parquet, optional ``<path>/bigram``
    (prev, cur, c_bi) parquet, ``<path>/meta.json`` (scalars, written
    LAST via tmp+rename so a crash mid-write leaves no readable-but-
    partial store — the ledger convention, pipeline.py:71)."""
    lm.write.mode("overwrite").parquet(os.path.join(path, "unigram"))
    if bigram is not None:
        bigram.write.mode("overwrite").parquet(os.path.join(path, "bigram"))
    meta = dict(meta, has_bigram=bigram is not None)
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))


def read_lm_store(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame | None, dict]:
    """Load ``(lm, bigram_or_None, meta)`` written by
    :func:`write_lm_store`. Raises ``FileNotFoundError`` if the store
    was never completed (no meta.json — the crash-window state)."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no completed LM store at {path}")
    with open(meta_path, encoding="utf-8") as f:
        meta = json.load(f)
    lm = spark.read.parquet(os.path.join(path, "unigram"))
    bigram = (
        spark.read.parquet(os.path.join(path, "bigram"))
        if meta.get("has_bigram")
        else None
    )
    return lm, bigram, meta


def ppl_thresholds(
    scored: DataFrame,
    by: str | None = "source",
    low_q: float = 1.0 / 3.0,
    high_q: float = 2.0 / 3.0,
    accuracy: int = 10000,
) -> DataFrame:
    """The ``(by?, __lo, __hi)`` perplexity-quantile threshold dimension
    (one ``percentile_approx`` aggregate — GK sketch, JVM-side,
    mergeable map-side partials; |groups| rows, 1 row when
    ``by=None``). Split out from :func:`ppl_buckets` so the thresholds
    can be FROZEN at corpus-build time and re-applied verbatim to later
    batches (:func:`assign_ppl_bucket`) — re-deriving quantiles on a
    small batch would silently move the cut line."""
    if not (0.0 < low_q <= high_q < 1.0):
        raise ValueError("need 0 < low_q <= high_q < 1")
    qs = F.percentile_approx(
        "ppl", [float(low_q), float(high_q)], accuracy
    ).alias("__qs")
    pick = lambda d: d.select(  # noqa: E731
        *([by] if by is not None else []),
        F.element_at("__qs", 1).alias("__lo"),
        F.element_at("__qs", 2).alias("__hi"),
    )
    return pick(scored.agg(qs) if by is None else scored.groupBy(by).agg(qs))


def assign_ppl_bucket(
    scored: DataFrame,
    thresholds: DataFrame,
    by: str | None = "source",
    out_col: str = "ppl_bucket",
    global_lo: float | None = None,
    global_hi: float | None = None,
) -> DataFrame:
    """Label each row 'head' / 'middle' / 'tail' against a GIVEN
    threshold dimension (``ppl <= __lo`` → head, ``<= __hi`` → middle);
    NULL ppl (empty docs) → NULL bucket. Groups absent from the
    dimension (a batch source the corpus never saw) fall back to
    ``global_lo``/``global_hi`` when given, else NULL bucket. The
    dimension is |groups|-sized → always broadcast."""
    if by is None:
        out = scored.crossJoin(F.broadcast(thresholds))
    else:
        out = scored.join(F.broadcast(thresholds), by, "left")
    lo = F.coalesce(F.col("__lo"), F.lit(global_lo).cast("double"))
    hi = F.coalesce(F.col("__hi"), F.lit(global_hi).cast("double"))
    bucket = (
        F.when(F.col("ppl").isNull() | lo.isNull(), F.lit(None).cast("string"))
        .when(F.col("ppl") <= lo, F.lit("head"))
        .when(F.col("ppl") <= hi, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.withColumn(out_col, bucket).drop("__lo", "__hi")


def ppl_buckets(
    scored: DataFrame,
    by: str | None = "source",
    low_q: float = 1.0 / 3.0,
    high_q: float = 2.0 / 3.0,
    out_col: str = "ppl_bucket",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail partition (Wenzek et al. 2019, public):
    bucket documents by perplexity WITHIN each ``by`` group (per-source
    thresholds, so a verbose-but-clean source isn't judged by a terse
    source's scale). ``ppl <= q(low_q)`` → 'head' (most fluent),
    ``<= q(high_q)`` → 'middle', else 'tail'; NULL ppl (empty docs) →
    NULL bucket. ``by=None`` buckets against global quantiles.

    Composition of :func:`ppl_thresholds` + :func:`assign_ppl_bucket`:
    one aggregate → broadcast threshold dimension → join back. No sort,
    no second scan of the data, no driver-side quantile math."""
    dim = ppl_thresholds(scored, by, low_q, high_q, accuracy)
    return assign_ppl_bucket(scored, dim, by, out_col)
