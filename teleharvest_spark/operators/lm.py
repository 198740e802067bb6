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

import math

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_unigram_lm", "score_unigram_lm"]


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
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = counts.agg(
        F.sum("__c").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).collect()[0]  # bounded: one row of two scalars
    total = int(tot["total"] or 0)
    vocab = int(tot["vocab"] or 0)
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
    cost nothing: the join direction is corpus→dimension."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.coalesce(F.col(tokens_col), F.array().cast("array<int>"))
            ).alias("token"),
        )
    )
    scored = toks.join(F.broadcast(lm), "token", "left")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.col("logp").isNull().cast("int")).alias("n_unseen"),
        F.sum(F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))).alias("__sum"),
    )
    mean = F.col("__sum") / F.col("n_tok")
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("n_unseen", F.lit(0)).alias("n_unseen"),
            mean.alias("mean_logp"),
            F.exp(-mean).alias("ppl"),
        )
    )
