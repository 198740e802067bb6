"""Data Selection with Importance Resampling (DSIR) — Xie et al. 2023
(public): select raw-corpus documents that look like a small TARGET
corpus by (1) fitting cheap bag-of-hashed-n-gram models to both, (2)
scoring each raw doc with the log importance ratio
``log p_target(x) − log p_raw(x)``, and (3) resampling k docs with the
Gumbel-top-k trick, which draws WITHOUT replacement from the softmax
of the log weights. This is the published way a 100 TB web crawl is
curated toward a high-quality target (Wikipedia/books) without
training a classifier.

Reference analogue: the reference's LLM quality score per row
(processor.py:120-134, design-excluded SURVEY §2.7); like
operators/lm.py this is the statistical stand-in that runs at corpus
scale with no model server — and unlike a perplexity filter it is
RELATIVE to a target distribution, not absolute fluency.

Spark shapes (everything is the explode → two-level-agg → broadcast-
dimension-join pattern the engine already uses for the unigram LM):

* features: hashed word unigrams + bigrams into ``n_buckets``
  (codegen: ``split`` + ``transform``/``zip_with`` over xxhash64 — no
  Python in the feature path).
* fit: one explode + hash aggregate per corpus → a ≤ n_buckets-row
  count dimension; the Lidstone log-ratio dimension is the join of
  the two (still ≤ n_buckets rows, broadcast).
* score: explode raw docs → broadcast hash join → per-doc sum. Raw
  corpus rows stream; nothing corpus-sized ever collects.
* resample: Gumbel key = log_w + g where g = −ln(−ln(u)) and u is the
  engine-wide content-defined md5 uniform (``sampling.hash_bucket``) —
  deterministic across partitionings/engines/re-runs; top-k by the
  perturbed key is one TakeOrdered (no global sort materialized).

Scale: the only shuffles are the two fit aggregates (map-side partial
on a uniform hash key — Zipf-hot words collapse before the exchange)
and the per-doc score aggregate keyed on doc_id. The dimension is
bounded by n_buckets (default 2^14 rows) regardless of corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_bucket, _BUCKETS

__all__ = [
    "hashed_gram_features",
    "fit_feature_counts",
    "dsir_log_ratio_dim",
    "dsir_log_weights",
    "dsir_resample",
]


def hashed_gram_features(text_col: Column, n_buckets: int = 16384) -> Column:
    """``array<int>`` of hashed word unigram + bigram feature ids (the
    DSIR paper's feature space). Pure codegen: lowercase, split on
    whitespace, xxhash64 each gram mod n_buckets. Empty/NULL text →
    empty array."""
    # regexp strip, not F.trim: trim only removes ASCII spaces, so a
    # leading/trailing \n or \t would yield phantom ''-grams
    stripped = F.regexp_replace(
        F.coalesce(text_col, F.lit("")), r"^\s+|\s+$", ""
    )
    words = F.when(
        stripped == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(stripped), r"\s+"))
    uni = F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(n_buckets)).cast("int"))
    # bigrams: zip words[0:n-1] with words[1:n]
    n = F.size(words)
    bi = F.when(n < 2, F.array().cast("array<int>")).otherwise(
        F.zip_with(
            F.slice(words, 1, n - 1),
            F.slice(words, 2, n - 1),
            lambda a, b: F.pmod(
                F.xxhash64(F.concat_ws(" ", a, b)), F.lit(n_buckets)
            ).cast("int"),
        )
    )
    return F.concat(uni, bi)


def fit_feature_counts(
    df: DataFrame, text_col: str = "text", n_buckets: int = 16384
) -> DataFrame:
    """``(feature, cnt)`` hash-aggregate over a corpus — one explode +
    two-level count on the uniform feature id."""
    return (
        df.select(
            F.explode(hashed_gram_features(F.col(text_col), n_buckets)).alias(
                "feature"
            )
        )
        .groupBy("feature")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratio_dim(
    target_counts: DataFrame,
    raw_counts: DataFrame,
) -> DataFrame:
    """The joined ``(feature, t_cnt, r_cnt)`` count dimension —
    ≤ n_buckets rows (full outer join of the two fits; absent side
    counts 0). :func:`dsir_log_weights` turns it into the smoothed
    log-ratio; features absent from BOTH corpora resolve there via the
    unseen-ratio constant."""
    t = target_counts.withColumnRenamed("cnt", "t_cnt")
    r = raw_counts.withColumnRenamed("cnt", "r_cnt")
    joined = t.join(r, "feature", "full")
    return joined.select(
        "feature",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )


def _smoothed_logp(cnt_col: Column, total: int, n_buckets: int, alpha: float) -> Column:
    denom = math.log(total + alpha * n_buckets)
    return F.log(cnt_col + F.lit(float(alpha))) - F.lit(denom)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16384,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-raw-doc ``(id_col, n_feat, log_w)`` where ``log_w`` is the
    summed hashed-n-gram log importance ratio of the doc's features.
    Docs with no features (empty text) score log_w = 0 (no evidence
    either way). NULL ids pass through (upstream cascade's problem).

    The two corpus totals are the only driver-side scalars (one
    1-row collect per corpus, corpus-size-independent)."""
    t_counts = fit_feature_counts(target, text_col, n_buckets)
    r_counts = fit_feature_counts(raw, text_col, n_buckets)
    # ≤ n_buckets rows, materialized EAGERLY via localCheckpoint: the
    # totals collect below and the scoring job's broadcast must not
    # each re-run the two corpus fit scans. localCheckpoint (not a
    # bare persist): its blocks are RDD-owned and released by the
    # ContextCleaner when the handle is GC'd, whereas a persist with
    # no unpersist hook would leak one CacheManager entry per call in
    # repeated-call paths (the lm.py convention).
    dim = dsir_log_ratio_dim(t_counts, r_counts).localCheckpoint(eager=True)

    totals = dim.agg(
        F.sum("t_cnt").alias("t_total"), F.sum("r_cnt").alias("r_total")
    ).collect()[0]  # bounded: one row, two scalars
    t_total = int(totals["t_total"] or 0)
    r_total = int(totals["r_total"] or 0)
    ratio_dim = dim.select(
        "feature",
        (
            _smoothed_logp(F.col("t_cnt"), t_total, n_buckets, alpha)
            - _smoothed_logp(F.col("r_cnt"), r_total, n_buckets, alpha)
        ).alias("log_ratio"),
    )
    # a feature unseen in BOTH corpora (absent from the dimension) has
    # ratio ln(alpha/(t_total+aB)) - ln(alpha/(r_total+aB))
    unseen_ratio = math.log(r_total + alpha * n_buckets) - math.log(
        t_total + alpha * n_buckets
    )

    feats = raw.select(
        F.col(id_col),
        F.explode_outer(hashed_gram_features(F.col(text_col), n_buckets)).alias(
            "feature"
        ),
    )
    scored = feats.join(F.broadcast(ratio_dim), "feature", "left")
    per_doc = scored.groupBy(id_col).agg(
        F.sum(F.col("feature").isNotNull().cast("int")).alias("n_feat"),
        F.sum(
            F.when(F.col("feature").isNull(), F.lit(0.0)).otherwise(
                F.coalesce(F.col("log_ratio"), F.lit(float(unseen_ratio)))
            )
        ).alias("log_w"),
    )
    return per_doc.select(
        id_col,
        F.coalesce("n_feat", F.lit(0)).alias("n_feat"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16384,
    alpha: float = 0.5,
    temperature: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Gumbel-top-k importance resample: the k raw docs with the
    largest ``log_w / temperature + gumbel`` — a draw WITHOUT
    replacement from softmax(log_w / temperature) (the public Gumbel-
    max identity). ``temperature → 0`` degrades to deterministic
    top-k by weight; large temperature → uniform sample.

    The Gumbel noise is CONTENT-DEFINED (md5 of ``id:seed`` → uniform
    in (0,1) → −ln(−ln u)), so the sample is reproducible across
    engines, partitionings, and re-runs, and ``seed`` re-rolls it.
    Returns the selected raw rows + ``log_w``.

    Scale: score (above) + one TakeOrdered(k) — no global sort
    materializes; k is driver-bounded by construction (the caller asks
    for k rows)."""
    if k <= 0:
        raise ValueError("k must be positive")
    weights = dsir_log_weights(
        raw, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    keyed = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    # uniform in (0,1): (bucket + 0.5) / BUCKETS keeps u strictly inside
    u = (hash_bucket(keyed) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    gumbel = -F.log(-F.log(u))
    scored = raw.join(weights, id_col, "left").withColumn(
        "__gkey",
        F.coalesce(F.col("log_w"), F.lit(0.0)) / F.lit(float(max(temperature, 1e-12)))
        + gumbel,
    )
    # NULL ids all share one Gumbel key (concat_ws skips NULLs), so a
    # content hash breaks their ties deterministically — without it the
    # pick among NULL-id rows would be partitioning-dependent
    return (
        scored.orderBy(
            F.col("__gkey").desc(),
            F.col(id_col),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))),
        )
        .limit(k)
        .drop("__gkey", "n_feat")
    )
