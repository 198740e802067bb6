"""Train/eval contamination scan — n-gram overlap of training
documents against a broadcast evaluation-set dimension.

The check every LLM training pipeline runs before a model ships:
"does any training document contain the benchmark?" (VERDICT r3 item
7). Reference analogue: the banned-content membership checks
(settings.py stop-word list, services/openai_service.py prompt
filters) generalized from single tokens to word k-shingles.

Scale design (100 TB train side, ~10^4-10^6 eval docs):

* The eval set is exploded ONCE into a (shingle, eval_id, n_eval)
  dimension and BROADCAST — eval benchmarks are MBs, never sharded.
* The training corpus streams through a broadcast hash join on the
  shingle — the 100 TB side is never shuffled; matched rows collapse
  in a map-side partial aggregate keyed by (doc_id, eval_id), whose
  output is bounded by true contamination volume, not corpus size.
* Everything is codegen (split/transform/explode/count); no Python.

If the eval set ever outgrows broadcast (say full-corpus vs corpus
overlap), the same plan degrades gracefully: drop the broadcast hint
and the shingle join becomes a shuffled equi-join on an 8-byte
xxhash64 of the shingle — still never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _spread, shingles


def contamination_scan(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """(doc_id, eval_id, n_overlap, n_eval, overlap_frac) for every
    training doc sharing ≥ ``min_overlap`` distinct word k-shingles
    with an eval doc.

    ``n_overlap`` = |shingles(train) ∩ shingles(eval)| (exact — the
    shingle arrays are distinct per doc, so the join row count per
    pair IS the intersection size); ``overlap_frac`` = n_overlap /
    n_eval, the fraction of the eval doc's shingles present in the
    training doc. ``min_overlap`` ≥ 2 by default so the degenerate
    single-shingle match (e.g. two empty texts both yielding the ''
    shingle) doesn't flag.

    Exact-SQL-oracle-comparable; the driver-gated ``contamination``
    query hashes the integer columns (overlap_frac stays out of the
    gate — a/b ratios can land on .xxxxxx5 ties where Spark HALF_UP
    and DuckDB binary rounding diverge).
    """
    tr_sh = _spread(train, id_col).select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("shingle")
    )
    ev_posts = eval_df.select(
        F.col(id_col).alias("eval_id"), shingles(text_col, k).alias("_sh")
    ).select(
        "eval_id", F.size("_sh").alias("n_eval"), F.explode("_sh").alias("shingle")
    )
    joined = tr_sh.join(F.broadcast(ev_posts), "shingle")
    return (
        joined.groupBy(id_col, "eval_id", "n_eval")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
        .select(
            id_col,
            "eval_id",
            "n_overlap",
            "n_eval",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_eval"), 6
            ).alias("overlap_frac"),
        )
    )
