"""Per-group characteristic terms (TF-IDF) — corpus analysis for a
training-data pipeline (what distinguishes one source's vocabulary
from the pooled corpus; the term-level companion of the distribution
drift checks in ``operators/drift.py``).

Reference analogue: the stop-word scan
(``/root/reference/processor.py:90-95``) is the degenerate
fixed-vocabulary form; TF-IDF derives the interesting vocabulary from
the data instead.

Everything is codegen expressions + two hash aggregations:

* term frequencies: one shuffle keyed by (group, term);
* document (group) frequencies: one shuffle keyed by term, output is
  |vocab| rows — joined back broadcast-style (vocab << corpus);
* the group count is a bounded driver scalar (|groups| is partition
  cardinality, same bound as IVF's centroid collect).

Skew note: natural-language term frequencies are Zipfian, but the
(group, term) composite key spreads each hot term over all groups, and
map-side partial aggregation collapses per-task counts before the
exchange — the classic word-count shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.text import WS as TXT_WS

__all__ = ["top_terms"]


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    group: str = "source",
    k: int = 5,
    idf: str = "linear",
) -> DataFrame:
    """Top-``k`` terms per group by TF-IDF: ``(group, term, tfidf,
    rank)``; rank ties broken by term (deterministic).

    ``idf='log'`` uses the textbook ``tf * ln(N/df)``; ``idf='linear'``
    uses ``tf * N / df`` — same ranking for a single fixed df only,
    but linear stays in exact rational arithmetic (int ops + one IEEE
    division), which makes results bit-reproducible across engines —
    the variant the cross-engine oracle pins. Both are monotone in tf
    and anti-monotone in df.
    """
    if idf not in ("linear", "log"):
        raise ValueError("idf must be 'linear' or 'log'")
    # NULL-group rows are excluded up front: they belong to the
    # referential/cascade violation path, and letting them through
    # would give their terms df=0 (countDistinct ignores NULL) — a
    # divide-by-zero under ANSI mode in the idf expression.
    words = df.where(F.col(group).isNotNull()).select(
        F.col(group),
        F.explode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), TXT_WS + "+")
        ).alias("term"),
    ).where(F.col("term") != "")
    # NULL groups excluded up front (the engine-wide NULL-stratum
    # policy; n_groups below counts non-null keys for the same reason)
    # — which makes tf rows distinct per (non-null group, term), so df
    # is a plain count: countDistinct here forced an Expand/partial-
    # distinct pass over the vocabulary-sized aggregate for a value a
    # hash aggregate produces identically
    words = words.where(F.col(group).isNotNull())
    tf = words.groupBy(group, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N = distinct non-null group keys in the corpus (whether or not a
    # group contributes terms). Computed from the column-pruned base
    # scan — counting it from `tf` instead would execute the whole
    # explode+aggregate pipeline a second time just for one scalar.
    n_groups = (
        df.select(group).where(F.col(group).isNotNull()).distinct().count()
    )
    scored = tf.join(dfreq, "term")
    if idf == "linear":
        score = F.col("tf").cast("double") * n_groups / F.col("df")
    else:
        score = F.col("tf").cast("double") * F.log(F.lit(float(n_groups)) / F.col("df"))
    w = W.partitionBy(group).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("tfidf", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group, "term", "tfidf", "rank")
    )
