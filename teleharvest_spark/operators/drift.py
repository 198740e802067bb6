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
from pyspark.sql import Column, DataFrame, functions as F

from ..config import CheckSuite
from ..functions.text import WS as TXT_WS

N_TOK_BUCKETS = 128
N_TOK_MAX_FOR_BUCKETS = 16384  # bucket width = 128 tokens
TOKEN_ID_BUCKETS = 64
_PSI_EPS = 1e-6


def ntok_bucket_col(n_tok: Column | None = None) -> Column:
    """THE n_tok bucketing expression — shared by the batch histogram
    and the streaming windowed histogram so the two can never fork
    (misaligned bucket spaces would make every streaming KS/PSI
    silently compare against a baseline in a different space)."""
    width = N_TOK_MAX_FOR_BUCKETS // N_TOK_BUCKETS
    col = n_tok if n_tok is not None else F.col("n_tok")
    return F.least(
        F.floor(F.coalesce(col, F.lit(0)) / width), F.lit(N_TOK_BUCKETS - 1)
    ).cast("int")


def token_bucket_array(tokens: Column, vocab: int) -> Column:
    """Per-row token-id bucket array (narrow ``transform`` before any
    explode) — the shared bucketing for batch ``token_id_histogram``
    and the streaming token histogram; same no-fork rationale as
    :func:`ntok_bucket_col`."""
    width = max(1, vocab // TOKEN_ID_BUCKETS)
    return F.transform(
        F.coalesce(tokens, F.array().cast("array<int>")),
        lambda t: F.least(F.floor(t / width), F.lit(TOKEN_ID_BUCKETS - 1)).cast("int"),
    )


def ntok_histogram(df: DataFrame, key: str = "source") -> DataFrame:
    """Per-source bucket counts of n_tok (fixed-width buckets).

    Rows with a NULL partition key are excluded: drift is a
    per-partition check and a NULL key is a referential violation for
    the cascade, not a partition to compare (the same exclusion policy
    as quantile_trim / top_terms)."""
    bucket = ntok_bucket_col()
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

    buckets = token_bucket_array(F.col("tokens"), VOCAB)
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


def _align_hist(hist: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """(source, bucket, cnt, base_cnt) — per-source dense alignment of
    a histogram against a global (no source column) or per-source
    baseline; absent buckets on either side read 0.

    The source key compares null-safely: NULL is a real partition
    value everywhere in this engine (a NULL-source histogram group
    exists whenever the fact has NULL sources), and a plain equality
    join would emit the NULL source's hist and baseline rows as two
    DISJOINT row sets — the downstream groupBy would then interleave
    duplicate buckets and corrupt that source's CDF."""
    base = baseline_hist.select(
        *(
            [F.col("source").alias("_bs")]
            if "source" in baseline_hist.columns
            else []
        ),
        F.col("bucket").alias("_bb"),
        F.col("cnt").alias("base_cnt"),
    )
    if "_bs" in base.columns:
        cond = F.col("source").eqNullSafe(F.col("_bs")) & (
            F.col("bucket") == F.col("_bb")
        )
        src_out = F.coalesce(F.col("source"), F.col("_bs"))
    else:
        sources = hist.select("source").distinct()
        base = sources.select(F.col("source").alias("_bs")).crossJoin(
            F.broadcast(base)
        )
        cond = F.col("source").eqNullSafe(F.col("_bs")) & (
            F.col("bucket") == F.col("_bb")
        )
        src_out = F.coalesce(F.col("source"), F.col("_bs"))
    # no broadcast hint: Spark cannot broadcast a full-outer build side
    # (the hint would be ignored with a per-query warning); both sides
    # are ≤ |sources|×|buckets| rows, so the shuffle is metadata-sized
    joined = hist.join(base, cond, "full_outer").select(
        src_out.alias("source"),
        F.coalesce(F.col("bucket"), F.col("_bb")).alias("bucket"),
        "cnt",
        "base_cnt",
    )
    return joined.fillna({"cnt": 0, "base_cnt": 0})


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
    # Pure-Catalyst KS/PSI (round 6, guide §4): the math previously ran
    # in ``_drift_metrics_pdf`` via applyInPandas — one FlatMapGroupsIn
    # Pandas node whose Python-worker round trip cost ~1.2-1.8 s of
    # fixed overhead per suite run over a ≤|sources|×|buckets|-row
    # frame. The window/aggregate form below performs the identical
    # operation sequence (per-source bucket-ordered running sums, the
    # same eps clamps) in codegen; the pandas helper stays as the
    # streaming micro-batch kernel and the parity oracle
    # (tests pin SQL ≡ pandas on dense/sparse/degenerate histograms).
    return _metrics_from_aligned(_align_hist(hist, baseline_hist), include_w1)


def _metrics_from_aligned(joined: DataFrame, include_w1: bool = False) -> DataFrame:
    """KS/PSI[, W1] from an aligned (source, bucket, cnt, base_cnt)
    frame — the shared kernel of :func:`drift_metrics` and
    :func:`loo_drift_metrics`."""
    from pyspark.sql import Window

    w_all = Window.partitionBy("source")
    w_ord = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pn = F.sum(F.col("cnt").cast("double")).over(w_all)
    qn = F.sum(F.col("base_cnt").cast("double")).over(w_all)
    # ANSI-safe divisors: a zero total is the degenerate branch (the
    # aggregate below overrides every per-row value with ks=1/psi=inf),
    # so the substituted 1.0 never reaches the output — it only keeps
    # the division from raising DIVIDE_BY_ZERO under ANSI mode.
    pn_safe = F.when(pn == 0.0, F.lit(1.0)).otherwise(pn)
    qn_safe = F.when(qn == 0.0, F.lit(1.0)).otherwise(qn)
    p = F.col("cnt").cast("double") / pn_safe
    q = F.col("base_cnt").cast("double") / qn_safe
    gap = F.sum(p).over(w_ord) - F.sum(q).over(w_ord)
    pc = F.greatest(p, F.lit(_PSI_EPS))
    qc = F.greatest(q, F.lit(_PSI_EPS))
    term = (pc - qc) * F.log(pc / qc)
    cols = [
        F.col("source"),
        (pn == 0.0) | (qn == 0.0),
        F.abs(gap),
        term,
    ]
    names = ["source", "_degen", "_abs_gap", "_term"]
    if include_w1:
        # CDF gaps hold over [b_i, b_{i+1}) — weight by the index span
        # to the next PRESENT bucket (the last gap is 0 by construction
        # so its span never contributes; 1.0 keeps it inert).
        nxt = F.lead("bucket").over(
            Window.partitionBy("source").orderBy("bucket")
        )
        span = F.coalesce(
            (nxt - F.col("bucket")).cast("double"), F.lit(1.0)
        )
        cols.append(F.abs(gap) * span)
        names.append("_wterm")
    rows = joined.select([c.alias(n) for c, n in zip(cols, names)])
    aggs = [
        F.when(F.max(F.col("_degen").cast("int")) == 1, F.lit(1.0))
        .otherwise(F.least(F.lit(1.0), F.max("_abs_gap")))
        .alias("ks"),
        F.when(
            F.max(F.col("_degen").cast("int")) == 1,
            F.lit(float("inf")),
        )
        .otherwise(F.sum("_term"))
        .alias("psi"),
    ]
    if include_w1:
        aggs.append(
            F.when(
                F.max(F.col("_degen").cast("int")) == 1,
                F.lit(float("inf")),
            )
            .otherwise(F.sum("_wterm"))
            .alias("w1")
        )
    return rows.groupBy("source").agg(*aggs)


def leave_one_out_baseline(
    hist: DataFrame, pooled: DataFrame | None = None
) -> DataFrame:
    """Per-source leave-one-out baseline: the pooled corpus histogram
    MINUS each source's own counts — "the rest of the corpus".

    A self-inclusive pool lets a DOMINANT source mask its own drift: at
    90% of rows its histogram IS ~90% of the pool, so KS/PSI vs the
    pool stay near zero however far it moves. Histograms are additive,
    so the leave-one-out form costs one metadata-sized subtraction —
    no extra pass over the fact.

    ``pooled`` — an externally reconstructed FULL-corpus pool (the
    resume path pools stored states for skipped partitions plus the
    current pending histograms); defaults to pooling ``hist`` itself.
    Output: (source, bucket, cnt) per-source baseline, dense over the
    pool's buckets. A single-source corpus yields an all-zero baseline
    for that source — callers should exclude zero-rest sources from
    drift scoring (there is nothing to diverge from) rather than let
    the degenerate qn=0 guard flag them.
    """
    if pooled is None:
        pooled = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    pool = pooled.select(F.col("bucket").alias("_pb"), F.col("cnt").alias("_pc"))
    dense = hist.select("source").distinct().crossJoin(F.broadcast(pool))
    own = hist.select(
        F.col("source").alias("_os"),
        F.col("bucket").alias("_ob"),
        F.col("cnt").alias("_oc"),
    )
    return dense.join(
        F.broadcast(own),
        F.col("source").eqNullSafe(F.col("_os")) & (F.col("_pb") == F.col("_ob")),
        "left",
    ).select(
        "source",
        F.col("_pb").alias("bucket"),
        # clamp: own ≤ pool holds whenever the pool covers the same
        # population as hist; the clamp keeps a stale external pool
        # from producing negative counts
        F.greatest(
            F.lit(0).cast("long"),
            F.col("_pc").cast("long") - F.coalesce(F.col("_oc"), F.lit(0)).cast("long"),
        ).alias("cnt"),
    )


def loo_drift_metrics(
    hist: DataFrame, pooled: DataFrame | None = None
) -> DataFrame:
    """Fused leave-one-out drift scoring: per-source (ks, psi) of each
    source's histogram vs "the rest of the corpus", with zero-rest
    sources excluded — equivalent to the chain

        scored = sources of leave_one_out_baseline(hist, pooled) with rest > 0
        drift_metrics(hist ⋉ scored, leave_one_out_baseline(...) ⋉ scored)

    but in ONE plan (a per-source dense frame + the shared windowed
    kernel + a rest-mass filter on the aggregate). The unfused chain
    cost ~6 join/aggregate stages of pure scheduling overhead per suite
    run over a ≤|sources|×|buckets|-row histogram — ~1.0-1.5 s of the
    2M-row suite wall (equivalence pinned in tests/test_drift.py).

    ``pooled`` — an externally reconstructed FULL-corpus pool (resume);
    defaults to pooling ``hist`` itself. Dense bucket domain per source
    is pool-buckets ∪ own-buckets (full outer), matching the unfused
    alignment even when a stale external pool lacks an own bucket.
    """
    if pooled is None:
        pooled = hist.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    pool = pooled.select(F.col("bucket").alias("_pb"), F.col("cnt").alias("_pc"))
    dense = hist.select("source").distinct().crossJoin(F.broadcast(pool))
    own = hist.select(
        F.col("source").alias("_os"),
        F.col("bucket").alias("_ob"),
        F.col("cnt").alias("_oc"),
    )
    joined = dense.join(
        own,
        F.col("source").eqNullSafe(F.col("_os")) & (F.col("_pb") == F.col("_ob")),
        "full_outer",
    ).select(
        F.coalesce(F.col("source"), F.col("_os")).alias("source"),
        F.coalesce(F.col("_pb"), F.col("_ob")).alias("bucket"),
        F.coalesce(F.col("_oc"), F.lit(0)).cast("long").alias("cnt"),
        # rest = pool − own, clamped (stale external pools); an
        # own-only bucket reads pool 0 → rest 0, as in the unfused form
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col("_pc"), F.lit(0)).cast("long")
            - F.coalesce(F.col("_oc"), F.lit(0)).cast("long"),
        ).alias("base_cnt"),
    )
    m = _metrics_from_aligned(joined)
    # zero-rest sources (single-source corpus) are excluded from
    # scoring, not flagged — the unfused chain's `scored` semi-join;
    # the degenerate marker fires exactly when a sum is zero, and
    # own-mass zero is impossible for a source present in hist, so
    # filtering the degenerate rows removes precisely the rest==0 set
    return m.where(F.col("psi") != float("inf"))


def loo_drift_rows(
    hist_rows: list, pooled_rows: list | None = None
) -> list[tuple]:
    """Driver-side twin of :func:`loo_drift_metrics` over COLLECTED
    histogram rows — ``[(source, ks, psi), ...]``.

    The histogram is metadata-sized (≤ |sources|×|buckets|), so the
    suite computes LOO drift here and ships the result back as a
    LocalRelation: the SQL chain, already fused, still cost ~1.0 s of
    stage scheduling per run on a ~1k-row frame. Float parity: the
    arithmetic replays the SQL kernel's exact operation sequence —
    bucket-ordered running sums, the same eps clamps, plain sequential
    accumulation (never ``math.fsum``/numpy pairwise) — pinned against
    :func:`loo_drift_metrics` in tests/test_drift.py.

    ``hist_rows``: rows with (source, bucket, cnt); ``pooled_rows``:
    optional (bucket, cnt) external pool.
    """
    import math

    own: dict = {}
    for r in hist_rows:
        own.setdefault(r["source"], {})[r["bucket"]] = r["cnt"]
    if pooled_rows is None:
        pool: dict = {}
        for r in hist_rows:
            pool[r["bucket"]] = pool.get(r["bucket"], 0) + r["cnt"]
    else:
        pool = {r["bucket"]: r["cnt"] for r in pooled_rows}
    out: list[tuple] = []
    for src, o in own.items():
        buckets = sorted(set(pool) | set(o))
        cnts = [o.get(b, 0) for b in buckets]
        rests = [max(0, pool.get(b, 0) - o.get(b, 0)) for b in buckets]
        pn = 0.0
        for c in cnts:
            pn += float(c)
        qn = 0.0
        for c in rests:
            qn += float(c)
        if qn == 0.0 or pn == 0.0:
            continue  # zero-rest sources are excluded, not flagged
        cum_p = cum_q = 0.0
        max_gap = 0.0
        psi = 0.0
        for c, rc in zip(cnts, rests):
            p = float(c) / pn
            q = float(rc) / qn
            cum_p += p
            cum_q += q
            gap = abs(cum_p - cum_q)
            if gap > max_gap:
                max_gap = gap
            pc = p if p > _PSI_EPS else _PSI_EPS
            qc = q if q > _PSI_EPS else _PSI_EPS
            psi += (pc - qc) * math.log(pc / qc)
        out.append((src, min(1.0, max_gap), psi))
    return out


def drift_verdicts(metrics: DataFrame, suite: CheckSuite) -> DataFrame:
    """Threshold the drift metrics into per-partition pass/fail."""
    return metrics.withColumn(
        "drift_verdict",
        F.when(
            (F.col("ks") <= suite.max_ks) & (F.col("psi") <= suite.max_psi), F.lit("pass")
        ).otherwise(F.lit("fail")),
    )


def _kolmogorov_sf(lam: np.ndarray) -> np.ndarray:
    """Survival function of the Kolmogorov distribution,
    Q(λ) = 2 Σ_{k≥1} (−1)^{k−1} exp(−2k²λ²) — the asymptotic two-sided
    KS p-value (public formula; e.g. Numerical Recipes §14.3.3 /
    Marsaglia-Tsang-Wang 2003). This series converges fast only for
    λ ≳ 0.2 (the k-th term is exp(−2k²λ²)); BELOW that the truncated
    alternating sum is garbage — but there the dual Jacobi-theta form
    1 − (√(2π)/λ)·Σ exp(−(2k−1)²π²/(8λ²)) puts Q within 1e-12 of 1
    (at λ=0.2 the first exponent is already −30.8), so λ < 0.2 returns
    exactly 1. Above 0.2 the series is converged by k ≈ 10; 100 terms
    is headroom.
    """
    lam = np.asarray(lam, dtype=np.float64)
    k = np.arange(1, 101, dtype=np.float64)[:, None]
    q = (2.0 * (-1.0) ** (k - 1) * np.exp(-2.0 * (k * lam[None, :]) ** 2)).sum(axis=0)
    out = np.clip(q, 0.0, 1.0)
    return np.where(lam < 0.2, 1.0, out)


def ks_pvalue_arrays(
    ks: np.ndarray, n: np.ndarray, m: np.ndarray
) -> np.ndarray:
    """Vectorized asymptotic two-sample KS p-value with the Stephens
    small-sample correction: λ = (√nₑ + 0.12 + 0.11/√nₑ)·D with
    nₑ = n·m/(n+m) (Stephens 1970 — the form scipy's 'asymp' mode and
    R's ks.test use). Empty sides (n or m = 0) are maximal drift by
    the engine's convention (drift_metrics emits ks=1 there): p = 0.
    """
    ks = np.asarray(ks, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    tot = n + m
    ne = np.divide(n * m, np.where(tot == 0, 1.0, tot))
    with np.errstate(divide="ignore", invalid="ignore"):
        rt = np.sqrt(ne)
        lam = (rt + 0.12 + np.where(rt == 0, 0.0, 0.11 / np.where(rt == 0, 1.0, rt))) * ks
    return np.where(ne == 0, 0.0, _kolmogorov_sf(lam))


def kolmogorov_critical(alpha: float) -> float:
    """λ_α with Q(λ_α) = α — inverse Kolmogorov survival via bisection
    (Q is strictly decreasing past its clamp region). λ(0.05) ≈ 1.358.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    lo, hi = 0.2, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if float(_kolmogorov_sf(np.array([mid]))[0]) > alpha:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def drift_pvalues(
    hist: DataFrame, baseline_hist: DataFrame, include_w1: bool = False
) -> DataFrame:
    """:func:`drift_metrics` plus per-source sample sizes and the KS
    p-value — the statistical form FDR control needs.

    Output: (source, ks, psi[, w1], n, base_n, p_value,
    min_detectable_ks). Sizes come from the histograms themselves (one
    |sources|×|buckets| aggregate each — sketch-sized); the p-value
    runs in one Arrow-batched pandas UDF over the |sources|-row
    metrics frame. With a GLOBAL baseline every source shares the
    pooled base_n.

    ``min_detectable_ks`` is the POWER disclosure: the smallest KS
    statistic this source's sample sizes could flag at α=0.05
    (λ_.05 / the Stephens factor). A "pass" from a 50-row source with
    min_detectable_ks ≈ 0.19 is an underpowered test, not evidence of
    stability — the column makes that readable off the verdict row.
    """
    metrics = drift_metrics(hist, baseline_hist, include_w1=include_w1)
    sizes = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    if "source" in baseline_hist.columns:
        base_sizes = baseline_hist.groupBy("source").agg(F.sum("cnt").alias("base_n"))
        sized = metrics.join(F.broadcast(sizes), "source", "left").join(
            F.broadcast(base_sizes), "source", "left"
        )
    else:
        base_tot = baseline_hist.agg(F.sum("cnt").alias("base_n"))
        sized = metrics.join(F.broadcast(sizes), "source", "left").crossJoin(
            F.broadcast(base_tot)
        )
    sized = sized.fillna({"n": 0, "base_n": 0})

    @F.pandas_udf("double")
    def _p(ks: pd.Series, n: pd.Series, m: pd.Series) -> pd.Series:
        return pd.Series(
            ks_pvalue_arrays(
                ks.to_numpy(np.float64),
                n.to_numpy(np.float64),
                m.to_numpy(np.float64),
            )
        )

    crit = kolmogorov_critical(0.05)
    ne = F.col("n").cast("double") * F.col("base_n") / (F.col("n") + F.col("base_n"))
    stephens = F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)
    return sized.withColumn(
        "p_value", _p(F.col("ks"), F.col("n"), F.col("base_n"))
    ).withColumn(
        "min_detectable_ks",
        F.when(
            (F.col("n") > 0) & (F.col("base_n") > 0),
            F.least(F.lit(crit) / stephens, F.lit(1.0)),
        ),
    )


def bh_reject(
    df: DataFrame, p_col: str = "p_value", alpha: float = 0.05
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control across the frame's rows.

    Adds (p_rank, n_tests, reject): sort p ascending, find the largest
    rank k with p_(k) ≤ (k/m)·α, reject ranks 1..k — the step-up shape
    where a row may be rejected even though its OWN threshold fails,
    because a later rank passes (pinned in tests). Ties and
    nondeterminism: rank is row_number over (p, source) so equal
    p-values order deterministically, and since rejection is "rank ≤
    k" with k defined by the largest passing rank, every member of a
    tie group shares one fate regardless of intra-tie order.

    The windows are GLOBAL (single-partition exchange) — correct here
    because the input is the |sources|-row metrics frame, metadata-
    sized by construction; this is not a row-level operator. At 10^5
    sources that is one task over 10^5 tiny rows.
    """
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col(p_col).asc_nulls_last(), F.col("source"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = df.withColumn("p_rank", F.row_number().over(w_rank)).withColumn(
        "n_tests", F.count(F.col(p_col)).over(w_all)
    )
    ok = F.col(p_col) <= F.col("p_rank") / F.col("n_tests") * F.lit(alpha)
    ranked = ranked.withColumn(
        "_k", F.max(F.when(ok, F.col("p_rank"))).over(w_all)
    )
    return ranked.withColumn(
        "reject", F.col("p_rank") <= F.coalesce(F.col("_k"), F.lit(0))
    ).drop("_k")


def _gammainc_q(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Regularized upper incomplete gamma Q(a, x) — the χ² survival
    function is Q(k/2, x/2). Standard public algorithm (Numerical
    Recipes §6.2): lower series for x < a+1, Lentz continued fraction
    otherwise. Near x ≈ a both need ~O(√a) iterations (series terms
    decay like exp(−n²/2a)), so a FIXED small count silently diverges
    at large dof — the iteration budget scales with max(a) and both
    loops break early on convergence; the |sources|-row input keeps
    even the 10^5-dof budget (~3k vectorized steps) trivial.
    """
    import math

    a = np.asarray(a, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    lg = np.frompyfunc(math.lgamma, 1, 1)(np.where(a > 0, a, 1.0)).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_pref = a * np.log(np.where(x > 0, x, 1.0)) - x - lg
    use_series = x < a + 1.0
    amax = float(np.max(a)) if a.size else 1.0
    budget = 300 + int(12.0 * math.sqrt(max(amax, 1.0)))

    # lower series: P(a,x) = e^{-x} x^a / Γ(a) · Σ x^n / (a(a+1)…(a+n))
    # lanes destined for the continued fraction (x ≥ a+1) still flow
    # through this vectorized loop and can overflow summ to inf there
    # (0·inf = nan in the final multiply) — harmless, masked out by
    # ``use_series`` below, so silence the masked-lane warnings only.
    ap = a.copy()
    summ = np.where(a > 0, 1.0 / np.where(a > 0, a, 1.0), 0.0)
    delta = summ.copy()
    with np.errstate(over="ignore", invalid="ignore"):
        for _ in range(budget):
            ap = ap + 1.0
            delta = delta * x / ap
            summ = summ + delta
            if np.all(np.abs(delta) <= np.abs(summ) * 1e-16):
                break
        p_series = np.exp(log_pref) * summ

    # continued fraction: Q(a,x) = e^{-x} x^a / Γ(a) · CF
    tiny = 1e-300
    b = x + 1.0 - a
    c = np.full_like(x, 1.0 / tiny)
    d = 1.0 / np.where(b == 0, tiny, b)
    h = d.copy()
    for i in range(1, budget + 1):
        an = -i * (i - a)
        b = b + 2.0
        d = an * d + b
        d = np.where(np.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        fac = d * c
        h = h * fac
        if np.all(np.abs(fac - 1.0) < 1e-16):
            break
    q_cf = np.exp(log_pref) * h

    q = np.where(use_series, 1.0 - p_series, q_cf)
    q = np.clip(q, 0.0, 1.0)
    # edges: x ≤ 0 → Q = 1; a ≤ 0 with x > 0 → Q = 0 (dof guard)
    q = np.where(x <= 0, 1.0, q)
    return np.where((a <= 0) & (x > 0), 0.0, q)


def chi2_sf_arrays(chi2: np.ndarray, dof: np.ndarray) -> np.ndarray:
    """χ² survival function P(X ≥ chi2 | dof) = Q(dof/2, chi2/2)."""
    chi2 = np.asarray(chi2, dtype=np.float64)
    dof = np.asarray(dof, dtype=np.float64)
    return _gammainc_q(dof / 2.0, chi2 / 2.0)


def source_mix_shift(
    df: DataFrame,
    baseline: DataFrame,
    key: str = "source",
    alpha: float = 0.05,
) -> DataFrame:
    """Categorical mix-shift test: did the MIXTURE of partition keys
    change vs the baseline? One-sample Pearson χ² of the observed
    per-key counts against expected = baseline proportions × n.

    The categorical complement of the per-source KS/PSI gates: those
    ask "did source X's n_tok distribution move"; this asks "did the
    corpus's source composition move" (an upstream feed dying or
    doubling shifts the mix long before any single source's payload
    drifts). ``baseline`` is raw rows or pre-aggregated (key, cnt).
    A key ABSENT from the baseline makes the test degenerate
    (expected = 0): p_value = 0, novel sources are mix shift by
    definition — the referential check names them.

    Output: one row (chi2, dof, p_value, n, base_n, mix_verdict).
    Counts aggregate JVM-side (map-side partials); the χ² math runs
    over the |keys|-row frame in one grouped pandas pass. NULL keys
    count as a category of their own.
    """
    obs = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")) if "cnt" not in df.columns else df
    base = (
        baseline
        if "cnt" in baseline.columns
        else baseline.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    )
    joined = (
        obs.withColumnRenamed("cnt", "obs_cnt")
        .join(
            base.withColumnRenamed("cnt", "base_cnt").withColumnRenamed(key, "_bk"),
            F.col(key).eqNullSafe(F.col("_bk")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("obs_cnt"), F.lit(0)).alias("obs_cnt"),
            F.coalesce(F.col("base_cnt"), F.lit(0)).alias("base_cnt"),
        )
        .withColumn("_g", F.lit(1))
    )

    def _chi2(pdf: pd.DataFrame) -> pd.DataFrame:
        o = pdf["obs_cnt"].to_numpy(np.float64)
        b = pdf["base_cnt"].to_numpy(np.float64)
        n, bn = o.sum(), b.sum()
        dof = max(len(o) - 1, 1)
        if n == 0 or bn == 0:
            chi2, p = float("inf"), 0.0
        elif np.any((b == 0) & (o > 0)):
            chi2, p = float("inf"), 0.0
        else:
            keep = b > 0
            exp = b[keep] / bn * n
            chi2 = float(np.sum((o[keep] - exp) ** 2 / exp))
            p = float(chi2_sf_arrays(np.array([chi2]), np.array([dof]))[0])
        return pd.DataFrame(
            {
                "chi2": [chi2],
                "dof": [dof],
                "p_value": [p],
                "n": [int(n)],
                "base_n": [int(bn)],
                "mix_verdict": ["fail" if p <= alpha else "pass"],
            }
        )

    return joined.groupBy("_g").applyInPandas(
        _chi2,
        schema="chi2 double, dof int, p_value double, n bigint, base_n bigint, "
        "mix_verdict string",
    )


def drift_fdr(
    hist: DataFrame,
    baseline_hist: DataFrame,
    alpha: float = 0.05,
    include_w1: bool = False,
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """FDR-controlled multi-source drift verdicts.

    At 10^5 sources, per-source α=0.05 KS tests produce ~5,000 false
    alarms on a perfectly stable corpus — the fixed-threshold
    ``drift_verdicts`` is a magnitude gate, not a significance gate.
    This surface converts each source's KS statistic to an asymptotic
    p-value (sample sizes from the histograms) and applies
    Benjamini–Hochberg across sources, so the expected fraction of
    false drift flags among the flagged is ≤ α regardless of how many
    sources the corpus has. drift_verdict: 'fail' iff rejected.

    ``restrict_to`` — a (source) frame limiting the TEST FAMILY. With
    a per-source baseline, the full-outer alignment emits
    baseline-only sources (vanished or resume-skipped) at ks=1 → p=0;
    those must be excluded BEFORE Benjamini–Hochberg, not after — p=0
    rows occupy the lowest ranks, inflate n_tests, and loosen every
    real source's step-up threshold (breaking the FDR guarantee for
    the family the caller actually means to test).
    """
    pvals = drift_pvalues(hist, baseline_hist, include_w1=include_w1)
    if restrict_to is not None:
        pvals = pvals.join(restrict_to.select("source"), "source", "semi")
    out = bh_reject(pvals, alpha=alpha)
    return out.withColumn(
        "drift_verdict", F.when(F.col("reject"), F.lit("fail")).otherwise(F.lit("pass"))
    )


def _contrib_pdf(pdf: pd.DataFrame, top_k: int | None) -> pd.DataFrame:
    src = pdf["source"].iloc[0]
    pdf = pdf.sort_values("bucket")
    p = pdf["cnt"].to_numpy(dtype=np.float64)
    q = pdf["base_cnt"].to_numpy(dtype=np.float64)
    pn, qn = p.sum(), q.sum()
    p = p / pn if pn > 0 else p
    q = q / qn if qn > 0 else q
    if pn == 0 or qn == 0:
        # one side has NO mass (new source absent from a per-source
        # baseline, or a vanished source): _drift_metrics_pdf reports
        # psi = inf, and the decomposition must mirror it — every
        # bucket present on the non-empty side carries infinite
        # evidence, so the sum ≡ psi invariant holds at inf too
        # (finite eps-clamped terms here would silently break it
        # exactly where the FDR pass most often reports buckets)
        present = p > 0 if qn == 0 else q > 0
        term = np.where(present, np.inf, 0.0)
    else:
        pc, qc = np.clip(p, _PSI_EPS, None), np.clip(q, _PSI_EPS, None)
        term = (pc - qc) * np.log(pc / qc)  # ≥ 0 bucket-wise by construction
    out = pd.DataFrame(
        {
            "source": src,
            "bucket": pdf["bucket"].to_numpy(),
            "share_now": p,
            "share_base": q,
            "psi_term": term,
            "direction": np.where(p >= q, "gained", "lost"),
        }
    )
    # secondary key: largest moved share first — inf terms (one-sided
    # mass) tie on psi_term and should surface the heaviest buckets
    out["_share"] = np.maximum(p, q)
    out = out.sort_values(
        ["psi_term", "_share", "bucket"], ascending=[False, False, True]
    ).drop(columns=["_share"])
    if top_k is not None:
        out = out.head(top_k)
    return out


def drift_contributions(
    hist: DataFrame,
    baseline_hist: DataFrame,
    top_k: int | None = 5,
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """WHERE a source's drift lives: per-bucket PSI decomposition.

    A KS/PSI verdict says "src_07 moved"; the triage question is
    which part of the distribution carried the movement. PSI
    decomposes exactly — Σ_b (p_b − q_b)·ln(p_b/q_b) with every term
    ≥ 0 — so ranking buckets by their term names the responsible
    region losslessly (``top_k=None`` returns the full decomposition,
    whose sum equals ``drift_metrics``'s psi under the same epsilon
    clamps; pinned in tests). ``direction`` says whether the bucket
    GAINED or LOST share vs the baseline.

    Same histogram-sized inputs and ``applyInPandas`` shape as
    ``drift_metrics`` — Python touches |sources|×|buckets| rows, never
    the corpus. ``restrict_to`` limits to a (source) frame (e.g. the
    FDR pass's rejected sources).
    """
    joined = _align_hist(hist, baseline_hist)
    if restrict_to is not None:
        joined = joined.join(restrict_to.select("source"), "source", "semi")
    return joined.groupBy("source").applyInPandas(
        lambda pdf: _contrib_pdf(pdf, top_k),
        schema=(
            "source string, bucket int, share_now double, "
            "share_base double, psi_term double, direction string"
        ),
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
    # tokens with engine-specific placement (Java split vs others).
    # The residual case trim can't remove: splitting an EMPTY string
    # (NULL/''/whitespace-only text) yields [''] in Java semantics, so
    # every such row would count a phantom '' word — a source with
    # many NULL texts would have its PSI driven by an artificial token
    # instead of its vocabulary. Filter it out of the distribution.
    words = F.explode(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), TXT_WS + "+")
    ).alias("w")
    cnt = (
        df.select(F.col(key), words)
        .where(F.col("w") != "")
        .groupBy(key, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
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
