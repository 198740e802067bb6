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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import (
    _spread,
    merge_positional_hits,
    positional_gram_hashes,
    remove_spans,
    shingles,
)


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
    training doc.

    The degenerate empty shingle ('' — an empty/whitespace-only text's
    whole-text fallback) is excluded from both sides, and the
    effective threshold is ``least(min_overlap, n_eval)``: an eval doc
    shorter than k words yields exactly ONE whole-text shingle, so a
    fixed ``min_overlap ≥ 2`` would make short-answer benchmarks
    structurally invisible to the scan even when a training doc
    contains them verbatim. With '' excluded, the single-shingle match
    is a real whole-text hit, not the empty-text artifact the fixed
    floor existed to suppress.

    Exact-SQL-oracle-comparable; the driver-gated ``contamination``
    query hashes the integer columns (overlap_frac stays out of the
    gate — a/b ratios can land on .xxxxxx5 ties where Spark HALF_UP
    and DuckDB binary rounding diverge).
    """
    nonempty = lambda col: F.filter(col, lambda s: s != "")
    tr_sh = _spread(train, id_col).select(
        F.col(id_col),
        F.explode(nonempty(shingles(text_col, k))).alias("shingle"),
    )
    ev_posts = eval_df.select(
        F.col(id_col).alias("eval_id"),
        nonempty(shingles(text_col, k)).alias("_sh"),
    ).select(
        "eval_id", F.size("_sh").alias("n_eval"), F.explode("_sh").alias("shingle")
    )
    joined = tr_sh.join(F.broadcast(ev_posts), "shingle")
    return (
        joined.groupBy(id_col, "eval_id", "n_eval")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= F.least(F.lit(min_overlap), F.col("n_eval")))
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


def decontamination_spans(
    train: DataFrame,
    eval_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 13,
    pad: int = 0,
) -> DataFrame:
    """Token spans ``(doc_id, start, end)`` in TRAIN docs covered by
    k-token-grams that appear anywhere in the eval set — the REMOVAL
    complement of :func:`contamination_scan` (which only reports). This
    is the published decontamination recipe (Brown et al. 2020 app. C /
    Chowdhery et al. 2022 use 13-gram overlap): find every training
    window that reproduces an eval n-gram, expand by ``pad`` context
    tokens, and cut it with :func:`dedup.remove_spans` rather than
    dropping the whole document.

    Operates on the north-rule token payload directly (no
    detokenization): both sides fingerprint k-windows with the SAME
    positional-gram expression (``dedup.positional_gram_hashes``), so a
    train window matches iff its token ids equal an eval window's
    exactly. Eval docs shorter than ``k`` tokens contribute no grams —
    by design: a sub-k fragment match is not evidence of contamination
    at the chosen k.

    Scale (100 TB train, MB-scale eval): the eval gram dimension is
    distinct-collapsed and BROADCAST; the train side streams its
    positional grams through a broadcast hash join (never shuffled);
    hits collapse per doc in one window pass (``merge_positional_hits``).
    Output volume is bounded by true contamination, not corpus size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ev_grams = (
        eval_df.select(
            F.explode(positional_gram_hashes(tokens_col, k)).alias("gram")
        ).distinct()
    )
    tr = _spread(train, id_col).select(
        F.col(id_col),
        F.posexplode(positional_gram_hashes(tokens_col, k)).alias("pos", "gram"),
    )
    hits = tr.join(F.broadcast(ev_grams), "gram").select(id_col, "pos")
    return merge_positional_hits(hits, id_col, k, pad=pad)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 13,
    pad: int = 0,
) -> DataFrame:
    """TRAIN with every eval-matching token span cut out: the one-call
    decontamination pass. Adds ``n_removed_tok`` (0 for clean docs);
    callers typically follow with a min-length check so docs gutted by
    the cut fall out of the corpus (the cascade's min_n_tok rule)."""
    spans = decontamination_spans(
        train, eval_df, tokens_col=tokens_col, id_col=id_col, k=k, pad=pad
    )
    return remove_spans(train, spans, tokens_col=tokens_col, id_col=id_col)


def semantic_contamination(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    tau: float = 0.95,
    dim: int | None = None,
    max_eval_rows: int = 65536,
) -> DataFrame:
    """(doc_id, eval_id, cosine) for every training doc whose embedding
    is within cosine ``tau`` of SOME eval embedding — the semantic
    complement of the exact 13-gram scan: paraphrased or re-formatted
    benchmark leakage shares no k-gram but sits next to the eval doc in
    embedding space (the public train-test-similarity screens run
    alongside n-gram decontamination, e.g. the Phi/SemDeDup lineage).
    One row per train doc (its NEAREST eval doc), only rows ≥ tau.

    Scale design (100 TB train, 10^3-10^4 eval rows): the eval matrix
    is unit-normalized ONCE on the driver and closed over by an
    Arrow-batched pandas UDF — per train batch one (batch × dim) @
    (dim × n_eval) matmul, rowwise max + argmax. The train side is a
    pure projection + filter: ZERO shuffles, no join, output bounded by
    true contamination volume. Eval sets are benchmark-sized by
    definition; ``max_eval_rows`` guards the driver collect (the
    bounded-collect convention: similarity.train_centroids) — a larger
    "eval" side is a corpus-vs-corpus job, which is semdedup/IVF
    territory, and raises here with that routing.

    ``dim`` is required when it cannot be read off the first eval row
    (the embedding_near_dups lesson: never guess a default dimension).
    Train rows with NULL or wrong-``dim`` embeddings are skipped (no
    evidence — the cascade convention), pinned in tests.
    """
    from pyspark.sql import types as T

    ev = eval_emb.select(eval_id_col, vec_col).limit(max_eval_rows + 1).collect()
    if len(ev) > max_eval_rows:
        raise ValueError(
            f"eval side exceeds max_eval_rows={max_eval_rows}; "
            "corpus-vs-corpus similarity belongs to semdedup/ivf_topk, "
            "not the broadcast eval screen"
        )
    ev = [r for r in ev if r[vec_col] is not None]
    if not ev:
        raise ValueError("eval side has no non-NULL embeddings")
    if dim is None:
        dim = len(ev[0][vec_col])
        n_bad = sum(1 for r in ev if len(r[vec_col]) != dim)
        if n_bad:
            # inferred from ONE row — if others disagree, the guess is
            # ambiguous and silently filtering on it could empty the
            # screen (an anomalous FIRST row would drop every healthy
            # eval row and ship a contaminated corpus with a clean
            # report). Mixed dims need the caller's explicit choice.
            raise ValueError(
                f"eval embeddings have mixed dimensions: inferred "
                f"dim={dim} from the first row but {n_bad} of "
                f"{len(ev)} rows disagree — pass dim explicitly"
            )
    ev = [r for r in ev if len(r[vec_col]) == dim]
    eval_ids = [r[eval_id_col] for r in ev]
    E = np.asarray([r[vec_col] for r in ev], dtype=np.float64)
    norms = np.linalg.norm(E, axis=1)
    E = E / np.where(norms == 0, 1.0, norms)[:, None]
    ET = E.T.copy()  # (dim, n_eval), contiguous for the batch matmul

    out_t = T.StructType(
        [
            T.StructField("eval_idx", T.IntegerType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    @F.pandas_udf(out_t)
    def _nearest(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        idx = np.full(n, -1, dtype=np.int64)
        cos = np.full(n, np.nan)
        ok = np.array(
            [v is not None and len(v) == dim for v in vecs], dtype=bool
        )
        if ok.any():
            V = np.asarray([v for v, k in zip(vecs, ok) if k], dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            V = V / np.where(vn == 0, 1.0, vn)[:, None]
            S = V @ ET
            idx[ok] = S.argmax(axis=1)
            cos[ok] = S.max(axis=1)
        return pd.DataFrame({"eval_idx": idx, "cosine": cos})

    hit = (
        train_emb.select(F.col(id_col), _nearest(F.col(vec_col)).alias("nn"))
        .select(
            id_col,
            F.col("nn.eval_idx").alias("eval_idx"),
            F.col("nn.cosine").alias("cosine"),
        )
        # eval_idx >= 0 first: skipped rows carry cosine=NaN, and Spark
        # orders NaN ABOVE every real number, so `NaN >= tau` is TRUE —
        # without the idx guard every NULL/wrong-dim row would "hit"
        .where((F.col("eval_idx") >= 0) & (F.col("cosine") >= F.lit(float(tau))))
    )
    # idx -> eval_id via a broadcast dimension (an eval-sized literal
    # array expression would bloat the plan at max_eval_rows)
    spark = train_emb.sparkSession
    id_type = eval_emb.schema[eval_id_col].dataType.simpleString()
    from ..session import local_df

    id_dim = local_df(
        spark,
        [(i, e) for i, e in enumerate(eval_ids)],
        f"eval_idx int, {eval_id_col} {id_type}",
    )
    return hit.join(F.broadcast(id_dim), "eval_idx").select(
        id_col, eval_id_col, "cosine"
    )
