"""Semantic deduplication over the embedding payload — the SemDeDup
recipe (Abbas et al. 2023, public: k-means-cluster the embeddings,
then inside each cluster drop all but one of any group of documents
whose pairwise cosine exceeds a threshold). Complements the lexical
dedup family (exact sha / MinHash / SimHash / n-gram Jaccard,
operators/dedup.py): those catch REWORDED-identical text only when
surface n-grams survive; semantic dedup catches paraphrases and
template re-renderings that share no shingles but embed near each
other.

Reference analogue: the reference's similarity pass is the same
primitive (pairwise cosine over stored embeddings, processor.py:159-
178) used for a max-score backfill; here the primitive drives a
keep/drop verdict per document.

Spark shape — no all-pairs join anywhere:

1. centroids: driver-side spherical k-means on a BOUNDED sample
   (reuses :func:`similarity.train_centroids`, collect ≤ sample_size
   rows — corpus-size-independent).
2. assignment: one Arrow-batched matmul per batch
   (:func:`similarity._cell_assign_udf` with n=1) — each vector gets
   exactly one cell.
3. within-cell pruning: ``groupBy(cell).applyInPandas`` — ONE shuffle
   keyed on cell, then per-cell numpy: sort members by (cosine to
   centroid DESC, id) and greedily keep a member iff its max cosine to
   every already-kept member is < tau. The paper keeps the member
   FURTHEST from the centroid; we keep the CLOSEST-first greedy
   (deterministic, and the kept set is a maximal tau-independent set
   either way); ``keep_policy='far'`` flips to the paper's order.

Scale: per-cell cost is O(c² · d) flops in one numpy matmul where c is
the cell population. n_cells is the knob that bounds c — SemDeDup at
web scale runs with ~100k clusters so cells stay ~1k rows; the greedy
loop is O(c · kept) vector ops on an already-materialized Gram matrix.
A pathologically hot cell (skewed embedding mass) degrades to one big
pandas group; ``max_cell`` caps it by sub-salting the cell id on a
hash of the doc id (dedup stays correct WITHIN each sub-cell; across
sub-cells duplicates may survive — the documented recall trade of
capping, off by default). NULL / wrong-dim embeddings are kept
verbatim (nothing to compare) with cell -1.

Determinism: assignment is a pure function of (vector, centroids);
centroids are seeded; the greedy order is (centroid_sim DESC, id) —
no partitioning dependence anywhere (pinned in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .similarity import train_centroids, _cell_assign_udf

__all__ = ["semdedup", "semdedup_prune"]


def semdedup(
    df: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_cells: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 10,
    sample_size: int = 4096,
    keep_policy: str = "near",
    max_cell: int | None = None,
    centroids: np.ndarray | None = None,
    seed_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdicts: returns
    ``(id_col, cell, centroid_sim, kept)`` with exactly one row per
    input row. ``kept=false`` rows have a kept row in the same cell
    with cosine ≥ tau (the survivor that shadows them).

    ``keep_policy``: 'near' keeps centroid-closest-first (default),
    'far' keeps centroid-furthest-first (the SemDeDup paper's order —
    it argues boundary examples are the informative ones).

    ``centroids``: pre-trained unit-norm (n_cells × dim) array —
    skips the driver-side k-means (the incremental path: a batch must
    be assigned with the SAME centroids the corpus was).

    ``seed_df``: rows (same id/vec cols) that are ALREADY KEPT — they
    pre-seed each cell's kept set and are never re-judged or returned;
    a ``df`` row shadowed by a seed at cosine ≥ tau drops. This is
    incremental SemDeDup: seed = the stored corpus survivors, df = the
    new batch; corpus always wins, batch docs also dedup among
    themselves, and the stored corpus is never re-clustered.
    """
    if keep_policy not in ("near", "far"):
        raise ValueError("keep_policy must be 'near' or 'far'")
    id_field = df.schema[id_col]

    cents = centroids if centroids is not None else train_centroids(
        # wrong-dim vectors would make the driver sample ragged; they
        # are kept verbatim downstream (cell -1), just never trained on
        df.where(F.size(F.col(vec_col)) == dim),
        dim, n_cells, n_iter=n_iter, sample_size=sample_size,
        id_col=id_col, vec_col=vec_col,
    )
    if cents.size == 0:
        # no usable vectors at all: everything kept, cell -1
        return df.select(
            F.col(id_col),
            F.lit(-1).alias("cell"),
            F.lit(None).cast("double").alias("centroid_sim"),
            F.lit(True).alias("kept"),
        )
    assign = _cell_assign_udf(cents, 1)
    cell = F.get(assign(F.col(vec_col)), 0)  # NULL on empty list (ANSI-safe)
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        F.coalesce(cell, F.lit(-1)).alias("cell"),
        F.lit(0).alias("__sub"),
        F.lit(False).alias("__is_seed"),
    )
    if seed_df is not None:
        seeds = seed_df.select(
            F.col(id_col),
            F.col(vec_col).alias("__vec"),
            F.coalesce(
                F.get(assign(F.col(vec_col)), 0), F.lit(-1)
            ).alias("cell"),
            F.lit(0).alias("__sub"),
            F.lit(True).alias("__is_seed"),
        # unembeddable seeds can't shadow anything — drop them rather
        # than pollute the cell -1 pass-through group
        ).where(F.col("cell") >= 0)
        base = base.unionByName(seeds)
    if max_cell is not None:
        # Sub-salt hot cells: one n_cells-row count aggregate, broadcast
        # back, then hash-split any cell over the cap into
        # ceil(count/max_cell) sub-cells. Duplicates ACROSS sub-cells of
        # the same cell may survive — the documented recall trade of
        # capping the quadratic; within each sub-cell semantics hold.
        counts = base.groupBy("cell").agg(F.count(F.lit(1)).alias("__cnt"))
        base = (
            base.join(F.broadcast(counts), "cell")
            .withColumn(
                "__nsub",
                F.greatest(
                    F.lit(1), F.ceil(F.col("__cnt") / F.lit(int(max_cell)))
                ).cast("int"),
            )
            .withColumn(
                "__sub",
                F.when(F.col("cell") < 0, F.lit(0)).otherwise(
                    F.pmod(
                        F.xxhash64(F.col(id_col).cast("string")), F.col("__nsub")
                    ).cast("int")
                ),
            )
            .drop("__cnt", "__nsub")
        )

    cents_unit = cents  # already unit-norm
    out_schema = T.StructType([
        id_field,
        T.StructField("cell", T.IntegerType()),
        T.StructField("centroid_sim", T.DoubleType()),
        T.StructField("kept", T.BooleanType()),
    ])
    tau_f = float(tau)
    near_first = keep_policy == "near"

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        cell_id = int(pdf["cell"].iloc[0])
        is_seed = pdf["__is_seed"].to_numpy()
        ids = pdf[id_col]
        m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        csim = m @ cents_unit[cell_id]
        # deterministic greedy order: centroid_sim (desc for 'near',
        # asc for 'far'), id as tiebreak; seeds are pre-kept and
        # never re-judged (the incremental contract: corpus wins)
        key = -csim if near_first else csim
        order = np.lexsort((ids.to_numpy(), key))
        gram = m @ m.T
        kept_mask = np.zeros(len(pdf), dtype=bool)
        kept_idx: list[int] = list(np.flatnonzero(is_seed))
        kept_mask[is_seed] = True
        for i in order:
            if is_seed[i]:
                continue
            if not kept_idx or gram[i, kept_idx].max() < tau_f:
                kept_mask[i] = True
                kept_idx.append(i)
        out = pd.DataFrame({
            id_col: ids,
            "cell": np.full(len(pdf), cell_id, dtype=np.int32),
            "centroid_sim": csim,
            "kept": kept_mask,
        })
        return out[~is_seed]

    # cell -1 (NULL/wrong-dim embeddings) never enters the pandas
    # stage: those rows are kept verbatim by contract, and funneling
    # them through applyInPandas would materialize EVERY embedding-less
    # row in one Python task (max_cell exempts cell<0 from sub-salting,
    # so nothing would ever split it) — a single-task OOM at scale for
    # a group that needs no computation at all. Pure projection union.
    passthrough = base.where(F.col("cell") < 0).select(
        F.col(id_col),
        F.col("cell").cast("int").alias("cell"),
        F.lit(None).cast("double").alias("centroid_sim"),
        F.lit(True).alias("kept"),
    )
    pruned = (
        base.where(F.col("cell") >= 0)
        .groupBy("cell", "__sub")
        .applyInPandas(_prune, schema=out_schema)
    )
    return pruned.unionByName(passthrough)


def semdedup_prune(
    df: DataFrame,
    dim: int,
    tau: float = 0.95,
    n_cells: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Convenience: the input restricted to semantically-unique rows —
    a semi-join on the id against the kept verdicts. The verdict table
    is corpus-sized, so this is a plain shuffle equi-join (no
    broadcast); AQE handles skew."""
    verdicts = semdedup(
        df, dim, tau=tau, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        **kwargs,
    )
    kept = verdicts.where(F.col("kept")).select(id_col)
    return df.join(kept, id_col, "semi")
