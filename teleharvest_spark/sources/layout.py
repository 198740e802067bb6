"""Multi-column Z-order layout — 2-D+ file/row-group pruning at write.

``write_partitioned``'s single-column ``sort_within`` makes parquet
min/max stats selective on ONE key (writer.py:18-20, "the poor man's
Z-order"). This module is the real thing: interleave the bits of
several columns' quantile-bucket ranks into one Morton code and lay
the table out in that order, so every file covers a small rectangle
of the multi-dimensional space and a selective predicate on ANY of
the z-columns skips most files via footer stats. This is the public
technique behind Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's
z-order rewrite strategy (Morton 1966; bucket ranks rather than raw
bits so skewed columns still split evenly — the same
range-partition-id idea Delta documents).

Why it matters at 100 TB: partition dirs prune one coarse key
(source); inside a partition, a scan filtering ``n_tok BETWEEN a AND
b AND quality > q`` reads everything unless the layout localizes both
columns at once. A z-ordered rewrite is one range exchange at write
time; every later scan pays less I/O.

Scale shape:

* quantile boundaries per column via ``approxQuantile`` (GK sketch,
  one pass over a narrow projection; driver receives 2^bits floats
  per column — bounded and corpus-size-independent);
* bucket ranks via ``pyspark.ml.feature.Bucketizer`` — JVM binary
  search over the split array, one vectorized pass, LINEAR plan size.
  (The tempting pure-expression alternative — ``bits`` chained
  ``when``/``element_at`` steps — embeds the accumulator THREE times
  per step: a 3^bits expression tree that stalled Catalyst for
  minutes on a 221 KB input. Measured, not theoretical; the
  transformer formulation is why this module hands back a DataFrame
  rather than a Column.)
* Morton interleave via ``shiftleft``/``bitwiseOR`` over the
  materialized rank COLUMNS (simple attribute refs — no re-inlined
  subtrees) — codegen, linear;
* layout via ``repartitionByRange`` on the Morton TILE (top
  ``log2(n_files)`` bits) + in-task sort — one shuffle, no global
  sort bottleneck. Tile-aligned splits, not equal-count splits: a
  count-based range split lands mid-tile and the straddling files
  span ~2× the rectangle on every straddled dim (measured), while
  rank-uniform z codes make whole tiles near-equal-count anyway, so
  aligning costs no balance. Range partitioning never splits one
  tile value across partitions (ties are atomic).

NULL/NaN semantics: both take bucket 0 (cluster low, still prunable
for non-NULL predicates). Constant columns degenerate to a single
bucket and stop contributing distinguishing bits — the interleave of
the remaining columns is unaffected.
"""

from __future__ import annotations

import glob as _glob
import math
import os

from pyspark.sql import Column, DataFrame, functions as F

ZVAL_COL = "_zval"


def _interleave(rank_cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i·m + j (LSB
    first), so all columns contribute equally at every granularity."""
    m = len(rank_cols)
    z: Column = F.lit(0).cast("long")
    for j, r in enumerate(rank_cols):
        r = r.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * m + j)
            )
    return z


def _validate(df: DataFrame, cols: list[str], bits: int) -> None:
    if not cols:
        raise ValueError("need at least one z-order column")
    if len(cols) != len(set(cols)):
        raise ValueError(f"duplicate z-order columns: {cols}")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(f"bits·cols must fit a long: got {bits}·{len(cols)}")
    # fail loudly BEFORE any job: an absent column would surface as an
    # analysis-plan dump, a non-numeric one as an opaque ANSI-cast
    # executor error inside approxQuantile
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    absent = [c for c in cols if c not in types]
    if absent:
        raise ValueError(f"z-order column(s) not in table: {absent}")
    numeric = {"byte", "short", "integer", "long", "float", "double", "decimal"}
    bad = [c for c in cols if types[c].split("(")[0] not in numeric]
    if bad:
        raise ValueError(
            f"z-order needs numeric columns (cast timestamps to "
            f"unix seconds first), got {bad} ({[types[c] for c in bad]})"
        )


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> tuple[DataFrame, dict[str, list[float]]]:
    """``df`` with the Morton code attached as ``_zval``, plus the
    quantile boundaries used (pass them back in to z-order a NEW batch
    into the same space — the frozen-boundaries idiom the dedup index
    and lm store follow). One ``approxQuantile`` pass per column not
    already covered."""
    from pyspark.ml.feature import Bucketizer

    _validate(df, cols, bits)
    boundaries = dict(boundaries or {})
    n_b = (1 << bits) - 1
    missing = [c for c in cols if c not in boundaries]
    if missing:
        probs = [(k + 1) / (n_b + 1) for k in range(n_b)]
        casted = df.select(*[F.col(c).cast("double").alias(c) for c in missing])
        rel_err = max(1e-4, 0.25 / (1 << bits))
        qs = casted.approxQuantile(missing, probs, rel_err)
        for c, q in zip(missing, qs):
            boundaries[c] = q

    # Bucketizer needs strictly increasing splits and non-null doubles:
    # dedupe repeated quantiles (skewed columns — fewer, still ordered
    # buckets), bracket with ±inf, and send NULL/NaN to -inf → bucket 0.
    inf = float("inf")
    prep_cols, out_cols, splits_arr = [], [], []
    ranks: dict[str, Column] = {}
    work = df
    for idx, c in enumerate(cols):
        pc, oc = f"_zb_in_{idx}", f"_zb_rank_{idx}"
        if len(boundaries[c]) > n_b:
            # caller-provided boundaries from a WIDER bits setting:
            # Bucketizer would emit ranks above 2^bits-1 and the
            # interleave would silently alias distant values (rank 16
            # ≡ rank 0 at bits=4) — the frozen-boundary "same space"
            # guarantee broken with no symptom but a scrambled layout
            raise ValueError(
                f"{len(boundaries[c])} boundaries for {c!r} exceed "
                f"bits={bits} (max {n_b}) — pass the bits the "
                "boundaries were built with"
            )
        uniq: list[float] = []
        for b in boundaries[c]:
            if not uniq or b > uniq[-1]:
                uniq.append(float(b))
        if not uniq:
            # all-NULL / constant-ish column: a single bucket —
            # Bucketizer rejects < 3 splits, and there is nothing to
            # search anyway
            ranks[c] = F.lit(0)
            continue
        v = F.col(c).cast("double")
        v = F.when(F.isnan(v) | v.isNull(), F.lit(-inf)).otherwise(v)
        work = work.withColumn(pc, v)
        prep_cols.append(pc)
        out_cols.append(oc)
        ranks[c] = F.col(oc)
        splits_arr.append([-inf] + uniq + [inf])
    if splits_arr:
        work = Bucketizer(
            splitsArray=splits_arr, inputCols=prep_cols, outputCols=out_cols
        ).transform(work)
    zval = _interleave([ranks[c] for c in cols], bits)
    out = work.withColumn(ZVAL_COL, zval).drop(*prep_cols, *out_cols)
    return out, boundaries


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    boundaries: dict[str, list[float]] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` laid out in z-order over ``cols``: one range
    exchange, in-task sort, ~``n_files`` output files each covering a
    compact hyper-rectangle (``n_files`` rounds to a power of two of
    Morton tiles — see module docstring). The z-value column is
    dropped from the stored schema (derivable; the layout IS the
    artifact). Returns the boundaries used and ``rows`` = THIS batch's
    written row count (the row-conservation receipt — under
    ``mode='append'`` it is the post-minus-pre footer count, so prior
    batches never inflate it; ``rows_total`` is the whole directory)."""
    spark = df.sparkSession
    prior = 0
    if mode == "append":
        from pyspark.errors import AnalysisException

        try:
            # parquet count() is footer metadata, not a data scan
            prior = spark.read.parquet(path).count()
        except AnalysisException as e:
            # ONLY first-append (no directory yet) reads as prior=0; a
            # transient read failure must not silently inflate the
            # row-conservation receipt — that is the opposite of a
            # receipt
            if "PATH_NOT_FOUND" not in str(e) and "does not exist" not in str(e):
                raise
            prior = 0
    assigned, bnds = zorder_frame(df, cols, bits=bits, boundaries=boundaries)
    k = min(max(round(math.log2(max(n_files, 1))), 0), bits * len(cols))
    tile = F.shiftright(F.col(ZVAL_COL), bits * len(cols) - k)
    assigned = assigned.withColumn("_ztile", tile)
    (
        assigned.repartitionByRange(1 << k, F.col("_ztile"))
        .sortWithinPartitions("_ztile", ZVAL_COL)
        .drop(ZVAL_COL, "_ztile")
        .write.mode(mode)
        .parquet(path)
    )
    total = spark.read.parquet(path).count()
    return {
        "rows": total - prior,
        "rows_total": total,
        "n_files_target": 1 << k,
        "bits": bits,
        "boundaries": bnds,
    }


def file_extents(path: str, cols: list[str]):
    """Per-file (min, max) of each column from parquet footers — the
    evidence table for layout quality and the skip oracle a reader's
    pruning would use. Driver-side metadata read only (footers, not
    data); |files| rows."""
    import pandas as pd
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ext = {"file": os.path.basename(f)}
        for c in cols:
            idx = schema_names.index(c)
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            ext[f"{c}_min"], ext[f"{c}_max"] = mn, mx
        rows.append(ext)
    return pd.DataFrame(rows)


def extent_scores(path: str, cols: list[str]) -> dict[str, float]:
    """Mean normalized per-file extent of each column — the
    band-agnostic layout-quality score. 1.0 = every file spans the
    whole column range (no pruning possible); 1/n_files = perfect
    single-column sort. A good z-order over m columns sits near
    ``n_files^(-1/m)`` on EVERY column simultaneously, which a
    single-column sort can only achieve on one. NaN-stat files score
    1.0 (unskippable), as does a CONSTANT column (every file overlaps
    any matching predicate — zero span is the unprunable end, not the
    ideal one). Returns ``{}`` when no parquet files are locally
    globbable (non-local filesystem) — scoring is driver-local footer
    reading and callers must treat absence as \"not measured\"."""
    ext = file_extents(path, cols)
    if not len(ext):
        return {}
    out: dict[str, float] = {}
    for c in cols:
        mn, mx = ext[f"{c}_min"], ext[f"{c}_max"]
        glo, ghi = mn.min(), mx.max()
        span = ghi - glo
        if not span or span != span:  # constant column or no stats
            out[c] = 1.0
            continue
        frac = ((mx - mn) / span).fillna(1.0)
        out[c] = float(frac.mean())
    return out


def prunable_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of files a footer-stats reader skips for
    ``col BETWEEN lo AND hi`` — the measurable payoff of the layout.
    Files without stats count as unskippable (correctness first)."""
    ext = file_extents(path, [col])
    if not len(ext):
        return 0.0
    mn, mx = ext[f"{col}_min"], ext[f"{col}_max"]
    overlaps = mn.isna() | mx.isna() | ((mx >= lo) & (mn <= hi))
    return float((~overlaps).mean())
