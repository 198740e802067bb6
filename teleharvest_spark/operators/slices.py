"""Violation hotspot slicing — which dimension slices FAIL anomalously?

A partition verdict says "src_07 failed"; the triage question after
that is *where inside the corpus the failures concentrate*: one
source? one length band? a (source, shard) pair? This is the
published "slice finder" problem (Chung, Kraska, Polyzotis et al.,
"Slice Finder: Automated Data Slicing for Model Validation", ICDE
2019 — find conjunctive predicates over categorical features whose
metric deviates significantly from the global), applied to the check
cascade's pass/fail bit instead of a model loss.

Reference analogue: the reference logs each failing row with its
reason (processor.py:97-145) and leaves aggregation to the operator
reading logs; this operator is the corpus-scale rollup of that triage
— rank every 1- and 2-column slice by how anomalously it fails.

Scale shape (the whole design at 10^12 rows):

* level 1 — ONE hash aggregate over the full table keyed by the
  complete dim tuple (``groupBy(dims)``: map-side partials, a single
  shuffle whose width is the number of DISTINCT dim combinations,
  not the row count). The fail bit is summed into the same pass.
* level 2 — ``cube`` over that *combination frame only*: the
  2^d grouping-set expansion multiplies a frame of |combos| rows,
  never the corpus. Arity is then capped (default ≤ 2) with
  ``bit_count(grouping_id())`` — conjunctive slices beyond pairs are
  exponentially many and rarely actionable (the SliceFinder paper
  searches lattice level ≤ 2 by default for the same reason).
* the significance stats run in numpy over the metadata-sized slice
  frame (reusing ``drift.chi2_sf_arrays``' scipy-free survival
  function) — Python never touches a corpus-sized row.

NULL semantics: a NULL dim value is a real slice value (rendered
``∅``) and is distinct from "column not in this grouping set" — the
distinction comes from ``grouping(col)``, not from the value, so the
NULL-source violations the cascade separates stay sliceable.

Continuous dims (n_tok, timestamps) must be pre-bucketed or the
level-1 combination frame degenerates toward |rows|; ``bucketized``
builds the standard fixed-width band column (the CLI's
``--slice-report n_tok:64`` syntax feeds it).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .cascade import VERDICT_COL
from .drift import chi2_sf_arrays

SLICE_COL = "slice"          # human-readable "a=x & b=y"
PIECES_COL = "_pieces"       # array of per-dim "a=x" atoms (join key for parents)


def bucketized(col: str, width: int) -> Column:
    """Fixed-width band of a numeric column, labeled by its inclusive
    lower edge (``floor(x / width) * width``); NULL stays NULL (its
    own slice value). Negative values band consistently because
    ``floor`` rounds toward −∞."""
    if width <= 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    return (F.floor(F.col(col) / F.lit(width)) * F.lit(width)).cast("long")


def capped_dim(
    df: DataFrame, col: str, k: int, capacity: int = 4096
) -> tuple[DataFrame, str]:
    """High-cardinality dim → sliceable dim: keep the Misra-Gries
    top-``k`` values, collapse the tail to ``__other__``.

    The level-1 combination frame is |distinct dim tuples| wide — a
    10^9-cardinality dim (user id, url host) would make it
    corpus-sized and the slice search meaningless row-noise anyway.
    Capping costs ONE extra narrow scan (sketch.heavy_hitters: MG
    summaries + a ≤ k-row driver materialization, deterministic error
    bounds) and restores the bounded-lattice guarantee for any dim.
    NULL stays NULL (its own ∅ slice, never folded into the tail);
    the capped column is string-typed ``<col>_top``. A genuine
    ``'__other__'`` value in the TOP-K is refused loudly (it would
    merge indistinguishably with the folded tail); one resident in the
    tail folds with the tail, which is what tail means.
    """
    out_col = f"{col}_top"
    if out_col in df.columns:
        raise ValueError(
            f"capped dim would overwrite existing column {out_col!r}"
        )
    top = top_values(df, col, k, capacity=capacity)
    return df.withColumn(out_col, capped_expr(col, top)), out_col


def top_values(
    df: DataFrame, col: str, k: int, capacity: int = 4096
) -> list:
    """The Misra-Gries top-``k`` STRING-CAST values of ``col`` —
    :func:`capped_dim`'s sketch step, exposed so callers capping TWO
    frames (the shared-scan suite+slices path caps the numerator and
    denominator against the SAME value set) sketch once."""
    if k < 1:
        raise ValueError(f"cap k must be >= 1, got {k}")
    from .sketch import heavy_hitters

    # sketch the STRING-CAST column, not the native one: the top list
    # must compare against the same cast the capped expression uses
    # (Python str(bytearray) != Spark's UTF-8 cast for binary — every
    # value silently folded to __other__, caught by review repro), and
    # the cast also makes ANY column type cappable (the sketch itself
    # accepts only string/binary/integral keys).
    c = F.col(col).cast("string")
    hh = heavy_hitters(df.select(c.alias(col)), col, k=k, capacity=capacity)
    top = [r[col] for r in hh.collect()]  # bounded: ≤ k rows, materialized
    if "__other__" in top:
        raise ValueError(
            f"column {col!r} carries the literal '__other__' as a frequent "
            "value — it would merge indistinguishably with the folded tail; "
            "rename it upstream or slice the column uncapped"
        )
    return top


def capped_expr(col: str, top: list) -> Column:
    """The fold-to-``__other__`` expression over a known top set —
    :func:`capped_dim`'s apply step. NULL stays NULL."""
    c = F.col(col).cast("string")
    return (
        F.when(F.col(col).isNull(), F.lit(None).cast("string"))
        .when(c.isin(top) if top else F.lit(False), c)
        .otherwise(F.lit("__other__"))
    )


def _fail_col(df: DataFrame, fail: Column | str | None) -> Column:
    if fail is None:
        if VERDICT_COL not in df.columns:
            raise ValueError(
                f"no fail column given and '{VERDICT_COL}' absent — "
                "run apply_cascade first or pass fail="
            )
        return ~F.col(VERDICT_COL)
    return F.col(fail) if isinstance(fail, str) else fail


def slice_profile(
    df: DataFrame,
    dims: Sequence[str],
    fail: Column | str | None = None,
    max_arity: int = 2,
    min_support: int = 30,
) -> DataFrame:
    """All 1..``max_arity``-column slices with their violation counts
    and the global baseline attached — the exact, distributed part of
    the slice search. Output columns: ``slice`` (string), ``_pieces``
    (array of atoms), ``arity``, ``n``, ``violations``, ``rate``,
    ``global_rate``, ``lift``.

    ``fail`` is a boolean column/expression (row is a violation when
    true); default reads the cascade's ``check_verdict``. NULL fail
    bits count as non-violations (a row the cascade could not judge
    is not evidence of a hot slice).

    ``min_support`` drops micro-slices below a row floor BEFORE
    significance scoring — a 3-row slice at 100% violation rate is
    noise, and pruning it here keeps the scored frame honest (the
    SliceFinder paper's min-support knob).
    """
    dims = list(dims)
    if not dims:
        raise ValueError("need at least one slice dimension")
    if len(dims) != len(set(dims)):
        raise ValueError(f"duplicate slice dimensions: {dims}")
    fail_bit = _fail_col(df, fail).cast("boolean")

    # level 1: the ONLY full-table pass — narrow projection, one
    # hash aggregate keyed by the complete dim tuple.
    base = (
        df.select(
            *[F.col(c) for c in dims],
            F.coalesce(fail_bit, F.lit(False)).cast("long").alias("_f"),
        )
        .groupBy(*dims)
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_f").alias("_v"))
    )
    return lattice_from_base(base, dims, max_arity=max_arity, min_support=min_support)


def lattice_from_base(
    base: DataFrame,
    dims: Sequence[str],
    max_arity: int = 2,
    min_support: int = 30,
    group_keys: Sequence[str] = (),
) -> DataFrame:
    """Level 2 of the slice search: grouping-set expansion + baseline
    over a pre-aggregated combination frame ``(group_keys..., dims...,
    _n, _v)`` — shared by the batch path (:func:`slice_profile`
    aggregates the corpus into it) and the streaming path (the
    watermarked windowed aggregation IS the combination frame, with
    ``group_keys=('window_start',)``). Each group-key value gets its
    own lattice and its own arity-0 global baseline."""
    dims = list(dims)
    keys = list(group_keys)
    if not dims:
        raise ValueError("need at least one slice dimension")
    if len(dims) != len(set(dims)):
        raise ValueError(f"duplicate slice dimensions: {dims}")
    if set(dims) & set(keys):
        raise ValueError(
            f"group keys overlap slice dimensions: {sorted(set(dims) & set(keys))}"
        )
    d = len(dims)

    # cube over (keys + dims), then KEEP only rows where every group
    # key is actually grouped (grouping() == 0) — the key columns are
    # fixed coordinates, not sliced dimensions, so they contribute
    # neither arity nor pieces.
    cube = base.cube(*keys, *dims).agg(
        F.sum("_n").alias("n"),
        F.sum("_v").alias("violations"),
        *[F.grouping(k).alias(f"_gk_{i}") for i, k in enumerate(keys)],
        *[F.grouping(c).alias(f"_g_{i}") for i, c in enumerate(dims)],
    )
    for i in range(len(keys)):
        cube = cube.where(F.col(f"_gk_{i}") == 0)
    arity = sum(
        (F.lit(1) - F.col(f"_g_{i}") for i in range(d)), F.lit(0)
    )
    pieces = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f"_g_{i}") == 0,
                    F.concat(
                        F.lit(f"{c}="),
                        F.coalesce(F.col(c).cast("string"), F.lit("∅")),
                    ),
                )
                for i, c in enumerate(dims)
            ]
        )
    )
    cube = cube.select(
        *keys,
        F.array_join(pieces, " & ").alias(SLICE_COL),
        pieces.alias(PIECES_COL),
        arity.alias("arity"),
        "n",
        "violations",
        (F.col("violations") / F.col("n")).alias("rate"),
    )

    # global baseline = the arity-0 row (per group), pulled across via
    # a window INSTEAD of a second cube branch: a separate
    # filter-the-total-row frame would re-execute the full-table scan
    # subtree (Spark reuses no plan across branches without an explicit
    # persist), turning one pass into two at 10^12 rows. The window
    # collapses each group to one partition, which is fine — it runs
    # over the |slices|-sized aggregate, never the corpus.
    from pyspark.sql import Window

    w = Window.partitionBy(*(keys or [F.lit(1)]))
    return (
        cube.withColumn(
            "global_rate",
            F.max(F.when(F.col("arity") == 0, F.col("rate"))).over(w),
        )
        .where((F.col("arity") >= 1) & (F.col("arity") <= max_arity))
        .where(F.col("n") >= min_support)
        .withColumn(
            "lift",
            F.when(F.col("global_rate") > 0, F.col("rate") / F.col("global_rate")),
        )
    )


def _score_pdf(
    pdf: pd.DataFrame, alpha: float, min_lift: float = 1.5
) -> pd.DataFrame:
    """One-sided binomial z vs the global rate + its χ²(1)/2 p-value,
    over the metadata-sized slice frame. One-sided because triage only
    cares about slices failing MORE than baseline; under-failing
    slices get z<0 / p→1 and never flag.

    ``flagged`` requires BOTH significance (p < alpha, z > 0) AND
    effect size (lift ≥ min_lift): at 10^6-row slices a 1.05× rate
    difference is statistically certain and operationally meaningless
    — without the floor every slice of a large corpus flags (measured:
    50/50 at 2M rows) and the report stops discriminating. A zero
    global rate counts as infinite lift."""
    p0 = pdf["global_rate"].to_numpy(dtype=np.float64)
    n = pdf["n"].to_numpy(dtype=np.float64)
    p = pdf["rate"].to_numpy(dtype=np.float64)
    denom = np.sqrt(np.maximum(p0 * (1.0 - p0), 1e-300) / np.maximum(n, 1.0))
    with np.errstate(invalid="ignore"):
        z = (p - p0) / denom
    # degenerate baselines: global rate 0 → any violation is infinite
    # evidence (z=+inf, p=0) iff the slice has one; global rate 1 →
    # nothing can exceed it.
    z = np.where((p0 <= 0.0) & (p > 0.0), np.inf, z)
    z = np.where((p0 <= 0.0) & (p <= 0.0), 0.0, z)
    z = np.where(p0 >= 1.0, 0.0, z)
    z2 = np.square(np.where(np.isfinite(z), z, 0.0))
    two_sided = chi2_sf_arrays(z2, np.ones_like(z2))
    p_val = np.where(z > 0.0, two_sided / 2.0, 1.0 - two_sided / 2.0)
    p_val = np.where(np.isposinf(z), 0.0, p_val)
    out = pdf.copy()
    out["z"] = z
    out["p_value"] = p_val
    lift = pdf["lift"].to_numpy(dtype=np.float64)
    lift_eff = np.where(np.isnan(lift), np.inf, lift)
    out["flagged"] = (
        (out["p_value"] < alpha) & (out["z"] > 0.0) & (lift_eff >= min_lift)
    )
    return out


def violation_slices(
    df: DataFrame,
    dims: Sequence[str],
    fail: Column | str | None = None,
    max_arity: int = 2,
    min_support: int = 30,
    alpha: float = 1e-3,
    min_lift: float = 1.5,
    top_k: int | None = 50,
) -> pd.DataFrame:
    """Ranked slice report: the most anomalously-failing slices with
    significance and parent-dominance marks, as a pandas frame (the
    slice lattice for bounded-cardinality dims is metadata-sized by
    construction — the bounded-collect convention). ``top_k`` caps the
    returned rows; ``None`` returns the full scored lattice (callers
    that persist or diff reports should keep everything — a truncated
    report silently hides known-bad slices below the cut).

    ``dominated`` marks an arity-2 slice whose evidence does not
    exceed its strongest arity-1 parent (z ≤ max parent z): the pair
    adds no triage information beyond "this source is bad" — the
    SliceFinder lattice-pruning rule, kept as a mark rather than a
    drop so the report stays lossless.

    ``alpha`` defaults tight (1e-3): with |slices| implicit
    comparisons a loose per-slice 0.05 would flag noise; callers
    wanting calibrated family-wise control can feed ``p_value``
    through ``drift.bh_reject`` (the FDR machinery is shared).
    ``min_lift`` is the practical-significance floor (see
    :func:`_score_pdf`) — large corpora make every slice
    statistically distinguishable.
    """
    prof = slice_profile(
        df, dims, fail=fail, max_arity=max_arity, min_support=min_support
    )
    return score_lattice(
        prof.toPandas(), alpha=alpha, min_lift=min_lift, top_k=top_k
    )


def score_lattice(
    pdf: pd.DataFrame,
    alpha: float = 1e-3,
    min_lift: float = 1.5,
    top_k: int | None = None,
    group_keys: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Score + dominance-mark + rank one collected lattice frame
    (:func:`slice_profile` / :func:`lattice_from_base` output,
    including the ``_pieces`` column, which is consumed here) — shared
    by the batch path and the streaming sink, which calls it once per
    finalized window.

    ``group_keys`` — pass the grouping columns when the frame holds
    SEVERAL lattices (lattice_from_base with group_keys, e.g. one per
    window): scoring then runs per group. Without it, a multi-group
    frame is REFUSED rather than mis-scored — the parent-dominance
    dict is keyed by the slice string alone, so mixed groups would
    dominance-mark arity-2 slices against an arbitrary group's
    parents."""
    if group_keys:
        parts = [
            score_lattice(g, alpha=alpha, min_lift=min_lift, top_k=top_k)
            for _, g in pdf.groupby(list(group_keys), dropna=False, sort=True)
        ]
        if not parts:
            return score_lattice(
                pdf, alpha=alpha, min_lift=min_lift, top_k=top_k
            )
        return pd.concat(parts, ignore_index=True)
    if not len(pdf):
        pdf = pdf.assign(z=[], p_value=[], flagged=[], dominated=[])
        return pdf.drop(columns=[PIECES_COL], errors="ignore")
    if pdf[pdf["arity"] == 1][SLICE_COL].duplicated().any():
        raise ValueError(
            "duplicate arity-1 slices in one frame — this looks like a "
            "multi-group lattice (lattice_from_base with group_keys); "
            "pass group_keys=... so each group is scored separately"
        )
    pdf = _score_pdf(pdf, alpha, min_lift=min_lift)

    # parent dominance over the collected frame: an arity-k slice's
    # parents are its individual atoms' (k-1)-ary slices; with
    # max_arity=2 that is exactly the singles, keyed by their atom.
    single_z = (
        pdf[pdf["arity"] == 1].set_index(SLICE_COL)["z"].to_dict()
    )
    def _dominated(row) -> bool:
        if row["arity"] < 2:
            return False
        parents = [single_z.get(a) for a in row[PIECES_COL]]
        parents = [z for z in parents if z is not None and np.isfinite(z)]
        if not parents or not np.isfinite(row["z"]):
            return False
        return bool(row["z"] <= max(parents))

    pdf["dominated"] = pdf.apply(_dominated, axis=1)
    pdf = pdf.sort_values(
        ["z", "n", SLICE_COL], ascending=[False, False, True], ignore_index=True
    )
    if top_k is not None:
        pdf = pdf.head(top_k)
    return pdf.drop(columns=[PIECES_COL])


def slice_transitions(cur: pd.DataFrame, prev: pd.DataFrame) -> pd.DataFrame:
    """Cross-run slice churn: what changed between two scored lattices
    (the hot-token-churn idiom applied to slices — a PSI-style single
    number can say "worse", only a keyed diff names WHICH slice).

    Outer-merges on the slice string and classifies each slice's
    ``transition`` as ``<prev>-><cur>`` over the states ``hot``
    (flagged), ``quiet`` (present, not flagged), ``absent`` (not in
    that run's lattice — dims changed, support moved, or the slice
    value vanished). Carries ``rate_delta``/``z_delta`` (NaN when
    either side is absent). The triage reads: ``quiet->hot`` and
    ``absent->hot`` are regressions; ``hot->quiet``/``hot->absent``
    are recoveries; ``hot->hot`` is standing damage.

    Both inputs are stored-lattice frames (:func:`violation_slices`
    output, full — compare runs written with ``top_k=None``; a
    truncated side misreports missing slices as ``absent``).
    """
    need = {SLICE_COL, "rate", "z", "flagged", "n"}
    for name, frame in (("cur", cur), ("prev", prev)):
        missing = need - set(frame.columns)
        if missing:
            raise ValueError(f"{name} lattice is missing columns {sorted(missing)}")
    m = cur.merge(
        prev[[SLICE_COL, "rate", "z", "flagged", "n"]],
        on=SLICE_COL,
        how="outer",
        suffixes=("", "_prev"),
        indicator=True,
    )

    def _state(flagged, present) -> str:
        if not present:
            return "absent"
        return "hot" if bool(flagged) else "quiet"

    cur_present = m["_merge"].isin(["both", "left_only"])
    prev_present = m["_merge"].isin(["both", "right_only"])
    m["transition"] = [
        f"{_state(fp, pp)}->{_state(fc, cp)}"
        for fc, cp, fp, pp in zip(
            m["flagged"].fillna(False), cur_present,
            m["flagged_prev"].fillna(False), prev_present,
        )
    ]
    m["rate_delta"] = m["rate"] - m["rate_prev"]
    m["z_delta"] = m["z"] - m["z_prev"]
    keep = [
        SLICE_COL, "transition", "n", "rate", "z", "flagged",
        "n_prev", "rate_prev", "z_prev", "flagged_prev",
        "rate_delta", "z_delta",
    ]
    keep = [c for c in keep if c in m.columns]
    out = m[keep].copy()
    order = {"quiet->hot": 0, "absent->hot": 1, "hot->hot": 2,
             "hot->quiet": 3, "hot->absent": 4}
    out["_o"] = out["transition"].map(lambda t: order.get(t, 9))
    out = out.sort_values(
        ["_o", "z_delta", SLICE_COL], ascending=[True, False, True],
        ignore_index=True,
    ).drop(columns=["_o"])
    # normalize the outer-merge's NaN-mixed dtypes so the frame
    # converts to Spark/parquet cleanly: nullable booleans for flags,
    # doubles for counts (an absent side has no count)
    for c in ("flagged", "flagged_prev"):
        if c in out.columns:
            out[c] = out[c].astype("boolean")
    for c in ("n", "n_prev"):
        if c in out.columns:
            out[c] = out[c].astype("float64")
    return out
