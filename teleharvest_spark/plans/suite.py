"""The full validation run: cascade (including the referential
unknown-source restriction, expressed as a row check) + uniqueness +
stats + drift → violations table + per-partition verdicts. The
standalone broadcast anti-join form of the referential check lives in
operators/referential.py for set-level use; here it is the cascade's
unknown_source rule so its violations materialize per row.

This is the engine's `fetch_and_process` analogue (processor.py:55-63)
minus the network boundaries: read → one narrow check-cascade stage →
broadcast joins → two small aggregates → verdict assembly. The fact
table is scanned ONCE for the row-level work and once for histograms;
all joins against dimensions are broadcast; the only row-volume
shuffle is the uniqueness aggregate (map-side partial agg collapses
hot keys before it — measured in operators/uniqueness.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import CheckSuite
from ..operators import cascade, drift, stats, uniqueness


@dataclass
class ValidationResult:
    violations: DataFrame  # schema.VIOLATIONS
    verdicts: DataFrame    # per-source verdict + metrics
    stats: DataFrame       # raw per-partition stats
    # distinct doc_ids with ANY violation — ALWAYS the uncapped set
    # (under violation_sample the violations field is a bounded sample;
    # certification must never pass a row whose violation was merely
    # unsampled)
    failing_ids: DataFrame | None = None
    hist: DataFrame | None = None  # per-(source, bucket) n_tok histogram of THIS run
    # one-decode mode's persisted narrow per-row cache (doc_id, source,
    # n_tok, _tok_null, fail columns, conditional tokens): callers that
    # need another pass over the validated rows (state writes) can
    # aggregate this instead of re-decoding the fact. None outside
    # one-decode mode. Released by cleanup() with everything else.
    row_cache: DataFrame | None = None
    # caches every branch below depends on, materialized IN ORDER at
    # the start of materialize() so concurrent branches read a pinned
    # cache instead of racing to compute it (a shared unmaterialized
    # cache is recomputed once per racing subtree)
    _eager: tuple = ()
    # narrow (slice_dims...) frame, ONE ROW PER CASCADE-FAILING ROW —
    # the exact numerator for a slice report riding this run's decode
    # scan (None unless run_suite was called with slice_dims)
    failing_dim_rows: DataFrame | None = None
    _cached: tuple = ()    # internal: persisted DataFrames to release
    _overlap: tuple = ()   # internal: persisted branches independent of violations

    def cleanup(self, blocking: bool = True) -> None:
        """Release every DataFrame run_suite persisted (violations AND
        the dup-key set — leaking the latter across repeated runs
        churns the block manager)."""
        for df in self._cached:
            df.unpersist(blocking)

    def materialize(self) -> tuple[int, int]:
        """(violation_rows, verdict_rows) with independent DAG branches
        submitted from concurrent threads: the verdict side's small
        pruned scans (stats, drift histogram — persisted, independent
        of violations) overlap the violations side's big tokens decode
        instead of queueing behind it; the final verdict assembly then
        reads only caches. Verdicts itself depends on the persisted
        violations, so counting the two naively in parallel would
        double-run the big scan."""
        from concurrent.futures import ThreadPoolExecutor

        for df in self._eager:
            df.count()
        with ThreadPoolExecutor(max(2, 1 + len(self._overlap))) as ex:
            fv = ex.submit(self.violations.count)
            fs = [ex.submit(df.count) for df in self._overlap]
            nv = fv.result()
            for f in fs:
                f.result()
        return nv, self.verdicts.count()


def sample_violations(
    violations: DataFrame,
    per_check_counts: DataFrame,
    limit: int,
    oversample: int = 4,
) -> DataFrame:
    """Deterministic ≤``limit``-row sample per (source, check_name).

    At 10^12 rows a SYSTEMATIC failure (bad threshold, corrupt source)
    makes the violations set corpus-sized — and each row carries its
    token array, so writing it is a second copy of the corpus. The cap
    bounds the written diagnostic at |sources|×|checks|×limit rows
    while the verdicts keep EXACT per-check counts.

    Two-phase, shuffle-bounded: a content-defined hash filter keeps
    ~``oversample × limit`` candidates per group MAP-SIDE (the fat
    token payload never enters a shuffle at pathological volume), then
    an exact window trim picks the ``limit`` lowest-hash survivors.
    The hash priority is content-derived (xxhash64 over the full row),
    so the sample is reproducible under any partitioning and any
    engine — not "first K encountered". Groups at or under
    the expected-candidate floor keep probability 1, so groups ≤ limit
    are returned COMPLETE; larger groups yield the limit lowest-hash
    rows among survivors (a deterministic sample, not the global
    minimum — the distinction is immaterial for a diagnostic sample
    and buying exactness would cost a corpus-wide sort).

    The expected candidate count per group is floored at 32 regardless
    of how small ``oversample × limit`` is: with a bare
    ``oversample=4, limit=1`` the survivor count for a huge group is
    Poisson(4), which is ZERO with probability e⁻⁴ ≈ 1.8% — a
    systematically failing check could ship an empty diagnostic sample
    beside a billion-row check_cnt. The floor drives that to e⁻³²
    (~10⁻¹⁴ per group; Chernoff-bounded ≤ ~e⁻²⁸ for any limit) while
    the retained fat rows stay ≤ ~max(32, oversample×limit) per group
    — still map-side-bounded, still one pass.
    """
    from pyspark.sql import Window

    m = 1 << 32
    expected = max(32.0, float(oversample * limit))
    thr = per_check_counts.select(
        F.col("source").alias("_s"),
        F.col("check_name").alias("_c"),
        F.least(
            F.lit(1.0),
            F.lit(expected) / F.col("check_cnt").cast("double"),
        ).alias("_p"),
    )
    h64 = F.xxhash64("doc_id", "check_name", "reason", "tokens")
    w = Window.partitionBy("source", "check_name").orderBy("_h")
    return (
        violations.join(
            F.broadcast(thr),
            F.col("source").eqNullSafe(F.col("_s"))
            & (F.col("check_name") == F.col("_c")),
            "inner",
        )
        .withColumn("_h", h64)
        .where((F.pmod(F.col("_h"), F.lit(m)).cast("double") / m) < F.col("_p"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit)
        .drop("_s", "_c", "_p", "_h", "_rn")
    )


def run_suite(
    sequences: DataFrame,
    suite: CheckSuite,
    baseline_hist: DataFrame | None = None,
    drift_vs_global: bool = False,
    source_dim: DataFrame | None = None,
    stored_key_counts: DataFrame | None = None,
    violation_sample: int | None = None,
    slice_dims: tuple[str, ...] = (),
    drift_exclude_self: bool | None = None,
) -> ValidationResult:
    """Run every check family over the sequences table.

    ``drift_exclude_self`` — score each source against the pool MINUS
    its own histogram (drift.leave_one_out_baseline: "the rest", so a
    dominant source cannot mask its own drift). Default (None): True
    when the pool is derived from the current corpus
    (``drift_vs_global`` with no explicit baseline), False when
    ``baseline_hist`` is an external/temporal baseline (self-exclusion
    would be wrong against a different era). The resume path passes
    True explicitly with its reconstructed full-corpus pool, keeping
    resume verdicts equal to a full run's. Sources with an all-zero
    rest (single-source corpus) are excluded from drift scoring —
    absent drift rows read as pass downstream.

    ``slice_dims`` — input column names a slice report will slice by:
    the run additionally exposes ``failing_dim_rows`` (one narrow row
    per CASCADE-failing row, carrying exactly those columns) derived
    from the SAME annotated plan, so a combined suite+slices run pays
    one token decode instead of two (the slice numerator needs the
    per-row fail bit, which only the cascade's decode can produce; the
    denominator is a token-free column-pruned aggregate the caller
    runs separately). Exact per-row semantics — a duplicated doc_id
    whose two rows land in different dim buckets counts in the right
    bucket, which a failing-ids join could not guarantee.

    The cascade already covers unknown_source/banned rows row-wise;
    uniqueness contributes rows the cascade can't see (cross-row).
    Violation precedence on union: cascade reason wins for a doc that
    is both (matches the reference's in-order reporting); uniqueness
    rows are additive.

    ``stored_key_counts`` — (doc_id, n_stored) from the persisted key
    index (uniqueness.cross_partition_counts): folds already-validated
    partitions' occurrences into the dup totals so a resume-scoped run
    still flags cross-partition duplicates with full-run counts.
    """
    missing_dims = sorted(set(slice_dims) - set(sequences.columns))
    if missing_dims:
        raise ValueError(
            f"slice_dims {missing_dims} not in the input table "
            f"(columns: {sequences.columns})"
        )
    # Optional per-source threshold overrides (FIXTURES.md T2): the
    # dimension broadcast-joins onto the fact for the cascade only —
    # the pruned uniqueness/stats/drift scans stay joins-free.
    if source_dim is not None:
        cascade_input = cascade.with_source_bounds(sequences, source_dim)
        checks = cascade.sequence_checks(suite, per_source_bounds=True)
    else:
        cascade_input = sequences
        checks = cascade.sequence_checks(suite)
    if suite.check_tolerances:
        # a typo'd tolerance name would silently keep strict verdicts —
        # surface the misconfiguration, matching the collision-raising
        # convention of custom_checks/stat_checks
        known = {c.name for c in checks} | {"duplicate_key"}
        unknown = sorted({n for n, _ in suite.check_tolerances} - known)
        if unknown:
            raise ValueError(
                f"check_tolerances name(s) {unknown} match no check in "
                f"this suite (known: {sorted(known)})"
            )
    # Duplicate-key detection runs on a column-pruned scan (doc_id
    # only — the tokens array is never decoded here; the array decode
    # IS the scan cost, ~33s/2M rows measured). The dup
    # set is persisted and counted so the fused join below can pick
    # broadcast (usual case: tiny dup set — no shuffle of the fact)
    # vs shuffle join (adversarial corpus: 10^9 dup keys at 10^12 rows
    # won't fit an executor). Without the explicit hint the static
    # plan would sort-merge-join and shuffle-write the whole fact.
    dups = uniqueness.duplicate_keys(
        sequences, key="doc_id", stored_counts=stored_key_counts
    ).persist()
    dups_r = dups.withColumnRenamed("doc_id", "_dup_key")
    dups_broadcast = dups.count() <= 5_000_000
    dups_side = F.broadcast(dups_r) if dups_broadcast else dups_r

    # ONE full decode of the tokens column produces BOTH violation
    # classes: the cascade flags are a narrow projection, the dup flag
    # a join against the (usually tiny) dup-key set, and each row
    # explodes into 0-2 violation rows (cascade + duplicate_key are
    # additive, matching the union semantics the tests pin). The tiny
    # output (~0.1% of rows) is persisted so verdict assembly and
    # caller-side counts never re-scan the fact. Null-safe dup join:
    # duplicate_keys' grouping treats NULL as a real key (two NULL
    # doc_ids ARE a duplicate pair); EqualNullSafe is still an
    # equi-join predicate, so broadcast-hash is preserved.
    annotated = (
        cascade.apply_cascade(cascade_input, checks)
        .join(dups_side, F.col("doc_id").eqNullSafe(F.col("_dup_key")), "left")
        .drop("_dup_key")
    )
    vstruct = F.explode(
        F.array_compact(
            F.array(
                F.when(
                    F.col(cascade.FIRST_FAIL_COL).isNotNull(),
                    F.struct(
                        F.col(cascade.FIRST_FAIL_COL).alias("check_name"),
                        F.col(cascade.REASON_COL).alias("reason"),
                    ),
                ),
                F.when(
                    F.col("dup_count").isNotNull(),
                    F.struct(
                        F.lit("duplicate_key").alias("check_name"),
                        F.concat(
                            F.lit("doc_id seen "),
                            F.col("dup_count").cast("string"),
                            F.lit(" times"),
                        ).alias("reason"),
                    ),
                ),
            )
        )
    )
    tokens_sel = (
        F.col("tokens")
        if "tokens" in sequences.columns
        else F.lit(None).cast("array<int>").alias("tokens")
    )
    violations_plan = (
        annotated.select(
            "doc_id",
            "source",
            tokens_sel,
            vstruct.alias("_v"),
        )
        .select("doc_id", "source", F.col("_v.check_name"), F.col("_v.reason"), "tokens")
        .select("doc_id", "source", "check_name", "reason", "tokens")
    )
    per_check = None
    viol_keys = None
    failing_rows = None
    failing_dim_rows = None
    per_row = None
    if violation_sample is None and dups_broadcast:
        # ONE-DECODE mode (the uncapped path the bench's seq/s metric
        # times): the fact's tokens column is decoded exactly once —
        # this narrow per-row cache carries the cascade verdictS, the
        # dup flag, the stats inputs (tokens-null bit, n_tok, doc_id)
        # and the tokens array ONLY for failing rows, so the stats
        # aggregate and the drift histogram below read the cache
        # instead of re-decoding the fact (each cached-plan pass was a
        # full token decode: ~3s apiece at 2M rows — persist defeats
        # the count-time column pruning an unpersisted aggregate
        # enjoys, so the old per-branch scans paid it in full).
        # Materialized eagerly: materialize() launches the violations
        # and stats/drift branches from concurrent threads, and an
        # unmaterialized shared cache would be decoded once per racing
        # branch (the same race the eager hist count pins). Restricted
        # to the broadcast-dup regime: a broadcast join preserves the
        # scan's partitioning, keeping percentile_approx's
        # merge order — and therefore stats — identical to a direct
        # fact scan; the shuffle-dup fallback keeps the old shape.
        fail_any = (
            F.col(cascade.FIRST_FAIL_COL).isNotNull()
            | F.col("dup_count").isNotNull()
        )
        _carried = {
            "doc_id", "source", "tokens", "dup_count", "n_tok",
            "_tok_null", cascade.FIRST_FAIL_COL, cascade.REASON_COL,
        }
        extra_dims = [c for c in slice_dims if c not in _carried]
        per_row = (
            annotated.select(
                "doc_id",
                "source",
                "n_tok",
                F.col("tokens").isNull().alias("_tok_null")
                if "tokens" in sequences.columns
                else F.lit(True).alias("_tok_null"),
                cascade.FIRST_FAIL_COL,
                cascade.REASON_COL,
                "dup_count",
                F.when(fail_any, tokens_sel).alias("tokens"),
                *extra_dims,
            )
            .persist()
        )
        failing_rows = per_row.where(fail_any)
        violations = (
            failing_rows.select(
                "doc_id", "source", "tokens", vstruct.alias("_v")
            )
            .select(
                "doc_id", "source", F.col("_v.check_name"),
                F.col("_v.reason"), "tokens",
            )
            .persist()
        )
        if slice_dims:
            failing_dim_rows = failing_rows.where(
                F.col(cascade.FIRST_FAIL_COL).isNotNull()
            ).select(*slice_dims)
        failing_rows = None  # derived view, nothing extra to release
    elif violation_sample is None and slice_dims:
        # Shared-scan mode: persist the PRE-explode failing rows (≤ the
        # violation count — a row failing cascade AND duplicate_key is
        # stored once) as the single parent the one decode scan
        # materializes; violations AND the slice numerator are cheap
        # projections of this cache, so the slice report adds zero
        # token decodes to the run.
        fail_any = (
            F.col(cascade.FIRST_FAIL_COL).isNotNull()
            | F.col("dup_count").isNotNull()
        )
        # columns the fixed select below already carries must not be
        # re-selected via extra_dims — a dim named 'tokens' would
        # otherwise duplicate the column and break every later
        # reference with AMBIGUOUS_REFERENCE
        _carried = {
            "doc_id", "source", "tokens", "dup_count",
            cascade.FIRST_FAIL_COL, cascade.REASON_COL,
        }
        extra_dims = [c for c in slice_dims if c not in _carried]
        failing_rows = (
            annotated.where(fail_any)
            .select(
                "doc_id",
                "source",
                tokens_sel,
                cascade.FIRST_FAIL_COL,
                cascade.REASON_COL,
                "dup_count",
                *extra_dims,
            )
            .persist()
        )
        violations = (
            failing_rows.select(
                "doc_id", "source", "tokens", vstruct.alias("_v")
            )
            .select(
                "doc_id", "source", F.col("_v.check_name"),
                F.col("_v.reason"), "tokens",
            )
            .persist()
        )
        failing_dim_rows = failing_rows.where(
            F.col(cascade.FIRST_FAIL_COL).isNotNull()
        ).select(*slice_dims)
    elif violation_sample is None:
        violations = violations_plan.persist()
    else:
        # Capped mode trades ONE extra decode pass (counts, then the
        # filtered sample — the uncapped TOKEN-CARRYING set is never
        # persisted, since at pathological volume persisting it IS the
        # problem) for an output bounded by |sources|×|checks|×limit.
        # The narrow (doc_id, source, check_name) projection IS
        # persisted: ~100× smaller than the violations rows (no token
        # arrays), spillable, and it serves BOTH the per-check counts
        # and the failing-id set — without it, certification
        # (emit_valid) would re-run the full cascade decode a third
        # time just to rebuild the failing ids.
        # 'check_name' excluded for the same ambiguity reason as the
        # shared-scan branch's carried set (it is derived from _v here)
        extra_dims = [
            c for c in slice_dims
            if c not in ("doc_id", "source", "check_name")
        ]
        viol_keys = (
            annotated.select(
                "doc_id", "source", vstruct.alias("_v"), *extra_dims
            )
            .select(
                "doc_id", "source", F.col("_v.check_name"), *extra_dims
            )
            .persist()
        )
        if slice_dims:
            failing_dim_rows = viol_keys.where(
                F.col("check_name") != "duplicate_key"
            ).select(*slice_dims)
        per_check = (
            viol_keys.groupBy("source", "check_name")
            .agg(F.count(F.lit(1)).alias("check_cnt"))
            .persist()
        )
        violations = sample_violations(
            violations_plan, per_check, violation_sample
        ).persist()

    # persisted: tiny (one row per source), independent of violations —
    # materialize() overlaps this scan with the big tokens decode.
    # source_dim rides along so the min/max mirrors compare against the
    # same per-source effective bounds the cascade used. In one-decode
    # mode the aggregate reads the per-row cache (same rows, same
    # partitioning — see per_row above) instead of re-decoding the
    # fact's tokens for the null count.
    if per_row is not None:
        stats_src = stats.partition_stats(per_row, tokens_null_col="_tok_null")
    else:
        stats_src = stats.partition_stats(sequences)
    part_stats = stats.stats_verdicts(
        stats_src, suite, source_bounds=source_dim
    ).persist()

    # Drift baseline: an explicit trusted histogram (production: the
    # published/validated era), or — drift_vs_global — the current
    # corpus's own pooled n_tok histogram, flagging sources whose
    # distribution diverges from the rest (the reference's
    # compare-against-published pattern, processor.py:159-178). The
    # histogram pass prunes to (source, n_tok); KS/PSI math runs in one
    # applyInPandas over ≤ |sources|×128 rows.
    drift_v = None
    hist = None
    if baseline_hist is not None:
        # The pool/baseline is metadata-sized by contract (≤ |sources|
        # × |buckets| rows) but its LINEAGE may be a full-table scan
        # (the resume rescan pool, the temporal baseline re-read), and
        # the leave-one-out chain below references it from several
        # subtrees — unlocalized, EACH reference re-ran that scan
        # (measured: the pending-slice drift branch paid the 1M-row
        # pool scan 2-3× per run). One bounded collect pins it
        # driver-side as a pure LocalRelation.
        from ..session import local_df

        baseline_hist = local_df(
            sequences.sparkSession,
            baseline_hist.collect(),
            baseline_hist.schema,
        )
    if baseline_hist is not None or drift_vs_global:
        # persist the (≤ |sources|×128-row) histogram: deriving the
        # pooled baseline from it would otherwise re-scan the fact.
        # Materialize it EAGERLY: the drift chain below references the
        # cached node from four separate subtrees (loo, scored, the
        # two semi-joins) that the first drift job launches
        # concurrently — each sees a cache miss until the first writer
        # lands, so the unmaterialized histogram's full fact scan ran
        # up to 4× inside one job (measured ~5.1s → ~2.4s for the
        # overlap branch at 2M rows). One tiny count pins the cache
        # before any consumer exists.
        hist = drift.ntok_histogram(
            sequences if per_row is None else per_row
        ).persist()
        if per_row is None:
            # the drift chain references this cache from four
            # concurrent subtrees — pin it before any consumer exists
            # (in one-decode mode materialize()'s _eager chain pins
            # per_row first and hist right after, so no extra job is
            # needed here)
            hist.count()
        if drift_exclude_self is None:
            drift_exclude_self = baseline_hist is None
        if drift_exclude_self:
            # leave-one-out: pool (explicit full-corpus pool under
            # resume, else pooled from hist) minus each source's own
            # counts — all metadata-sized arithmetic on the persisted
            # histogram, zero extra passes over the fact. Round 6: the
            # scoring runs DRIVER-side over the collected histogram
            # (drift.loo_drift_rows — float-parity-pinned twin of the
            # loo_drift_metrics SQL chain, which itself pins the old
            # loo → semi-join → drift_metrics form); the old chain was
            # ~1.0-1.5 s of stage scheduling per run on a ≤1k-row
            # frame. The collect is bounded by |sources|×|buckets| —
            # the snapshot-localization argument. hist must be
            # materialized first: in one-decode mode the _eager chain
            # has not run yet at build time, so the collect doubles as
            # the cache pin (the hist.count() above covers the other
            # mode).
            from ..session import local_df

            drift_v = drift.drift_verdicts(
                local_df(
                    sequences.sparkSession,
                    drift.loo_drift_rows(
                        hist.collect(),
                        None if baseline_hist is None
                        else baseline_hist.collect(),
                    ),
                    "source string, ks double, psi double",
                ),
                suite,
            ).persist()
        else:
            drift_v = drift.drift_verdicts(
                drift.drift_metrics(hist, baseline_hist), suite
            ).persist()

    # per-source violation counts (small agg over the violations set).
    # NULL is a legitimate partition value here (null_key violations) —
    # all verdict-side joins must be null-safe.
    # per-check breakdown rides along: it lands in the manifest metrics
    # map as viol_<check> keys, so cross-run anomaly bands (plans/
    # history.py) can flag ONE check's failure count jumping even when
    # the total stays inside its band. Two-level agg over the already-
    # tiny violations set.
    if per_check is None:
        per_check = violations.groupBy("source", "check_name").agg(
            F.count(F.lit(1)).alias("check_cnt")
        )
    viol_counts = (
        per_check
        .groupBy("source")
        .agg(
            F.sum("check_cnt").alias("violation_rows"),
            F.map_from_entries(
                F.collect_list(F.struct("check_name", "check_cnt"))
            ).alias("viol_by_check"),
        )
    )
    verdicts = (
        part_stats.join(
            viol_counts.withColumnRenamed("source", "_vsource"),
            F.col("source").eqNullSafe(F.col("_vsource")),
            "left",
        )
        .drop("_vsource")
        .fillna({"violation_rows": 0})
    )
    if drift_v is not None:
        verdicts = verdicts.join(
            drift_v.select(
                F.col("source").alias("_dsource"), "ks", "psi", "drift_verdict"
            ),
            F.col("source").eqNullSafe(F.col("_dsource")),
            "left",
        ).drop("_dsource")
        drift_fail = F.col("drift_verdict") == "fail"
    else:
        drift_fail = F.lit(False)

    if suite.max_violation_frac > 0.0 or suite.check_tolerances:
        # Tolerance mode (Deequ/GE assertion shape): the partition's
        # violation clause fails when ANY check's violation-row count
        # exceeds its tolerated fraction of the partition's rows —
        # per-check override first, else the global max_violation_frac.
        # Pure map-expression over the already-computed viol_by_check:
        # no extra scan, no extra join. Strict >: exactly-at-tolerance
        # passes. violation_rows stays the EXACT total either way.
        tol = dict(suite.check_tolerances)
        if tol:
            tol_map = F.create_map(
                *[
                    x
                    for name, frac in tol.items()
                    for x in (F.lit(name), F.lit(float(frac)))
                ]
            )

            def tol_expr(k):
                return F.coalesce(
                    F.element_at(tol_map, k),
                    F.lit(float(suite.max_violation_frac)),
                )

        else:

            def tol_expr(k):
                return F.lit(float(suite.max_violation_frac))

        viol_fail = F.coalesce(
            F.exists(
                F.map_entries(F.col("viol_by_check")),
                lambda e: e.value.cast("double")
                > tol_expr(e.key) * F.col("row_count").cast("double"),
            ),
            F.lit(False),
        )
    else:
        viol_fail = F.col("violation_rows") > 0
    verdicts = verdicts.withColumn(
        "verdict",
        F.when(
            (F.col("stats_verdict") == "fail")
            | viol_fail
            | F.coalesce(drift_fail, F.lit(False)),
            F.lit("fail"),
        ).otherwise(F.lit("pass")),
    )
    failing_ids = (
        violations if violation_sample is None else viol_keys
    ).select("doc_id").distinct()
    overlap = (part_stats,) + ((drift_v,) if drift_v is not None else ())
    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        stats=part_stats,
        failing_ids=failing_ids,
        hist=hist,
        failing_dim_rows=failing_dim_rows,
        row_cache=per_row,
        _cached=(violations, dups)
        + ((failing_rows,) if failing_rows is not None else ())
        + ((per_row,) if per_row is not None else ())
        + ((per_check, viol_keys) if violation_sample is not None else ())
        + overlap
        + ((hist,) if hist is not None else ()),
        _overlap=overlap,
        _eager=(
            ((per_row,) if per_row is not None else ())
            + ((hist,) if hist is not None and per_row is not None else ())
        ),
    )
