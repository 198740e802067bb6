"""Row-level check cascade — strictly-ordered, first-failing-reason.

Reference semantics: ``_process_message`` (processor.py:97-145) applies
checks in a fixed order with early exit; each failure is logged with
its reason. Order matters only for *which reason is reported* — the
pass/fail outcome is the conjunction (SURVEY.md §2.2).

Here every check is a declarative ``Check`` (name + fail-predicate +
reason expression); the cascade evaluates ALL predicates in one narrow
``select`` (whole-stage codegen, zero shuffles) and picks the
first-failing reason by fixed priority — semantically identical to the
reference's early exit, but vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..config import CheckSuite

VERDICT_COL = "check_verdict"          # boolean: True = pass
FIRST_FAIL_COL = "first_failed_check"  # string or NULL
REASON_COL = "fail_reason"             # string or NULL
FAILED_ALL_COL = "failed_checks"       # array<string>, every failing check


@dataclass(frozen=True)
class Check:
    """One named check: row FAILS when ``fails`` evaluates true."""

    name: str
    fails: Column
    reason: Column  # human-readable reason, evaluated only for failures


BOUND_MIN_COL = "_min_n_tok_src"  # per-source overrides (FIXTURES.md T2)
BOUND_MAX_COL = "_max_n_tok_src"


def with_source_bounds(sequences: DataFrame, source_dim: DataFrame) -> DataFrame:
    """Attach per-source length bounds from the allowed-source
    dimension (FIXTURES.md T2: `source, min_n_tok, max_n_tok`) via a
    broadcast join; rows whose source is absent (rogue/null) keep NULL
    overrides and fall back to the suite's global thresholds."""
    dim = source_dim.select(
        "source",
        F.col("min_n_tok").alias(BOUND_MIN_COL),
        F.col("max_n_tok").alias(BOUND_MAX_COL),
    )
    # Fail fast on a duplicated dimension key: a left join against a
    # dup-keyed dim MULTIPLIES matching fact rows — every downstream
    # count inflates and unique doc_ids manufacture duplicate_key
    # violations. The probe is one tiny job over the config-sized dim
    # (referential.py guards the same shape with .distinct(); here
    # distinct() would silently pick an arbitrary override instead of
    # surfacing the conflicting config).
    dup = (
        dim.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(5)
        .collect()
    )
    if dup:
        raise ValueError(
            "source_dim has duplicate rows for source(s) "
            f"{sorted((r['source'] for r in dup), key=str)} — per-source bounds "
            "must be unique"
        )
    return sequences.join(F.broadcast(dim), "source", "left")


def sequence_checks(suite: CheckSuite, per_source_bounds: bool = False) -> list[Check]:
    """The ordered cascade for the canonical `sequences` table.

    Ordering mirrors processor.py:97-135 — payload null/empty first
    (processor.py:98-100), key null/empty second (102-104), then
    consistency, length bounds (107-109), banned tokens (111-114),
    unknown source (the J3 referential restriction, processor.py:59,
    expressed as a row check so violations materialize).

    Suite-gated extras with no reference analogue (all default OFF so
    the base cascade is byte-identical): token-domain checks
    (``forbid_null_token`` → null_token_element, ``vocab_size`` →
    out_of_vocab) slot after the consistency check — they are schema
    errors; token degeneracy (``min_distinct_frac`` /
    ``max_token_run``) slots after the bounds — it is a quality rule
    (quality.token_degeneracy_checks inlined as per-row expressions).

    With ``per_source_bounds`` the length checks compare against the
    dimension columns attached by :func:`with_source_bounds`
    (per-source overrides, global thresholds as fallback) — the
    reference's per-run thresholds (settings.py:11-16) generalized to
    a per-partition dimension.
    """
    tokens, n_tok, source = F.col("tokens"), F.col("n_tok"), F.col("source")
    if per_source_bounds:
        min_b = F.coalesce(F.col(BOUND_MIN_COL), F.lit(suite.min_n_tok))
        max_b = F.coalesce(F.col(BOUND_MAX_COL), F.lit(suite.max_n_tok))
    else:
        min_b = F.lit(suite.min_n_tok)
        max_b = F.lit(suite.max_n_tok)
    checks = [
        Check("null_payload", tokens.isNull(), F.lit("tokens is NULL")),
        Check("empty_payload", F.size(tokens) == 0, F.lit("tokens is empty")),
        Check(
            "null_key",
            source.isNull() | (source == ""),
            F.lit("source is NULL or empty"),
        ),
        Check(
            "inconsistent_n_tok",
            n_tok.isNull() | (n_tok != F.size(tokens)),
            F.concat(
                F.lit("n_tok="),
                F.coalesce(n_tok.cast("string"), F.lit("NULL")),
                F.lit(" != size(tokens)="),
                F.size(tokens).cast("string"),
            ),
        ),
    ]
    # Token-domain checks (suite-gated, default off): the payload is
    # pre-tokenized ids, so domain violations — NULL elements inside
    # the array, ids outside [0, vocab) — are schema errors exactly
    # like inconsistent_n_tok, and sit with it in the cascade order
    # (before the threshold checks). Both are per-row codegen HOFs
    # with the banned-token range-prefilter idiom: no shuffle, no UDF.
    if suite.forbid_null_token:
        n_null_el = F.size(F.filter(tokens, lambda t: t.isNull()))
        checks.append(
            Check(
                "null_token_element",
                F.exists(tokens, lambda t: t.isNull()),
                F.concat(n_null_el.cast("string"), F.lit(" NULL token element(s)")),
            )
        )
    if suite.vocab_size is not None:
        vocab = F.lit(int(suite.vocab_size))
        oov = lambda t: (t < 0) | (t >= vocab)  # noqa: E731 — NULL ids stay NULL (never true)
        checks.append(
            Check(
                "out_of_vocab",
                F.exists(tokens, oov),
                F.concat(
                    F.lit("token "),
                    F.element_at(F.filter(tokens, oov), 1).cast("string"),
                    F.lit(f" outside [0, {int(suite.vocab_size)})"),
                ),
            )
        )
    # Sequence-framing checks (suite-gated, default off): special-token
    # contracts on the pre-tokenized payload. They sit with the schema
    # checks: a sequence that doesn't start with BOS / end with EOS is
    # malformed regardless of its length. F.get is the null-safe
    # element access (ANSI element_at throws on out-of-bounds; an
    # empty payload already failed empty_payload above, and the NULL
    # it yields here is treated as a framing failure explicitly).
    if suite.max_interior_eos is not None and suite.eos_id is None:
        raise ValueError("max_interior_eos requires eos_id")
    if suite.bos_id is not None:
        first = F.get(tokens, 0)
        checks.append(
            Check(
                "missing_bos",
                first.isNull() | (first != F.lit(int(suite.bos_id))),
                F.concat(
                    F.lit("first token "),
                    F.coalesce(first.cast("string"), F.lit("NULL")),
                    F.lit(f" != bos {int(suite.bos_id)}"),
                ),
            )
        )
    if suite.eos_id is not None:
        last = F.get(tokens, F.size(tokens) - 1)
        checks.append(
            Check(
                "missing_eos",
                last.isNull() | (last != F.lit(int(suite.eos_id))),
                F.concat(
                    F.lit("last token "),
                    F.coalesce(last.cast("string"), F.lit("NULL")),
                    F.lit(f" != eos {int(suite.eos_id)}"),
                ),
            )
        )
        if suite.max_interior_eos is not None:
            interior = F.slice(tokens, 1, F.greatest(F.size(tokens) - 1, F.lit(0)))
            n_int = F.size(
                F.filter(interior, lambda t: t == F.lit(int(suite.eos_id)))
            )
            checks.append(
                Check(
                    "excess_interior_eos",
                    n_int > F.lit(int(suite.max_interior_eos)),
                    F.concat(
                        F.lit("interior eos count "),
                        n_int.cast("string"),
                        F.lit(f" > {int(suite.max_interior_eos)}"),
                    ),
                )
            )
    checks += [
        Check(
            "too_short",
            n_tok < min_b,
            F.concat(F.lit("n_tok="), n_tok.cast("string"), F.lit(" < "), min_b.cast("string")),
        ),
        Check(
            "too_long",
            n_tok > max_b,
            F.concat(F.lit("n_tok="), n_tok.cast("string"), F.lit(" > "), max_b.cast("string")),
        ),
    ]
    # Token-level degeneracy (suite-gated, default off): the Gopher
    # repetition rule on the token payload — see
    # quality.token_degeneracy_checks. Signals are inlined as per-row
    # expressions so the cascade stays a single narrow projection.
    if suite.min_distinct_frac is not None:
        from .quality import distinct_frac_expr

        df_sig = distinct_frac_expr(tokens)
        checks.append(
            Check(
                "low_distinct_frac",
                df_sig < F.lit(float(suite.min_distinct_frac)),
                F.format_string(
                    f"distinct_frac=%.4f < {float(suite.min_distinct_frac)}", df_sig
                ),
            )
        )
    if suite.max_token_run is not None:
        from .quality import max_token_run_expr

        run_sig = max_token_run_expr(tokens)
        checks.append(
            Check(
                "long_token_run",
                run_sig > F.lit(int(suite.max_token_run)),
                F.concat(
                    F.lit("max_token_run="),
                    run_sig.cast("string"),
                    F.lit(f" > {int(suite.max_token_run)}"),
                ),
            )
        )
    if suite.banned_tokens:
        banned = F.array([F.lit(int(t)) for t in suite.banned_tokens])
        lo, hi = min(suite.banned_tokens), max(suite.banned_tokens)
        # Range prefilter before the set probe: most tokens fail the two
        # comparisons and never reach the |banned|-way contains — ~3.4×
        # cheaper than arrays_overlap on 1k-token rows (measured at 2M
        # rows: 25.1s → 7.4s), identical semantics for any banned set.
        in_banned = lambda t: (t >= F.lit(lo)) & (t <= F.lit(hi)) & F.array_contains(banned, t)
        first_banned = F.element_at(F.filter(tokens, in_banned), 1)
        # Row-level prefilter BEFORE the per-element HOF: exists() is
        # an interpreted lambda per element (the Catalyst HOF trap —
        # at 2M rows × ~1k tokens it was ~3s of the cascade stage);
        # array_max is a single non-HOF pass, and a row can only
        # contain a banned token if its max token reaches the banned
        # range's floor. Necessary condition for ANY banned set, so
        # exists() runs on just the prefiltered rows (0.2% on the
        # bench fixture). NULL/empty token arrays: array_max yields
        # NULL → otherwise(False), exactly what coalesce(exists, False)
        # produced before.
        has_banned = F.when(
            F.array_max(tokens) >= F.lit(lo), F.exists(tokens, in_banned)
        ).otherwise(F.lit(False))
        checks.append(
            Check(
                "banned_token",
                has_banned,
                F.concat(F.lit("banned token "), first_banned.cast("string")),
            )
        )
    if suite.allowed_sources:
        checks.append(
            Check(
                "unknown_source",
                ~source.isin(list(suite.allowed_sources)),
                F.concat(F.lit("source "), source, F.lit(" not in allowed set")),
            )
        )
    # Declarative user checks (suite.custom_checks): arbitrary SQL
    # boolean predicates over the row, TRUE = fail. Appended LAST so
    # built-in semantics keep precedence in first-fail reporting; a
    # NULL predicate result is NOT a failure (three-valued SQL
    # semantics — an expression that can't decide shouldn't flag the
    # row; users who want NULL-fails write `x IS NULL OR ...`
    # explicitly, matching how the built-ins spell it out). Stays pure
    # Catalyst: F.expr compiles into the same single narrow projection
    # as every built-in — no UDF, no extra scan.
    if suite.custom_checks:
        reserved = {c.name for c in checks} | {"duplicate_key"}
        for name, expr in suite.custom_checks:
            if name in reserved:
                raise ValueError(
                    f"custom check name {name!r} collides with a "
                    "built-in check"
                )
            reserved.add(name)
            checks.append(
                Check(
                    name,
                    F.coalesce(F.expr(expr), F.lit(False)),
                    F.lit(f"custom: {expr}"),
                )
            )
    return checks


def scored_checks(suite: CheckSuite) -> list[Check]:
    """F7-F9 — thresholds over enrichment scores (reference:
    processor.py:121-135).

    Exact reference semantics: strict ``<=`` (a score of exactly
    min_score FAILS — settings.py:15, asserted
    tests/test_processor.py:155-168) and NULL scores FAIL (``score is
    None or score <= min_score``). F9 degraded mode: when the scorer is
    unavailable (``credits_available=False``, processor.py:34-35,
    121-122) the score checks are NOT part of the suite — rows pass
    with NULL scores (tests/test_processor.py:410-475). Returned empty
    here so callers concatenate ``sequence_checks + scored_checks``.
    """
    if not suite.scorer_available:
        return []
    score, alt = F.col("score"), F.col("score_alt")
    return [
        Check(
            "low_score",
            score.isNull() | (score <= suite.min_score),
            F.concat(
                F.lit("score "),
                F.coalesce(score.cast("string"), F.lit("NULL")),
                F.lit(f" <= {suite.min_score}"),
            ),
        ),
        Check(
            "low_score_alt",
            alt.isNull() | (alt <= suite.min_score_alt),
            F.concat(
                F.lit("score_alt "),
                F.coalesce(alt.cast("string"), F.lit("NULL")),
                F.lit(f" <= {suite.min_score_alt}"),
            ),
        ),
    ]


def apply_cascade(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Annotate ``df`` with verdict / first-fail / reason / all-failed.

    One narrow stage — no shuffle, no UDF. NULL predicate results
    count as "did not fail" except where a check's predicate explicitly
    tests for NULL (reference: `not message.text` treats None and ''
    the same, processor.py:98).

    Each predicate is materialized ONCE as a boolean flag column and
    the verdict/first-fail/reason expressions reference the flag — not
    the predicate. Inlining the predicate into the when-chains (and
    the downstream `WHERE first_fail IS NOT NULL`) re-evaluates every
    expensive array predicate up to 3× per row; Catalyst's
    CollapseProject keeps multiply-referenced non-cheap aliases in
    their own projection, so this structure pins one-eval-per-flag
    (measured 93.5s → ~30s on the 2M-row cascade).
    """
    flag_names = [f"_chk_{i}" for i in range(len(checks))]
    flagged = df.select(
        "*",
        *[
            F.coalesce(c.fails, F.lit(False)).alias(fn)
            for c, fn in zip(checks, flag_names)
        ],
    )
    fail_flags = [F.col(fn) for fn in flag_names]

    first_fail: Column = F.lit(None).cast("string")
    reason: Column = F.lit(None).cast("string")
    # Build the when-chain front-to-back so the FIRST failing check wins,
    # matching the reference's early-exit reason reporting.
    chain_name = None
    chain_reason = None
    for c, flag in zip(checks, fail_flags):
        if chain_name is None:
            chain_name = F.when(flag, F.lit(c.name))
            chain_reason = F.when(flag, c.reason)
        else:
            chain_name = chain_name.when(flag, F.lit(c.name))
            chain_reason = chain_reason.when(flag, c.reason)
    if chain_name is not None:
        first_fail = chain_name.otherwise(F.lit(None).cast("string"))
        reason = chain_reason.otherwise(F.lit(None).cast("string"))

    failed_all = F.array_compact(
        F.array(
            *[
                F.when(flag, F.lit(c.name)).otherwise(F.lit(None).cast("string"))
                for c, flag in zip(checks, fail_flags)
            ]
        )
    )
    verdict = ~F.coalesce(
        fail_flags[0] if len(fail_flags) == 1 else F.array_contains(F.array(*fail_flags), F.lit(True)),
        F.lit(False),
    )
    return (
        flagged.withColumn(FIRST_FAIL_COL, first_fail)
        .withColumn(REASON_COL, reason)
        .withColumn(FAILED_ALL_COL, failed_all)
        .withColumn(VERDICT_COL, verdict)
        .drop(*flag_names)
    )


def violations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Materialized violation rows (schema.VIOLATIONS).

    The reference only *logs* failures (processor.py:98-134); the engine
    materializes them with the first-failing reason. ``tokens`` rides
    along for the token-array-equality invariant.
    """
    annotated = apply_cascade(df, checks)
    out_cols = [
        F.col("doc_id"),
        F.col("source"),
        F.col(FIRST_FAIL_COL).alias("check_name"),
        F.col(REASON_COL).alias("reason"),
    ]
    if "tokens" in df.columns:
        out_cols.append(F.col("tokens"))
    else:
        out_cols.append(F.lit(None).cast("array<int>").alias("tokens"))
    return annotated.where(F.col(FIRST_FAIL_COL).isNotNull()).select(*out_cols)
