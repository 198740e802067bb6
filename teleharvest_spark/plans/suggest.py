"""Suite suggestion — profile the table once, bootstrap a CheckSuite.

The Deequ `ConstraintSuggestionRunner` / Great Expectations profiler
shape applied to the north-rule table: ONE single-pass aggregate over
(doc_id, tokens, n_tok, source) yields robust length bounds, the
observed token-id domain, null-element presence, degeneracy
percentiles and null rates; a second |sources|-bounded pass collects
the allowed-source set only when it is small enough to be a dimension.
The output is (a) a ready-to-run :class:`CheckSuite` and (b) the flat
JSON overrides dict that ``cli.build_suite`` accepts verbatim — so
``--suggest-suite out.json`` then ``--suite-json out.json`` closes the
bootstrap loop.

Suggestion policy (every threshold is a STARTING POINT for review, not
a verdict — the profile reflects the data as-is, including any
violations already in it):

* ``min_n_tok`` / ``max_n_tok`` — the p0.5 / p99.5 approx quantiles of
  observed ``n_tok`` with 25% headroom on the upper bound: bounds that
  would pass ~99% of today's data and flag new mass outside it.
* ``vocab_size`` — ``max(token id) + 1`` when every observed id is
  non-negative (ids are a contiguous-from-zero domain by convention);
  omitted when negative ids exist (the domain is not [0, v)).
* ``forbid_null_token`` — suggested exactly when NO null element was
  observed (the check would pass today and lock the invariant in).
* ``min_distinct_frac`` / ``max_token_run`` — p0.5 of the distinct
  fraction with 20% slack down, p99.5 of the longest run with 50%
  slack up: degeneracy gates calibrated to the corpus's own tail.
* ``max_null_rate`` — twice the observed null-payload rate (floor
  1e-4): today's rate passes with headroom; a doubling trips it.
* ``allowed_sources`` — the observed non-NULL/non-empty sources when
  there are at most ``source_cap`` of them; left open otherwise (a
  10^6-value key is not an enum dimension).
* ``banned_tokens`` stays empty — a ban list is domain knowledge, not
  a statistic.

Scale: the profile aggregate is map-side partial over one decode scan
(the same shape as stats.partition_stats); the only collect is one row
plus at most ``source_cap`` source names. No shuffle beyond the final
single-group aggregate.
"""

from __future__ import annotations

import math
from dataclasses import fields

from pyspark.sql import DataFrame, functions as F

from ..config import CheckSuite
from ..operators.quality import distinct_frac_expr, max_token_run_expr


def profile_table(df: DataFrame) -> dict:
    """One-pass profile row (plus a bounded source-set pass) as a dict."""
    tokens = F.col("tokens")
    has_null_el = F.when(
        tokens.isNotNull(), F.exists(tokens, lambda t: t.isNull())
    )
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(tokens.isNull().cast("long")).alias("null_tokens"),
        F.expr(
            "approx_percentile(n_tok, array(0.005, 0.995), 10000)"
        ).alias("ntok_q"),
        F.min("n_tok").alias("min_n_tok_obs"),
        F.max("n_tok").alias("max_n_tok_obs"),
        F.max(F.array_max(tokens)).alias("max_token_id"),
        F.min(F.array_min(tokens)).alias("min_token_id"),
        F.max(has_null_el.cast("int")).alias("has_null_element"),
        F.percentile_approx(
            distinct_frac_expr(tokens), F.lit(0.005), F.lit(10000)
        ).alias("distinct_frac_p005"),
        F.percentile_approx(
            max_token_run_expr(tokens), F.lit(0.995), F.lit(10000)
        ).alias("token_run_p995"),
        F.approx_count_distinct("source").alias("n_sources_approx"),
    ).first()
    return row.asDict()


def suggest_suite(
    df: DataFrame,
    source_cap: int = 100,
    base: CheckSuite | None = None,
    profile: dict | None = None,
) -> tuple[CheckSuite, dict]:
    """(suggested suite, flat JSON overrides) — see module docstring.

    ``base``: suite whose non-profiled fields (scores, drift
    thresholds, lookback) carry through unchanged; defaults to
    :class:`CheckSuite` defaults. ``profile``: a precomputed
    :func:`profile_table` row, to avoid re-scanning.
    """
    base = base or CheckSuite()
    prof = profile if profile is not None else profile_table(df)
    overrides: dict = {}

    q = prof["ntok_q"]
    if q and q[0] is not None:
        overrides["min_n_tok"] = max(1, int(q[0]))
        overrides["max_n_tok"] = int(math.ceil(q[1] * 1.25))
    if prof["max_token_id"] is not None and (
        prof["min_token_id"] is not None and prof["min_token_id"] >= 0
    ):
        overrides["vocab_size"] = int(prof["max_token_id"]) + 1
    overrides["forbid_null_token"] = prof["has_null_element"] in (0, None)
    if prof["distinct_frac_p005"] is not None:
        overrides["min_distinct_frac"] = round(
            float(prof["distinct_frac_p005"]) * 0.8, 4
        )
    if prof["token_run_p995"] is not None:
        overrides["max_token_run"] = int(
            math.ceil(float(prof["token_run_p995"]) * 1.5)
        )
    if prof["rows"]:
        observed_null = prof["null_tokens"] / prof["rows"]
        overrides["max_null_rate"] = round(max(2 * observed_null, 1e-4), 6)

    if prof["n_sources_approx"] <= source_cap * 1.1:
        srcs = sorted(
            r["source"]
            for r in df.select("source").distinct().collect()
            if r["source"] not in (None, "")
        )
        if len(srcs) <= source_cap:
            overrides["allowed_sources"] = tuple(srcs)

    suite = CheckSuite(
        **{
            **{
                f.name: getattr(base, f.name)
                for f in fields(CheckSuite)
            },
            **overrides,
        }
    )
    # JSON form: only the overrides (build_suite semantics), tuples as
    # lists via json default handling at the caller
    return suite, {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in overrides.items()
    }


def suggestion_report(df: DataFrame, source_cap: int = 100) -> dict:
    """CLI payload: the overrides plus the profile evidence."""
    prof = profile_table(df)
    suite, overrides = suggest_suite(df, source_cap=source_cap, profile=prof)
    prof = dict(prof)
    prof["ntok_q"] = list(prof["ntok_q"]) if prof["ntok_q"] else None
    return {
        "suite": overrides,
        "suite_hash": suite.suite_hash(),
        "evidence": prof,
    }
