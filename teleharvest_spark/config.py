"""Declarative check-suite configuration.

Reference analogue: pydantic Settings (settings.py:8-62) — thresholds
``limit=1000, min_views=50, min_len=200, min_er=0.025, min_score=80,
min_score_alt=85`` plus comma-split stop-word / channel lists. Here the
suite is a frozen dataclass; ``suite_hash`` feeds the checkpoint
manifest so a threshold change invalidates prior verdicts.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, asdict, fields


@dataclass(frozen=True)
class CheckSuite:
    """Thresholds + dimensions for one validation run."""

    # Row-level cascade (reference: processor.py:97-135).
    min_n_tok: int = 16          # min_len=200 analogue (settings.py:13)
    max_n_tok: int = 8192
    banned_tokens: tuple[int, ...] = ()   # stop words (settings.py:17-21)
    allowed_sources: tuple[str, ...] = () # channels (settings.py:32-34)

    # Token-domain checks (no reference analogue — the north-rule
    # payload is pre-tokenized ids, so a validation engine must be able
    # to assert the id domain). Both default OFF: enabling either is a
    # suite change and re-queues every manifest partition via
    # suite_hash, exactly like a threshold change.
    vocab_size: int | None = None   # ids must lie in [0, vocab_size)
    forbid_null_token: bool = False # NULL elements inside tokens fail
    # Token-level degeneracy gate (quality.token_degeneracy_signals):
    # a sequence fails when its distinct-token fraction is below
    # min_distinct_frac or its longest same-token run exceeds
    # max_token_run. None disables the check entirely.
    min_distinct_frac: float | None = None
    max_token_run: int | None = None
    # Sequence-framing checks (no reference analogue — pre-tokenized
    # training sequences carry special-token framing contracts): with
    # bos_id set every sequence must BEGIN with that id; with eos_id
    # set it must END with it; max_interior_eos bounds how many EOS
    # tokens may appear BEFORE the final position (packed sequences
    # use interior EOS as document separators — 0 forbids packing
    # artifacts outright, None leaves interior EOS unchecked).
    # max_interior_eos requires eos_id. All default off.
    bos_id: int | None = None
    eos_id: int | None = None
    max_interior_eos: int | None = None

    # Per-partition stats thresholds (north_rule single-pass aggregate).
    max_null_rate: float = 0.01
    max_dup_rate: float = 0.0
    # Drift thresholds (KS on n_tok ECDF, PSI on token histogram).
    max_ks: float = 0.15
    max_psi: float = 0.25

    # Degraded mode: skip enrichment-dependent checks, rows still pass
    # with NULL enrichment columns (reference F9: processor.py:121-122,
    # tests/test_processor.py:410-475).
    scorer_available: bool = True
    min_score: int = 80          # strict <=: exactly 80 fails (processor.py:125)
    min_score_alt: int = 85

    # F6 engagement-rate check (processor.py:116-119, settings.py:12-14):
    # fail when er < min_er AND views > min_views AND NOT is_latest.
    min_er: float = 0.025
    min_views: int = 50

    # Violation tolerance (no reference analogue — the reference fails
    # a batch on any violation, which this default reproduces; at
    # 10^12 rows a partition-level verdict usually wants "fail when
    # MORE THAN x% of rows violate", the Deequ/Great-Expectations
    # assertion shape). A partition fails the violation clause when ANY
    # check's violation-row count exceeds its tolerated fraction of the
    # partition's rows (strict >: a frac exactly at the tolerance
    # passes). check_tolerances overrides the global fraction for the
    # named checks only. Row-level certification (--emit-valid) is
    # unaffected: a tolerated row is still a violation and is never
    # certified. Both default to the strict semantics, so existing
    # suite hashes are stable.
    max_violation_frac: float = 0.0
    check_tolerances: tuple[tuple[str, float], ...] = ()

    # Declarative user checks (no reference analogue): (name, sql_expr)
    # pairs appended after every built-in; a row FAILS when the boolean
    # SQL expression is TRUE (NULL result = pass — three-valued SQL).
    # Compiled via F.expr into the same single-scan cascade projection,
    # and hashed into suite_hash like any threshold, so adding or
    # editing one re-queues every manifest partition.
    custom_checks: tuple[tuple[str, str], ...] = ()

    # Declarative PARTITION-level assertions (no reference analogue —
    # the aggregate-side twin of custom_checks): (name, sql_expr) pairs
    # evaluated over each partition's STATS row (columns: row_count,
    # null_tokens, null_n_tok, min_n_tok, max_n_tok, avg_n_tok,
    # ntok_quantiles array, approx_distinct_doc_id, total_tokens,
    # null_rate). TRUE fails the partition, NULL passes (three-valued
    # SQL, same contract as custom_checks); names land in
    # failed_stat_checks after the built-ins; collisions with built-in
    # stat-check names raise. Evaluated over |partitions| rows — zero
    # data-scan cost. Hashed into suite_hash like any threshold.
    stat_checks: tuple[tuple[str, str], ...] = ()

    # Late-data lookback depth (reference: PROCESSOR_LIMIT, settings.py:11).
    lookback_limit: int = 1000

    # Similarity / near-dup knobs.
    minhash_perms: int = 64
    minhash_bands: int = 16
    shingle_k: int = 5
    neardup_jaccard: float = 0.8

    def suite_hash(self) -> str:
        """Stable hash of every NON-DEFAULT threshold — manifest
        lineage key.

        Default-valued fields are excluded so that ADDING a new suite
        field in a later release does not change the hash of every
        existing suite — which would anti-join-miss every stored
        manifest row and re-validate the whole (nominally 100 TB)
        warehouse on upgrade. The contract this relies on: new checks
        MUST default to disabled/no-op (vocab_size=None,
        forbid_null_token=False, ...), so a default value always means
        "semantics unchanged". Changing an EXISTING default is still a
        semantics change and must be treated as a suite change (the
        field now hashes for suites pinning the old value, and the
        release notes re-queue the rest).
        """
        defaults = {f.name: f.default for f in fields(self)}
        payload = json.dumps(
            {k: v for k, v in asdict(self).items() if v != defaults[k]},
            sort_keys=True,
            default=list,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_SUITE = CheckSuite()
