"""Batched external-scorer enrichment stage (U3/U4) — the reference's
OpenAI evaluate/improve loop re-expressed as an Arrow-batched
``mapInPandas`` stage with per-executor client init, bounded
exponential-backoff retry on rate limits, and a per-executor
request-rate cap.

Reference mapping (semantics, not code):

* ``services/openai_service.py:47-57`` ``get_evaluation`` — empty/NULL
  text scores NULL; the client parses the model's reply to float
  (quote-strip) and unparseable replies yield NULL.
* ``services/openai_service.py:62-67`` ``get_alt`` — rewrite the text;
  empty/NULL text yields NULL.
* ``processor.py:124-135`` — the rewrite + re-evaluation (``alt_text``
  / ``score_alt``) run ONLY for rows whose first score clears
  ``min_score`` (strict ``<=`` fails) — the lazy second call is a cost
  contract, not an optimization: at 10^12 rows the rewrite call volume
  is proportional to the *passing* fraction.
* ``services/openai_service.py:69-80`` ``check_credits_available`` —
  one driver-side probe before the run; an unavailable scorer flips
  the suite into degraded mode (F9: score checks excluded,
  processor.py:34-35, 121-122) instead of NULL-failing every row.

Why this shape at scale: each Python worker holds ONE client (created
lazily on first batch — the reference's per-run session), texts move
driver→executor as Arrow record batches (no per-row Python), and the
external service sees bounded, rate-capped, retried batch calls. The
swap point for a real LLM backend is :class:`Scorer` — implement
``score_batch`` / ``rewrite_batch`` / ``probe`` over your client and
pass a zero-arg factory; everything Spark-side stays unchanged.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "Scorer",
    "StubScorer",
    "RateLimited",
    "ScorerError",
    "score_stage",
    "probe_scorer",
]


class ScorerError(Exception):
    """Non-retryable scorer failure (reference: OpenAIError)."""


class RateLimited(ScorerError):
    """Retryable rate-limit signal (reference: RateLimitError). The
    stage backs off exponentially and re-issues the SAME batch."""


class Scorer:
    """Backend contract. Batch methods take a list of texts (``None``
    entries allowed — they MUST map to ``None`` outputs, mirroring the
    reference's empty-text short-circuit) and return an equal-length
    list."""

    def score_batch(self, texts: Sequence[str | None]) -> list[float | None]:
        raise NotImplementedError

    def rewrite_batch(self, texts: Sequence[str | None]) -> list[str | None]:
        raise NotImplementedError

    def probe(self) -> bool:
        """Cheap availability check (reference: a 1-token request)."""
        return True


def _stub_score(text: str | None) -> float | None:
    if not text:  # reference: `if not text: return None` (None and '')
        return None
    # deterministic, content-derived, spread over [0, 100] with one
    # decimal — stable across executors/runs (no RNG, no time)
    import zlib

    return (zlib.crc32(text.encode("utf-8")) % 1001) / 10.0


@dataclass
class StubScorer(Scorer):
    """Deterministic stand-in for the external LLM.

    * score: CRC-derived float in [0, 100] (one decimal), NULL for
      empty/NULL text — same domain as the reference's 0-100 rubric.
    * rewrite: whitespace-normalized text prefixed with ``improved: ``
      (deterministic, content-preserving enough that re-scoring it
      yields a different but stable number).
    * ``fail_every``: raise :class:`RateLimited` on every N-th
      ``score_batch`` call (per client instance) — exercises the
      backoff/retry path in tests without a real 429.
    * ``available``: what :meth:`probe` reports (drives F9 degraded
      mode end-to-end).
    """

    fail_every: int = 0
    available: bool = True
    calls: int = field(default=0, init=False)

    def score_batch(self, texts: Sequence[str | None]) -> list[float | None]:
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            raise RateLimited(f"stub rate limit on call {self.calls}")
        return [_stub_score(t) for t in texts]

    def rewrite_batch(self, texts: Sequence[str | None]) -> list[str | None]:
        return [
            ("improved: " + " ".join(t.split())) if t else None for t in texts
        ]

    def probe(self) -> bool:
        return self.available


# One client per (worker process, factory CONTENT): Spark reuses
# workers across tasks, but EVERY task deserializes its own fresh
# factory object — object-identity keying therefore missed on every
# task (one new client per task, entries never evicted: unbounded
# growth plus a fresh connection/auth per task, defeating the reuse
# this cache exists for). The key is the sha256 of the factory's
# cloudpickle bytes, recomputed per task (~µs): identical closures
# rehydrate to identical bytes within a worker, so tasks of one stage
# share one client, while two same-named factories with different
# captured configs serialize differently and never collide. The
# pickling cost scales with the factory's captured state (~µs for a
# config-sized closure; a factory capturing megabytes pays
# proportionally — keep heavyweight state inside the client, not the
# closure). Bounded LRU so a long-lived worker serving many distinct
# stages cannot grow without limit (evicted clients get an optional
# close() call); an unpicklable factory falls back to per-task
# construction (correct, just unshared).
_CLIENTS: OrderedDict = OrderedDict()
_CLIENTS_MAX = 16


def _client(factory: Callable[[], Scorer]) -> Scorer:
    import hashlib

    try:
        from pyspark import cloudpickle

        key = hashlib.sha256(cloudpickle.dumps(factory)).hexdigest()
    except Exception:
        return factory()
    hit = _CLIENTS.get(key)
    if hit is not None:
        _CLIENTS.move_to_end(key)
        return hit
    c = factory()
    _CLIENTS[key] = c
    while len(_CLIENTS) > _CLIENTS_MAX:
        _, evicted = _CLIENTS.popitem(last=False)
        # a real backend client may hold connections — give it a
        # shutdown hook instead of relying on GC (ADVICE r5); eviction
        # must never fail the scoring task over cleanup
        close = getattr(evicted, "close", None)
        if callable(close):
            try:
                close()
            except Exception:
                pass
    return c


def _call_with_retry(fn, texts, max_retries: int, base_backoff: float):
    attempt = 0
    while True:
        try:
            return fn(texts)
        except RateLimited:
            if attempt >= max_retries:
                # give up on THIS batch: NULL scores (rows then fail
                # F7 exactly as the reference's None evaluation does)
                # rather than killing a 10^12-row job on a hot quota
                return [None] * len(texts)
            time.sleep(base_backoff * (2**attempt))
            attempt += 1


class _RateGate:
    """Min-interval gate between external calls, per worker process."""

    def __init__(self, max_calls_per_sec: float | None):
        self.interval = 1.0 / max_calls_per_sec if max_calls_per_sec else 0.0
        self.last = 0.0

    def wait(self) -> None:
        if not self.interval:
            return
        now = time.monotonic()
        delta = self.interval - (now - self.last)
        if delta > 0:
            time.sleep(delta)
        self.last = time.monotonic()


def score_stage(
    df: DataFrame,
    scorer_factory: Callable[[], Scorer],
    text_col: str = "text",
    min_score: float | None = None,
    batch_size: int = 256,
    max_retries: int = 5,
    base_backoff: float = 0.05,
    max_calls_per_sec: float | None = None,
    with_alt: bool = True,
) -> DataFrame:
    """Enrich ``df`` with ``score`` (+ ``alt_text``/``score_alt``).

    One narrow ``mapInPandas`` stage — no shuffle; Arrow carries the
    text column to Python in record batches, the client is called in
    ``batch_size`` chunks behind the retry/rate gates, and (reference
    processor.py:124-135) the rewrite + re-score run only for the
    subset whose first score is strictly above ``min_score``. With
    ``min_score=None`` (or ``with_alt=False``) every/no row gets the
    second call respectively.

    Output schema = input columns + ``score:double`` and, when
    ``with_alt``, ``alt_text:string`` + ``score_alt:double`` — the
    exact columns :func:`cascade.scored_checks` (F7/F8) reads.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    # NEVER .add() onto df.schema — classic PySpark caches the
    # StructType on the DataFrame and add() mutates in place, silently
    # corrupting df.columns for every later use of df
    out_fields = list(df.schema.fields) + [StructField("score", DoubleType())]
    if with_alt:
        out_fields += [
            StructField("alt_text", StringType()),
            StructField("score_alt", DoubleType()),
        ]
    schema = StructType(out_fields)
    in_cols = df.columns
    if text_col not in in_cols:
        raise ValueError(f"text_col {text_col!r} not in {in_cols}")
    reserved = {"score"} | ({"alt_text", "score_alt"} if with_alt else set())
    clash = sorted(reserved & set(in_cols))
    if clash:
        # appending a second same-named StructField would fail (or
        # mis-bind) only at Arrow conversion time, deep in the job —
        # e.g. re-scoring an already-scored frame; fail at plan time
        raise ValueError(
            f"score_stage output column(s) {clash} already exist in the "
            "input — drop/rename them before re-scoring"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        client = _client(scorer_factory)
        gate = _RateGate(max_calls_per_sec)

        def scored(texts: list) -> list:
            out: list = []
            for i in range(0, len(texts), batch_size):
                gate.wait()
                out.extend(
                    _call_with_retry(
                        client.score_batch,
                        texts[i : i + batch_size],
                        max_retries,
                        base_backoff,
                    )
                )
            return out

        for pdf in batches:
            texts = [
                t if isinstance(t, str) else None for t in pdf[text_col]
            ]
            pdf = pdf.copy()
            pdf["score"] = pd.Series(
                scored(texts), index=pdf.index, dtype="float64"
            )
            if with_alt:
                if min_score is None:
                    idx = list(pdf.index)
                else:
                    s = pdf["score"]
                    idx = list(pdf.index[s.notna() & (s > float(min_score))])
                alts: list = [None] * len(pdf)
                alt_scores: list = [None] * len(pdf)
                if idx:
                    pos = {lab: i for i, lab in enumerate(pdf.index)}
                    sub = [texts[pos[lab]] for lab in idx]
                    rewritten: list = []
                    for i in range(0, len(sub), batch_size):
                        gate.wait()
                        rewritten.extend(
                            _call_with_retry(
                                client.rewrite_batch,
                                sub[i : i + batch_size],
                                max_retries,
                                base_backoff,
                            )
                        )
                    re_scores = scored(rewritten)
                    for lab, alt, sc in zip(idx, rewritten, re_scores):
                        alts[pos[lab]] = alt
                        alt_scores[pos[lab]] = sc
                pdf["alt_text"] = pd.Series(
                    alts, index=pdf.index, dtype="object"
                )
                pdf["score_alt"] = pd.Series(
                    alt_scores, index=pdf.index, dtype="float64"
                )
            yield pdf

    return df.mapInPandas(run, schema)


def probe_scorer(scorer_factory: Callable[[], Scorer]) -> bool:
    """Driver-side availability probe, once per run (reference
    ``async_init``, processor.py:34-35). ``False`` (or a probe that
    raises the scorer's own error types) → run degraded: callers set
    ``CheckSuite.scorer_available=False`` so F7/F8 drop out of the
    cascade instead of NULL-failing every row (F9)."""
    try:
        return bool(scorer_factory().probe())
    except ScorerError:
        return False
