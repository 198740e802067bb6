"""Streaming frequent-items: per-key Misra-Gries state over a stream.

The continuous form of ``operators/sketch.py``: each grouping key
(``source``) carries ONE bounded MG summary in
``applyInPandasWithState`` state — ≤ capacity (token, est) pairs plus
two scalars — regardless of how long the stream runs. Every trigger
that touches a key re-emits that key's current top-k with the same
deterministic bounds as the batch operator (est_lo ≤ true ≤ est_lo +
err_bound over everything ingested so far).

Reference analogue: none (the reference is batch-incremental,
SURVEY.md §2.8); this is the streaming twin of the engine's sketch
family, same state-bounding contract as the windowed drift sink
(streaming/drift.py) — state size is parameter-bounded, never
row-volume-bounded.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import _batch_counts, _fold


def _hh_update_fn(key: str, tokens_col: str, capacity: int, k: int):
    """The per-key state-update function, factored to module level so
    the drain edge can be pinned with a fake GroupState (the streaming
    harness is too slow to exercise every branch end-to-end)."""

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            toks, ests, dec, n_obs = state.get
            acc: pd.Series | None = (
                pd.Series(
                    np.asarray(ests, dtype=np.int64),
                    index=np.asarray(toks, dtype=np.int64),
                )
                if len(toks)
                else None
            )
        else:
            acc, dec, n_obs = None, 0, 0
        for pdf in pdfs:
            counts = _batch_counts(pdf[tokens_col], flatten=True)
            if counts is None:
                continue
            n_obs += int(counts.sum())
            acc, d = _fold(acc, counts, capacity)
            dec += int(d)
        if acc is None or not len(acc):
            state.update(([], [], int(dec), int(n_obs)))
            # summary drained (all-equal-counts pressure edge): an
            # update-mode sink would otherwise retain the PREVIOUS
            # trigger's rows with stale bounds for a key that did
            # receive data — emit one NULL-token bounds row (the batch
            # operator's sentinel, streamed) so err_bound/n_obs stay
            # current downstream.
            if dec or n_obs:
                yield pd.DataFrame(
                    {
                        key: [key_tuple[0]],
                        "token": [None],
                        "est_lo": np.int64(0),
                        "est_hi": np.int64(dec),
                        "err_bound": np.int64(dec),
                        "n_obs": np.int64(n_obs),
                    }
                )
            return
        state.update(
            (
                [int(t) for t in acc.index],
                [int(v) for v in acc.to_numpy(dtype=np.int64)],
                int(dec),
                int(n_obs),
            )
        )
        # deterministic top-k: ties broken by ascending token id
        head = acc.sort_index().sort_values(ascending=False, kind="stable").head(k)
        est = head.to_numpy(dtype=np.int64)
        yield pd.DataFrame(
            {
                key: key_tuple[0],
                "token": head.index.to_numpy(dtype=np.int64),
                "est_lo": est,
                "est_hi": est + dec,
                "err_bound": np.int64(dec),
                "n_obs": np.int64(n_obs),
            }
        )

    return fn


def streaming_token_heavy_hitters(
    stream: DataFrame,
    key: str = "source",
    tokens_col: str = "tokens",
    capacity: int = 1024,
    k: int = 16,
) -> DataFrame:
    """Running per-``key`` top-k token ids over a token-array stream.

    Output rows per trigger: ``(key, token, est_lo, est_hi, err_bound,
    n_obs)`` — update semantics (a later trigger's rows for a key
    supersede earlier ones; a NULL ``token`` row is the drained-summary
    bounds sentinel). Arrays are flattened inside the Arrow kernel; the
    MG fold is shared verbatim with the batch operator so the guarantee
    can't fork. NULL array elements are filtered JVM-side before the
    Python boundary (the batch operator's int64-precision guard).
    """
    cleaned = stream.select(
        key,
        F.filter(F.col(tokens_col), lambda x: x.isNotNull()).alias(tokens_col),
    )
    out_schema = (
        f"{key} string, token long, est_lo long, est_hi long, "
        "err_bound long, n_obs long"
    )
    return cleaned.groupBy(key).applyInPandasWithState(
        _hh_update_fn(key, tokens_col, capacity, k),
        outputStructType=out_schema,
        stateStructType="toks array<long>, ests array<long>, dec long, n_obs long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
