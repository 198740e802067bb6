"""Streaming ingest + windowed validation counters.

The reference is batch-incremental, NOT streaming (SURVEY.md §2.8) —
its watermark semantics map to the batch manifest (plans/manifest.py).
This module exists for the continuous-ingest deployment mode: the same
check cascade run on a file stream with event-time windowed violation
counts. The cascade expressions are reused verbatim — one definition,
two execution modes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import CheckSuite
from ..operators import cascade
from ..schema import SEQUENCES


def stream_sequences(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of sequence parquet drops."""
    return spark.readStream.schema(SEQUENCES).parquet(path)


def streaming_violation_counts(
    stream: DataFrame,
    suite: CheckSuite,
    ts_col: str = "_ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Windowed per-check violation counts with late-data watermark.

    If the stream has no event-time column, a processing-time column is
    stamped at ingest — deterministic tests drive this with
    ``processAllAvailable`` on a static directory.
    """
    annotated = cascade.apply_cascade(
        stream.withColumn(ts_col, F.coalesce(F.col(ts_col) if ts_col in stream.columns else F.lit(None), F.current_timestamp())),
        cascade.sequence_checks(suite),
    )
    return (
        annotated.where(F.col(cascade.FIRST_FAIL_COL).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(cascade.FIRST_FAIL_COL).alias("check_name"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "_ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cross-microbatch key dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each key in state only
    until the event-time watermark passes it — the streaming form of
    the PK-uniqueness check (reference: duplicate insert rejected by
    the store, models/message.py:34-36) with state that does NOT grow
    with the corpus.
    """
    keys = keys or ["doc_id"]
    if ts_col not in stream.columns:
        stream = stream.withColumn(ts_col, F.current_timestamp())
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stateful_high_water(
    stream: DataFrame,
    key: str = "source",
    seq: str = "seq",
) -> DataFrame:
    """Custom stateful operator: per-key high-water-mark filter.

    The reference re-derives `min_id = get_last_message_id(channel)`
    per run and fetches only newer rows (processor.py:60-62,
    models/message.py:75-89). As a continuous operator, the watermark
    lives in ``applyInPandasWithState`` state: each key's group keeps
    ``last_seq``; rows with ``seq <= last_seq`` (replays / overlapping
    re-drops) are dropped, and the mark ratchets forward. Arrow-batched
    — the per-group work is a vectorized pandas filter, no per-row
    Python.

    Emit-once holds WITHIN a micro-batch too: an original and its
    re-drop often land in the same batch (both files present when an
    availableNow query starts), where both are above the STORED mark —
    filtering against that mark alone would emit every duplicate. A
    per-batch seen-set (bounded by the batch's distinct seqs, which
    are already materialized) drops intra-batch replays while genuine
    out-of-order rows above the stored mark still emit; NULL seqs are
    never treated as duplicates of each other.
    """

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        high = last
        seen: set = set()
        for pdf in pdfs:
            fresh = pdf if last is None else pdf[pdf[seq] > last]
            if len(fresh) and seen:
                fresh = fresh[~fresh[seq].isin(seen)]
            if len(fresh):
                dup = fresh[seq].duplicated(keep="first") & fresh[seq].notna()
                fresh = fresh[~dup]
            if len(fresh):
                seen.update(fresh[seq].dropna().tolist())
                mx = int(fresh[seq].max())
                high = mx if high is None else max(high, mx)
                yield fresh.assign(**{key: key_tuple[0]})
        if high is not None:
            state.update((high,))

    out_schema = ", ".join(
        f"{c} {t}" for c, t in stream.dtypes if c != key
    ) + f", {key} string"
    return (
        stream.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_seq long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "source",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich (or referentially check) a stream
    against a batch dimension table.

    The static side is RE-RESOLVED every microbatch — a dimension
    update (new allowed source, changed threshold row) takes effect on
    the next batch without restarting the query. Spark plans this as a
    stateless broadcast hash join per batch: no streaming state, no
    watermark needed (this is the streaming form of J3,
    reference processor.py:59 / settings.py:32-34).

    ``how='left'`` enriches; ``how='left_anti'`` yields the stream's
    referential VIOLATIONS (rows whose key is absent from the
    dimension); ``how='left_semi'`` keeps only known-key rows.
    """
    return stream.join(F.broadcast(dim), key, how)
