"""Continuous corpus ingestion — the incremental prep pipeline as a
Structured Streaming sink.

New document snapshots land in a drop directory; each micro-batch runs
:func:`pipeline.prep_batch` (quality gate → dedup vs the stored MinHash
index → tokenize → split → pack → index append), so the prepared
corpus warehouse grows continuously and every batch dedups against
everything ingested before it. Reference analogue: the incremental
channel fetch loop (processor.py:41-63) — new rows only, resumed by a
stored high-water mark — applied to corpus prep.

Exactly-once story (two independent layers, both needed):
* the file source's checkpoint guarantees each input FILE is offered
  to foreachBatch once per committed batch — but a crash between sink
  completion and checkpoint commit REPLAYS the batch;
* ``prep_batch`` is replay-idempotent on its own: every write lands in
  a per-batch directory keyed by the batch's CONTENT digest (overwrite
  semantics), and the completion ledger is written last — a replayed
  micro-batch either fast-skips (ledger present) or rewrites its own
  directories byte-identically (ledger absent after a mid-batch kill).
  Pinned in tests/test_streaming_multimodal.py.

Scale: per micro-batch the corpus-sized state is touched ONLY through
the pre-bucketed index equi-join (operators/dedup.py:326); everything
else is proportional to the batch. The micro-batch is persisted for
the duration of the sink call — prep_batch runs several actions over
it, and a file-source batch would otherwise re-scan its input files
per action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import pipeline


def prep_sink(output_path: str, **prep_kwargs):
    """foreachBatch body: run the idempotent incremental prep over one
    micro-batch of new documents."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            pipeline.prep_batch(
                batch.sparkSession,
                batch,
                output_path,
                run_id=f"stream_b{batch_id}",
                **prep_kwargs,
            )
        finally:
            batch.unpersist()

    return sink


def start_prep_ingest(
    spark: SparkSession,
    stream: DataFrame,
    output_path: str,
    checkpoint: str,
    **prep_kwargs,
):
    """Wire a document stream into a prep_corpus warehouse."""
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(prep_sink(output_path, **prep_kwargs))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
