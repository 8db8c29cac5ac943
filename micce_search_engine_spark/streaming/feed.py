"""Incremental feed: the streaming analog of the reader→indexer pipeline.

Reference pipeline (SURVEY.md §3.2-3.3): Event Hub 'pre' -> reader
(state rows READY, batch fetch from Firestore, republish) -> Event Hub
'index' -> indexer (idempotent Vespa upsert, state COMPLETED,
checkpoint commit). Two partitioned, checkpointed, at-least-once
micro-batch consumers.

Spark-first equivalent: a Structured Streaming file source over the
pages landing directory feeding ``foreachBatch``; each micro-batch
(a) MERGEs new/changed docs into the canonical pages table with
omit-nil semantics and (b) records per-batch lineage in the manifest.
``checkpointLocation`` gives exactly the reference's
checkpoint-after-success replay semantics
(/root/reference/reader/internal/service/read_service.go:154-163);
``maxFilesPerTrigger`` bounds in-flight work like the reference's
receive batch of 20 (/root/reference/.../read_service.go:29,93-99).

The full index delta-rebuild per batch is intentionally NOT wired in
here — at scale you accumulate merged batches and re-run the
resumable ``build_index`` on affected partitions (operators/upsert.py
computes the affected-term scope).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from micce_search_engine_spark.corpus import pages_spark_schema
from micce_search_engine_spark.plans.manifest import COMPLETED, Manifest


def run_feed_once(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 20,
) -> int:
    """Drain everything currently in ``landing_dir`` through a streaming
    query into parquet under ``out_dir`` (append), with checkpoint-
    resume. Returns number of batches processed this run."""
    m = Manifest(out_dir)
    batches = {"n": 0}

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.count()
        batch_df.write.mode("append").parquet(os.path.join(out_dir, "data"))
        m.mark(f"feed_epoch_{epoch_id}", COMPLETED, rows_in=rows, rows_out=rows)
        batches["n"] += 1

    stream = (
        spark.readStream.schema(pages_spark_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
