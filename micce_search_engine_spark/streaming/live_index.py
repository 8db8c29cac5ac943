"""Streaming incremental indexing: feed micro-batches -> index upserts.

This closes the loop the reference runs in production: the indexer
consumes the 'index' Event Hub and idempotently upserts each document
into Vespa, committing the checkpoint only after success
(/root/reference/indexer/internal/service/index_service.go:130-172).

Spark-first equivalent: Structured Streaming over the updates landing
directory; each micro-batch is applied through
``operators.upsert.apply_upsert`` — the set-oriented MERGE +
affected-term delta rebuild — so after every epoch the on-disk index
(docs/terms/term_stats/segments) answers queries that include the new
documents. ``checkpointLocation`` makes replay after a crash
at-least-once, and ``apply_upsert`` is idempotent (re-applying the same
updates is a no-op), which together give effectively-once index state —
the same contract the reference builds from Event Hub checkpoints +
idempotent Vespa PUTs.

Scale note: one ``apply_upsert`` per micro-batch re-encodes only the
affected terms' buckets; throughput tuning is the trigger size
(``maxFilesPerTrigger``) — bigger batches amortize the per-epoch
aggregate passes, exactly like the reference's receive-batch of 20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from micce_search_engine_spark.corpus import pages_spark_schema
from micce_search_engine_spark.operators.upsert import apply_upsert
from micce_search_engine_spark.plans.manifest import COMPLETED, Manifest


def run_live_index_once(
    spark: SparkSession,
    updates_dir: str,
    index_dir: str,
    pages_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 20,
) -> int:
    """Drain pending update files through the incremental indexer.

    ``pages_path``: canonical pages parquet (rewritten atomically per
    epoch with the merged state). Returns epochs processed this run.
    """
    m = Manifest(index_dir)
    epochs = {"n": 0}

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        updates = batch_df.select("url", "text", "lang")
        if updates.isEmpty():
            return
        old_pages = spark.read.parquet(pages_path)
        merged = apply_upsert(spark, index_dir, old_pages, updates)
        from micce_search_engine_spark.operators.upsert import _atomic_overwrite

        _atomic_overwrite(merged, pages_path)
        m.mark(
            f"live_index_epoch_{epoch_id}",
            COMPLETED,
            rows_in=updates.count(),
        )
        epochs["n"] += 1

    stream = (
        spark.readStream.schema(pages_spark_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(updates_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return epochs["n"]
