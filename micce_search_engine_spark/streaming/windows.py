"""Event-time windowed aggregation with a watermark (Structured
Streaming breadth beyond the reference: the reference processes events
in arrival order with no time-based aggregation — SURVEY.md §2D — but
a web-scale ingest pipeline wants per-window rollups with bounded
state, so this is a first-class operator here).

``windowed_event_counts`` reads an events directory as a stream,
applies ``withWatermark`` (bounds state: windows older than the
watermark are eligible for eviction; late rows beyond it are dropped
in append/update modes) and a tumbling ``window(ts, ...)`` group-by.
The one-shot drain uses availableNow + a complete-mode memory sink so
the result equals the batch GROUP BY over the same files — which is
exactly what the DuckDB oracle checks (time_bucket equivalence).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    schema,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Drain ``events_dir`` through a watermarked tumbling-window count;
    returns (window_start, <key_col>, n)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"winagg_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), key_col, "n"
    )
