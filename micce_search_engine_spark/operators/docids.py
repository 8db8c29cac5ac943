"""Deterministic, parallelism-independent docID assignment.

Rank-identical results across N and 4N executors (BASELINE.json
north_rule) require a doc order that does not depend on partitioning.
``doc_id`` is defined as the global rank of the unique ``url`` key
(the reference's document key, spot_id — spot.sd:3-7), 0-based.

NOT ``monotonically_increasing_id()`` (varies with partitioning) and
NOT a single-partition ``Window.orderBy`` (doesn't scale): instead a
scalable two-pass scheme — range-partition by url, sort within
partitions, count per partition, broadcast the tiny cumulative-offset
table, and add the per-partition local rank. Every pass is distributed;
driver state is one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    spark = pages.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Rank ONLY the key column: the range shuffle and sampling pass then
    # touch a single pruned string column, never the html payload; the
    # final equi-join moves full rows exactly once (and goes broadcast
    # when the id map is small enough).
    parts = (
        pages.select("url")
        .repartitionByRange(n, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
    )
    # Cache so the partition ids seen by the count pass and the rank pass
    # are identical (range boundaries come from sampling).
    parts = parts.persist()
    counts = parts.groupBy("_pid").count().collect()
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid INT, _offset LONG"
        )
    )
    w = Window.partitionBy("_pid").orderBy("url")
    ids = (
        parts.join(offsets_df, "_pid")
        .withColumn("doc_id", F.col("_offset") + F.row_number().over(w) - F.lit(1))
        .select("url", "doc_id")
    )
    return pages.join(ids, "url")
