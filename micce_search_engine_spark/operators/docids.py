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


def url_id_map(pages: DataFrame, num_partitions: int | None = None) -> tuple[DataFrame, int]:
    """(url -> doc_id) map + total row count, without joining it back.

    Rank ONLY the key column: the range shuffle and sampling pass touch
    a single pruned string column, never the payload. The count comes
    free from the per-partition size pass."""
    spark = pages.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
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
    return ids, acc


#: id maps up to this many rows are broadcast to every consumer instead
#: of shuffle-joined (~70 B/row -> <=140 MB broadcast)
BROADCAST_IDS_MAX = 2_000_000


def assign_doc_ids(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    ids, total = url_id_map(pages, num_partitions)
    if total <= BROADCAST_IDS_MAX:
        # map-side join: no shuffle of the payload columns at all
        return pages.join(F.broadcast(ids), "url")
    return pages.join(ids, "url")
