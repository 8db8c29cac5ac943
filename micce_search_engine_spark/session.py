"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster; on a 1000-executor cluster the same code runs unchanged with
``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and AQE
coalescing the rest.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so executors can import it — the programmatic
    equivalent of ``spark-submit --py-files`` (BASELINE.json north_rule
    deployment mode). Cached per process."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "micce_search_engine_spark.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(
                        p,
                        os.path.join(
                            "micce_search_engine_spark",
                            os.path.relpath(p, pkg_dir),
                        ),
                    )
    return out


def get_spark(
    app_name: str = "micce-search-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if shuffle_partitions is None:
        # local[N] -> N; a real cluster would use 2-3x total cores.
        inner = master.split("[")[-1].rstrip("]")
        try:
            shuffle_partitions = int(inner)
        except ValueError:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # BYTES bound on Python-runner Arrow batches (Spark 4: batch
        # closes when EITHER limit hits). The grouped posting encoder
        # ships one row per (term,salt) group whose arrays hold up to
        # max_postings_per_row postings — at web scale most rows sit AT
        # that cap, so a records-only bound would admit multi-GB
        # batches (measured: a 1M-doc build OOMed a 8g heap exactly
        # there). 32 MB bounds executor batch memory independently of
        # row width at ANY scale; for narrow per-posting rows the
        # records bound still closes batches first, so nothing else
        # changes.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(_package_zip())
    return spark
