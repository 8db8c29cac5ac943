"""Synonym dictionary: CSV -> broadcast exact-key map.

Reference: a 2-column headerless CSV split on ',' and loaded into a
bbolt B+tree for exact-key lookup
(/root/reference/synonym-data-generator/internal/bboltRepository.go:49-82,
/root/reference/synonym-data-generator/dict/synonym.csv:1-4,
/root/reference/search-api/internal/repository/bboltRepository.go:56-64).

In Spark the dictionary is tiny: read it once, collect to the driver,
and broadcast — query compilation does exact-key lookups against the
broadcast map (P14 / Q7 in SURVEY.md §2)."""

from __future__ import annotations

import csv
import io

from pyspark.sql import SparkSession


def load_synonyms_csv(spark: SparkSession, path: str) -> dict[str, str]:
    df = spark.read.csv(path, header=False).toDF("key", "value")
    return {r["key"]: r["value"] for r in df.collect() if r["key"] is not None}


def write_synonyms_csv(rows: list[tuple[str, str]], path: str) -> None:
    buf = io.StringIO()
    w = csv.writer(buf)
    for k, v in rows:
        w.writerow([k, v])
    with open(path, "w") as f:
        f.write(buf.getvalue())
