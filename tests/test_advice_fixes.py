"""Regression tests for the round-1 ADVICE findings:
short-doc shingle crash, null-text insert in apply_upsert, stale
__old__ dir wedging _atomic_overwrite, and latest-status (not
lexicographic-max) manifest lineage."""

import os
import time

from pyspark.sql import functions as F

from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema
from micce_search_engine_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from micce_search_engine_spark.operators.index_build import build_index
from micce_search_engine_spark.operators.upsert import _atomic_overwrite, apply_upsert
from micce_search_engine_spark.plans.manifest import COMPLETED, PROCESSING, Manifest


def test_shingles_short_docs(spark):
    """Docs with <n tokens (incl. empty/null) yield zero shingles, no crash."""
    df = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "one"),
            (3, "one two"),
            (4, "one two three"),
            (5, "one two three four"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in shingles(df, n=3).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == {4: 1, 5: 2}  # short docs absent entirely


def test_dedup_ops_survive_fixture_corpus(spark):
    """gen_pages emits 2% empty / 1% null texts — dedup ops must not crash."""
    pages = spark.createDataFrame(gen_pages(300, seed=7), schema=pages_spark_schema())
    docs = pages.select(F.monotonically_increasing_id().alias("doc_id"), "text")
    # doc_id only needs uniqueness here, not determinism
    assert ngram_jaccard_pairs(docs, threshold=0.9, max_shingle_df=10**9).count() >= 0
    assert minhash_lsh_pairs(docs, threshold=0.9).count() >= 0


def test_upsert_inserts_null_text_url(spark, tmp_path):
    idx = str(tmp_path / "idx")
    pdf = gen_pages(50, seed=3)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(spark, pages, idx, n_buckets=4, max_postings_per_row=10**9)
    updates = spark.createDataFrame(
        [("https://zz.example/nulltext", None, "en")],
        "url string, text string, lang string",
    )
    apply_upsert(spark, idx, pages, updates)
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    assert docs.count() == 51
    assert docs.filter(F.col("doc_id").isNull()).count() == 0
    assert docs.select("doc_id").distinct().count() == 51
    row = docs.filter(F.col("url") == "https://zz.example/nulltext").collect()[0]
    assert row["doc_id"] == 50 and row["dl"] == 0


def test_atomic_overwrite_clears_stale_old_dir(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1,)], "x long")
    _atomic_overwrite(df, path)
    os.makedirs(path + ".__old__")  # simulate crash between the two renames
    _atomic_overwrite(spark.createDataFrame([(2,)], "x long"), path)
    assert [r["x"] for r in spark.read.parquet(path).collect()] == [2]
    assert not os.path.exists(path + ".__old__")


def test_manifest_latest_status_not_lexicographic(spark, tmp_path):
    m = Manifest(str(tmp_path))
    m.mark("S1", PROCESSING)
    time.sleep(0.002)
    m.mark("S1", COMPLETED)  # lexicographically SMALLER than PROCESSING
    assert m.stage_status("S1") == COMPLETED
    df = spark.createDataFrame(m.read())
    latest = (
        df.filter(F.col("partition_id") == -1)
        .groupBy("stage")
        .agg(F.max_by("status", "updated_at").alias("final_status"))
        .collect()
    )
    assert latest[0]["final_status"] == COMPLETED
