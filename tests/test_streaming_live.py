"""Streaming incremental indexing: update files -> checkpointed
micro-batches -> apply_upsert -> queryable index; replay-safe.
Plus the persisted LSH ANN index (partition-pruned probes)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema
from micce_search_engine_spark.operators.index_build import build_index
from micce_search_engine_spark.operators.query import SearchEngine
from micce_search_engine_spark.oracle import BruteForceBM25
from micce_search_engine_spark.streaming.live_index import (
    init_pages_store,
    run_live_index_once,
)


def test_live_index_stream(spark, tmp_path):
    base = str(tmp_path)
    pdf = gen_pages(120, seed=31)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    pages_path = os.path.join(base, "pages")
    init_pages_store(spark, pages, pages_path, n_buckets=8)
    idx = os.path.join(base, "idx")
    build_index(
        spark, pages, idx, n_buckets=4, max_postings_per_row=10**9,
        docs_per_bucket=50,
    )

    updates_dir = os.path.join(base, "updates")
    os.makedirs(updates_dir)
    upd1 = spark.createDataFrame(
        [
            (pdf.url[0], "streamed replacement alpha beta", None, None, "en"),
            ("https://zz.example/new0", "fresh streaming doc alpha", None, None, "en"),
        ],
        "url string, text string, warc_ts timestamp, html binary, lang string",
    )
    upd1.select("url", "warc_ts", "html", "text", "lang").write.mode("append").parquet(
        updates_dir
    )
    ckpt = os.path.join(base, "ckpt")
    n = run_live_index_once(spark, updates_dir, idx, pages_path, ckpt)
    assert n >= 1

    # second drain with no new files: checkpoint skips everything
    assert run_live_index_once(spark, updates_dir, idx, pages_path, ckpt) == 0

    # a second batch file arrives
    upd2 = spark.createDataFrame(
        [("https://zz.example/new1", "another streamed gamma doc", None, None, "de")],
        "url string, text string, warc_ts timestamp, html binary, lang string",
    )
    upd2.select("url", "warc_ts", "html", "text", "lang").write.mode("append").parquet(
        updates_dir
    )
    assert run_live_index_once(spark, updates_dir, idx, pages_path, ckpt) == 1

    # final index state == batch oracle over the merged corpus
    merged_pdf = spark.read.parquet(pages_path).select("url", "text", "lang").toPandas()
    assert len(merged_pdf) == 122
    eng = SearchEngine(spark, idx)
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    url_of = {r["doc_id"]: r["url"] for r in docs.collect()}
    oracle = BruteForceBM25(merged_pdf)
    for q in ["alpha", "streaming", "gamma", "the"]:
        got = eng.search(q, limit=10, page=1)
        exp = oracle.search(q, limit=10, page=1)
        assert got["total_hits"] == exp["total_hits"], q
        got_urls = sorted((url_of[d], s) for d, s in got["results"])
        exp_urls = sorted((oracle.urls[d], s) for d, s in exp["results"])
        assert got_urls == exp_urls, q


def test_preload_engine_same_results(spark, tiny_index, synonyms):
    cold = SearchEngine(spark, tiny_index, synonyms=synonyms)
    hot = SearchEngine(spark, tiny_index, synonyms=synonyms, preload=True)
    for q, lf in [("the", None), ("w000002", "ja"), ("alias0", None)]:
        a = cold.search(q, lang_filter=lf, limit=10, page=1)
        b = hot.search(q, lang_filter=lf, limit=10, page=1)
        assert a == b, q


def test_ann_persisted_index(spark, tmp_path):
    import numpy as np

    from micce_search_engine_spark.operators.ann import (
        build_ann_index,
        lsh_topk,
        lsh_topk_indexed,
    )

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(1, 300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = str(tmp_path / "annidx")
    build_ann_index(df, out, dim=16)
    q = rows[5][1]
    direct = [(r["vec_id"], round(r["cosine"], 9)) for r in lsh_topk(df, q, dim=16).collect()]
    indexed = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in lsh_topk_indexed(spark, out, q).collect()
    ]
    assert direct == indexed
    # partition pruning: the physical plan must carry a bucket filter
    plan = lsh_topk_indexed(spark, out, q)._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_windowed_event_counts_equals_batch(spark, tmp_path):
    """Watermarked streaming window agg == batch GROUP BY time bucket."""
    import pandas as pd

    from micce_search_engine_spark.streaming.windows import windowed_event_counts

    rows = []
    base = pd.Timestamp("2024-03-01T00:00:00")
    for i in range(500):
        rows.append((i, f"t{i % 3}", (base + pd.Timedelta(seconds=i * 97)).to_pydatetime()))
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    d = str(tmp_path / "ev")
    df.write.parquet(d)
    got = windowed_event_counts(spark, d, df.schema, window="10 minutes")
    batch = (
        df.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_ivf_topk_deterministic_and_sane(spark):
    import numpy as np

    from micce_search_engine_spark.operators.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    base = rng.standard_normal(12)
    rows = []
    for i in range(1, 150):
        noise = rng.standard_normal(12) * (0.05 if i <= 5 else 1.0)
        rows.append((i, [float(x) for x in base + noise]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [v for _, v in rows[:8]]
    q = [float(x) for x in base]
    a = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf_topk(df, q, cents, k=5, n_probes=5).collect()]
    b = [(r["vec_id"], round(r["cosine"], 9)) for r in ivf_topk(df, q, cents, k=5, n_probes=5).collect()]
    assert a == b and len(a) == 5
    exact = {r["vec_id"] for r in brute_force_topk(df, q, k=5).collect()}
    # centroid 1..5 ARE the planted neighbors; probing their lists must recover most
    assert len({v for v, _ in a} & exact) >= 4
