"""Batched multi-query BM25 evaluation — N queries in ONE DataFrame plan.

The reference answers one HTTP query at a time
(/root/reference/search-api/internal/repository/vespaRepository.go:21-40);
for offline evaluation at cluster scale the engine instead compiles a
whole query *set* into a single relational plan (SURVEY.md §2D
"window functions"):

  qterms(query_id, term, idf)  ⋈  decoded postings(term, doc_id, tf, dl)
    -> per-(query, doc) BM25 partial scores (native Column math)
    -> groupBy(query_id, doc_id): deterministic-order score sum
    -> branch AND/OR matching as a relational count-join (a doc matches
       a branch iff it contains ALL the branch's terms)
    -> optional per-query exact lang filter
    -> per-query total_hits + Window top-k (row_number over
       score DESC, doc_id ASC) with the reference's limit*page /
       offset=limit*(page-1) pagination quirk
       (/root/reference/search-api/internal/repository/query/queryBuilder.go:40-41,
        /root/reference/search-api/internal/presentation/model/response.go:40-42)

Everything after posting decode is plain Catalyst-optimized DataFrame
ops — broadcast joins for the (tiny) query tables, one shuffle for the
(query_id, doc_id) aggregation, one for the per-query window.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from micce_search_engine_spark import BM25_B, BM25_K1
from micce_search_engine_spark.operators.query import SearchEngine
from micce_search_engine_spark.oracle import expand_branches


def compile_query_tables(
    spark: SparkSession,
    queries: list[dict],
    synonyms: dict[str, str],
    idf_fn,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Driver-side compile: queries -> (qmeta, qbranch_terms, all_terms).

    ``queries``: [{query_id, query_text, lang_filter, limit, page}].
    Synonym expansion is an exact-key broadcast-dict lookup
    (/root/reference/search-api/internal/repository/bboltRepository.go:56-64).
    """
    qmeta_rows = []
    branch_rows = []
    terms: set[str] = set()
    for q in queries:
        branches = expand_branches(q["query_text"], synonyms)
        qmeta_rows.append(
            {
                "query_id": int(q["query_id"]),
                "lang_filter": q.get("lang_filter"),
                "limit": int(q["limit"]),
                "page": int(q["page"]),
                "n_branches": len(branches),
            }
        )
        for bi, b in enumerate(branches):
            for t in sorted(set(b)):
                branch_rows.append(
                    {
                        "query_id": int(q["query_id"]),
                        "branch_id": bi,
                        "branch_size": len(set(b)),
                        "term": t,
                    }
                )
                terms.add(t)
    all_terms = sorted(terms)
    idf = idf_fn(all_terms)
    qmeta = spark.createDataFrame(
        pd.DataFrame(qmeta_rows),
        "query_id long, lang_filter string, limit long, page long, n_branches int",
    )
    if branch_rows:
        bpdf = pd.DataFrame(branch_rows)
        bpdf["idf"] = bpdf["term"].map(idf)
        qbranch = spark.createDataFrame(
            bpdf, "query_id long, branch_id int, branch_size int, term string, idf double"
        )
    else:
        qbranch = spark.createDataFrame(
            [], "query_id long, branch_id int, branch_size int, term string, idf double"
        )
    return qmeta, qbranch, all_terms


def _branches_df(spark: SparkSession, queries: list[dict], synonyms) -> DataFrame:
    rows = [
        (int(q["query_id"]), expand_branches(q["query_text"], synonyms))
        for q in queries
    ]
    return spark.createDataFrame(
        rows, "query_id long, branches array<array<string>>"
    )


def search_batch(
    engine: SearchEngine,
    queries: list[dict],
) -> DataFrame:
    """Evaluate all queries; returns DataFrame
    (query_id, doc_id, score, rank, total_hits, last_page) — one row per
    returned hit, rank 1-based within the returned page."""
    spark = engine.spark
    qmeta, qbranch, all_terms = compile_query_tables(
        spark, queries, engine.synonyms, engine.idf_map
    )
    if not all_terms:
        return spark.createDataFrame(
            [],
            "query_id long, doc_id long, score double, rank int, "
            "total_hits long, last_page boolean",
        )

    postings = engine._postings(all_terms)
    # distinct query terms (a term may appear in several branches/queries)
    qterms = qbranch.select("query_id", "term", "idf").distinct()
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .withColumn(
            "contrib",
            (
                F.col("idf")
                * F.col("tf")
                * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.lit(engine.avgdl)
                    )
                )
            ).cast("double"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_set(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score"),
        F.collect_set("term").alias("matched"),
    )
    # branch matching in-place: doc is a candidate iff SOME branch has
    # ALL its terms matched — a broadcast join of the per-query branch
    # structure + exists/forall, no extra shuffle
    branches_df = _branches_df(spark, queries, engine.synonyms)
    cand = scored.join(F.broadcast(branches_df), "query_id").filter(
        F.exists(
            F.col("branches"),
            lambda b: F.forall(b, lambda t: F.array_contains(F.col("matched"), t)),
        )
    )

    # per-query exact lang filter (category analog, spot.sd:24-28)
    cand = cand.join(F.broadcast(qmeta), "query_id")
    docs_lang = engine.spark.read.parquet(engine.paths.docs).select("doc_id", "lang")
    cand = cand.join(docs_lang, "doc_id", "left").filter(
        F.col("lang_filter").isNull() | (F.col("lang") == F.col("lang_filter"))
    )

    # Distributed per-query top-k WITHOUT a global sort: every partition
    # keeps a bounded running top-maxk per query (linear scan, memory
    # <= n_queries*maxk rows), then one tiny window finalizes. totals
    # are a plain hash aggregate. This is the per-group analog of
    # Spark's TakeOrderedAndProject.
    maxk = max(int(q["limit"]) * int(q["page"]) for q in queries)
    cand = cand.select("query_id", "doc_id", "score").persist()
    try:
        totals = cand.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("total_hits")
        )

        def local_topk(it):
            import pandas as _pd

            running = None
            for pdf in it:
                pool = pdf if running is None else _pd.concat([running, pdf])
                running = (
                    pool.sort_values(
                        ["query_id", "score", "doc_id"],
                        ascending=[True, False, True],
                    )
                    .groupby("query_id", sort=False)
                    .head(maxk)
                )
            if running is not None and len(running):
                yield running

        pruned = cand.mapInPandas(
            local_topk, "query_id long, doc_id long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        out = (
            pruned.withColumn("rn", F.row_number().over(w))
            .join(F.broadcast(qmeta.select("query_id", "limit", "page")), "query_id")
            .filter(
                (F.col("rn") > F.col("limit") * (F.col("page") - 1))
                & (F.col("rn") <= F.col("limit") * F.col("page"))
            )
            .join(F.broadcast(totals), "query_id")
            .withColumn(
                "rank", (F.col("rn") - F.col("limit") * (F.col("page") - 1)).cast("int")
            )
            .withColumn(
                "last_page", F.col("total_hits") - F.col("limit") * F.col("page") <= 0
            )
            .select("query_id", "doc_id", "score", "rank", "total_hits", "last_page")
        )
        # materialize while cand is cached (one pass for totals+topk)
        out = out.localCheckpoint(eager=True)
    finally:
        cand.unpersist()
    return out


def totals_batch(engine: SearchEngine, queries: list[dict]) -> DataFrame:
    """Per-query total_hits + last_page only (covers queries whose page
    window is empty and queries with zero hits). Q11/Q12 analog."""
    spark = engine.spark
    qmeta, qbranch, all_terms = compile_query_tables(
        spark, queries, engine.synonyms, engine.idf_map
    )
    if not all_terms:
        return qmeta.select(
            "query_id",
            F.lit(0).cast("long").alias("total_hits"),
            F.lit(True).alias("last_page"),
        )
    postings = engine._postings(all_terms).select("term", "doc_id")
    qterms = qbranch.select("query_id", "term").distinct()
    matched = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.collect_set("term").alias("matched"))
    )
    branches_df = _branches_df(spark, queries, engine.synonyms)
    branch_hits = matched.join(F.broadcast(branches_df), "query_id").filter(
        F.exists(
            F.col("branches"),
            lambda b: F.forall(b, lambda t: F.array_contains(F.col("matched"), t)),
        )
    )
    docs_lang = spark.read.parquet(engine.paths.docs).select("doc_id", "lang")
    counted = (
        branch_hits.join(F.broadcast(qmeta), "query_id")
        .join(docs_lang, "doc_id", "left")
        .filter(F.col("lang_filter").isNull() | (F.col("lang") == F.col("lang_filter")))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("total_hits"))
    )
    return (
        qmeta.join(counted, "query_id", "left")
        .withColumn("total_hits", F.coalesce("total_hits", F.lit(0)))
        .withColumn(
            "last_page", F.col("total_hits") - F.col("limit") * F.col("page") <= 0
        )
        .select("query_id", "total_hits", "last_page")
    )
