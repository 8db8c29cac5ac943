"""Query engine: SearchCondition -> DataFrame plan -> BM25 top-k.

Re-expresses the reference's query path (SURVEY.md §3.1):
  SearchCondition (/root/reference/search-api/internal/domain/SearchCondition.go:9-21)
  -> synonym expansion (vespaRepository.go:22-29, convertSpotNameQuery.go:5-22)
  -> predicate tree (query/whereQuery.go) -> [Vespa: tokenize, match
  inverted index, BM25, limit/offset] -> {total_hits, last_page, ids}
  (presentation/model/response.go:8-42).

Here the "Vespa side" is a DataFrame plan: query terms pruned to their
segment buckets -> Arrow-batched posting decode -> native-Column BM25 ->
branch AND/OR semantics -> exact lang filter -> count + distributed
top-k (TakeOrderedAndProject).

Determinism: per-doc scores are summed in sorted-term order via
``aggregate(sort_array(collect_list(...)))`` so float accumulation
order is parallelism-independent (SURVEY.md §4.2 item 4); ties break
``score DESC, doc_id ASC``.

``topk_only=True`` enables block-max WAND pruning (SURVEY.md §4.2
item 2): decode each term's best block for score lower bounds, set
theta = k-th best, then decode only blocks whose upper bound (own
block-max + other terms' global maxima) reaches theta. Applied only
when every OR branch is a single term — with multi-term AND branches a
pruned doc could still be a candidate, so we fall back to exact.
total_hits is not computed in this mode (the reference's totalCount is
likewise an estimate under Vespa's weakAnd).
"""

from __future__ import annotations

import json
import math
import os
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micce_search_engine_spark import BM25_B, BM25_K1
from micce_search_engine_spark.functions.codec import decode_postings
from micce_search_engine_spark.operators.index_build import IndexPaths, bucket_of
from micce_search_engine_spark.oracle import expand_branches

_POSTING_SCHEMA = "term string, doc_id long, tf long, dl long"


def _decode_map(block_sel: dict | None):
    """mapInPandas decoder: segment rows -> (term, doc_id, tf, dl).

    ``block_sel``: optional {(term, salt): [block_idx, ...]} restriction
    (block-max WAND surviving blocks); None decodes everything.
    """

    def fn(it):
        import pyarrow as pa

        for batch in it:
            rows = batch.to_pylist()
            terms, sizes, docs_out, tfs_out, dls_out = [], [], [], [], []
            for row in rows:
                mask = None
                if block_sel is not None:
                    allowed = block_sel.get((row["term"], row["salt"]))
                    if allowed is None:
                        continue
                    mask = np.zeros(len(row["block_first_doc"]), dtype=bool)
                    mask[np.asarray(allowed, dtype=np.int64)] = True
                docs, tfs, dls = decode_postings(row, mask)
                if docs.size:
                    terms.append(row["term"])
                    sizes.append(docs.size)
                    docs_out.append(docs)
                    tfs_out.append(tfs)
                    dls_out.append(dls)
            if docs_out:
                # expand the per-row term to per-posting rows with a
                # C-level take (Spark can't consume Arrow dictionary
                # arrays directly)
                idx = np.repeat(
                    np.arange(len(terms), dtype=np.int64), np.asarray(sizes)
                )
                term_arr = pa.array(terms, type=pa.string()).take(pa.array(idx))
                yield pa.RecordBatch.from_arrays(
                    [
                        term_arr,
                        pa.array(np.concatenate(docs_out)),
                        pa.array(np.concatenate(tfs_out)),
                        pa.array(np.concatenate(dls_out)),
                    ],
                    names=["term", "doc_id", "tf", "dl"],
                )

    return fn


class SearchEngine:
    """Load index artifacts and answer SearchCondition-shaped queries."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        synonyms: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        with open(self.paths.meta) as f:
            self.meta = json.load(f)
        stats = spark.read.parquet(self.paths.stats).collect()[0]
        self.N = int(stats["N"])
        self.avgdl = float(stats["avgdl"])
        self.synonyms = dict(synonyms or {})
        # term dictionary is hot at query time — keep it cached (at
        # true web scale this stays a filter-pushdown parquet lookup;
        # persist() is a no-op benefit there and a big one locally)
        self._term_stats = spark.read.parquet(self.paths.term_stats).persist()
        # lossless WAND after incremental upserts: stored block bounds
        # were encoded with a possibly-smaller avgdl; scaling them by
        # avgdl_now/min_avgdl_encoded keeps them true upper bounds
        # (wf(a2)/wf(a1) <= a2/a1 for a2 > a1 — see operators/upsert.py)
        self.wand_derate = max(
            1.0, self.avgdl / float(self.meta.get("min_avgdl_encoded", self.avgdl))
        )

    # -- pieces -------------------------------------------------------

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        rows = self._term_stats.filter(F.col("term").isin(terms)).collect()
        df = {r["term"]: int(r["df"]) for r in rows}
        return {
            t: math.log((self.N - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5) + 1.0)
            for t in terms
        }

    def _segments_for(self, terms: list[str]) -> DataFrame:
        buckets = sorted({bucket_of(t, self.meta["n_buckets"]) for t in terms})
        return (
            self.spark.read.parquet(self.paths.segments)
            # partition pruning on bucket=, then row-group pruning on term
            .filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        )

    def _postings(self, terms: list[str], block_sel: dict | None = None) -> DataFrame:
        return self._segments_for(terms).mapInArrow(
            _decode_map(block_sel), _POSTING_SCHEMA
        )

    def _scored(self, postings: DataFrame, idf: dict[str, float]) -> DataFrame:
        idf_expr = F.create_map(
            *[x for t, v in sorted(idf.items()) for x in (F.lit(t), F.lit(float(v)))]
        )
        contrib = (
            F.col("idf")
            * F.col("tf")
            * F.lit(BM25_K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.lit(self.avgdl)
                )
            )
        )
        per_term = postings.withColumn("idf", idf_expr[F.col("term")]).withColumn(
            "contrib", contrib.cast("double")
        )
        # Deterministic accumulation: sum in sorted-term order.
        return per_term.groupBy("doc_id").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
            F.collect_set("term").alias("matched"),
        )

    def _branch_filter(self, scored: DataFrame, branches: list[list[str]]) -> DataFrame:
        """AND within a branch, OR across branches (whereQuery.go:13-41)."""
        def branch_pred(b):
            return reduce(
                lambda a, c: a & c,
                [F.array_contains(F.col("matched"), t) for t in b],
            )

        pred = reduce(lambda a, c: a | c, [branch_pred(b) for b in branches])
        return scored.filter(pred)

    def _lang_filter(self, scored: DataFrame, lang: str | None) -> DataFrame:
        if lang is None:
            return scored
        docs = (
            self.spark.read.parquet(self.paths.docs)
            .filter(F.col("lang") == lang)  # partition-pruned scan
            .select("doc_id")
        )
        return scored.join(docs, "doc_id", "left_semi")

    # -- block-max WAND ------------------------------------------------

    def _wand_block_selection(
        self, terms: list[str], idf: dict[str, float], k: int
    ) -> dict | None:
        """Return {(term, salt): [block indices]} surviving pruning, or
        None if pruning is not worthwhile."""
        meta_cols = self._segments_for(terms).select(
            "term", "salt", "max_wf", F.posexplode("block_max_wf").alias("bi", "bmax")
        )
        idf_expr = F.create_map(
            *[x for t, v in sorted(idf.items()) for x in (F.lit(t), F.lit(float(v)))]
        )
        blocks = meta_cols.withColumn(
            "bound",
            idf_expr[F.col("term")] * F.col("bmax") * F.lit(self.wand_derate),
        )
        # global per-term upper bound
        term_ub = {
            r["term"]: r["ub"]
            for r in blocks.groupBy("term").agg(F.max("bound").alias("ub")).collect()
        }
        if not term_ub:
            return {}
        # phase A: best block per term -> exact single-term lower bounds
        from pyspark.sql import Window

        w = Window.partitionBy("term").orderBy(F.desc("bound"), "salt", "bi")
        best = (
            blocks.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("term", "salt", "bi")
            .collect()
        )
        sel = {}
        for r in best:
            sel.setdefault((r["term"], r["salt"]), []).append(r["bi"])
        lb = (
            self._scored(self._postings(terms, sel), idf)
            .orderBy(F.desc("score"), "doc_id")
            .limit(k)
            .collect()
        )
        if len(lb) < k:
            return None  # not enough evidence to prune safely
        theta = lb[-1]["score"]
        total_ub = sum(term_ub.values())
        surviving = (
            blocks.withColumn(
                "keep",
                F.col("bound")
                + F.lit(total_ub)
                - idf_expr[F.col("term")] * F.lit(1.0) * F.col("max_wf")
                >= F.lit(theta),
            )
            .filter(F.col("keep"))
            .select("term", "salt", "bi")
            .collect()
        )
        out: dict = {}
        for r in surviving:
            out.setdefault((r["term"], r["salt"]), []).append(r["bi"])
        return out

    # -- entry point ----------------------------------------------------

    def search(
        self,
        query_text: str,
        lang_filter: str | None = None,
        limit: int = 10,
        page: int = 1,
        topk_only: bool = False,
    ) -> dict:
        """Returns {total_hits, last_page, results: [(doc_id, score)]}.

        limit/page semantics replicate queryBuilder.go:40-41 +
        response.go:40-42 exactly (limit' = limit*page, offset =
        limit*(page-1), last_page = total - limit*page <= 0).
        """
        if limit < 1 or page < 1:
            raise ValueError("limit and page are required and must be >= 1")
        branches = expand_branches(query_text, self.synonyms)
        if not branches:
            return {"total_hits": 0, "last_page": True, "results": []}
        all_terms = sorted({t for b in branches for t in b})
        idf = self.idf_map(all_terms)
        k = limit * page

        block_sel = None
        use_wand = topk_only and all(len(b) == 1 for b in branches) and lang_filter is None
        if use_wand:
            block_sel = self._wand_block_selection(all_terms, idf, k)

        scored = self._scored(self._postings(all_terms, block_sel), idf)
        cand = self._branch_filter(scored, branches)
        cand = self._lang_filter(cand, lang_filter)
        cand = cand.select("doc_id", "score").persist()
        try:
            if topk_only:
                total = None
            else:
                total = cand.count()
            top = cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
        finally:
            cand.unpersist()
        offset = limit * (page - 1)
        window = top[offset : offset + limit]
        return {
            "total_hits": total,
            "last_page": (total - limit * page <= 0) if total is not None else None,
            "results": [(r["doc_id"], r["score"]) for r in window],
        }
