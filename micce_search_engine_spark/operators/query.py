"""Query engine: SearchCondition -> DataFrame plan -> BM25 top-k.

Re-expresses the reference's query path (SURVEY.md §3.1):
  SearchCondition (/root/reference/search-api/internal/domain/SearchCondition.go:9-21)
  -> synonym expansion (vespaRepository.go:22-29, convertSpotNameQuery.go:5-22)
  -> predicate tree (query/whereQuery.go) -> [Vespa: tokenize, match
  inverted index, BM25, limit/offset] -> {total_hits, last_page, ids}
  (presentation/model/response.go:8-42).

Here the "Vespa side" is a DataFrame plan: query terms pruned to their
segment buckets -> Arrow-batched zero-copy posting decode (the decoder
emits the idf-free BM25 weight ``wf`` directly and applies the exact
lang filter from the per-posting attribute stream — NO join against a
docs table, which at 10^12 docs is a full shuffle per query) ->
fixed-point scoring -> per-branch match counting -> count + distributed
top-k (TakeOrderedAndProject).

Determinism (SURVEY.md §4.2 item 4): per-term contributions are
quantized to int64 fixed-point (floor(idf * wf * 1e9)) and summed as
LONGS — integer addition is exact and order-independent, so scores are
bit-identical across any partitioning/parallelism WITHOUT the
collect_set/sort_array array aggregate round 1 used (which was the
batched path's scaling bottleneck). score = score_fx / 1e9; ties break
``score DESC, doc_id ASC``.

Branch semantics (AND within an OR branch, whereQuery.go:13-41) are
counted relationally: one conditional-sum column per branch (<= 8
branches), a doc matches iff some branch's matched-term count equals
its size — plain codegen aggregates, no per-group arrays.

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

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micce_search_engine_spark import BM25_B, BM25_K1
from micce_search_engine_spark.functions.codec import bm25_wf, decode_postings
from micce_search_engine_spark.operators.index_build import IndexPaths, bucket_of
from micce_search_engine_spark.oracle import expand_branches

_POSTING_SCHEMA = "term string, doc_id long, tf long, dl long"
_SCORE_SCHEMA = "term string, doc_id long, wf double"
_SCORE_LANG_SCHEMA = "term string, doc_id long, wf double, lang_id long"

# fixed-point scale: contributions are floor(idf * wf * 1e9) int64
SCORE_SCALE = 1e9
MAX_BRANCHES = 8

# segment columns each decode mode needs (column-pruned parquet scan)
_META_COLS = ["term", "salt", "block_first_doc", "block_n"]
_MODE_COLS = {
    "postings": _META_COLS
    + ["block_doc_off", "block_tf_off", "block_dl_off", "doc_blob", "tf_blob", "dl_blob"],
    "score": _META_COLS
    + ["block_doc_off", "block_tf_off", "block_dl_off", "doc_blob", "tf_blob", "dl_blob"],
    "score_lang": _META_COLS
    + [
        "block_doc_off",
        "block_tf_off",
        "block_dl_off",
        "block_lang_off",
        "doc_blob",
        "tf_blob",
        "dl_blob",
        "lang_blob",
    ],
}


def _batch_row_views(batch, names: list[str]):
    """Zero-copy per-row views over list<long>/binary Arrow columns.

    Returns a list of per-row dicts whose array/blob values are numpy
    VIEWS into the Arrow buffers (no to_pylist object materialization —
    round 1 copied every blob into Python bytes before numpy saw it)."""
    idx = {nm: j for j, nm in enumerate(batch.schema.names)}
    n = batch.num_rows
    cols = {}
    for nm in names:
        col = batch.column(idx[nm])
        t = col.type
        if str(t) == "string":
            cols[nm] = col.to_pylist()
        elif str(t).startswith("list"):
            off = col.offsets.to_numpy().astype(np.int64)
            vals = col.values.to_numpy(zero_copy_only=False)
            cols[nm] = ("list", off, vals)
        elif str(t) == "binary" or str(t) == "large_binary":
            bufs = col.buffers()
            odt = np.int64 if str(t) == "large_binary" else np.int32
            off = np.frombuffer(bufs[1], dtype=odt)[
                col.offset : col.offset + n + 1
            ].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            cols[nm] = ("bin", off, data)
        else:  # plain ints (salt)
            cols[nm] = col.to_numpy(zero_copy_only=False)
    rows = []
    for i in range(n):
        row = {}
        for nm, c in cols.items():
            if isinstance(c, tuple):
                _, off, vals = c
                row[nm] = vals[off[i] : off[i + 1]]
            elif isinstance(c, list):
                row[nm] = c[i]
            else:
                row[nm] = c[i]
        rows.append(row)
    return rows


def _decode_map(
    block_sel: dict | None,
    mode: str = "postings",
    lang_id: int | None = None,
    avgdl: float = 1.0,
):
    """mapInArrow decoder factory.

    modes:
      * ``postings``   -> (term, doc_id, tf, dl)            [probe/tests]
      * ``score``      -> (term, doc_id, wf)                [single query;
                          optional decode-side exact lang filter]
      * ``score_lang`` -> (term, doc_id, wf, lang_id)       [batched
                          queries with per-query lang filters]

    ``block_sel``: optional {(term, salt): [block_idx, ...]} restriction
    (block-max WAND surviving blocks); None decodes everything.
    """
    want_lang = mode == "score_lang" or (mode == "score" and lang_id is not None)
    cols = _MODE_COLS["score_lang" if want_lang else mode]

    def fn(it):
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            rows = _batch_row_views(batch, cols)
            terms, sizes = [], []
            docs_out, a_out, b_out = [], [], []
            for row in rows:
                mask = None
                if block_sel is not None:
                    allowed = block_sel.get((row["term"], int(row["salt"])))
                    if allowed is None:
                        continue
                    mask = np.zeros(len(row["block_first_doc"]), dtype=bool)
                    mask[np.asarray(allowed, dtype=np.int64)] = True
                if want_lang:
                    docs, tfs, dls, langs = decode_postings(row, mask, want_lang=True)
                else:
                    docs, tfs, dls = decode_postings(row, mask)
                if mode == "score" and lang_id is not None:
                    keep = langs == lang_id
                    docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                if not docs.size:
                    continue
                terms.append(row["term"])
                sizes.append(docs.size)
                docs_out.append(docs)
                if mode == "postings":
                    a_out.append(tfs)
                    b_out.append(dls)
                else:
                    a_out.append(bm25_wf(tfs, dls, avgdl, BM25_K1, BM25_B))
                    if mode == "score_lang":
                        b_out.append(langs)
            if docs_out:
                # expand the per-row term to per-posting rows with a
                # C-level take (Spark can't consume Arrow dictionary
                # arrays directly)
                idx = np.repeat(
                    np.arange(len(terms), dtype=np.int64), np.asarray(sizes)
                )
                term_arr = pa.array(terms, type=pa.string()).take(pa.array(idx))
                arrays = [term_arr, pa.array(np.concatenate(docs_out))]
                names = ["term", "doc_id"]
                if mode == "postings":
                    arrays += [pa.array(np.concatenate(a_out)), pa.array(np.concatenate(b_out))]
                    names += ["tf", "dl"]
                elif mode == "score":
                    arrays.append(pa.array(np.concatenate(a_out)))
                    names.append("wf")
                else:
                    arrays += [pa.array(np.concatenate(a_out)), pa.array(np.concatenate(b_out))]
                    names += ["wf", "lang_id"]
                yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn


def contrib_fx(idf_col, wf_col):
    """Fixed-point per-term BM25 contribution: floor(idf*wf*1e9) long.
    Summed as int64 -> deterministic under ANY partitioning; mirrored
    verbatim in the DuckDB oracle (floor of the identically-ordered
    double expression)."""
    return F.floor(idf_col * wf_col * F.lit(SCORE_SCALE)).cast("long")


def branch_count_aggs(branches: list[list[str]]):
    """One conditional-count aggregate per OR branch: how many of branch
    i's distinct terms matched this doc."""
    assert len(branches) <= MAX_BRANCHES, "query expands to too many OR branches"
    return [
        F.sum(
            F.when(F.col("term").isin(sorted(set(b))), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"_b{i}")
        for i, b in enumerate(branches)
    ]


def branch_match_pred(branches: list[list[str]]):
    """Doc is a candidate iff SOME branch matched ALL its terms
    (whereQuery.go:13-41)."""
    preds = [
        F.col(f"_b{i}") == F.lit(len(set(b))) for i, b in enumerate(branches)
    ]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


class SearchEngine:
    """Load index artifacts and answer SearchCondition-shaped queries."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        synonyms: dict[str, str] | None = None,
        preload: bool = False,
    ):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        with open(self.paths.meta) as f:
            self.meta = json.load(f)
        # v1 indexes have no per-posting lang stream: the score_lang
        # column select would fail with AnalysisException deep inside a
        # query (ADVICE r2) — fail at open time with a clear remedy
        if int(self.meta.get("version", 1)) < 2:
            raise RuntimeError(
                f"index at {index_dir} is format v{self.meta.get('version', 1)} "
                "(no lang attribute stream); rebuild with build_index "
                "(format v2) before opening"
            )
        stats = spark.read.parquet(self.paths.stats).collect()[0]
        self.N = int(stats["N"])
        self.avgdl = float(stats["avgdl"])
        self.synonyms = dict(synonyms or {})
        self.langs: list[str] = list(self.meta.get("langs", []))
        # term dictionary is hot at query time — keep it cached (at
        # true web scale this stays a filter-pushdown parquet lookup;
        # persist() is a no-op benefit there and a big one locally)
        self._term_stats = spark.read.parquet(self.paths.term_stats).persist()
        # ``preload``: pin the segments table in executor memory — the
        # analog of Vespa serving its index from memory. Queries then
        # filter the in-memory columnar cache instead of re-opening
        # parquet. At 10^12 docs a serving tier holds its shard the
        # same way; batch/offline sessions leave this off and rely on
        # bucket partition pruning.
        self._segments_cached = None
        if preload:
            self._segments_cached = spark.read.parquet(self.paths.segments).persist()
        # lossless WAND after incremental upserts: stored block bounds
        # were encoded with a possibly-smaller avgdl; scaling them by
        # avgdl_now/min_avgdl_encoded keeps them true upper bounds
        # (wf(a2)/wf(a1) <= a2/a1 for a2 > a1 — see operators/upsert.py)
        self.wand_derate = max(
            1.0, self.avgdl / float(self.meta.get("min_avgdl_encoded", self.avgdl))
        )

    # -- pieces -------------------------------------------------------

    def lang_id_of(self, lang: str | None) -> int | None:
        """Dictionary id for an exact lang filter; unknown lang -> -1
        (matches nothing, mirroring an impossible equality filter)."""
        if lang is None:
            return None
        try:
            return self.langs.index(lang)
        except ValueError:
            return -1

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        rows = self._term_stats.filter(F.col("term").isin(terms)).collect()
        df = {r["term"]: int(r["df"]) for r in rows}
        return {
            t: math.log((self.N - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5) + 1.0)
            for t in terms
        }

    def _segments_for(self, terms: list[str], cols: list[str] | None = None) -> DataFrame:
        buckets = sorted({bucket_of(t, self.meta["n_buckets"]) for t in terms})
        base = (
            self._segments_cached
            if self._segments_cached is not None
            else self.spark.read.parquet(self.paths.segments)
        )
        # partition pruning on bucket=, then row-group pruning on term
        df = base.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        if cols is not None:
            df = df.select(*cols)  # prune blob columns the mode won't read
        return df

    def _postings(
        self,
        terms: list[str],
        block_sel: dict | None = None,
        mode: str = "postings",
        lang_id: int | None = None,
    ) -> DataFrame:
        want_lang = mode == "score_lang" or (mode == "score" and lang_id is not None)
        cols = _MODE_COLS["score_lang" if want_lang else mode]
        schema = {
            "postings": _POSTING_SCHEMA,
            "score": _SCORE_SCHEMA,
            "score_lang": _SCORE_LANG_SCHEMA,
        }[mode]
        return self._segments_for(terms, cols).mapInArrow(
            _decode_map(block_sel, mode, lang_id, self.avgdl), schema
        )

    def _idf_expr(self, idf: dict[str, float]):
        return F.create_map(
            *[x for t, v in sorted(idf.items()) for x in (F.lit(t), F.lit(float(v)))]
        )

    def _scored(
        self,
        postings: DataFrame,
        idf: dict[str, float],
        branches: list[list[str]],
    ) -> DataFrame:
        """(doc_id, score double) for docs matching some branch."""
        per_term = postings.withColumn(
            "w_fx", contrib_fx(self._idf_expr(idf)[F.col("term")], F.col("wf"))
        )
        agg = per_term.groupBy("doc_id").agg(
            F.sum("w_fx").alias("score_fx"), *branch_count_aggs(branches)
        )
        return agg.filter(branch_match_pred(branches)).select(
            "doc_id", (F.col("score_fx") / F.lit(SCORE_SCALE)).alias("score")
        )

    # -- block-max WAND ------------------------------------------------

    def _wand_block_selection(
        self, terms: list[str], idf: dict[str, float], k: int
    ) -> dict | None:
        """Return {(term, salt): [block indices]} surviving pruning, or
        None if pruning is not worthwhile."""
        meta_cols = self._segments_for(terms).select(
            "term", "salt", "max_wf", F.posexplode("block_max_wf").alias("bi", "bmax")
        )
        idf_expr = self._idf_expr(idf)
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
        branches = [[t] for t in terms]
        lb = (
            self._scored(self._postings(terms, sel, mode="score"), idf, branches)
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
        lid = self.lang_id_of(lang_filter)

        block_sel = None
        use_wand = topk_only and all(len(b) == 1 for b in branches) and lang_filter is None
        if use_wand:
            block_sel = self._wand_block_selection(all_terms, idf, k)

        cand = self._scored(
            self._postings(all_terms, block_sel, mode="score", lang_id=lid),
            idf,
            branches,
        ).persist()
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
