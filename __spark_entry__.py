"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the real engine (micce_search_engine_spark); ``oracle_sql()``
gives the DuckDB-runnable ANSI-SQL equivalent. BM25 queries run through
the full index pipeline (tokenize -> salted posting segments -> decode
-> score) — the SQL oracle recomputes BM25 from first principles, so a
match certifies the codec, the segments, and the scorer end-to-end.
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from micce_search_engine_spark import BM25_B, BM25_K1  # noqa: E402
from micce_search_engine_spark.oracle import expand_branches  # noqa: E402

K1_P1 = BM25_K1 + 1.0  # same float literal on both sides (repr round-trips)

# ---------------------------------------------------------------------------
# fixed query set over the `documents` table (vocab: spark/join/merge/...)
# ---------------------------------------------------------------------------
SYNONYMS = {"fastjoin": "fast join"}
QUERY_SPECS = [
    {"query_id": 0, "query_text": "spark join", "lang_filter": None, "limit": 10, "page": 1},
    {"query_id": 1, "query_text": "merge", "lang_filter": "en", "limit": 10, "page": 1},
    {"query_id": 2, "query_text": "the window", "lang_filter": None, "limit": 5, "page": 2},
    {"query_id": 3, "query_text": "data vector stream", "lang_filter": None, "limit": 10, "page": 1},
    {"query_id": 4, "query_text": "fastjoin", "lang_filter": None, "limit": 10, "page": 1},
    {"query_id": 5, "query_text": "nosuchterm123xyz", "lang_filter": None, "limit": 10, "page": 1},
]
PROBE_TERMS = ["spark", "join", "vector"]  # posting_roundtrip terms


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship the package to executors even under a driver-owned session."""
    try:
        from micce_search_engine_spark.session import _package_zip

        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added or local import works


# ---------------------------------------------------------------------------
# index cache (built lazily once per sf_dir; stages resume/skip if present)
# ---------------------------------------------------------------------------
_ENGINES: dict = {}
_MF_ENGINES: dict = {}

# second searchable field ("korea_name" analog): first 5 words of text —
# derived identically in Spark and in the SQL oracle
_TITLE_SPARK = "array_join(slice(split(coalesce(text, '') , ' '), 1, 5), ' ')"
_TITLE_SQL = "array_to_string(list_slice(string_split(coalesce(text, ''), ' '), 1, 5), ' ')"


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            "doc_id",
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            "text",
            "lang",
        )
    )


def _engine(spark: SparkSession, sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key in _ENGINES:
        return _ENGINES[key]
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.index_build import build_index
    from micce_search_engine_spark.operators.query import SearchEngine

    tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    index_dir = os.path.join("/tmp", "mse_entry_idx_v5", tag)
    build_index(
        spark,
        _docs_as_pages(spark, sf_dir),
        index_dir,
        n_buckets=8,
        max_postings_per_row=2000,
        doc_id_col="doc_id",
        # round-4: positional index so bm25_phrase exercises the
        # optional 5th stream; every other entry reads the same index
        # (the extra stream is column-pruned away for them)
        with_positions=True,
    )
    eng = SearchEngine(spark, index_dir, synonyms=SYNONYMS)
    _ENGINES[key] = eng
    return eng


def _attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute store over documents: deterministic doc_id-derived geo
    position + category/bool/int attrs (spot.sd:19-31 analog); same
    derivation in the SQL oracles."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        ((F.col("doc_id") * 7919 % 18001) / 100.0 - 90.0).alias("lat"),
        ((F.col("doc_id") * 104729 % 36001) / 100.0 - 180.0).alias("lon"),
        F.col("source").alias("category"),
        (F.col("doc_id") % 3 == 0).alias("has_images"),
        "n_chars",
    )


_ATTRS_SQL = """
attrs AS (
  SELECT doc_id,
         (doc_id * 7919 % 18001) / 100.0 - 90.0 AS lat,
         (doc_id * 104729 % 36001) / 100.0 - 180.0 AS lon,
         source AS category,
         (doc_id % 3 = 0) AS has_images,
         n_chars
  FROM documents
)"""


def _mf_engine(spark: SparkSession, sf_dir: str):
    """Two-field engine (text + derived title) sharing the documents
    doc_id space — the name/korea_name analog."""
    key = os.path.abspath(sf_dir)
    if key in _MF_ENGINES:
        return _MF_ENGINES[key]
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.multifield import (
        ConditionEngine,
        build_field_indexes,
    )
    from micce_search_engine_spark.operators.query import SearchEngine

    tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    base = os.path.join("/tmp", "mse_entry_idx_v5", tag + "_mf")
    pages = _docs_as_pages(spark, sf_dir).withColumn("title", F.expr(_TITLE_SPARK))
    idxs = build_field_indexes(
        spark,
        pages,
        fields=["text", "title"],
        base_dir=base,
        doc_id_col="doc_id",
        n_buckets=8,
        max_postings_per_row=2000,
        # round-5: positional field indexes so multi-word keywords can
        # phrase-match per field (bm25_phrase_multifield)
        with_positions=True,
    )
    engines = {f: SearchEngine(spark, d, synonyms=SYNONYMS) for f, d in idxs.items()}
    ce = ConditionEngine(engines, attrs=_attrs(spark, sf_dir), synonyms=SYNONYMS)
    _MF_ENGINES[key] = ce
    return ce


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB) — tokenization identical to the engine's
# (documents.text is single-space lowercase words, so split == \w+ regex)
# ---------------------------------------------------------------------------
_TOKS = """
toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (
  SELECT d.doc_id, coalesce(x.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1) x USING (doc_id)
)"""

# token positions with DEFINED order (ADVICE r4, low): row_number() over
# an unnest has no ORDER BY — row order there is a DuckDB implementation
# detail, and adjacency-based oracles (phrase, shingles) are order-
# SENSITIVE. generate_subscripts zipped with unnest emits the ordinal
# straight from the split order, guaranteed by SQL semantics.
_TOKS_POS = """
toks_pos AS (
  SELECT doc_id,
         generate_subscripts(parts, 1) - 1 AS pos,
         unnest(parts) AS term
  FROM (
    SELECT doc_id,
           list_filter(string_split(lower(text), ' '), x -> x <> '') AS parts
    FROM documents
  )
)"""

_SHINGLES = f"""
{_TOKS_POS.strip()},
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM toks_pos a
  JOIN toks_pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN toks_pos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
)"""


def _query_values() -> tuple[str, str]:
    """Build the qmeta / qbranch VALUES clauses from QUERY_SPECS +
    SYNONYMS via the same expand_branches the engine uses."""
    qmeta_rows = []
    qbranch_rows = []
    for q in QUERY_SPECS:
        lf = "NULL" if q["lang_filter"] is None else f"'{q['lang_filter']}'"
        qmeta_rows.append(
            f"({q['query_id']}, {lf}::VARCHAR, {q['limit']}, {q['page']})"
        )
        for bi, b in enumerate(expand_branches(q["query_text"], SYNONYMS)):
            uniq = sorted(set(b))
            for t in uniq:
                qbranch_rows.append(
                    f"({q['query_id']}, {bi}, {len(uniq)}, '{t}')"
                )
    return ", ".join(qmeta_rows), ", ".join(qbranch_rows)


def _bm25_sql(select_clause: str) -> str:
    qmeta_vals, qbranch_vals = _query_values()
    return f"""
WITH {_TOKS},
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qmeta(query_id, lang_filter, lim, pg) AS (VALUES {qmeta_vals}),
qbranch(query_id, branch_id, branch_size, term) AS (VALUES {qbranch_vals}),
qterms AS (SELECT DISTINCT query_id, term FROM qbranch),
contrib AS (
  -- fixed-point int64 contribution: floor(idf * wf * 1e9), the exact
  -- expression order the engine uses (bm25_wf numpy + contrib_fx) so
  -- IEEE doubles match bit-for-bit and integer sums are order-free
  SELECT q.query_id, f.doc_id,
         floor(
           ln((s.n - coalesce(d.df, 0) + 0.5) / (coalesce(d.df, 0) + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT AS c_fx
  FROM qterms q
  JOIN tf f USING (term)
  JOIN dl l ON f.doc_id = l.doc_id
  CROSS JOIN stats s
  LEFT JOIN tdf d ON d.term = q.term
),
scored AS (
  SELECT query_id, doc_id, sum(c_fx)::DOUBLE / 1e9 AS score
  FROM contrib GROUP BY 1, 2
),
branch_hits AS (
  SELECT b.query_id, f.doc_id
  FROM qbranch b JOIN tf f USING (term)
  GROUP BY b.query_id, b.branch_id, b.branch_size, f.doc_id
  HAVING count(*) = b.branch_size
),
cand AS (SELECT DISTINCT query_id, doc_id FROM branch_hits),
filtered AS (
  SELECT s.query_id, s.doc_id, s.score
  FROM scored s
  JOIN cand USING (query_id, doc_id)
  JOIN qmeta m USING (query_id)
  JOIN documents d ON d.doc_id = s.doc_id
  WHERE m.lang_filter IS NULL OR d.lang = m.lang_filter
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY query_id) AS total
  FROM filtered
)
{select_clause}
"""


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.operators.batch_query import search_batch

    eng = _engine(spark, sf_dir)
    out = search_batch(eng, QUERY_SPECS)
    return out.select(
        "query_id",
        "doc_id",
        "rank",
        F.round("score", 6).alias("score_r"),
        "total_hits",
        "last_page",
    )


def _q_bm25_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.operators.batch_query import totals_batch

    eng = _engine(spark, sf_dir)
    return totals_batch(eng, QUERY_SPECS).select("query_id", "total_hits", "last_page")


def _q_bm25_wand_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND path for a single-term query; oracle is plain BM25
    top-10 — proves pruning loses nothing."""
    eng = _engine(spark, sf_dir)
    # force probe engagement: at sf0.01 the round-4 adaptive floor would
    # skip pruning, and this entry certifies the pruning path itself
    eng.wand_engage_factor = 0
    res = eng.search("spark", limit=10, page=1, topk_only=True)
    rows = [(int(d), round(float(s), 6)) for d, s in res["results"]]
    return spark.createDataFrame(rows, "doc_id long, score_r double")


def _q_bm25_wand_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized block-max WAND: multi-term AND branch ('spark join')
    with pruning; oracle is exact BM25 over docs containing BOTH terms —
    proves the round-3 generalization loses nothing."""
    eng = _engine(spark, sf_dir)
    eng.wand_engage_factor = 0  # certify the pruning path (see wand_single)
    res = eng.search("spark join", limit=10, page=1, topk_only=True)
    rows = [(int(d), round(float(s), 6)) for d, s in res["results"]]
    return spark.createDataFrame(rows, "doc_id long, score_r double")


def _q_bm25_wand_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched WAND (search_batch_topk): per-query block pruning, one
    plan for the whole query set; oracle is the exact per-query page
    window — rank- and score-identical to the unpruned path."""
    from micce_search_engine_spark.operators.batch_query import search_batch_topk

    eng = _engine(spark, sf_dir)
    # force probe engagement: round-5 adaptive engagement would route
    # every query to the exact path at sf0.01, and this entry certifies
    # the PRUNED path (losslessness), mirroring bm25_wand_single
    old = eng.wand_engage_factor
    eng.wand_engage_factor = 0
    out = search_batch_topk(eng, QUERY_SPECS)
    eng.wand_engage_factor = old
    return out.select(
        "query_id", "doc_id", "rank", F.round("score", 6).alias("score_r")
    )


PHRASE_T1, PHRASE_T2 = "table", "hash"  # 46 adjacent-pair docs at sf0.01


def _q_bm25_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 phrase matching (Vespa ``contains "multi word"`` =
    phrase on index fields, whereQuery.go:43-57): exact token adjacency
    via the positional posting stream, BM25 over the phrase's distinct
    terms; oracle recomputes adjacency from token positions in SQL.
    Round-5: the positional decode is bounded by the AND-candidate
    blocks (operators/query.py _phrase_sets)."""
    eng = _engine(spark, sf_dir)
    res = eng.search_phrase(f"{PHRASE_T1} {PHRASE_T2}", limit=10, page=1)
    rows = [(int(d), round(float(s), 6)) for d, s in res["results"]]
    df = spark.createDataFrame(rows, "doc_id long, score_r double")
    return df.withColumn("total_hits", F.lit(int(res["total_hits"])))


# batched phrase queries (round-5): multi-word keywords as exact phrases
# THROUGH the batch plan — mixed with a bag-of-words query, a lang
# filter, a page-2 window and a single-token phrase
PHRASE_SPECS = [
    {"query_id": 0, "query_text": f"{PHRASE_T1} {PHRASE_T2}", "lang_filter": None,
     "limit": 10, "page": 1, "phrase": True},
    {"query_id": 1, "query_text": "the window", "lang_filter": None,
     "limit": 5, "page": 2, "phrase": True},
    {"query_id": 2, "query_text": f"{PHRASE_T1} {PHRASE_T2}", "lang_filter": "en",
     "limit": 10, "page": 1, "phrase": True},
    {"query_id": 3, "query_text": "the window", "lang_filter": None,
     "limit": 5, "page": 1},
    {"query_id": 4, "query_text": "merge", "lang_filter": None,
     "limit": 10, "page": 1, "phrase": True},
]


def _q_bm25_phrase_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: phrase-flagged queries through search_batch — adjacency
    restriction composes with per-query lang filters, pagination and
    exact totals in ONE batch plan; bag-of-words queries in the same
    batch are unaffected."""
    from micce_search_engine_spark.operators.batch_query import search_batch

    eng = _engine(spark, sf_dir)
    out = search_batch(eng, PHRASE_SPECS)
    return out.select(
        "query_id",
        "doc_id",
        "rank",
        F.round("score", 6).alias("score_r"),
        "total_hits",
        "last_page",
    )


# deterministic Japanese-text corpus: 16 hex chars of md5(doc_id) mapped
# 1:1 to katakana — same derivation in Spark and DuckDB (translate is
# char-wise in both), so the oracle can re-tokenize independently
_KANA = "アイウエオカキクケコサシスセソタ"
_JA_TEXT_SPARK = (
    "concat('doc ', translate(substr(md5(cast(doc_id as string)), 1, 16), "
    f"'0123456789abcdef', '{_KANA}'))"
)
_CJK_QUERIES = ["アイ", "ウエオ", "カキクケ"]
_JA_ENGINES: dict = {}


def _ja_engine(spark: SparkSession, sf_dir: str):
    key = os.path.abspath(sf_dir)
    if key in _JA_ENGINES:
        return _JA_ENGINES[key]
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.index_build import build_index
    from micce_search_engine_spark.operators.query import SearchEngine

    tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    index_dir = os.path.join("/tmp", "mse_entry_idx_v3", tag + "_ja")
    pages = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id",
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.expr(_JA_TEXT_SPARK).alias("text"),
        F.lit("ja").alias("lang"),
    )
    build_index(
        spark, pages, index_dir, n_buckets=8, max_postings_per_row=2000,
        doc_id_col="doc_id",
    )
    eng = SearchEngine(spark, index_dir)
    _JA_ENGINES[key] = eng
    return eng


def _q_cjk_bigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 CJK: unsegmented kana text indexed + queried via character
    bigrams (kuromoji mode=search analog, services.xml:7-12); oracle
    re-derives the bigram tokenization with SQL substr windows."""
    eng = _ja_engine(spark, sf_dir)
    rows = []
    for qid, q in enumerate(_CJK_QUERIES):
        res = eng.search(q, limit=10, page=1)
        for rank, (doc_id, score) in enumerate(res["results"], start=1):
            rows.append(
                (qid, int(doc_id), rank, round(float(score), 6), int(res["total_hits"]))
            )
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int, score_r double, total_hits long"
    )


def _cjk_sql() -> str:
    qvals = ", ".join(f"({i}, '{q}')" for i, q in enumerate(_CJK_QUERIES))
    return f"""
WITH ja AS (
  SELECT doc_id,
         translate(substr(md5(doc_id::VARCHAR), 1, 16),
                   '0123456789abcdef', '{_KANA}') AS kana
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, 'doc' AS term FROM ja
    UNION ALL
    SELECT doc_id, substr(kana, g.i::INT, 2) AS term
    FROM ja, (SELECT unnest(range(1, 16)) AS i) g
  ) GROUP BY 1, 2
),
dl AS (SELECT doc_id, 16::BIGINT AS dl FROM ja),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, 16.0 AS avgdl),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qmeta(query_id, q) AS (VALUES {qvals}),
qterms AS (
  SELECT DISTINCT query_id, substr(q, g.i::INT, 2) AS term
  FROM qmeta, (SELECT unnest(range(1, 16)) AS i) g
  WHERE g.i <= length(q) - 1
),
qsize AS (SELECT query_id, count(*)::BIGINT AS sz FROM qterms GROUP BY 1),
matched AS (
  SELECT q.query_id, f.doc_id, count(*)::BIGINT AS m,
         sum(floor(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT) AS s_fx
  FROM qterms q
  JOIN tf f USING (term)
  JOIN dl l ON f.doc_id = l.doc_id
  CROSS JOIN stats s
  JOIN tdf d ON d.term = f.term
  GROUP BY 1, 2
),
cand AS (
  SELECT m.query_id, m.doc_id, m.s_fx
  FROM matched m JOIN qsize z USING (query_id)
  WHERE m.m = z.sz
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id ORDER BY s_fx DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY query_id) AS total
  FROM cand
)
SELECT query_id, doc_id, rn::INT AS rank,
       round(s_fx::DOUBLE / 1e9, 6)::DOUBLE AS score_r,
       total::BIGINT AS total_hits
FROM ranked WHERE rn <= 10
"""


def _q_posting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng._postings(PROBE_TERMS).select("term", "doc_id", "tf", "dl")


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return spark.createDataFrame(
        [(eng.N, round(eng.avgdl, 6))], "n_docs long, avgdl_r double"
    )


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return (
        spark.read.parquet(eng.paths.term_stats)
        .filter(F.col("df") >= 100)
        .select("term", "df", "cf")
    )


def _q_docid_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic url-rank docIDs (independent of input partitioning)."""
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.docids import assign_doc_ids

    pages = _docs_as_pages(spark, sf_dir).select(
        F.col("url"), F.col("doc_id").alias("orig_id")
    )
    # scramble partitioning to prove independence
    out = assign_doc_ids(pages.repartition(7), num_partitions=5)
    return out.select(F.col("url"), F.col("doc_id").alias("rank_id"))


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return exact_dedup(docs).select("doc_id", "fp", "group_size")


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = ngram_jaccard_pairs(docs, threshold=0.5, n=3, max_shingle_df=10**9)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r"))


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = minhash_lsh_pairs(docs, threshold=0.5, num_hashes=16, bands=4, n=3)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r"))


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.dedup import simhash

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return simhash(docs).select("doc_id", "simhash")


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.ann import brute_force_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        F.col("vec_id") != 0
    )
    qv = _query_vec(spark, sf_dir)
    return brute_force_topk(emb, qv, k=10).select(
        "vec_id", F.round("cosine", 6).alias("cosine_r")
    )


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.ann import cosine_neardup_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = cosine_neardup_pairs(emb, threshold=0.42, exact=True)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed multi-probe ANN over the PERSISTED index — the
    scale path (vectors partitioned by bucket; the query scans only its
    probe partitions). Hyperplanes are md5-derived INTEGER vectors and
    components are 2^20 fixed-point, so bucket ids, probe order and the
    candidate set are exact int64 arithmetic the DuckDB oracle
    reproduces bit-for-bit. Round 2 measured the recompute-per-query
    variant here; the indexed path is algorithm-identical (same planes,
    same probes) and is what a deployment runs (VERDICT r2 #6)."""
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.ann import build_ann_index, lsh_topk_indexed

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).filter(
        F.col("vec_id") != 0
    )
    qv = _query_vec(spark, sf_dir)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    ann_dir = os.path.join("/tmp", "mse_entry_ann_v3", tag)
    if not os.path.exists(os.path.join(ann_dir, "ann_meta.json")):
        build_ann_index(emb, ann_dir, dim=len(qv))
    return lsh_topk_indexed(spark, ann_dir, qv, k=10).select(
        "vec_id", F.round("cosine", 6).alias("cosine_r")
    )


def _q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: inverted lists under deterministic centroids (the
    8 lowest-id data vectors — a stand-in for sampled k-means that the
    SQL oracle can reproduce), probe the 4 nearest lists, exact cosine
    within them."""
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8))
        .orderBy("vec_id")
        .collect()
    ]
    qv = _query_vec(spark, sf_dir)
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0), qv, cents, k=10, n_probes=4
    ).select("vec_id", F.round("cosine", 6).alias("cosine_r"))


def _q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids (round-3): distributed deterministic
    Lloyd's k-means (fixed-point int64 component sums -> bit-identical
    under any partitioning), persisted index partitioned by ivf_list,
    partition-pruned probe scan. The oracle re-runs the SAME k-means
    unrolled in SQL — training, assignment, probing and cosine all
    reproduce bit-for-bit."""
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.ann import (
        build_ivf_index,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qv = _query_vec(spark, sf_dir)
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    ivf_dir = os.path.join("/tmp", "mse_entry_ivf_v3", tag)
    if not os.path.exists(os.path.join(ivf_dir, "ivf_meta.json")):
        cents = train_ivf_centroids(emb, dim=len(qv), k=8, iters=2)
        build_ivf_index(emb.filter(F.col("vec_id") != 0), ivf_dir, cents)
    return ivf_topk_indexed(spark, ivf_dir, qv, k=10, n_probes=2).select(
        "vec_id", F.round("cosine", 6).alias("cosine_r")
    )


def _ivf_trained_sql(k: int = 8, iters: int = 2, n_probes: int = 2, dim: int = 64) -> str:
    """Unrolled deterministic k-means + IVF probe in DuckDB SQL —
    mirrors train_ivf_centroids/ivf_assign/cosine exactly (fixed-point
    integer sums for means; (a-b)*(a-b) fold distances; list_sum is
    the same left fold as Spark's F.aggregate, proven bit-equal by the
    embedding_topk entry since round 1)."""
    Q = 1 << 20
    d2 = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)))"
    )
    parts = [
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list,
         list_transform(embedding, x -> x::DOUBLE) AS vec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k})
)"""
    ]
    for t in range(iters):
        da = d2.format(a="e.embedding", b="c.vec")
        parts.append(
            f"""a{t} AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.list FROM c{t} c ORDER BY {da} ASC, c.list ASC LIMIT 1) AS l
  FROM embeddings e
)"""
        )
        parts.append(
            f"""m{t} AS (
  SELECT l AS list, g.i - 1 AS idx,
         sum(floor(embedding[g.i]::DOUBLE * {Q})::BIGINT) AS s, count(*) AS n
  FROM a{t}, (SELECT unnest(range(1, {dim} + 1)) AS i) g
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""c{t + 1} AS (
  SELECT c.list,
         coalesce(
           (SELECT list(m.s::DOUBLE / m.n / {Q}.0 ORDER BY m.idx)
            FROM m{t} m WHERE m.list = c.list),
           c.vec) AS vec
  FROM c{t} c
)"""
        )
    dq = d2.format(a="q.qv", b="c.vec")
    daf = d2.format(a="e.embedding", b="c.vec")
    parts.append("q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)")
    parts.append(
        f"""probes AS (
  SELECT c.list FROM c{iters} c, q ORDER BY {dq} ASC, c.list ASC LIMIT {n_probes}
)"""
    )
    parts.append(
        f"""af AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.list FROM c{iters} c ORDER BY {daf} ASC, c.list ASC LIMIT 1) AS l
  FROM embeddings e WHERE e.vec_id <> 0
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """,
d AS (
  SELECT a.vec_id,
         list_sum(list_transform(list_zip(a.embedding, (SELECT qv FROM q)),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) AS na,
         (SELECT sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) FROM q) AS nb
  FROM af a WHERE a.l IN (SELECT list FROM probes)
)
SELECT vec_id, round(dot / (na * nb), 6)::DOUBLE AS cosine_r
FROM d ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10
"""
    )


MF_QUERY = "fastjoin"  # expands to 2 branches x 2 fields = 4 OR branches
# multi-field PHRASE keyword (round-5): the synonym branch is a 2-token
# sequence that must match ADJACENTLY per field; the original is a
# single token — the reference's convertSpotNameQuery 4-branch shape
# with whereQuery.go's contains-phrase semantics
MF_PHRASE_QUERY = "tablehash"
MF_PHRASE_SYN = {"tablehash": f"{PHRASE_T1} {PHRASE_T2}"}


def _q_bm25_phrase_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5: multi-word keywords phrase-match PER FIELD with the
    synonym-branch OR (whereQuery.go:43-57 x convertSpotNameQuery.go:
    11-17); scoring stays the cross-field fixed-point BM25 sum, so
    phrase only shrinks candidacy. Oracle recomputes per-field
    adjacency from ordered token positions + the same score."""
    from micce_search_engine_spark.operators.multifield import multifield_scored

    ce = _mf_engine(spark, sf_dir)
    out = multifield_scored(ce.engines, MF_PHRASE_QUERY, MF_PHRASE_SYN, phrase=True)
    return out.select("doc_id", F.round("score", 6).alias("score_r"))


def _q_bm25_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field keyword search (name/korea_name analog): candidacy =
    some branch fully matched in SOME field; score = cross-field sum of
    per-field fixed-point BM25 (convertSpotNameQuery.go:11-17 +
    spot.sd:9-17)."""
    from micce_search_engine_spark.operators.multifield import multifield_scored

    ce = _mf_engine(spark, sf_dir)
    out = multifield_scored(ce.engines, MF_QUERY, ce.synonyms)
    return out.select("doc_id", F.round("score", 6).alias("score_r"))


def _q_geo_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword + geo-radius condition ranked by the closeness profile
    (whereQuery.go:59-77, convertGeoQuery.go:10, spot.profile:3-5).
    Returns ALL in-radius matches (ordering-free check; values carry
    the ranking)."""
    ce = _mf_engine(spark, sf_dir)
    cand = ce.search_frame(
        {
            "keyword": "spark",
            "geo": {"lat": 10.0, "lon": 20.0, "radius_km": 5000.0},
            "rank_profile": "closeness",
            "limit": 10,
            "page": 1,
        }
    )
    return cand.select("doc_id", F.round("score", 6).alias("closeness_r"))


def _q_condition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SearchCondition: keyword AND category AND bool AND
    comparison filters, BM25 profile (SearchCondition.go:9-21,
    whereQuery.go:79-122)."""
    ce = _mf_engine(spark, sf_dir)
    cand = ce.search_frame(
        {
            "keyword": "merge",
            "category": "src3",
            "has_images": True,
            "filters": [("n_chars", ">=", 200)],
            "rank_profile": "bm25",
            "limit": 10,
            "page": 1,
        }
    )
    return cand.select("doc_id", F.round("score", 6).alias("score_r"))


def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.functions.text_analysis import lang_id

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.functions.text_analysis import quality_score

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality_r")
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.functions.text_analysis import (
        subword_estimate,
        token_count,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_estimate(F.col("text")).alias("n_subwords"),
    )


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from micce_search_engine_spark.functions.text_analysis import fingerprint

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


# html synthesized around documents.text — IDENTICAL string built by the
# Spark entry and the SQL oracle, then both extract independently
_HTML_PRE = (
    '<html><head><style>p {c: red}</style></head>'
    '<body><h1>Doc &amp; title</h1><p>'
)
_HTML_POST = '</p><script>var x = "<p>";</script></body></html>'


def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """html -> text extraction (mapInArrow over binary; SURVEY §2D's
    reserved extraction pass), oracle = the same RE2-safe rule chain in
    DuckDB regexp_replace."""
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.functions.html_extract import extract_text_df

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit(_HTML_PRE), F.coalesce(F.col("text"), F.lit("")), F.lit(_HTML_POST)
            ),
            "UTF-8",
        ).alias("html"),
    )
    return extract_text_df(docs, key_col="doc_id").select(
        "doc_id", F.col("text").alias("extracted")
    )


def _q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.multimodal import extract_binary_meta

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).withColumn(
        "payload", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    )
    meta = extract_binary_meta(docs, binary_col="payload")
    return meta.select("doc_id", "n_bytes", "sha256", "magic")


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_pyfiles(spark)
    from micce_search_engine_spark.operators.upsert import merge_pages

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    updates = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.lit(None).cast("string").alias("text"), F.lit("xx").alias("lang")
    )
    new_row = spark.createDataFrame(
        [(int(max_id) + 1, "brand new doc", "en")], "doc_id long, text string, lang string"
    )
    merged = merge_pages(docs, updates.union(new_row), key="doc_id")
    return merged.select(
        "doc_id", "lang", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_fp")
    )


def _q_streaming_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming feed drain (file source + foreachBatch +
    checkpoint); returns ingested row count == table count."""
    _ensure_pyfiles(spark)
    import shutil
    import tempfile

    from micce_search_engine_spark.corpus import pages_spark_schema
    from micce_search_engine_spark.streaming.feed import run_feed_once

    docs = _docs_as_pages(spark, sf_dir).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("html"),
        "text",
        "lang",
    )
    work = tempfile.mkdtemp(prefix="mse_feed_")
    try:
        landing = os.path.join(work, "landing")
        docs.write.mode("overwrite").parquet(landing)
        run_feed_once(
            spark, landing, os.path.join(work, "out"), os.path.join(work, "ckpt")
        )
        n = (
            spark.read.schema(pages_spark_schema())
            .parquet(os.path.join(work, "out", "data"))
            .count()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame([(n,)], "n_rows long")


def _q_manifest_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage lineage after a (possibly resumed) build: LATEST status per
    stage (max_by updated_at — NOT lexicographic max, which would report
    PROCESSING > COMPLETED forever). Oracle: the state machine must have
    driven every build stage to COMPLETED."""
    eng = _engine(spark, sf_dir)
    m = spark.read.parquet(os.path.join(eng.paths.root, "_manifest"))
    return (
        m.filter(F.col("partition_id") == -1)
        .groupBy("stage")
        .agg(F.max_by("status", "updated_at").alias("final_status"))
        .orderBy("stage")
    )


def _q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window count over the events stream
    (event-time semantics; availableNow drain == batch GROUP BY, which
    the oracle checks via time_bucket)."""
    _ensure_pyfiles(spark)
    import shutil
    import tempfile

    from micce_search_engine_spark.streaming.windows import windowed_event_counts

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the streaming file source wants a DIRECTORY; stage the single
    # parquet file into one (symlink; copy as fallback)
    work = tempfile.mkdtemp(prefix="mse_winagg_")
    try:
        dst = os.path.join(work, "events.parquet")
        try:
            os.symlink(os.path.abspath(path), dst)
        except OSError:
            shutil.copy(path, dst)
        out = windowed_event_counts(spark, work, schema, window="10 minutes")
        out = out.localCheckpoint(eager=True)  # materialize before cleanup
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def _q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"))
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def _q_json_decode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 analog: vectorized JSON decode of event payloads
    (/root/reference/reader/internal/service/read_service.go:166-181)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.filter(F.col("event_type") == "click").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def _q_semi_join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 analog: point-lookup batch fetch as a broadcast left-semi join
    (Firestore `WHERE id IN (<=30 ids)`,
    /root/reference/reader/internal/repository/firestore/firestore_client.go:28-30)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    ids = spark.createDataFrame([(k,) for k in range(1, 31)], "l_orderkey long")
    return li.join(F.broadcast(ids), "l_orderkey", "left_semi").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


def _docs_with_term(spark, sf_dir, term):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
    return docs.filter(F.array_contains(toks, term)).select("doc_id")


def _q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (Q2 OR=union family): intersect + except."""
    a = _docs_with_term(spark, sf_dir, "spark")
    b = _docs_with_term(spark, sf_dir, "join")
    c = _docs_with_term(spark, sf_dir, "merge")
    return a.intersect(b).exceptAll(c).select("doc_id")


def _q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


def _q_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
        )
    )


def _q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions via lag + running sum windows."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # double-precision epoch seconds on BOTH sides (DuckDB epoch() keeps
    # the fractional part; a long cast would truncate differently)
    # parquet stores TIMESTAMP_NTZ which can't cast straight to double;
    # hop via timestamp (session TZ pinned UTC) to get epoch seconds
    sec = F.col("ts").cast("timestamp").cast("double")
    gap = (sec - F.lag(sec).over(w)) > 1800.0
    return (
        ev.withColumn("new_sess", F.when(gap, 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "event_id", "session_id")
    )


def _q_window_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batched BM25 top-k over the sf0.001 documents corpus
    through the full index pipeline."""
    return _q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": _q_bm25_topk,
        "bm25_totals": _q_bm25_totals,
        "bm25_wand_single": _q_bm25_wand_single,
        "bm25_wand_multi": _q_bm25_wand_multi,
        "bm25_wand_batch": _q_bm25_wand_batch,
        "bm25_phrase": _q_bm25_phrase,
        "bm25_phrase_batch": _q_bm25_phrase_batch,
        "bm25_phrase_multifield": _q_bm25_phrase_multifield,
        "cjk_bigram_search": _q_cjk_bigram_search,
        "posting_roundtrip": _q_posting_roundtrip,
        "corpus_stats": _q_corpus_stats,
        "term_stats": _q_term_stats,
        "docid_assignment": _q_docid_assignment,
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "minhash_lsh": _q_minhash_lsh,
        "simhash": _q_simhash,
        "embedding_topk": _q_embedding_topk,
        "embedding_neardup": _q_embedding_neardup,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_ivf_trained": _q_ann_ivf_trained,
        "bm25_multifield": _q_bm25_multifield,
        "geo_search": _q_geo_search,
        "condition_filters": _q_condition_filters,
        "langid": _q_langid,
        "quality": _q_quality,
        "token_counts": _q_token_counts,
        "fingerprint": _q_fingerprint,
        "multimodal_meta": _q_multimodal_meta,
        "html_extract": _q_html_extract,
        "merge_upsert": _q_merge_upsert,
        "streaming_feed": _q_streaming_feed,
        "stream_windowed_counts": _q_stream_windowed_counts,
        "manifest_lineage": _q_manifest_lineage,
        "agg_pricing_summary": _q_agg_pricing_summary,
        "join_top_customers": _q_join_top_customers,
        "window_latest_event": _q_window_latest_event,
        "json_decode_events": _q_json_decode_events,
        "semi_join_lookup": _q_semi_join_lookup,
        "set_ops": _q_set_ops,
        "rollup_orders": _q_rollup_orders,
        "median_prices": _q_median_prices,
        "pivot_events": _q_pivot_events,
        "sessionize_events": _q_sessionize_events,
    }


# ---------------------------------------------------------------------------
# oracle_sql()
# ---------------------------------------------------------------------------


def _minhash_sql() -> str:
    return f"""
WITH {_SHINGLES},
sz AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
sig AS (
  SELECT doc_id, s.seed,
         min(('0x' || substr(md5('s' || s.seed || '#' || shingle), 1, 8))::BIGINT) AS m
  FROM sh, (SELECT unnest(range(16)) AS seed) s
  GROUP BY 1, 2
),
banded AS (
  SELECT doc_id, seed // 4 AS band,
         string_agg(m::VARCHAR, ',' ORDER BY seed) AS key
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  JOIN cand c ON c.doc_a = x.doc_id AND c.doc_b = y.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.i * 1.0 / (sa.n_sh + sb.n_sh - i.i), 6)::DOUBLE AS jaccard_r
FROM inter i JOIN sz sa ON i.doc_a = sa.doc_id JOIN sz sb ON i.doc_b = sb.doc_id
WHERE i.i * 1.0 / (sa.n_sh + sb.n_sh - i.i) >= 0.5
"""


def _langid_sql() -> str:
    from micce_search_engine_spark.functions.text_analysis import LANG_STOPWORDS

    hits = {
        code: "len(list_filter(string_split(lower(coalesce(text,'')), ' '), x -> x IN ("
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[code])
        + ")))"
        for code in sorted(LANG_STOPWORDS)
    }
    h = {c: f"n_{c}" for c in hits}
    cols = ", ".join(f"{expr} AS {h[c]}" for c, expr in hits.items())
    return f"""
WITH x AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id,
  CASE WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
       WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
       WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
       WHEN n_es >= n_fr THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM x
"""


def _quality_sql() -> str:
    from micce_search_engine_spark.functions.text_analysis import LANG_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(coalesce(text,'')), ' '), x -> x <> '') AS toks
  FROM documents
),
x AS (
  SELECT doc_id,
         len(toks)::DOUBLE AS n,
         len(list_filter(toks, x -> x IN ({stops})))::DOUBLE AS n_stop,
         list_sum(list_transform(toks, x -> length(x)))::DOUBLE AS total_len
  FROM t
)
SELECT doc_id,
  round(
    0.4 * least(n / 100.0, 1.0)
    + 0.3 * least((n_stop / greatest(n, 1)) / 0.3, 1.0)
    + 0.3 * (CASE WHEN coalesce(total_len, 0) / greatest(n, 1) BETWEEN 3.0 AND 12.0
             THEN 1.0 ELSE 0.0 END),
  6)::DOUBLE AS quality_r
FROM x
"""


def _mf_toks_sql() -> str:
    """Two-field token/stat CTEs: T = text, K = derived title."""
    out = []
    for tag, expr in (("T", "lower(coalesce(text, ''))"), ("K", f"lower({_TITLE_SQL})")):
        out.append(
            f"""
toks{tag} AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split({expr}, ' ')) AS t(term)
  WHERE t.term <> ''
),
tf{tag} AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks{tag} GROUP BY 1, 2),
dl{tag} AS (
  SELECT d.doc_id, coalesce(x.dl, 0)::BIGINT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks{tag} GROUP BY 1) x USING (doc_id)
),
stats{tag} AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl{tag}) AS avgdl
),
df{tag} AS (SELECT term, count(*)::BIGINT AS df FROM tf{tag} GROUP BY 1)"""
        )
    return ",".join(out)


def _mf_toks_pos_sql() -> str:
    """Per-field ORDERED token positions (ordinality from the split
    order — see _TOKS_POS): tpT = text, tpK = derived title."""
    out = []
    for tag, expr in (("T", "lower(coalesce(text, ''))"), ("K", f"lower({_TITLE_SQL})")):
        out.append(
            f"""
tp{tag} AS (
  SELECT doc_id,
         generate_subscripts(parts, 1) - 1 AS pos,
         unnest(parts) AS term
  FROM (
    SELECT doc_id, list_filter(string_split({expr}, ' '), x -> x <> '') AS parts
    FROM documents
  )
)"""
        )
    return ",".join(out)


def _phrase_join_sql(rel: str, b: list[str], qid_expr: str = "") -> str:
    """One SELECT of doc_ids where relation ``rel`` (doc_id, pos, term)
    contains the token sequence ``b`` consecutively."""
    head = f"SELECT {qid_expr}a0.doc_id FROM {rel} a0"
    joins = " ".join(
        f"JOIN {rel} a{i} ON a{i}.doc_id = a0.doc_id "
        f"AND a{i}.pos = a0.pos + {i} AND a{i}.term = '{b[i]}'"
        for i in range(1, len(b))
    )
    return f"{head} {joins} WHERE a0.term = '{b[0]}'"


def _mf_cand_phrase_sql(query_text: str, synonyms: dict[str, str]) -> str:
    """Phrase candidacy: some OR branch's token sequence CONSECUTIVE in
    some field (single-token branches degrade to presence)."""
    branches = expand_branches(query_text, synonyms)
    sels = []
    for tag in ("T", "K"):
        for b in branches:
            if len(b) == 1:
                sels.append(f"SELECT doc_id FROM tp{tag} WHERE term = '{b[0]}'")
            else:
                sels.append(_phrase_join_sql(f"tp{tag}", b))
    return "cand AS (SELECT DISTINCT doc_id FROM (" + " UNION ALL ".join(sels) + "))"


def _mf_cand_sql(query_text: str) -> str:
    """Candidacy: some OR branch fully matched in SOME field."""
    branches = expand_branches(query_text, SYNONYMS)
    sels = []
    for tag in ("T", "K"):
        for b in branches:
            uniq = sorted(set(b))
            terms = ", ".join(f"'{t}'" for t in uniq)
            sels.append(
                f"SELECT doc_id FROM tf{tag} WHERE term IN ({terms}) "
                f"GROUP BY doc_id HAVING count(*) = {len(uniq)}"
            )
    return "cand AS (SELECT DISTINCT doc_id FROM (" + " UNION ALL ".join(sels) + "))"


def _mf_score_sql(query_text: str, synonyms: dict[str, str] | None = None) -> str:
    """Per-field fixed-point BM25 sums cT/cK over the expanded terms +
    the cross-field combined score CTE 'mfscore'."""
    branches = expand_branches(query_text, SYNONYMS if synonyms is None else synonyms)
    qterms = sorted({t for b in branches for t in b})
    in_list = ", ".join(f"'{t}'" for t in qterms)
    parts = []
    for tag in ("T", "K"):
        parts.append(
            f"""
c{tag} AS (
  SELECT f.doc_id,
         sum(floor(
           ln((s.n - coalesce(d.df, 0) + 0.5) / (coalesce(d.df, 0) + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT) AS fx
  FROM tf{tag} f
  JOIN dl{tag} l USING (doc_id)
  CROSS JOIN stats{tag} s
  LEFT JOIN df{tag} d ON d.term = f.term
  WHERE f.term IN ({in_list})
  GROUP BY 1
)"""
        )
    parts.append(
        """
mfscore AS (
  SELECT c.doc_id,
         (coalesce(t.fx, 0) + coalesce(k.fx, 0))::DOUBLE / 1e9 AS score
  FROM cand c
  LEFT JOIN cT t ON t.doc_id = c.doc_id
  LEFT JOIN cK k ON k.doc_id = c.doc_id
)"""
    )
    return ",".join(parts)


def _phrase_batch_sql() -> str:
    """Batched phrase oracle: per-query candidacy is ADJACENCY for
    phrase-flagged queries (from ordered token positions) and the usual
    branch-AND for bag-of-words queries; scoring/pagination/lang
    filters/totals are identical to _bm25_sql."""
    qmeta_rows, qbranch_rows, cand_sels = [], [], []
    for q in PHRASE_SPECS:
        lf = "NULL" if q["lang_filter"] is None else f"'{q['lang_filter']}'"
        qmeta_rows.append(
            f"({q['query_id']}, {lf}::VARCHAR, {q['limit']}, {q['page']})"
        )
        for bi, b in enumerate(expand_branches(q["query_text"], SYNONYMS)):
            uniq = sorted(set(b))
            for t in uniq:
                qbranch_rows.append(f"({q['query_id']}, {bi}, {len(uniq)}, '{t}')")
            if q.get("phrase"):
                if len(b) == 1:
                    cand_sels.append(
                        f"SELECT {q['query_id']} AS query_id, doc_id "
                        f"FROM toks_pos WHERE term = '{b[0]}'"
                    )
                else:
                    cand_sels.append(
                        _phrase_join_sql(
                            "toks_pos", b, qid_expr=f"{q['query_id']} AS query_id, "
                        )
                    )
            else:
                terms = ", ".join(f"'{t}'" for t in uniq)
                cand_sels.append(
                    f"SELECT {q['query_id']} AS query_id, doc_id FROM tf "
                    f"WHERE term IN ({terms}) "
                    f"GROUP BY doc_id HAVING count(*) = {len(uniq)}"
                )
    qmeta_vals = ", ".join(qmeta_rows)
    qbranch_vals = ", ".join(qbranch_rows)
    cand_union = " UNION ALL ".join(cand_sels)
    return f"""
WITH {_TOKS},
{_TOKS_POS.strip()},
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qmeta(query_id, lang_filter, lim, pg) AS (VALUES {qmeta_vals}),
qbranch(query_id, branch_id, branch_size, term) AS (VALUES {qbranch_vals}),
qterms AS (SELECT DISTINCT query_id, term FROM qbranch),
contrib AS (
  SELECT q.query_id, f.doc_id,
         floor(
           ln((s.n - coalesce(d.df, 0) + 0.5) / (coalesce(d.df, 0) + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT AS c_fx
  FROM qterms q
  JOIN tf f USING (term)
  JOIN dl l ON f.doc_id = l.doc_id
  CROSS JOIN stats s
  LEFT JOIN tdf d ON d.term = q.term
),
scored AS (
  SELECT query_id, doc_id, sum(c_fx)::DOUBLE / 1e9 AS score
  FROM contrib GROUP BY 1, 2
),
cand AS (SELECT DISTINCT query_id, doc_id FROM ({cand_union})),
filtered AS (
  SELECT s.query_id, s.doc_id, s.score
  FROM scored s
  JOIN cand USING (query_id, doc_id)
  JOIN qmeta m USING (query_id)
  JOIN documents d ON d.doc_id = s.doc_id
  WHERE m.lang_filter IS NULL OR d.lang = m.lang_filter
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY query_id) AS total
  FROM filtered
)
SELECT r.query_id, r.doc_id,
       (r.rn - m.lim * (m.pg - 1))::INT AS rank,
       round(r.score, 6)::DOUBLE AS score_r,
       r.total::BIGINT AS total_hits,
       (r.total - m.lim * m.pg <= 0) AS last_page
FROM ranked r JOIN qmeta m USING (query_id)
WHERE r.rn > m.lim * (m.pg - 1) AND r.rn <= m.lim * m.pg
"""


# mirrors functions/geo.py haversine_km exactly (same operand order)
_HAV_SQL = (
    "2.0 * 6371.0 * asin(sqrt("
    "power(sin((radians({clat}) - radians(a.lat)) / 2), 2)"
    " + cos(radians(a.lat)) * cos(radians({clat}))"
    " * power(sin((radians({clon}) - radians(a.lon)) / 2), 2)))"
)


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}
    sqls["bm25_topk"] = _bm25_sql(
        """
SELECT r.query_id, r.doc_id,
       (r.rn - m.lim * (m.pg - 1))::INT AS rank,
       round(r.score, 6)::DOUBLE AS score_r,
       r.total::BIGINT AS total_hits,
       (r.total - m.lim * m.pg <= 0) AS last_page
FROM ranked r JOIN qmeta m USING (query_id)
WHERE r.rn > m.lim * (m.pg - 1) AND r.rn <= m.lim * m.pg"""
    )
    sqls["bm25_totals"] = _bm25_sql(
        """
SELECT m.query_id,
       coalesce(t.total, 0)::BIGINT AS total_hits,
       (coalesce(t.total, 0) - m.lim * m.pg <= 0) AS last_page
FROM qmeta m
LEFT JOIN (SELECT DISTINCT query_id, total FROM ranked) t USING (query_id)"""
    )
    sqls["bm25_wand_single"] = f"""
WITH {_TOKS},
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tdf AS (SELECT count(*)::BIGINT AS df FROM tf WHERE term = 'spark'),
scored AS (
  SELECT f.doc_id,
         floor(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT::DOUBLE / 1e9 AS score
  FROM tf f JOIN dl l USING (doc_id) CROSS JOIN stats s CROSS JOIN tdf d
  WHERE f.term = 'spark'
)
SELECT doc_id, round(score, 6)::DOUBLE AS score_r
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""
    sqls["bm25_wand_multi"] = f"""
WITH {_TOKS},
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tdf AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN ('spark', 'join') GROUP BY 1
),
contrib AS (
  SELECT f.doc_id,
         floor(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT AS c_fx
  FROM tf f JOIN dl l USING (doc_id) CROSS JOIN stats s
  JOIN tdf d ON d.term = f.term
  WHERE f.term IN ('spark', 'join')
),
scored AS (
  SELECT doc_id, sum(c_fx) AS s_fx, count(*) AS m FROM contrib GROUP BY 1
)
SELECT doc_id, round(s_fx::DOUBLE / 1e9, 6)::DOUBLE AS score_r
FROM scored WHERE m = 2 ORDER BY s_fx DESC, doc_id LIMIT 10
"""
    sqls["bm25_wand_batch"] = _bm25_sql(
        """
SELECT r.query_id, r.doc_id,
       (r.rn - m.lim * (m.pg - 1))::INT AS rank,
       round(r.score, 6)::DOUBLE AS score_r
FROM ranked r JOIN qmeta m USING (query_id)
WHERE r.rn > m.lim * (m.pg - 1) AND r.rn <= m.lim * m.pg"""
    )
    sqls["bm25_phrase"] = f"""
WITH {_TOKS},
{_TOKS_POS.strip()},
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
),
tdf AS (
  SELECT term, count(*)::BIGINT AS df FROM tf
  WHERE term IN ('{PHRASE_T1}', '{PHRASE_T2}') GROUP BY 1
),
phrase AS (
  SELECT DISTINCT a.doc_id
  FROM toks_pos a JOIN toks_pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{PHRASE_T1}' AND b.term = '{PHRASE_T2}'
),
contrib AS (
  SELECT f.doc_id,
         floor(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (f.tf * {K1_P1!r}
              / (f.tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * l.dl / s.avgdl)))
           * 1e9
         )::BIGINT AS c_fx
  FROM tf f JOIN dl l USING (doc_id) CROSS JOIN stats s JOIN tdf d ON d.term = f.term
  WHERE f.term IN ('{PHRASE_T1}', '{PHRASE_T2}')
),
scored AS (
  SELECT c.doc_id, sum(c.c_fx)::DOUBLE / 1e9 AS score
  FROM contrib c JOIN phrase USING (doc_id) GROUP BY 1
)
SELECT doc_id, round(score, 6)::DOUBLE AS score_r,
       (SELECT count(*) FROM phrase)::BIGINT AS total_hits
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""
    sqls["bm25_phrase_batch"] = _phrase_batch_sql()
    sqls["bm25_phrase_multifield"] = f"""
WITH {_mf_toks_sql()},
{_mf_toks_pos_sql()},
{_mf_cand_phrase_sql(MF_PHRASE_QUERY, MF_PHRASE_SYN)},
{_mf_score_sql(MF_PHRASE_QUERY, MF_PHRASE_SYN)}
SELECT doc_id, round(score, 6)::DOUBLE AS score_r FROM mfscore
"""
    sqls["cjk_bigram_search"] = _cjk_sql()
    sqls["posting_roundtrip"] = f"""
WITH {_TOKS}
SELECT f.term, f.doc_id, f.tf, l.dl
FROM tf f JOIN dl l USING (doc_id)
WHERE f.term IN ({", ".join(f"'{t}'" for t in PROBE_TERMS)})
"""
    sqls["corpus_stats"] = f"""
WITH {_TOKS}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       round((SELECT avg(dl) FROM dl), 6)::DOUBLE AS avgdl_r
"""
    sqls["term_stats"] = f"""
WITH {_TOKS}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term HAVING count(*) >= 100
"""
    sqls["docid_assignment"] = """
SELECT 'doc://' || doc_id AS url,
       (row_number() OVER (ORDER BY 'doc://' || doc_id) - 1)::BIGINT AS rank_id
FROM documents
"""
    sqls["exact_dedup"] = """
SELECT min(doc_id)::BIGINT AS doc_id, md5(lower(coalesce(text, ''))) AS fp,
       count(*)::BIGINT AS group_size
FROM documents GROUP BY 2
"""
    sqls["ngram_jaccard"] = f"""
WITH {_SHINGLES},
sz AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.i * 1.0 / (sa.n_sh + sb.n_sh - i.i), 6)::DOUBLE AS jaccard_r
FROM inter i JOIN sz sa ON i.doc_a = sa.doc_id JOIN sz sb ON i.doc_b = sb.doc_id
WHERE i.i * 1.0 / (sa.n_sh + sb.n_sh - i.i) >= 0.5
"""
    sqls["minhash_lsh"] = _minhash_sql()
    sqls["simhash"] = f"""
WITH {_TOKS},
h AS (
  SELECT doc_id, tf, ('0x' || substr(md5('s0#' || term), 1, 8))::BIGINT AS h
  FROM tf
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM h, (SELECT unnest(range(32)) AS bit) b
  GROUP BY 1, 2
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY 1
"""
    sqls["embedding_topk"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT vec_id,
         list_sum(list_transform(list_zip(embedding, (SELECT qv FROM q)),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS na,
         (SELECT sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) FROM q) AS nb
  FROM embeddings WHERE vec_id <> 0
)
SELECT vec_id, round(dot / (na * nb), 6)::DOUBLE AS cosine_r
FROM d ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10
"""
    sqls["embedding_neardup"] = """
WITH d AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) AS na,
         sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))) AS nb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(dot / (na * nb), 6)::DOUBLE AS cosine_r
FROM d WHERE dot / (na * nb) >= 0.42
"""
    sqls["langid"] = _langid_sql()
    sqls["quality"] = _quality_sql()
    sqls["token_counts"] = """
SELECT doc_id,
       len(list_filter(string_split(lower(coalesce(text, '')), ' '), x -> x <> ''))::INT AS n_tokens,
       ceil(length(coalesce(text, '')) / 4.0)::BIGINT AS n_subwords
FROM documents
"""
    sqls["fingerprint"] = """
SELECT doc_id, md5(lower(coalesce(text, ''))) AS fp FROM documents
"""
    from micce_search_engine_spark.functions.html_extract import EXTRACT_SQL_EXPR

    _html_col = (
        f"('{_HTML_PRE}' || coalesce(text, '') || '{_HTML_POST.replace(chr(39), chr(39) * 2)}')"
    )
    sqls["html_extract"] = f"""
SELECT doc_id, {EXTRACT_SQL_EXPR.format(col=_html_col)} AS extracted
FROM documents
"""
    sqls["multimodal_meta"] = """
SELECT doc_id,
       octet_length(encode(coalesce(text, '')))::BIGINT AS n_bytes,
       sha256(coalesce(text, '')) AS sha256,
       substr(coalesce(text, ''), 1, 6) AS magic
FROM documents
"""
    sqls["merge_upsert"] = """
WITH updates AS (
  SELECT doc_id, NULL::VARCHAR AS u_text, 'xx' AS u_lang
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT (SELECT max(doc_id) + 1 FROM documents), 'brand new doc', 'en'
),
m AS (
  SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
         coalesce(u.u_text, t.text) AS text,
         coalesce(u.u_lang, t.lang) AS lang
  FROM documents t FULL OUTER JOIN updates u ON t.doc_id = u.doc_id
)
SELECT doc_id, lang, md5(coalesce(text, '')) AS text_fp FROM m
"""
    sqls["streaming_feed"] = "SELECT count(*)::BIGINT AS n_rows FROM documents"
    sqls["stream_windowed_counts"] = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       event_type, count(*)::BIGINT AS n
FROM events GROUP BY 1, 2
"""
    sqls["agg_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""
    sqls["join_top_customers"] = """
SELECT c.c_custkey, c.c_name, r.revenue
FROM (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue
  FROM orders GROUP BY 1
) r JOIN customer c ON r.o_custkey = c.c_custkey
ORDER BY r.revenue DESC, c.c_custkey LIMIT 10
"""
    sqls["json_decode_events"] = """
SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
FROM events WHERE event_type = 'click'
"""
    sqls["semi_join_lookup"] = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem WHERE l_orderkey IN (
  SELECT unnest(range(1, 31)))
"""
    sqls["set_ops"] = """
WITH t AS (SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS toks FROM documents)
(SELECT doc_id FROM t WHERE list_contains(toks, 'spark')
 INTERSECT
 SELECT doc_id FROM t WHERE list_contains(toks, 'join'))
EXCEPT ALL
SELECT doc_id FROM t WHERE list_contains(toks, 'merge')
"""
    sqls["rollup_orders"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""
    sqls["median_prices"] = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 6)::DOUBLE AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 6)::DOUBLE AS p90_price
FROM orders GROUP BY o_orderstatus
"""
    sqls["pivot_events"] = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY user_id
"""
    sqls["sessionize_events"] = """
SELECT user_id, event_id,
       sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
FROM (
  SELECT user_id, event_id, ts,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
)
"""
    sqls["window_latest_event"] = """
SELECT user_id, event_id, event_type
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""
    sqls["manifest_lineage"] = """
SELECT stage, final_status FROM (VALUES
  ('S1_tokenize', 'COMPLETED'),
  ('S2_stats', 'COMPLETED'),
  ('S3_segments', 'COMPLETED')
) AS t(stage, final_status)
"""
    sqls["bm25_multifield"] = f"""
WITH {_mf_toks_sql()},
{_mf_cand_sql(MF_QUERY)},
{_mf_score_sql(MF_QUERY)}
SELECT doc_id, round(score, 6)::DOUBLE AS score_r FROM mfscore
"""
    hav = _HAV_SQL.format(clat="10.0", clon="20.0")
    sqls["geo_search"] = f"""
WITH {_mf_toks_sql()},
{_mf_cand_sql("spark")},
{_ATTRS_SQL},
geo AS (
  SELECT a.doc_id, {hav} AS km
  FROM attrs a JOIN cand USING (doc_id)
)
SELECT doc_id, round(1.0 / (1.0 + km), 6)::DOUBLE AS closeness_r
FROM geo WHERE km <= 5000.0
"""
    sqls["condition_filters"] = f"""
WITH {_mf_toks_sql()},
{_mf_cand_sql("merge")},
{_mf_score_sql("merge")},
{_ATTRS_SQL}
SELECT m.doc_id, round(m.score, 6)::DOUBLE AS score_r
FROM mfscore m
JOIN attrs a USING (doc_id)
WHERE a.category = 'src3' AND a.has_images AND a.n_chars >= 200
"""
    # integer-exact LSH: md5-derived int32 hyperplanes x 2^20 fixed-point
    # components reproduce buckets/probes/candidates bit-for-bit
    sqls["ann_lsh_topk"] = """
WITH dims AS (
  SELECT unnest(generate_series(0, len(embedding) - 1)) AS j
  FROM embeddings WHERE vec_id = 0
),
planes AS (
  SELECT i.range AS i, d.j AS j,
         ('0x' || substr(md5('p42#' || i.range || '#' || d.j), 1, 8))::BIGINT
           - 2147483648 AS v
  FROM range(8) i, dims d
),
vecs AS (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1048576.0)::BIGINT) AS vfx,
         embedding
  FROM embeddings
),
proj AS (
  SELECT w.vec_id, p.i, sum(p.v * w.vfx[p.j + 1])::BIGINT AS dot
  FROM vecs w, planes p GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
  FROM proj GROUP BY 1
),
qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
flips AS (SELECT i FROM proj WHERE vec_id = 0 ORDER BY abs(dot), i LIMIT 7),
probes AS (
  SELECT bucket AS b FROM qb
  UNION ALL
  SELECT xor((SELECT bucket FROM qb), (1::BIGINT << i)) FROM flips
),
cand AS (
  SELECT b2.vec_id FROM buckets b2
  WHERE b2.vec_id <> 0 AND b2.bucket IN (SELECT b FROM probes)
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT v.vec_id,
         list_sum(list_transform(list_zip(v.embedding, (SELECT qv FROM q)),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(v.embedding, x -> x::DOUBLE * x::DOUBLE))) AS na,
         (SELECT sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) FROM q) AS nb
  FROM vecs v JOIN cand USING (vec_id)
)
SELECT vec_id, round(dot / (na * nb), 6)::DOUBLE AS cosine_r
FROM d ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10
"""
    # IVF-flat: centroids = the 8 lowest-id data vectors; assignment by
    # squared L2 (exact double math, centroid-id tie-break), probe the
    # 4 nearest lists, exact cosine within them — mirrors ivf_topk
    sqls["ann_ivf_topk"] = """
WITH cents AS (
  SELECT vec_id - 1 AS cid, embedding AS cvec
  FROM embeddings WHERE vec_id BETWEEN 1 AND 8
),
d2 AS (
  SELECT e.vec_id, c.cid,
         list_sum(list_transform(list_zip(e.embedding, c.cvec),
                  p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE))) AS d
  FROM embeddings e, cents c
),
assigned AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d2 WHERE vec_id <> 0
  ) WHERE rn = 1
),
probes AS (
  SELECT cid FROM d2 WHERE vec_id = 0 ORDER BY d, cid LIMIT 4
),
cand AS (
  SELECT a.vec_id FROM assigned a WHERE a.cid IN (SELECT cid FROM probes)
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sc AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, (SELECT qv FROM q)),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE)) AS dot,
         sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) AS na,
         (SELECT sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) FROM q) AS nb
  FROM embeddings e JOIN cand USING (vec_id)
)
SELECT vec_id, round(dot / (na * nb), 6)::DOUBLE AS cosine_r
FROM sc ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10
"""
    sqls["ann_ivf_trained"] = _ivf_trained_sql()
    return sqls
