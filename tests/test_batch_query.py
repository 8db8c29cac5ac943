"""Batched multi-query plan vs the single-query engine and the oracle:
same hits, same fixed-point scores, same totals/pagination — one
relational plan for N queries (SURVEY.md §2D)."""

import pytest

from micce_search_engine_spark.operators.batch_query import search_batch, totals_batch
from micce_search_engine_spark.operators.query import SearchEngine

SPECS = [
    {"query_id": 0, "query_text": "the", "lang_filter": None, "limit": 5, "page": 1},
    {"query_id": 1, "query_text": "w000002", "lang_filter": "ja", "limit": 10, "page": 1},
    {"query_id": 2, "query_text": "alias0", "lang_filter": None, "limit": 5, "page": 2},
    {"query_id": 3, "query_text": "zzznope", "lang_filter": None, "limit": 5, "page": 1},
    {"query_id": 4, "query_text": "the w000001", "lang_filter": "nolang", "limit": 5, "page": 1},
    {"query_id": 5, "query_text": "the of", "lang_filter": "de", "limit": 7, "page": 2},
]


@pytest.fixture(scope="module")
def batch_env(spark, tiny_index, synonyms):
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    rows = search_batch(eng, SPECS).collect()
    totals = {r["query_id"]: r for r in totals_batch(eng, SPECS).collect()}
    return eng, rows, totals


def test_batch_matches_single_engine(batch_env):
    eng, rows, _ = batch_env
    for s in SPECS:
        got = sorted(
            ((r["doc_id"], r["score"]) for r in rows if r["query_id"] == s["query_id"]),
        )
        if s["lang_filter"] == "nolang":  # unknown lang -> zero hits
            assert got == []
            continue
        single = eng.search(
            s["query_text"], lang_filter=s["lang_filter"],
            limit=s["limit"], page=s["page"],
        )
        assert got == sorted(single["results"]), s  # EXACT score equality


def test_batch_rank_and_totals(batch_env, oracle, synonyms):
    eng, rows, totals = batch_env
    for s in SPECS:
        lf = None if s["lang_filter"] == "nolang" else s["lang_filter"]
        exp = oracle.search(
            s["query_text"], lang_filter=lf, limit=s["limit"], page=s["page"],
            synonyms=synonyms,
        )
        exp_total = 0 if s["lang_filter"] == "nolang" else exp["total_hits"]
        t = totals[s["query_id"]]
        assert t["total_hits"] == exp_total, s
        assert t["last_page"] == (exp_total - s["limit"] * s["page"] <= 0)
        qrows = sorted(
            (r for r in rows if r["query_id"] == s["query_id"]),
            key=lambda r: r["rank"],
        )
        if s["lang_filter"] == "nolang":
            assert qrows == []
            continue
        assert [r["doc_id"] for r in qrows] == [d for d, _ in exp["results"]], s
        for r in qrows:
            assert r["total_hits"] == exp_total


def test_batch_empty_query_set(spark, tiny_index, synonyms):
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    assert search_batch(eng, []).count() == 0
    specs = [{"query_id": 9, "query_text": "", "lang_filter": None, "limit": 5, "page": 1}]
    assert search_batch(eng, specs).count() == 0
    t = totals_batch(eng, specs).collect()
    assert t[0]["total_hits"] == 0 and t[0]["last_page"]


def test_batch_wand_topk_matches_exact(batch_env):
    """search_batch_topk (per-query block pruning) returns the exact
    same page windows and scores as the unpruned batch path."""
    from micce_search_engine_spark.operators.batch_query import search_batch_topk

    eng, rows, _ = batch_env
    wand = search_batch_topk(eng, SPECS).collect()
    exp = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in rows
    }
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in wand
    }
    assert got == exp
