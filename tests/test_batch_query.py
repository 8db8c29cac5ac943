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


def test_batch_wand_adaptive_split_matches_exact(batch_env):
    """Round-5 adaptive engagement: whichever side of the engagement
    floor a query lands on (forced-all-engaged, forced-none, and a
    mixed split), the page windows are identical."""
    from micce_search_engine_spark.operators.batch_query import search_batch_topk

    eng, rows, _ = batch_env
    exp = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in rows}
    old = eng.wand_engage_factor
    try:
        for factor in (0, 10**9):
            eng.wand_engage_factor = factor
            got = {
                (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
                for r in search_batch_topk(eng, SPECS).collect()
            }
            assert got == exp, factor
        # mixed: pick a floor between the stopword's df-sum and the rare
        # terms' so the batch genuinely splits
        from micce_search_engine_spark import BLOCK_SIZE
        from micce_search_engine_spark.oracle import expand_branches

        sums = {}
        for q in SPECS:
            terms = {
                t for b in expand_branches(q["query_text"], eng.synonyms) for t in b
            }
            k = q["limit"] * q["page"]
            sums[q["query_id"]] = (
                sum(eng._df_cache.get(t, 0) for t in terms) / max(k * BLOCK_SIZE, 1)
            )
        mid = sorted(sums.values())[len(sums) // 2] or 1e-6
        eng.wand_engage_factor = mid
        engaged = [qid for qid, s in sums.items() if s >= mid]
        assert engaged and len(engaged) < len(SPECS)  # both paths exercised
        got = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in search_batch_topk(eng, SPECS).collect()
        }
        assert got == exp
    finally:
        eng.wand_engage_factor = old


def test_batch_phrase_flag(spark, tiny_pages_pdf, synonyms, tmp_path_factory):
    """Round-5 phrase-in-batch: a phrase-flagged query's hits/totals in
    search_batch equal search_phrase; bag-of-words queries in the same
    batch are unaffected; totals_batch and search_batch_topk agree."""
    from micce_search_engine_spark.corpus import pages_spark_schema
    from micce_search_engine_spark.operators.batch_query import search_batch_topk
    from micce_search_engine_spark.operators.index_build import build_index

    idx = str(tmp_path_factory.mktemp("batchphrase") / "idx")
    pages = spark.createDataFrame(tiny_pages_pdf, schema=pages_spark_schema())
    build_index(
        spark, pages, idx, n_buckets=4, max_postings_per_row=300, with_positions=True
    )
    eng = SearchEngine(spark, idx, synonyms=synonyms)
    specs = [
        {"query_id": 0, "query_text": "the of", "lang_filter": None,
         "limit": 5, "page": 1, "phrase": True},
        {"query_id": 1, "query_text": "the of", "lang_filter": None,
         "limit": 5, "page": 1},
        {"query_id": 2, "query_text": "the of", "lang_filter": "en",
         "limit": 5, "page": 1, "phrase": True},
    ]
    rows = search_batch(eng, specs).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in by_q.values():
        q.sort(key=lambda r: r["rank"])

    sp = eng.search_phrase("the of", limit=5, page=1)
    got0 = [(r["doc_id"], r["score"]) for r in by_q[0]]
    assert got0 == sp["results"]
    assert by_q[0][0]["total_hits"] == sp["total_hits"]

    bag = eng.search("the of", limit=5, page=1)
    got1 = [(r["doc_id"], r["score"]) for r in by_q[1]]
    assert got1 == bag["results"]
    assert by_q[1][0]["total_hits"] == bag["total_hits"]
    assert bag["total_hits"] > sp["total_hits"]  # phrase strictly shrinks here

    spl = eng.search_phrase("the of", lang_filter="en", limit=5, page=1)
    got2 = [(r["doc_id"], r["score"]) for r in by_q[2]]
    assert got2 == spl["results"]
    assert by_q[2][0]["total_hits"] == spl["total_hits"]

    t = {r["query_id"]: r["total_hits"] for r in totals_batch(eng, specs).collect()}
    assert t == {0: sp["total_hits"], 1: bag["total_hits"], 2: spl["total_hits"]}

    wand = search_batch_topk(eng, specs).collect()
    gotw = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in wand}
    expw = {(r["query_id"], r["rank"]): (r["doc_id"], r["score"]) for r in rows}
    assert gotw == expw


def test_vectorized_plan_matches_join_plan(spark, tiny_index, synonyms):
    """Round-6: the doc-partitioned vectorized evaluator (dense
    docs x vocabulary numpy panel, fused per-partition top-k/count)
    must return row-identical candidates AND identical final frames to
    the qweights-join fallback plan it replaced."""
    import micce_search_engine_spark.operators.batch_query as bq

    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    new_rows = sorted(map(tuple, search_batch(eng, SPECS).collect()))
    new_cand, _, reduced = bq._candidates(eng, SPECS, with_score=True)
    assert not reduced  # no reduce requested -> plain candidate rows
    new_c = sorted(map(tuple, new_cand.collect()))
    old_max = bq.BATCH_EXPR_MAX
    bq.BATCH_EXPR_MAX = 0  # force the join fallback
    try:
        old_rows = sorted(map(tuple, search_batch(eng, SPECS).collect()))
        old_cand, _, _ = bq._candidates(eng, SPECS, with_score=True)
        old_c = sorted(map(tuple, old_cand.collect()))
    finally:
        bq.BATCH_EXPR_MAX = old_max
    assert new_c == old_c
    assert new_rows == old_rows
