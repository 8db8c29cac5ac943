"""Rank-identity of the Spark engine vs the brute-force BM25 oracle
(SURVEY.md §5.2 — the stand-in for 'matches the reference's top-k')."""

import pytest

from micce_search_engine_spark.operators.query import SearchEngine

CASES = [
    # (query_text, lang_filter, limit, page)
    ("the", None, 10, 1),          # hottest stopword (Zipf head, salted)
    ("w000000", None, 10, 1),      # hot vocab term
    ("w000001 w000003", None, 5, 1),   # AND of two terms
    ("the of w000002", None, 10, 1),   # stopwords + term AND
    ("alias0", None, 10, 1),       # synonym expansion (OR branches)
    ("w000000", "ja", 10, 1),      # exact lang filter
    ("the", None, 5, 2),           # pagination quirk page 2
    ("the", None, 5, 3),           # page 3
    ("w049999 w048888", None, 10, 1),  # rare terms, likely empty
    ("zzzunknown", None, 10, 1),   # unseen term -> empty
    ("w000007", "de", 7, 2),       # filter + odd limit + page 2
]


@pytest.mark.parametrize("query_text,lang,limit,page", CASES)
def test_rank_identical(spark, tiny_index, oracle, synonyms, query_text, lang, limit, page):
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    got = eng.search(query_text, lang_filter=lang, limit=limit, page=page)
    exp = oracle.search(query_text, lang_filter=lang, limit=limit, page=page, synonyms=synonyms)
    assert got["total_hits"] == exp["total_hits"]
    assert got["last_page"] == exp["last_page"]
    assert [d for d, _ in got["results"]] == [d for d, _ in exp["results"]]
    for (gd, gs), (ed, es) in zip(got["results"], exp["results"]):
        assert abs(gs - es) < 1e-9, (gd, gs, es)


def test_fixture_query_set_sample(spark, tiny_index, oracle, synonyms, queries_pdf):
    """A slice of the FIXTURES.md §3 reference query set."""
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    for row in queries_pdf.head(12).itertuples():
        got = eng.search(
            row.query_text,
            lang_filter=row.lang_filter if isinstance(row.lang_filter, str) else None,
            limit=int(row.limit),
            page=int(row.page),
        )
        exp = oracle.search(
            row.query_text,
            lang_filter=row.lang_filter if isinstance(row.lang_filter, str) else None,
            limit=int(row.limit),
            page=int(row.page),
            synonyms=synonyms,
        )
        assert got["total_hits"] == exp["total_hits"], row.query_text
        assert [d for d, _ in got["results"]] == [d for d, _ in exp["results"]]


def test_wand_topk_matches_exact(spark, tiny_index, synonyms):
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    # force probe engagement: at test scale the adaptive floor would
    # skip pruning (round-4), and this test is ABOUT the pruning path
    eng.wand_engage_factor = 0
    for q in ["the", "w000000", "alias0", "a"]:
        exact = eng.search(q, limit=10, page=1)
        wand = eng.search(q, limit=10, page=1, topk_only=True)
        assert [d for d, _ in wand["results"]] == [d for d, _ in exact["results"]]
        for (gd, gs), (ed, es) in zip(wand["results"], exact["results"]):
            assert abs(gs - es) < 1e-9


def test_validation():
    from micce_search_engine_spark.operators.query import SearchEngine  # noqa

    # limit/page required >= 1 (SearchCondition.go:32-44 analog)
    class Dummy(SearchEngine):
        def __init__(self):
            pass

    d = Dummy()
    with pytest.raises(ValueError):
        d.search("x", limit=0, page=1)
    with pytest.raises(ValueError):
        d.search("x", limit=5, page=0)


def test_wand_generalized_matches_exact(spark, tiny_index, synonyms):
    """Round-3: WAND pruning with multi-term AND branches, synonyms
    and lang filters — previously these fell back to full decode."""
    eng = SearchEngine(spark, tiny_index, synonyms=synonyms)
    eng.wand_engage_factor = 0  # force probe engagement at test scale
    cases = [
        ("the w000001", None),
        ("w000000 w000002", None),
        ("the", "ja"),
        ("alias0 the", "en"),
    ]
    for q, lf in cases:
        exact = eng.search(q, lang_filter=lf, limit=10, page=1)
        wand = eng.search(q, lang_filter=lf, limit=10, page=1, topk_only=True)
        assert [d for d, _ in wand["results"]] == [d for d, _ in exact["results"]], (q, lf)
        for (gd, gs), (ed, es) in zip(wand["results"], exact["results"]):
            assert abs(gs - es) < 1e-9
