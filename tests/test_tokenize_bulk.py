"""Bulk tokenizer (S1 fast path) == per-doc tokenize_text, and CJK
bigram semantics (the kuromoji mode=search analog, round-3).

The whole index's correctness rests on one invariant: _tokenize_count's
(doc, term, tf, dl) output equals per-doc ``tokenize_text`` + Counter
for EVERY document — including ASCII fast-path membership, NFKC
edge cases, and CJK bigram expansion.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from micce_search_engine_spark.functions.tokenize import (
    expand_cjk_token,
    tokenize_text,
)
from micce_search_engine_spark.operators.index_build import _tokenize_count


def _run_bulk(texts, langs=None):
    langs = langs or [0] * len(texts)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(list(range(len(texts))), pa.int64()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.int64()),
        ],
        names=["doc_id", "text", "lang_id"],
    )
    got: dict[int, dict[str, tuple]] = {}
    for b in _tokenize_count(iter([batch])):
        d = b.to_pydict()
        for i in range(b.num_rows):
            got.setdefault(d["doc_id"][i], {})[d["term"][i]] = (
                d["tf"][i],
                d["dl"][i],
                d["lang_id"][i],
            )
    return got


def _expected(texts, langs=None):
    langs = langs or [0] * len(texts)
    exp: dict[int, dict[str, tuple]] = {}
    for i, t in enumerate(texts):
        toks = tokenize_text(t)
        if toks:
            exp[i] = {
                term: (tf, len(toks), langs[i])
                for term, tf in Counter(toks).items()
            }
    return exp


def test_bulk_equals_perdoc_fixed():
    texts = [
        "hello world hello",
        "",
        None,
        "Foo BAR foo",
        "café au lait café",
        "データベース検索 spark engine",
        "a\x01b weird\x01sep token",
        "ア",
        "   ",
        "the the the",
        "mixEDデータx検索end",
        "ümlaut Über STRASSE straße",
        "12_3 a-b_c",
        "ＦＵＬＬＷＩＤＴＨ　ｔｅｘｔ",  # NFKC folds to ascii
        "ﬁligree ﬀ",  # ligature NFKC expansion
    ]
    assert _run_bulk(texts) == _expected(texts)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.sampled_from(
                    list("abc XYZ_09-.\t\n\x01é字デぁ中ーñ〇々 ")
                ),
                max_size=60,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_bulk_equals_perdoc_property(texts):
    assert _run_bulk(texts) == _expected(texts)


def test_null_lang_id_fails_loudly():
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([0], pa.int64()),
            pa.array(["hello"], pa.string()),
            pa.array([None], pa.int64()),
        ],
        names=["doc_id", "text", "lang_id"],
    )
    with pytest.raises(ValueError, match="lang_id"):
        list(_tokenize_count(iter([batch])))


# ---- CJK bigram rule -------------------------------------------------


def test_cjk_bigrams_basic():
    assert tokenize_text("データベース") == ["デー", "ータ", "タベ", "ベー", "ース"]
    assert tokenize_text("ア") == ["ア"]
    assert tokenize_text("中文搜索") == ["中文", "文搜", "搜索"]


def test_cjk_mixed_script_token():
    # non-CJK sub-segments stay whole, in position order
    assert expand_cjk_token("データx検索") == ["デー", "ータ", "x", "検索"]
    assert tokenize_text("mixEDデータx検索end") == [
        "mixed",
        "デー",
        "ータ",
        "x",
        "検索",
        "end",
    ]


def test_cjk_query_matches_index_side():
    """Query-side bigrams are a subset-AND of document-side bigrams:
    every bigram of a contained phrase appears in the doc stream."""
    doc = tokenize_text("全文検索エンジンです")
    query = tokenize_text("検索エンジン")
    assert set(query) <= set(doc)


def test_ascii_unchanged():
    # the pre-round-3 contract: ascii tokenization is untouched
    assert tokenize_text("Hello, World! foo_bar 42") == [
        "hello",
        "world",
        "foo_bar",
        "42",
    ]
