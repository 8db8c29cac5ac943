"""HTML -> text extraction: pure-function parity with the DuckDB
expression, and the Arrow DataFrame path."""

import duckdb
import pytest

from micce_search_engine_spark.functions.html_extract import (
    EXTRACT_SQL_EXPR,
    extract_text,
    extract_text_df,
)

CASES = [
    '<html><head><style>p{c}</style></head><body><h1>T &amp; U</h1><p>hello  world</p>'
    '<script>var x = "<p>";</script></body></html>',
    "<p>a&lt;b &amp;amp; c&#39;s &quot;x&quot;</p>",
    "plain text",
    "<ScRiPt>alert(1)</SCRIPT>after<STYLE a=b>x</style>done",
    "<p>multi\n\nline\ttext</p>",
    "unicode <b>naïve 日本語</b> ok",
    "",
]


@pytest.mark.parametrize("case", CASES)
def test_extract_matches_duckdb_expression(case):
    con = duckdb.connect()
    sql = con.execute(
        "SELECT " + EXTRACT_SQL_EXPR.format(col="?"), [case]
    ).fetchone()[0]
    assert extract_text(case.encode()) == sql


def test_extract_none_and_bad_utf8():
    assert extract_text(None) is None
    assert extract_text(b"<p>ok\xff\xfe</p>") == "ok��"


def test_extract_dataframe_path(spark):
    rows = [(i, CASES[i].encode()) for i in range(len(CASES))] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r["doc_id"]: r["text"] for r in extract_text_df(df, key_col="doc_id").collect()}
    for i, c in enumerate(CASES):
        assert got[i] == extract_text(c.encode()), i
    assert got[99] is None
