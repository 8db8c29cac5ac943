"""Integration test for the HTTP serving front-end: real socket ->
handler -> ConditionEngine -> reference response shape
(searchHandler.go / response.go / openapi.yaml analog)."""

import json
import urllib.error
import urllib.request

import pytest

from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema
from micce_search_engine_spark.operators.multifield import (
    ConditionEngine,
    build_field_indexes,
)
from micce_search_engine_spark.operators.query import SearchEngine
from micce_search_engine_spark.serving.http_api import parse_condition, serve

N = 200
SYN = {"qalias": "the of"}


def _title(text):
    return " ".join((text or "").split(" ")[:5])


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    pdf = gen_pages(N, seed=23).sort_values("url").reset_index(drop=True)
    pdf["title"] = [_title(t) for t in pdf["text"]]
    pdf["doc_id"] = range(N)
    pages = spark.createDataFrame(pdf[["url", "text", "title", "lang", "doc_id"]])
    base = str(tmp_path_factory.mktemp("http") / "idx")
    idxs = build_field_indexes(
        spark, pages, ["text", "title"], base, doc_id_col="doc_id",
        n_buckets=4, max_postings_per_row=10**9, with_positions=True,
    )
    engines = {f: SearchEngine(spark, d, synonyms=SYN) for f, d in idxs.items()}
    attrs = pages.selectExpr(
        "doc_id",
        "(doc_id * 7919 % 18001) / 100.0 - 90.0 AS lat",
        "(doc_id * 104729 % 36001) / 100.0 - 180.0 AS lon",
        "'cat0' AS category",
        "doc_id % 3 = 0 AS has_images",
    )
    ce = ConditionEngine(engines, attrs=attrs, synonyms=SYN)
    srv = serve(ce, port=0)
    port = srv.server_address[1]
    yield ce, f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, body: dict):
    req = urllib.request.Request(
        url + "/api/v1/search",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_health(api):
    _, base = api
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert r.status == 200


def test_search_matches_engine(api):
    ce, base = api
    body = {"spot_name": "the", "limit": 5, "page": 1}
    status, out = _post(base, body)
    assert status == 200
    assert set(out) == {"total_hits", "last_page", "spot_ids"}
    exp = ce.search(
        {"keyword": "the", "phrase": True, "rank_profile": "closeness",
         "limit": 5, "page": 1}
    )
    assert out["total_hits"] == exp["total_hits"]
    assert out["last_page"] == exp["last_page"]
    assert out["spot_ids"] == [str(d) for d, _ in exp["results"]]


def test_search_phrase_and_synonym_through_http(api):
    ce, base = api
    # multi-word spot_name phrase-matches; synonym key expands
    for name in ["the of", "qalias"]:
        status, out = _post(base, {"spot_name": name, "limit": 10, "page": 1})
        assert status == 200
        exp = ce.search(
            {"keyword": name, "phrase": True, "rank_profile": "closeness",
             "limit": 10, "page": 1}
        )
        assert out["total_hits"] == exp["total_hits"], name
        assert out["spot_ids"] == [str(d) for d, _ in exp["results"]], name
    # same phrase via both spellings -> same hit set (synonym OR adds
    # only the absent 'qalias' token branch)
    s1 = _post(base, {"spot_name": "the of", "limit": 10, "page": 1})[1]
    s2 = _post(base, {"spot_name": "qalias", "limit": 10, "page": 1})[1]
    assert s1["total_hits"] == s2["total_hits"]


def test_geo_filters_and_pagination(api):
    ce, base = api
    body = {
        "spot_name": "the",
        "geo": {"latitude": 10.0, "longitude": 20.0},
        "has_instagram_image": True,
        "limit": 3,
        "page": 2,
    }
    status, out = _post(base, body)
    assert status == 200
    exp = ce.search(
        {
            "keyword": "the", "phrase": True, "rank_profile": "closeness",
            "geo": {"lat": 10.0, "lon": 20.0}, "has_images": True,
            "limit": 3, "page": 2,
        }
    )
    assert out["total_hits"] == exp["total_hits"]
    assert out["spot_ids"] == [str(d) for d, _ in exp["results"]]
    assert out["last_page"] == (exp["total_hits"] - 3 * 2 <= 0)


def test_validation_400(api):
    _, base = api
    for bad in [{}, {"limit": 5}, {"page": 1}]:
        try:
            _post(base, bad)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            err = json.loads(e.read())
            assert err["status_code"] == 400 and "required" in err["message"]


def test_parse_condition_mapping():
    cond = parse_condition(
        json.dumps(
            {
                "spot_name": "a b",
                "category": "c1",
                "geo": {"latitude": 1.5, "longitude": 2.5},
                "has_instagram_image": False,
                "limit": 10,
                "page": 3,
            }
        ).encode()
    )
    assert cond == {
        "limit": 10, "page": 3, "rank_profile": "closeness",
        "keyword": "a b", "phrase": True, "category": "c1",
        "has_images": False, "geo": {"lat": 1.5, "lon": 2.5},
    }
