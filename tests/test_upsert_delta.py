"""Incremental upsert + affected-partition delta rebuild (I4):
omit-nil MERGE, stable doc_ids, segment surgery only on affected
buckets, and post-delta rank-identity vs an oracle on the merged
corpus (SURVEY.md §5.6)."""

import os

import pytest
from pyspark.sql import functions as F

from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema
from micce_search_engine_spark.operators.index_build import build_index
from micce_search_engine_spark.operators.query import SearchEngine
from micce_search_engine_spark.operators.upsert import apply_upsert
from micce_search_engine_spark.oracle import BruteForceBM25


@pytest.fixture(scope="module")
def delta_env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("upd") / "idx")
    pdf = gen_pages(300, seed=13)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(spark, pages, idx, n_buckets=4, max_postings_per_row=60)

    # updates: rewrite text of 10 docs, lang-only change for 5 (omit-nil
    # text=None), and 5 brand-new urls
    upd_rows = []
    for i in range(10):
        upd_rows.append((pdf.url[i], f"updated document w{i:06d} spark delta", None))
    for i in range(10, 15):
        upd_rows.append((pdf.url[i], None, "xx"))
    for i in range(5):
        upd_rows.append((f"https://zz.example/new{i}", f"fresh page alpha w{i:06d}", "en"))
    updates = spark.createDataFrame(
        upd_rows, "url string, text string, lang string"
    )
    merged = apply_upsert(spark, idx, pages, updates)
    merged_pdf = merged.select("url", "text", "lang").toPandas()
    return idx, merged_pdf


def test_docid_stability_and_new_allocation(spark, delta_env):
    idx, merged_pdf = delta_env
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    assert docs.count() == 305
    assert docs.select("doc_id").distinct().count() == 305
    # new urls got ids above the old max (append-only allocation)
    new_ids = [
        r["doc_id"]
        for r in docs.filter(F.col("url").startswith("https://zz.example/")).collect()
    ]
    assert sorted(new_ids) == [300, 301, 302, 303, 304]


def test_post_delta_rank_identity(spark, delta_env):
    idx, merged_pdf = delta_env
    eng = SearchEngine(spark, idx)
    docs = spark.read.parquet(os.path.join(idx, "docs"))
    url_of = {r["doc_id"]: r["url"] for r in docs.collect()}
    oracle = BruteForceBM25(merged_pdf)
    oracle_url = {i: oracle.urls[i] for i in range(len(oracle.urls))}
    for q in ["spark delta", "alpha", "the", "w000001", "updated"]:
        got = eng.search(q, limit=10, page=1)
        exp = oracle.search(q, limit=10, page=1)
        assert got["total_hits"] == exp["total_hits"], q
        got_set = sorted((url_of[d], round(s, 9)) for d, s in got["results"])
        exp_set = sorted((oracle_url[d], round(s, 9)) for d, s in exp["results"])
        assert got_set == exp_set, q


def test_wand_still_lossless_after_delta(spark, delta_env):
    idx, _ = delta_env
    eng = SearchEngine(spark, idx)
    eng.wand_engage_factor = 0  # force probe engagement at test scale
    assert eng.wand_derate >= 1.0
    for q in ["the", "spark", "alpha"]:
        exact = eng.search(q, limit=10, page=1)
        wand = eng.search(q, limit=10, page=1, topk_only=True)
        assert [d for d, _ in wand["results"]] == [d for d, _ in exact["results"]], q


def test_unaffected_buckets_untouched(spark, tmp_path):
    """Delta rebuild must not rewrite buckets of unaffected terms."""
    idx = str(tmp_path / "idx2")
    pdf = gen_pages(200, seed=21)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(spark, pages, idx, n_buckets=8, max_postings_per_row=10**9)
    seg_root = os.path.join(idx, "segments")
    before = {
        b: sorted(os.listdir(os.path.join(seg_root, b)))
        for b in os.listdir(seg_root)
        if b.startswith("bucket=")
    }
    updates = spark.createDataFrame(
        [("https://zz.example/solo", "uniqueterm0042 uniqueterm0042", "en")],
        "url string, text string, lang string",
    )
    apply_upsert(spark, idx, pages, updates)
    from micce_search_engine_spark.operators.index_build import bucket_of

    touched = {f"bucket={bucket_of('uniqueterm0042', 8)}"}
    after = {
        b: sorted(os.listdir(os.path.join(seg_root, b)))
        for b in os.listdir(seg_root)
        if b.startswith("bucket=")
    }
    for b in before:
        if b not in touched:
            assert after[b] == before[b], f"{b} was rewritten needlessly"


def test_odelta_partition_scoped_writes(spark, tmp_path):
    """v3 O(delta) contract (round-3): an upsert touching docs in ONE
    dbucket must not rewrite terms/docs partition files of any other
    dbucket, and url_map stays untouched when no url is new."""
    idx = str(tmp_path / "idx3")
    pdf = gen_pages(400, seed=23)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(
        spark, pages, idx, n_buckets=8, max_postings_per_row=10**9,
        docs_per_bucket=100,
    )

    def snap(table):
        root = os.path.join(idx, table)
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.startswith("_") or f.startswith("."):
                    continue
                fp = os.path.join(dirpath, f)
                out[fp] = os.path.getmtime(fp)
        return out

    t_before, d_before, u_before = snap("terms"), snap("docs"), snap("url_map")
    docs_tbl = spark.read.parquet(os.path.join(idx, "docs"))
    urls = [
        r["url"]
        for r in docs_tbl.filter(F.col("doc_id") < 100).limit(3).collect()
    ]
    updates = spark.createDataFrame(
        [(u, f"patched uniquetermz{i:04d}", "en") for i, u in enumerate(urls)],
        "url string, text string, lang string",
    )
    apply_upsert(spark, idx, pages, updates)
    t_after, d_after, u_after = snap("terms"), snap("docs"), snap("url_map")

    def untouched(before, after, skip_part):
        for fp, mt in before.items():
            if skip_part in fp:
                continue
            assert fp in after and after[fp] == mt, f"{fp} rewritten needlessly"

    untouched(t_before, t_after, "dbucket=0/")
    untouched(d_before, d_after, "dbucket=0/")
    # the touched bucket WAS rewritten
    assert {f for f in t_after if "dbucket=0/" in f} != {
        f for f in t_before if "dbucket=0/" in f
    }
    # no new urls -> url_map untouched entirely
    assert u_after == u_before


def test_engine_cache_invalidated_after_upsert(spark, tmp_path):
    """An engine opened BEFORE an upsert persists term_stats; Spark's
    CacheManager matches cached plans by path, so without explicit
    refreshByPath a NEW engine after the upsert would silently read
    the stale cache (df=0 for fresh terms -> wrong idf)."""
    idx = str(tmp_path / "idx4")
    pdf = gen_pages(120, seed=29)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    build_index(spark, pages, idx, n_buckets=4, max_postings_per_row=10**9)
    eng_before = SearchEngine(spark, idx)  # persists term_stats
    assert eng_before.search("zzfreshterm", limit=5, page=1)["total_hits"] == 0
    updates = spark.createDataFrame(
        [(pdf.url[0], "zzfreshterm zzfreshterm appears", "en")],
        "url string, text string, lang string",
    )
    apply_upsert(spark, idx, pages, updates)
    eng_after = SearchEngine(spark, idx)
    res = eng_after.search("zzfreshterm", limit=5, page=1)
    assert res["total_hits"] == 1
    # score must reflect df=1, not a stale df=0 (idf would be inflated)
    import math

    n = eng_after.N
    idf = math.log((n - 1 + 0.5) / 1.5 + 1.0)
    assert res["results"][0][1] < idf * 2.2 + 1e-9


def test_upsert_crash_recovery_rolls_forward(spark, tmp_path, monkeypatch):
    """ADVICE r3 (medium): a crash mid-swap must not leave the index
    permanently inconsistent. Simulate a crash after HALF the journaled
    swaps executed; recover_upsert must roll forward to the exact state
    a clean upsert produces (stats, term_stats, and search results all
    match a crash-free replica)."""
    import micce_search_engine_spark.operators.upsert as up

    pdf = gen_pages(300, seed=31)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    updates = spark.createDataFrame(
        [
            (pdf["url"].iloc[0], "crashterm alpha beta", "en"),
            ("https://zz.example/new1", "crashterm gamma", "ja"),
        ],
        "url string, text string, lang string",
    )

    idx_ok = str(tmp_path / "idx_ok")
    build_index(spark, pages, idx_ok, n_buckets=4, max_postings_per_row=10**9)
    apply_upsert(spark, idx_ok, pages, updates)

    idx_cr = str(tmp_path / "idx_cr")
    build_index(spark, pages, idx_cr, n_buckets=4, max_postings_per_row=10**9)

    real_apply = up._apply_swaps

    def crash_midway(swaps):
        real_apply(swaps[: len(swaps) // 2])
        raise RuntimeError("injected crash mid-swap")

    monkeypatch.setattr(up, "_apply_swaps", crash_midway)
    try:
        apply_upsert(spark, idx_cr, pages, updates)
    except RuntimeError:
        pass
    monkeypatch.setattr(up, "_apply_swaps", real_apply)
    assert os.path.exists(os.path.join(idx_cr, "upsert_journal.json"))

    # opening the engine heals the index (roll-forward from journal)
    for path in ("docs", "terms", "stats", "term_stats", "segments", "url_map"):
        spark.catalog.refreshByPath(os.path.join(idx_cr, path))
    eng_cr = SearchEngine(spark, idx_cr)
    assert not os.path.exists(os.path.join(idx_cr, "upsert_journal.json"))
    eng_ok = SearchEngine(spark, idx_ok)
    assert eng_cr.N == eng_ok.N and abs(eng_cr.avgdl - eng_ok.avgdl) < 1e-12
    for q in ["crashterm", "the", "alpha"]:
        a = eng_cr.search(q, limit=10, page=1)
        b = eng_ok.search(q, limit=10, page=1)
        assert a["total_hits"] == b["total_hits"], q
        assert a["results"] == b["results"], q
    ts_a = sorted(
        (r["term"], r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(idx_cr, "term_stats")).collect()
    )
    ts_b = sorted(
        (r["term"], r["df"], r["cf"])
        for r in spark.read.parquet(os.path.join(idx_ok, "term_stats")).collect()
    )
    assert ts_a == ts_b


def test_upsert_replay_after_recovery_is_noop(spark, tmp_path):
    """Incremental stats deltas must be applied exactly once even when
    the same updates are replayed after a completed upsert (the
    at-least-once safety the journal preserves)."""
    pdf = gen_pages(120, seed=33)
    pages = spark.createDataFrame(pdf, schema=pages_spark_schema())
    idx = str(tmp_path / "idx_replay")
    build_index(spark, pages, idx, n_buckets=4, max_postings_per_row=10**9)
    updates = spark.createDataFrame(
        [(pdf["url"].iloc[1], "replayterm one two", "en")],
        "url string, text string, lang string",
    )
    merged = apply_upsert(spark, idx, pages, updates).persist()
    merged.count()
    s1 = spark.read.parquet(os.path.join(idx, "stats")).collect()[0]
    apply_upsert(spark, idx, merged, updates)
    s2 = spark.read.parquet(os.path.join(idx, "stats")).collect()[0]
    assert (s1["N"], s1["sum_dl"], s1["max_doc_id"]) == (
        s2["N"], s2["sum_dl"], s2["max_doc_id"],
    )
    merged.unpersist()


def test_upsert_preserves_positions(spark, tmp_path):
    """Round-4: a delta over a positional index must decode, carry and
    re-encode the position stream — phrase queries stay correct for
    both touched and untouched docs."""
    idx = str(tmp_path / "idx_pos")
    rows = [
        ("u0", "new york city", "en"),
        ("u1", "york new nope", "en"),
        ("u2", "big new york here", "en"),
        ("u3", "unrelated words only", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    build_index(
        spark, pages, idx, n_buckets=4, max_postings_per_row=10**9,
        with_positions=True,
    )
    eng = SearchEngine(spark, idx)
    assert eng.search_phrase("new york", limit=10, page=1)["total_hits"] == 2

    updates = spark.createDataFrame(
        [
            ("u1", "now i contain new york too", "en"),   # gains the phrase
            ("u2", "york new flipped", "en"),             # loses the phrase
            ("u9", "fresh page with new york inside", "en"),  # new doc
        ],
        "url string, text string, lang string",
    )
    apply_upsert(spark, idx, pages, updates)
    eng2 = SearchEngine(spark, idx)
    res = eng2.search_phrase("new york", limit=10, page=1)
    docs = spark.read.parquet(os.path.join(idx, "docs")).collect()
    url_of = {r["doc_id"]: r["url"] for r in docs}
    assert sorted(url_of[d] for d, _ in res["results"]) == ["u0", "u1", "u9"]
    assert res["total_hits"] == 3
