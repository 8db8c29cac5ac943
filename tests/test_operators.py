"""Operator-level tests: tokenizer contract, upsert omit-nil semantics,
streaming feed checkpoint-resume, multimodal plumbing, dedup/ANN sanity
(SURVEY.md §5 items 1, 6)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from micce_search_engine_spark.functions.tokenize import tokenize_text, tokenize_udf


class TestTokenizer:
    def test_ignore_case_and_nfkc(self):
        # kuromoji config: ignore_case true (services.xml:10); NFKC folds
        # full-width forms
        assert tokenize_text("HeLLo WoRLD") == ["hello", "world"]
        assert tokenize_text("ＨＥＬＬＯ　ｗｏｒｌｄ１２３") == ["hello", "world123"]

    def test_null_empty(self):
        assert tokenize_text(None) == []
        assert tokenize_text("") == []
        assert tokenize_text("   ") == []

    def test_punct_split(self):
        assert tokenize_text("a,b.c-d_e") == ["a", "b", "c", "d_e"]

    def test_udf_matches_pure_function(self, spark):
        texts = ["Hello World", None, "", "ＴＥＳＴ ok", "a,b c", "日本語 テスト"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [r["toks"] for r in df.select(tokenize_udf("text").alias("toks")).collect()]
        assert got == [tokenize_text(t) for t in texts]

    def test_ascii_fast_path_identical(self):
        import re
        import unicodedata

        rng = np.random.default_rng(3)
        for _ in range(200):
            s = "".join(
                chr(rng.integers(32, 127)) for _ in range(int(rng.integers(0, 60)))
            )
            slow = re.findall(r"\w+", unicodedata.normalize("NFKC", s).lower())
            assert tokenize_text(s) == slow


class TestUpsert:
    def test_omit_nil_and_insert(self, spark):
        from micce_search_engine_spark.operators.upsert import merge_pages

        target = spark.createDataFrame(
            [("u1", "old text", "en"), ("u2", "keep", "de")],
            "url string, text string, lang string",
        )
        updates = spark.createDataFrame(
            [("u1", None, "ja"), ("u3", "new", None)],
            "url string, text string, lang string",
        )
        out = {r["url"]: r for r in merge_pages(target, updates).collect()}
        assert out["u1"]["text"] == "old text"  # nil omitted -> untouched
        assert out["u1"]["lang"] == "ja"
        assert out["u2"]["text"] == "keep"
        assert out["u3"]["text"] == "new" and out["u3"]["lang"] is None

    def test_idempotent_replay(self, spark):
        from micce_search_engine_spark.operators.upsert import merge_pages

        target = spark.createDataFrame(
            [("u1", "t", "en")], "url string, text string, lang string"
        )
        updates = spark.createDataFrame(
            [("u1", "t2", None)], "url string, text string, lang string"
        )
        once = merge_pages(target, updates)
        twice = merge_pages(once, updates)
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    def test_affected_terms(self, spark):
        from micce_search_engine_spark.operators.upsert import affected_terms

        old = spark.createDataFrame(
            [("u1", "alpha beta"), ("u2", "gamma")], "url string, text string"
        )
        new = spark.createDataFrame(
            [("u1", "alpha delta"), ("u2", "gamma")], "url string, text string"
        )
        terms = {r["term"] for r in affected_terms(old, new).collect()}
        # only u1 changed: union of its old+new tokens
        assert terms == {"alpha", "beta", "delta"}


class TestStreamingFeed:
    def test_checkpoint_resume(self, spark, tmp_path):
        from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema
        from micce_search_engine_spark.streaming.feed import run_feed_once

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        pdf = gen_pages(60, seed=1)
        df = spark.createDataFrame(pdf, schema=pages_spark_schema())
        df.write.mode("overwrite").parquet(landing)

        n1 = run_feed_once(spark, landing, out, ckpt, max_files_per_trigger=2)
        assert n1 >= 1
        total1 = spark.read.parquet(os.path.join(out, "data")).count()
        assert total1 == 60

        # replay with same checkpoint: nothing new -> no batches, no dup rows
        n2 = run_feed_once(spark, landing, out, ckpt, max_files_per_trigger=2)
        assert spark.read.parquet(os.path.join(out, "data")).count() == 60

        # new arrivals are picked up exactly once
        df2 = spark.createDataFrame(gen_pages(10, seed=2), schema=pages_spark_schema())
        df2.write.mode("append").parquet(landing)
        run_feed_once(spark, landing, out, ckpt, max_files_per_trigger=2)
        assert spark.read.parquet(os.path.join(out, "data")).count() == 70


class TestMultimodal:
    def test_binary_meta_plumbing(self, spark):
        from micce_search_engine_spark.operators.multimodal import (
            decode_image,
            extract_binary_meta,
        )

        df = spark.createDataFrame(
            [(1, b"\x89PNG\r\nxxxx"), (2, None), (3, b"")],
            "doc_id long, html binary",
        )
        rows = {r["doc_id"]: r for r in extract_binary_meta(df).collect()}
        assert rows[1]["n_bytes"] == 10
        assert rows[1]["magic"].startswith("\x89PNG")
        assert rows[2]["n_bytes"] == 0
        assert len(rows[1]["feat"]) == 8
        import hashlib

        assert rows[3]["sha256"] == hashlib.sha256(b"").hexdigest()
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")


class TestGeo:
    def test_haversine_known_distance(self, spark):
        from micce_search_engine_spark.functions.geo import (
            closeness,
            geo_radius_filter,
            haversine_km,
        )

        # Tokyo (35.6762, 139.6503) <-> Osaka (34.6937, 135.5023) ~ 397 km
        df = spark.createDataFrame(
            [(35.6762, 139.6503, 34.6937, 135.5023)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        from pyspark.sql import functions as F

        row = df.select(
            haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km"),
            geo_radius_filter(F.col("lat1"), F.col("lon1"), 34.6937, 135.5023).alias("in200"),
            geo_radius_filter(F.col("lat1"), F.col("lon1"), 34.6937, 135.5023, 500).alias("in500"),
            closeness(F.col("lat1"), F.col("lon1"), 35.6762, 139.6503).alias("self_close"),
        ).collect()[0]
        assert abs(row["km"] - 397) < 5
        assert row["in200"] is False and row["in500"] is True
        assert abs(row["self_close"] - 1.0) < 1e-12


class TestSynonymSource:
    def test_csv_roundtrip_and_broadcast_shape(self, spark, tmp_path):
        from micce_search_engine_spark.sources.synonyms import (
            load_synonyms_csv,
            write_synonyms_csv,
        )

        p = str(tmp_path / "syn.csv")
        write_synonyms_csv([("alias0", "w000000"), ("シノニム", "w000001")], p)
        d = load_synonyms_csv(spark, p)
        assert d == {"alias0": "w000000", "シノニム": "w000001"}


class TestDedupAnn:
    def test_exact_dedup_keeps_min_id(self, spark):
        from micce_search_engine_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(5, "Same Text"), (2, "same text"), (9, "other")],
            "doc_id long, text string",
        )
        rows = {r["fp"]: r for r in exact_dedup(df).collect()}
        sizes = sorted(r["group_size"] for r in rows.values())
        assert sizes == [1, 2]
        dup = [r for r in rows.values() if r["group_size"] == 2][0]
        assert dup["doc_id"] == 2  # lowest id survives

    def test_jaccard_near_dup_found(self, spark):
        from micce_search_engine_spark.operators.dedup import ngram_jaccard_pairs

        a = "the quick brown fox jumps over the lazy dog tonight"
        b = "the quick brown fox jumps over the lazy dog today"
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, "completely different words entirely here")],
            "doc_id long, text string",
        )
        pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
        assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]

    def test_lsh_topk_contains_true_neighbors(self, spark):
        from micce_search_engine_spark.operators.ann import brute_force_topk, lsh_topk

        rng = np.random.default_rng(5)
        base = rng.standard_normal(16)
        rows = []
        for i in range(1, 200):
            noise = rng.standard_normal(16) * (0.05 if i <= 5 else 1.0)
            v = base + noise
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = [float(x) for x in base]
        exact = [r["vec_id"] for r in brute_force_topk(df, q, k=5).collect()]
        approx = [r["vec_id"] for r in lsh_topk(df, q, dim=16, k=5, n_probes=8).collect()]
        # the 5 planted near neighbors must be found by both
        assert set(exact) == {1, 2, 3, 4, 5}
        assert len(set(approx) & {1, 2, 3, 4, 5}) >= 4


def test_ivf_trained_recall_and_pruning(spark, tmp_path):
    """Trained IVF (deterministic distributed k-means): decent
    recall@10 vs brute force, persisted index partition-prunes."""
    import numpy as np

    from micce_search_engine_spark.operators.ann import (
        brute_force_topk,
        build_ivf_index,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(7)
    # clustered data so IVF has structure to find
    centers = rng.standard_normal((6, 16)) * 3
    rows = []
    for i in range(360):
        v = centers[i % 6] + rng.standard_normal(16) * 0.4
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(df, dim=16, k=6, iters=4)
    # training converged to distinct centroids
    assert len({tuple(round(x, 6) for x in c) for c in cents}) == 6
    out = str(tmp_path / "ivfidx")
    q = rows[10][1]
    build_ivf_index(df.filter(F.col("vec_id") != 10), out, cents)
    approx = [r["vec_id"] for r in ivf_topk_indexed(spark, out, q, k=10, n_probes=2).collect()]
    exact = [
        r["vec_id"]
        for r in brute_force_topk(df.filter(F.col("vec_id") != 10), q, k=10).collect()
    ]
    recall = len(set(approx) & set(exact)) / 10.0
    assert recall >= 0.8, (recall, approx, exact)
    plan = (
        ivf_topk_indexed(spark, out, q, k=10, n_probes=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ivf_list" in plan


def test_train_ivf_deterministic_across_parallelism(spark):
    """Fixed-point centroid sums: same centroids at any partitioning."""
    import numpy as np

    from micce_search_engine_spark.operators.ann import train_ivf_centroids

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = train_ivf_centroids(df.repartition(1), dim=8, k=4, iters=3)
    b = train_ivf_centroids(df.repartition(7), dim=8, k=4, iters=3)
    assert a == b


def test_ivf_assign_vectorized_large_k(spark):
    """Round-4 (VERDICT r3 minor #4): k > IVF_COLUMN_MAX_K switches to
    the pandas_udf argmin — same assignments as ground truth, built in
    seconds, and the Column path still handles small k."""
    import numpy as np
    from pyspark.sql import functions as F

    from micce_search_engine_spark.operators.ann import ivf_assign

    rng = np.random.default_rng(11)
    dim, k, n = 16, 128, 500
    cents = rng.normal(size=(k, dim)).astype(np.float64)
    # vectors placed EXACTLY at centroids -> unambiguous nearest
    owner = rng.integers(0, k, size=n)
    vecs = cents[owner]
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["ivf_list"]
        for r in ivf_assign(df, [list(c) for c in cents]).collect()
    }
    assert got == {i: int(owner[i]) for i in range(n)}
    # small-k Column path agrees with ground truth too
    small = ivf_assign(
        df.filter(F.col("vec_id") < 50), [list(c) for c in cents[:8]]
    ).collect()
    ref = {
        i: int(np.argmin(((vecs[i][None, :] - cents[:8]) ** 2).sum(axis=1)))
        for i in range(50)
    }
    assert {r["vec_id"]: r["ivf_list"] for r in small} == ref


def test_zombie_redrive_loop(tmp_path):
    """Round-4 (VERDICT r3 missing #3): the periodic re-drive ticker —
    stages stuck PROCESSING/READY past the staleness window are marked
    READY and handed to the handler each tick."""
    from micce_search_engine_spark.plans.manifest import (
        COMPLETED,
        PROCESSING,
        Manifest,
        find_zombies,
        run_redrive_loop,
    )

    m = Manifest(str(tmp_path))
    m.mark("S_ok", COMPLETED)
    m.mark("S_stuck", PROCESSING)
    m.mark("S_fresh", PROCESSING)
    # S_stuck is stale immediately with stale_after_s=0; S_ok is
    # COMPLETED (never a zombie); with a long window nothing is stale
    assert find_zombies(m, stale_after_s=3600.0) == []
    zombies = find_zombies(m, stale_after_s=0.0)
    assert zombies == ["S_fresh", "S_stuck"]
    driven = []
    n = run_redrive_loop(
        m, driven.append, interval_s=0.01, stale_after_s=0.0, max_iters=1
    )
    assert n == 2 and sorted(driven) == ["S_fresh", "S_stuck"]
    # handler completes the stage -> next tick finds nothing
    for s in driven:
        m.mark(s, COMPLETED)
    assert find_zombies(m, stale_after_s=0.0) == []
