"""Round-6 optimization harness: per-operator isolation benches.

NOT the frozen driver bench (bench.py) — this file exists so individual
operators can be timed with a noop sink (guide §1.4) and their plans
dumped, without touching bench.py's methodology.

Usage:
  python bench_extra.py minhash [--plan plans/r06/minhash_before.txt]
  python bench_extra.py <leg> ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
round-5 measurement scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from micce_search_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORKDIR = os.environ.get(
    "SPARK_GRAFT_WORKDIR", "/dev/shm/mse" if os.path.isdir("/dev/shm") else "/tmp"
)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(label, fn, spark, reps=REPS):
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        fn()
        ts.append(time.monotonic() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label}: min={min(ts):.3f}s reps={[round(t, 3) for t in ts]}", flush=True)
    return min(ts)


def leg_minhash(spark, plan_out=None):
    from pyspark.sql import functions as F  # noqa: F401

    from micce_search_engine_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    if plan_out:
        lazy = minhash_lsh_pairs(docs, threshold=0.5, materialize=False)
        with open(plan_out, "w") as f:
            f.write(lazy._sc._jvm.PythonSQLUtils.explainString(
                lazy._jdf.queryExecution(), "formatted"))
        print(f"plan -> {plan_out}")
    _time("minhash_lsh count (bench leg)", lambda: minhash_lsh_pairs(docs, threshold=0.5).count(), spark)


def leg_build(spark, plan_out=None, with_positions=False):
    import shutil

    from micce_search_engine_spark.corpus import gen_pages, pages_spark_schema  # noqa: F401
    from micce_search_engine_spark.operators.index_build import build_index

    corpus_path = f"{WORKDIR}/mse_bench_corpus/v2_n100000"
    if not os.path.exists(os.path.join(corpus_path, "_DONE")):
        print("corpus missing; run bench.py once first", file=sys.stderr)
        sys.exit(1)
    pages = spark.read.parquet(corpus_path)
    tag = "pos" if with_positions else "std"
    idx = f"{WORKDIR}/mse_extra_index_{tag}"

    def run():
        shutil.rmtree(idx, ignore_errors=True)
        build_index(spark, pages, idx, n_buckets=32, max_postings_per_row=200_000,
                    with_positions=with_positions)

    _time(f"index_build[{tag}]", run, spark)


def leg_phrase(spark):
    import shutil

    from micce_search_engine_spark.corpus import gen_synonyms
    from micce_search_engine_spark.operators.index_build import build_index
    from micce_search_engine_spark.operators.query import SearchEngine

    corpus_path = f"{WORKDIR}/mse_bench_corpus/v2_n100000"
    pages = spark.read.parquet(corpus_path)
    idx = f"{WORKDIR}/mse_extra_index_pos"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        build_index(spark, pages, idx, n_buckets=32, max_postings_per_row=200_000,
                    with_positions=True)
    eng = SearchEngine(spark, idx, synonyms=dict(gen_synonyms()), preload=True)
    eng.search("w000003", limit=10, page=1)  # warm
    r1 = _time("q_phrase_stopword", lambda: eng.search_phrase("the w000001", limit=10, page=1), spark)
    r2 = _time("q_phrase", lambda: eng.search_phrase("w000001 w000002", limit=10, page=1), spark)
    hits1 = eng.search_phrase("the w000001", limit=10, page=1)["total_hits"]
    hits2 = eng.search_phrase("w000001 w000002", limit=10, page=1)["total_hits"]
    print(f"hits: stopword={hits1} rare={hits2}")
    return r1, r2


def leg_batch(spark):
    from micce_search_engine_spark.corpus import gen_queries, gen_synonyms
    from micce_search_engine_spark.operators.batch_query import search_batch, search_batch_topk
    from micce_search_engine_spark.operators.query import SearchEngine

    idx = f"{WORKDIR}/mse_bench_index/c{CPUS}_n100000"
    eng = SearchEngine(spark, idx, synonyms=dict(gen_synonyms()), preload=True)
    qset = gen_queries(seed=42, n=100)
    specs = [
        {
            "query_id": int(r.query_id),
            "query_text": r.query_text,
            "lang_filter": r.lang_filter if isinstance(r.lang_filter, str) else None,
            "limit": int(r.limit),
            "page": int(r.page),
        }
        for r in qset.itertuples()
    ]
    _time("batch100", lambda: search_batch(eng, specs).count(), spark)
    _time("batch100_wand", lambda: search_batch_topk(eng, specs).count(), spark)


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    plan_out = None
    if "--plan" in sys.argv:
        plan_out = sys.argv[sys.argv.index("--plan") + 1]
    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.local.dir": os.path.join(WORKDIR, "spark-local")},
    )
    if leg == "minhash":
        leg_minhash(spark, plan_out)
    elif leg == "build":
        leg_build(spark, plan_out)
    elif leg == "build_pos":
        leg_build(spark, plan_out, with_positions=True)
    elif leg == "phrase":
        leg_phrase(spark)
    elif leg == "batch":
        leg_batch(spark)
    else:
        print(f"unknown leg {leg}", file=sys.stderr)
        sys.exit(2)
    spark.stop()


if __name__ == "__main__":
    main()
