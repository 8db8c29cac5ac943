"""IVF-vs-brute datapoint at the 1M-vector scale (VERDICT r4 #7):
where does the persisted IVF index beat exact brute force, and what
recall does each nprobe setting buy? Writes BENCH/ann_scale.json.

Vectors are deterministic synthetic (JVM-side column math, no Python
in generation): v[id][i] = pmod(hash(id, i), 65536)/65536 - 0.5 using
Spark's murmur3 hash — near-random components, so the recall-vs-nprobe
curve is meaningful (an LCG pattern made every neighbor land in one
IVF list and recall was trivially 1.0). Reproducible anywhere, no
external data. Each timed query path is warmed once (plan codegen) and
reported as the median over 5 query vectors.
Usage: python tools/ann_scale.py [n_vectors] [dim]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from micce_search_engine_spark.operators.ann import (  # noqa: E402
    brute_force_topk,
    build_ivf_index,
    ivf_topk_indexed,
    train_ivf_centroids,
)
from micce_search_engine_spark.session import get_spark  # noqa: E402

WORKDIR = os.environ.get(
    "SPARK_GRAFT_WORKDIR", "/dev/shm/mse" if os.path.isdir("/dev/shm") else "/tmp"
)


def synth(spark, n: int, dim: int, start: int = 0):
    return spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            "cast(pmod(hash(id, i), 65536) as double) / 65536.0 - 0.5)"
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    k_lists, iters, topk = 128, 3, 10
    spark = get_spark(
        "ann-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": os.path.join(WORKDIR, "spark-local")},
    )
    vecs = synth(spark, n, dim).persist()
    vecs.count()  # materialize so scans don't re-run the generator
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in synth(spark, 5, dim, start=10**9).collect()
    ]

    t0 = time.monotonic()
    cents = train_ivf_centroids(
        vecs, dim, k=k_lists, iters=iters, sample_mod=max(n // 20_000, 1)
    )
    train_s = time.monotonic() - t0
    idx = os.path.join(WORKDIR, "mse_ann_scale_idx")
    t0 = time.monotonic()
    build_ivf_index(vecs, idx, cents)
    build_s = time.monotonic() - t0

    # warm both query paths once (whole-stage codegen + parquet footer
    # reads), so timings reflect steady-state latency, not first-plan
    # compilation — the r5 first cut timed nprobe=1 coldest and the
    # curve read backwards
    brute_force_topk(vecs, qvecs[0], k=topk).collect()
    ivf_topk_indexed(spark, idx, qvecs[0], k=topk, n_probes=1).collect()

    truth = {}
    brute_lat = []
    for qi, qv in enumerate(qvecs):
        t0 = time.monotonic()
        rows = brute_force_topk(vecs, qv, k=topk).collect()
        brute_lat.append(time.monotonic() - t0)
        truth[qi] = [int(r["vec_id"]) for r in rows]

    # extended sweep (VERDICT r5 #5): push nprobe until recall@10
    # crosses 0.9 — on near-random synthetic vectors (no cluster
    # structure, the adversarial case for IVF) that takes scanning a
    # large list fraction, so the artifact shows exactly what that
    # recall level costs vs brute force
    per_probe = {}
    for n_probes in (1, 4, 16, 32, 48, 64):
        lats, recalls = [], []
        for qi, qv in enumerate(qvecs):
            t0 = time.monotonic()
            rows = ivf_topk_indexed(spark, idx, qv, k=topk, n_probes=n_probes).collect()
            lats.append(time.monotonic() - t0)
            got = {int(r["vec_id"]) for r in rows}
            recalls.append(len(got & set(truth[qi])) / topk)
        per_probe[str(n_probes)] = {
            "latency_p50_s": round(statistics.median(lats), 3),
            "recall_at_10": round(statistics.mean(recalls), 3),
            "scanned_lists_pct": round(100.0 * n_probes / k_lists, 1),
        }

    out = {
        "n_vectors": n,
        "dim": dim,
        "cpus": cpus,
        "k_lists": k_lists,
        "train_s": round(train_s, 1),
        "build_index_s": round(build_s, 1),
        "brute_latency_p50_s": round(statistics.median(brute_lat), 3),
        "ivf": per_probe,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
