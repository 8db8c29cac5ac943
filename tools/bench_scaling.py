"""Two-parallelism scaling evidence (BASELINE.json north_rule): N vs 4N cores.

No real multi-node cluster exists in this sandbox, so per the driver
instruction the N -> 4N executor criterion is evidenced by running the
SAME bench suite on the SAME input at local[4] and local[16] (fresh JVM
each, CPU-pinned with taskset) and reporting throughput at both plus
efficiency = (T_4 / T_16) / 4  (1.0 = perfect linear scaling).

SUBSTRATE CONTROL: this VM's host visibly steals/throttles CPU in
bursts (measured /proc/stat steal up to ~25% of the pinned cores, and
run-to-run variance up to 5x). A pure-Python multiprocessing tokenize
control — NO Spark, no shuffle, embarrassingly parallel — measures what
the MACHINE itself gives 4->16 processes in the same windows; repeated
measurement puts that ceiling at ~0.7, not 1.0. Each leg therefore
also records (a) steal ticks during the leg and (b) the control
runtime at the same core count, and BASELINE.md reports both absolute
engine efficiency and the substrate-normalized ratio
(engine speedup / control speedup) — the quantity that actually
isolates the ENGINE's scaling behavior from the host's.

Writes BENCH/BASELINE.md and BENCH/scaling_*.json.
Usage: python tools/bench_scaling.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# N and 4N core counts. 4 vs 16 (not 8 vs 32): a raw-CPU ladder on this
# box measures the upper 16 vCPUs as sharing capacity (8->32 ceiling
# 0.76), so the 4->16 pair is the fairest available.
N_SMALL, N_BIG = 4, 16
CONTROL_TEXTS = "/dev/shm/mse/control_texts.pkl"


def _read_steal() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _ensure_control_corpus() -> None:
    if os.path.exists(CONTROL_TEXTS):
        return
    sys.path.insert(0, REPO)
    from micce_search_engine_spark.corpus import gen_pages

    os.makedirs(os.path.dirname(CONTROL_TEXTS), exist_ok=True)
    with open(CONTROL_TEXTS, "wb") as f:
        pickle.dump(list(gen_pages(120_000, seed=1)["text"]), f)


_CONTROL_SRC = r"""
import sys, time, pickle, multiprocessing as mp
sys.path.insert(0, %(repo)r)
from micce_search_engine_spark.functions.tokenize import tokenize_text
from collections import Counter

def work(texts):
    n = 0
    for t in texts:
        toks = tokenize_text(t)
        if toks:
            n += len(Counter(toks))
    return n

if __name__ == "__main__":
    nproc = int(sys.argv[1])
    texts = pickle.load(open(%(texts)r, "rb"))
    chunks = [texts[i::nproc*4] for i in range(nproc*4)]
    with mp.Pool(nproc) as p:
        t0 = time.monotonic(); p.map(work, chunks)
        print(time.monotonic() - t0)
"""


def run_control(cpus: int) -> float:
    """Substrate control: multiprocessing tokenize, min of 2 runs."""
    src = _CONTROL_SRC % {"repo": REPO, "texts": CONTROL_TEXTS}
    best = float("inf")
    for _ in range(2):
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", src, str(cpus)],
            capture_output=True,
            text=True,
            timeout=300,
        )
        best = min(best, float(out.stdout.strip().splitlines()[-1]))
    return best


# Second control (round-4): the ARROW tokenize kernel — the same
# RE2-split + dictionary-encode + np.unique the engine's S1 runs. This
# kernel is so fast per byte that it is MEMORY-BANDWIDTH-bound, and on
# this box 4 pinned cores already saturate that bandwidth (measured
# 4->16 speedup ~1.0x vs ~2.5-3.3x for the CPU-bound Python control).
# Per-stage normalization against the control that matches each
# stage's bottleneck resource is the honest substrate ceiling.
_CONTROL_ARROW_SRC = r"""
import sys, time, pickle, multiprocessing as mp
sys.path.insert(0, %(repo)r)

def work(texts):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    arr = pa.array([t.lower() for t in texts if t], type=pa.string())
    lst = pc.split_pattern_regex(arr, pattern="[^0-9a-z_]+")
    denc = pc.list_flatten(lst).dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    u, c = np.unique(codes, return_counts=True)
    return len(u)

if __name__ == "__main__":
    nproc = int(sys.argv[1])
    texts = pickle.load(open(%(texts)r, "rb"))
    chunks = [texts[i::nproc*4] for i in range(nproc*4)]
    with mp.Pool(nproc) as p:
        t0 = time.monotonic(); p.map(work, chunks)
        print(time.monotonic() - t0)
"""


def run_control_arrow(cpus: int) -> float:
    """Bandwidth-bound substrate control (Arrow kernel), min of 2."""
    src = _CONTROL_ARROW_SRC % {"repo": REPO, "texts": CONTROL_TEXTS}
    best = float("inf")
    for _ in range(2):
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", src, str(cpus)],
            capture_output=True,
            text=True,
            timeout=300,
        )
        best = min(best, float(out.stdout.strip().splitlines()[-1]))
    return best


def run_bench(cpus: int, n_docs: int) -> dict:
    """One bench leg, CPU-PINNED to exactly ``cpus`` cores via taskset.

    Without pinning, a small-N run on a 32-core box lets the JVM's GC/
    shuffle threads and the Python worker daemons spill onto the 24
    idle cores — the 'small cluster' secretly isn't, and the measured
    scaling ratio is meaningless. Pinning makes local[N] a faithful
    stand-in for an N-core cluster slice."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    # this harness interleaves its own reps and min-merges; one suite
    # pass per leg (bench.py's internal min-of-3 is for standalone runs)
    env["SPARK_GRAFT_BENCH_REPS"] = "1"
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")  # 48g G1 heap measured 2.7x SLOWER at 16 threads (huge-young-gen first-touch)
    env.setdefault("SPARK_GRAFT_WORKDIR", "/dev/shm/mse")
    s0, t0 = _read_steal()
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
    )
    s1, t1 = _read_steal()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    r["steal_pct_machine"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
    r["control_tok_s"] = round(run_control(cpus), 3)
    r["control_arrow_s"] = round(run_control_arrow(cpus), 3)
    return r


def _min_merge(runs: list[dict]) -> dict:
    """Noise-robust per-metric minimum across repetitions."""
    best = json.loads(json.dumps(runs[0]))
    for r in runs[1:]:
        for k, v in r["queries"].items():
            if v < best["queries"].get(k, float("inf")):
                best["queries"][k] = v
        best["control_tok_s"] = min(best["control_tok_s"], r["control_tok_s"])
    best["docs_per_sec"] = max(r["docs_per_sec"] for r in runs)
    best["batch_queries_per_sec"] = max(r["batch_queries_per_sec"] for r in runs)
    best["reps"] = len(runs)
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # optional tag (e.g. "_n1M"): write scaling_c{N}{tag}.json and SKIP
    # rewriting BASELINE.md — used for the 1M-doc scale proof-point
    tag = sys.argv[3] if len(sys.argv) > 3 else ""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    _ensure_control_corpus()
    raw: dict[int, list[dict]] = {N_SMALL: [], N_BIG: []}
    # interleave legs to decorrelate machine drift
    for _ in range(reps):
        for cpus in (N_SMALL, N_BIG):
            t0 = time.time()
            r = run_bench(cpus, n_docs)
            r["wall"] = round(time.time() - t0, 1)
            raw[cpus].append(r)
            print(f"local[{cpus}]: {json.dumps(r)}", flush=True)
    results = {c: _min_merge(rs) for c, rs in raw.items()}
    for cpus, r in results.items():
        with open(os.path.join(REPO, "BENCH", f"scaling_c{cpus}{tag}.json"), "w") as f:
            json.dump({"best": r, "runs": raw[cpus]}, f, indent=2)
    if tag:
        r4, r16 = results[N_SMALL], results[N_BIG]
        ctl = r4["control_tok_s"] / r16["control_tok_s"]
        b = r4["queries"]["index_build"] / r16["queries"]["index_build"]
        print(
            json.dumps(
                {
                    "tag": tag,
                    "n_docs": n_docs,
                    "build_speedup": round(b, 3),
                    "build_eff_norm": round(b / ctl, 3),
                    "control_speedup": round(ctl, 3),
                }
            )
        )
        return

    r4, r16 = results[N_SMALL], results[N_BIG]

    def spd(key):
        return r4["queries"][key] / r16["queries"][key]

    ctl_spd = r4["control_tok_s"] / r16["control_tok_s"]
    build_spd, batch_spd = spd("index_build"), spd("batch100")
    steals = {
        c: [x["steal_pct_machine"] for x in raw[c]] for c in (N_SMALL, N_BIG)
    }
    md = baseline_md(n_docs, reps, r4, r16, build_spd, batch_spd, ctl_spd, steals)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


def baseline_md(n_docs, reps, r4, r16, build_spd, batch_spd, ctl_spd, steals) -> str:
    """BENCH/BASELINE.md template (shared with tools/scaling_assemble.py)."""
    return f"""# BENCH/BASELINE — measured numbers vs targets

## Scaling evidence: local[{N_SMALL}] vs local[{N_BIG}] (N vs 4N cores, same input)

Per the driver instruction, the north_rule's ">=0.8 throughput scaling
efficiency from N to 4N executors" is evidenced in-sandbox by running
the identical suite (bench.py) on the identical input at two
parallelism levels, fresh JVM each, **CPU-pinned with taskset** to
exactly {N_SMALL} / {N_BIG} cores. {reps} interleaved repetitions per
leg, per-metric minimum (noise-robust — see substrate note).

Corpus: deterministic synthetic `pages` (FIXTURES.md §1), n={n_docs:,} docs.

**Run-condition disclosure (ADVICE r3):** since round 3, every SPARK leg
runs one untimed 5k-doc warmup build before its timed work, absorbing
the fresh JVM's one-off whole-stage-codegen + JIT + Python-worker
spin-up (~40-60 s) that a long-lived cluster never pays per job. The
no-Spark substrate control has no JVM and therefore NO equivalent
warmup — so part of the round-2 -> round-3 normalized-efficiency gain
(0.74 -> 0.93 for the build) was this methodology change, not engine
scaling alone; compare round >= 3 numbers with each other only.
Within round 3+ both Spark legs are warmed identically.

| metric | local[{N_SMALL}] | local[{N_BIG}] | speedup | efficiency | substrate-normalized |
|---|---|---|---|---|---|
| index build (s) | {r4['queries']['index_build']:.1f} | {r16['queries']['index_build']:.1f} | {build_spd:.2f}x | {build_spd / 4:.2f} | **{build_spd / ctl_spd:.2f}** |
| index throughput (docs/s) | {r4['docs_per_sec']:,.0f} | {r16['docs_per_sec']:,.0f} | | | |
| batch 100-query BM25 (s) | {r4['queries']['batch100']:.1f} | {r16['queries']['batch100']:.1f} | {batch_spd:.2f}x | {batch_spd / 4:.2f} | **{batch_spd / ctl_spd:.2f}** |
| batch throughput (q/s) | {r4['batch_queries_per_sec']:.2f} | {r16['batch_queries_per_sec']:.2f} | | | |
| single-query p50 (s) | {r4['queries']['q_p50']:.2f} | {r16['queries']['q_p50']:.2f} | | (latency, not throughput) | |
| **substrate control** (mp tokenize, no Spark) | {r4['control_tok_s']:.2f} | {r16['control_tok_s']:.2f} | {ctl_spd:.2f}x | {ctl_spd / 4:.2f} | 1.00 by construction |

## Substrate note (why normalized efficiency is the honest number)

This sandbox VM is hosted with visible CPU steal (up to ~25% of the
pinned cores in bursts; per-leg machine-wide steal this run:
local[{N_SMALL}] {steals[N_SMALL]}%, local[{N_BIG}] {steals[N_BIG]}%) and
its run-to-run variance reaches 5x. A NO-SPARK control — pure-Python
multiprocessing over the same tokenizer, zero shuffle, embarrassingly
parallel — measures the machine's own 4->16 ceiling at
{ctl_spd:.2f}x ({ctl_spd / 4:.2f} efficiency) in the same windows. No
engine can out-scale its substrate, so the engine's scaling quality is
(engine speedup) / (control speedup), reported in the last column;
>= 1.0 means the engine scales as well as this machine allows.
On real distinct-host executors the control would be ~4.0x and the
absolute and normalized numbers would coincide.

Raw JSON: BENCH/scaling_c{N_SMALL}.json, BENCH/scaling_c{N_BIG}.json
(per-rep runs + steal + control).

## Notes

* Both runs build the full index (tokenize -> stats -> salted
  segments), then run the 100-query batched BM25 evaluation and 5
  single-query latencies, then pipeline ops (MinHash-LSH dedup, ANN).
* Round-4 changes vs round 3: search_batch computes totals + top-k in
  ONE fused pass over the candidate set (round 3 scanned a persisted
  candidate set twice and eagerly checkpointed the full joined output
  — the r2->r3 batch100 regression); single-query WAND engages
  adaptively above a decode-volume floor; MinHash verify join bounded
  to candidate docs; upserts stage-then-swap under a crash-recovery
  journal; optional positional stream + phrase matching; serving-mode
  decoded-postings cache (q_p50_preload leg).
* Round-3 changes vs round 2: S1 tokenize is Arrow-native (RE2
  split + dictionary-encode + np.unique; no per-doc Python
  findall/Counter — round 2's build-scaling bottleneck), WAND block
  selection is relational (no driver-side block collects) and wired
  into the batch path, upserts are O(delta) on the v3 bucketed
  layout, single queries run ONE fused count+top-k job with a
  driver-side term-df cache.
* Round-2 changes vs round 1: fixed-point int64 scoring (plain sums,
  no collect_set/sort_array arrays), per-posting lang attribute (no
  docs join at query time), explicit tokenize repartition (AQE
  size-based coalescing starved the CPU-bound stage), distributed
  upsert delta. Round-1 batch100 ANTI-scaled (0.17); see table.
* Build-leg fixed costs (docid offset collect, stats/meta collects,
  stage commits, worker spin-up; ~15s total) do not shrink with cores
  and weigh 2x more on the big leg at this corpus size — they amortize
  away at cluster scale (see decomposition note of the committed
  BASELINE.md).
* Correctness at both parallelism levels is asserted separately:
  tests/test_build_pipeline.py::test_parallelism_invariance proves
  byte-identical segment artifacts and identical docIDs across
  shuffle-partition settings.
"""


if __name__ == "__main__":
    main()
