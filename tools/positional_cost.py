"""One-off measurement of the positional (phrase-capable) index's cost
vs the default index at a given scale: build-time delta, segment-bytes
delta, and phrase latency. Writes BENCH/positional_cost.json (consumed
by scaling_assemble's BASELINE.md template). Pinned + steal-recorded
like a scaling leg. Usage:
  taskset is applied internally; python tools/positional_cost.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_scaling import _read_steal  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    env["SPARK_GRAFT_BENCH_REPS"] = "1"
    env["SPARK_GRAFT_BENCH_ONLY"] = "phrase"  # build + batch legs always run
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
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
    rec = {
        "n_docs": n_docs,
        "cpus": cpus,
        "steal_pct_machine": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
        "index_build_s": r["queries"]["index_build"],
        "index_build_pos_s": r["queries"]["index_build_pos"],
        "segments_bytes": r["segments_bytes"],
        "segments_pos_bytes": r["segments_pos_bytes"],
        "q_phrase_stopword_s": r["queries"]["q_phrase_stopword"],
        "q_phrase_s": r["queries"]["q_phrase"],
        "phrase_hits": r["phrase_hits"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "positional_cost.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
