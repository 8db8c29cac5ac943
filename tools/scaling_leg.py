"""Run ONE pinned scaling leg (bench suite + steal + control) and
append its JSON to a raw file — lets an orchestrator run legs in
bounded time slices and assemble BASELINE.md afterwards with
tools/scaling_assemble.py. Usage:
  python tools/scaling_leg.py <cpus> <n_docs> <raw_out.jsonl>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

from bench_scaling import _ensure_control_corpus, run_bench  # noqa: E402


def main() -> None:
    cpus, n_docs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    _ensure_control_corpus()
    t0 = time.time()
    r = run_bench(cpus, n_docs)
    r["wall"] = round(time.time() - t0, 1)
    r["leg_cpus"] = cpus
    with open(out, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(f"leg c{cpus} done in {r['wall']}s build={r['queries']['index_build']}")


if __name__ == "__main__":
    main()
