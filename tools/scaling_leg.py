"""Run ONE pinned scaling leg (bench suite + steal + control) and
append its JSON to a raw file — lets an orchestrator run legs in
bounded time slices and assemble BASELINE.md afterwards with
tools/scaling_assemble.py. Usage:
  python tools/scaling_leg.py <cpus> <n_docs> <raw_out.jsonl>

INTERFERENCE-AWARE (round-5, VERDICT r4 wrong #3): the r4 1M artifact
landed in a sustained host-steal phase and measured the host, not the
engine. Each leg now (a) waits for a calm pre-flight window (spot
steal <= SPARK_GRAFT_STEAL_MAX, default 3% machine-wide) and (b) if
the steal measured DURING the leg still exceeded the threshold,
retries up to SPARK_GRAFT_STEAL_RETRIES times. Every attempt is
recorded with ``steal_ok``; the assembler excludes dirty attempts when
a clean one exists, instead of publishing them with a disclaimer.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

from bench_scaling import _ensure_control_corpus, _read_steal, run_bench  # noqa: E402

STEAL_MAX = float(os.environ.get("SPARK_GRAFT_STEAL_MAX", "3.0"))
RETRIES = int(os.environ.get("SPARK_GRAFT_STEAL_RETRIES", "2"))
PREFLIGHT_WAIT_S = float(os.environ.get("SPARK_GRAFT_PREFLIGHT_WAIT", "120"))


def _spot_steal(seconds: float = 3.0) -> float:
    s0, t0 = _read_steal()
    time.sleep(seconds)
    s1, t1 = _read_steal()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def _wait_calm() -> float:
    """Block until a calm window (or the wait budget runs out);
    returns the last spot-steal reading."""
    deadline = time.time() + PREFLIGHT_WAIT_S
    s = _spot_steal()
    while s > STEAL_MAX and time.time() < deadline:
        print(f"pre-flight steal {s:.1f}% > {STEAL_MAX}% — waiting", flush=True)
        time.sleep(10)
        s = _spot_steal()
    return s


def main() -> None:
    cpus, n_docs, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    _ensure_control_corpus()
    for attempt in range(RETRIES + 1):
        pre = _wait_calm()
        t0 = time.time()
        r = run_bench(cpus, n_docs)
        r["wall"] = round(time.time() - t0, 1)
        r["leg_cpus"] = cpus
        r["attempt"] = attempt
        r["preflight_steal_pct"] = round(pre, 2)
        r["steal_ok"] = r["steal_pct_machine"] <= STEAL_MAX
        with open(out, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(
            f"leg c{cpus} attempt {attempt} done in {r['wall']}s "
            f"build={r['queries']['index_build']} "
            f"steal={r['steal_pct_machine']}% ok={r['steal_ok']}",
            flush=True,
        )
        if r["steal_ok"]:
            break


if __name__ == "__main__":
    main()
