"""Run PAIRED c4+c16 scaling legs inside one calm window (VERDICT r5
next #2): the r5 artifacts computed efficiency from min-merged legs
taken in DIFFERENT host phases, which biased ratios down. A pair runs
both core counts back-to-back after a single calm-window pre-flight,
so numerator and denominator see the same substrate; the published
number is the MEDIAN of per-pair ratios.

Usage:
  python tools/scaling_pair.py <n_docs> <raw_out.jsonl> [n_pairs]

Appends one JSON line per pair: both legs' raw results (same fields as
tools/scaling_leg.py) plus the pair's build/batch speedups and
control-normalized efficiencies. Assemble with
tools/scaling_pair_assemble.py.
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
PREFLIGHT_WAIT_S = float(os.environ.get("SPARK_GRAFT_PREFLIGHT_WAIT", "120"))
C_SMALL, C_BIG = 4, 16


def _spot_steal(seconds: float = 3.0) -> float:
    s0, t0 = _read_steal()
    time.sleep(seconds)
    s1, t1 = _read_steal()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1)


def _wait_calm() -> float:
    deadline = time.time() + PREFLIGHT_WAIT_S
    s = _spot_steal()
    while s > STEAL_MAX and time.time() < deadline:
        print(f"pre-flight steal {s:.1f}% > {STEAL_MAX}% — waiting", flush=True)
        time.sleep(10)
        s = _spot_steal()
    return s


def _pair_ratios(small: dict, big: dict) -> dict:
    q4, q16 = small["queries"], big["queries"]
    out = {
        "build_speedup": round(q4["index_build"] / q16["index_build"], 3),
        "batch_speedup": round(q4["batch100"] / q16["batch100"], 3),
    }
    # control-normalized (same normalization the r4/r5 assembler uses:
    # engine speedup / substrate-control speedup, per pair)
    for ctrl in ("control_tok_s", "control_arrow_s"):
        c4, c16 = small.get(ctrl), big.get(ctrl)
        if c4 and c16:
            spd = c4 / c16
            out[f"build_eff_norm_{ctrl}"] = round(
                (out["build_speedup"] / 4.0) / (spd / 4.0), 3
            )
            out[f"batch_eff_norm_{ctrl}"] = round(
                (out["batch_speedup"] / 4.0) / (spd / 4.0), 3
            )
    return out


def main() -> None:
    n_docs, out = int(sys.argv[1]), sys.argv[2]
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    _ensure_control_corpus()
    for pi in range(n_pairs):
        pre = _wait_calm()
        legs = {}
        for cpus in (C_SMALL, C_BIG):
            t0 = time.time()
            r = run_bench(cpus, n_docs)
            r["wall"] = round(time.time() - t0, 1)
            r["leg_cpus"] = cpus
            r["steal_ok"] = r["steal_pct_machine"] <= STEAL_MAX
            legs[cpus] = r
            print(
                f"pair {pi} leg c{cpus} done in {r['wall']}s "
                f"build={r['queries']['index_build']} "
                f"batch={r['queries']['batch100']} "
                f"steal={r['steal_pct_machine']}% ok={r['steal_ok']}",
                flush=True,
            )
        rec = {
            "pair": pi,
            "n_docs": n_docs,
            "preflight_steal_pct": round(pre, 2),
            "clean": legs[C_SMALL]["steal_ok"] and legs[C_BIG]["steal_ok"],
            "small": legs[C_SMALL],
            "big": legs[C_BIG],
            **_pair_ratios(legs[C_SMALL], legs[C_BIG]),
        }
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(
            f"pair {pi}: clean={rec['clean']} "
            f"build x{rec['build_speedup']} batch x{rec['batch_speedup']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
