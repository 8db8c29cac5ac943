"""Assemble BENCH/scaling_pairs_<tag>.json from tools/scaling_pair.py
raw output: per-pair build/batch speedups + control-normalized
efficiencies, published as the MEDIAN over CLEAN pairs (both legs'
in-leg steal under the harness threshold) — the VERDICT r5 #2
methodology: numerator and denominator of every ratio come from the
same calm window.

Usage: python tools/scaling_pair_assemble.py <raw.jsonl> <out.json>
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    raw_path, out_path = sys.argv[1], sys.argv[2]
    pairs = [json.loads(line) for line in open(raw_path)]
    clean = [p for p in pairs if p.get("clean")]
    use = clean or pairs
    keys = [
        k
        for k in use[0]
        if k.startswith(("build_speedup", "batch_speedup", "build_eff", "batch_eff"))
    ]
    med = {k: round(statistics.median(p[k] for p in use if k in p), 3) for k in keys}
    out = {
        "methodology": (
            "paired c4+c16 legs inside one calm window; per-pair ratios; "
            "median over clean pairs (dirty pairs recorded but excluded)"
        ),
        "n_docs": use[0]["n_docs"],
        "n_pairs_total": len(pairs),
        "n_pairs_clean": len(clean),
        "median": med,
        "pairs": [
            {
                "pair": p["pair"],
                "clean": p["clean"],
                "build_c4_s": p["small"]["queries"]["index_build"],
                "build_c16_s": p["big"]["queries"]["index_build"],
                "batch_c4_s": p["small"]["queries"]["batch100"],
                "batch_c16_s": p["big"]["queries"]["batch100"],
                **{k: p[k] for k in keys if k in p},
            }
            for p in pairs
        ],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["median"], indent=2))


if __name__ == "__main__":
    main()
