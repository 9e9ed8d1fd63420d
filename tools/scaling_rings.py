"""Ring-join scaling deep-dive: nearest_join / knn_join at 4x suite volume
(BENCH_SCALE=96), local[2] vs local[8], fresh JVM per cell (see scaling.py).

Usage: python tools/scaling_rings.py [passes]
Prints one JSON line per (query, pass) and a final summary line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import run_query  # noqa: E402

QUERIES = ["nearest_join_r25", "knn_join_k4_r50"]


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    os.environ["BENCH_SCALE"] = os.environ.get("BENCH_SCALE", "96")
    os.environ["BENCH_REPEAT"] = os.environ.get("BENCH_REPEAT", "2")
    sf_dir = "/root/testdata/sf0.1"
    best: dict[str, list[float]] = {q: [1e18, 1e18] for q in QUERIES}
    for p in range(passes):
        for q in QUERIES:
            ts = run_query(q, 2, sf_dir)
            tb = run_query(q, 8, sf_dir)
            best[q][0] = min(best[q][0], ts)
            best[q][1] = min(best[q][1], tb)
            print(json.dumps({"pass": p, "query": q, "t_small": ts,
                              "t_big": tb, "eff": round(ts / tb / 4.0, 3)}),
                  flush=True)
    out = {q: {"t_small": v[0], "t_big": v[1],
               "eff": round(v[0] / v[1] / 4.0, 3)} for q, v in best.items()}
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
