"""One-off: knn_join_k4_r50 N->4N cells at 4x suite volume (see scaling.py)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("BENCH_SCALE", "96")
os.environ.setdefault("BENCH_REPEAT", "2")
from scaling import run_query  # noqa: E402

sf = "/root/testdata/sf0.1"
for p in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
    ts = run_query("knn_join_k4_r50", 2, sf)
    tb = run_query("knn_join_k4_r50", 8, sf)
    print(json.dumps({"pass": p, "t_small": ts, "t_big": tb,
                      "eff": round(ts / tb / 4.0, 3)}), flush=True)
