"""Two-parallelism scaling run (the sandbox proxy for N vs 4N executors).

Runs bench.py in separate JVMs at local[8] and local[32] on the same input
and reports throughput at both plus scaling efficiency
  efficiency = T(N) / (4 * T(4N))    (equivalently speedup / 4)
per the BASELINE.json north_rule (target >= 0.8). Writes BENCH.md.

Usage: python tools/scaling.py [sf_dir] [n_small] [n_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    # Reproducible defaults for the reported study (override via env):
    # BENCH_SCALE=24 gives every query enough work to amortize constant
    # scheduling/compile costs at the low-parallelism level; min-of-2
    # bounds wall time; 64 shuffle partitions at BOTH levels keeps the
    # task graph identical so the comparison isolates core count.
    env.setdefault("BENCH_SCALE", "24")
    env.setdefault("BENCH_REPEAT", "2")
    env.setdefault("BENCH_SHUFFLE_PARTITIONS", "64")
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py produced no JSON at {cores} cores")
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    factor = n_big / n_small

    small = run_bench(n_small, sf_dir)
    big = run_bench(n_big, sf_dir)

    speedup = small["value"] / big["value"]
    eff = speedup / factor
    rows = []
    for q in big["queries"]:
        ts, tb = small["queries"][q], big["queries"][q]
        rows.append((q, ts, tb, ts / tb, (ts / tb) / factor))

    scale = os.environ.get("BENCH_SCALE", "24")
    repeat = os.environ.get("BENCH_REPEAT", "2")
    shuffle = os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64")
    lines = [
        "# BENCH — scaling evidence (north_rule)",
        "",
        f"Same headline suite, same input ({sf_dir}, BENCH_SCALE={scale}),",
        f"two parallelism levels in separate JVMs: `local[{n_small}]` (N) vs",
        f"`local[{n_big}]` (4N) — the sandbox proxy for N vs 4N executors",
        f"mandated by the driver. Shuffle partitions fixed at {shuffle} for",
        "BOTH levels (sized by data, not cores: the same task graph",
        "executed by fewer or more threads is the apples-to-apples",
        f"comparison). Each query is timed as min-of-{repeat}; the host",
        "carries a fluctuating external background load of ~4-9 cores, so",
        "the minimum estimates steady state and these levels keep both",
        "runs inside the machine's idle headroom. Per-query efficiencies",
        "are noisy at sub-10s wall times (constant scheduling/compile",
        "costs and external load dominate); the suite total is the",
        "headline number.",
        "",
        f"| metric | local[{n_small}] | local[{n_big}] | speedup | efficiency |",
        "|---|---|---|---|---|",
        f"| suite wall time (s) | {small['value']} | {big['value']} | "
        f"{speedup:.2f}x | **{eff:.2f}** |",
        f"| throughput (rows/s) | {small['throughput_rows_per_sec']} | "
        f"{big['throughput_rows_per_sec']} | — | — |",
        "",
        "Per-query:",
        "",
        "| query | T(N) s | T(4N) s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for q, ts, tb, sp, ef in rows:
        lines.append(f"| {q} | {ts} | {tb} | {sp:.2f}x | {ef:.2f} |")
    lines += [
        "",
        f"North-rule target: efficiency >= 0.8 from N to 4N. Measured: "
        f"**{eff:.2f}** on the suite total.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps({"n_small": small, "n_big": big}),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(eff, 3), "speedup": round(speedup, 3),
                      "t_small": small["value"], "t_big": big["value"]}))


if __name__ == "__main__":
    main()
