"""N-vs-4N scaling study (BASELINE.md gate: efficiency >= 0.8).

No real cluster exists in this sandbox, so the north rule's two-cluster-size
criterion is evidenced by running the SAME job on the SAME input at two
parallelism levels: local[8] and local[32] (the host has 32 cores). Each run
is `bench.py` in a fresh subprocess (fresh JVM — no warm-cache bleed between
cluster sizes); the scored-pair workloads are identical because everything is
seed-deterministic and the pair set is checkpointed before timing.

Efficiency = tput(local[32]) / (4 * tput(local[8])), reported for both the
mixed workload (pairs_scored_per_sec: blocking-realistic, mostly early-exit)
and the kernel-bound workload (hard_pairs_scored_per_sec: full-band DP on
true near-duplicates — the purest measure of scoring-stage scalability).

Writes results to BENCH_SCALING.json and patches the measured rows in
BASELINE.md. Usage: python scripts/scaling_bench.py [--sf-dir PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, extra: list[str]) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--cpus", str(cpus), "--sf-dir", sf_dir, *extra]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    # bench.py prints exactly one JSON line on stdout (Spark logs go to stderr)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def patch_baseline(eff: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        md = f.read()
    rows = {
        r"\| measured: pairs/sec @ local\[8\] \|[^\n]*":
            "| measured: pairs/sec @ local[8] | {p8:,.0f} mixed / {h8:,.0f} kernel-bound | sf{sf}, seed=42, fixed 128-task pair set | `BENCH_SCALING.json` |".format(**eff),
        r"\| measured: pairs/sec @ local\[32\] \|[^\n]*":
            "| measured: pairs/sec @ local[32] | {p32:,.0f} mixed / {h32:,.0f} kernel-bound | same input + plan, 4x cores | `BENCH_SCALING.json` |".format(**eff),
        r"\| measured: scaling efficiency \|[^\n]*":
            "| measured: scaling efficiency | {e_mixed:.2f} mixed / {e_hard:.2f} kernel-bound (gate >= 0.8) | tput(32)/(4*tput(8)) | `BENCH_SCALING.json` |".format(**eff),
    }
    for pat, rep in rows.items():
        md = re.sub(pat, rep.replace("\\", "\\\\"), md)
    with open(path, "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--target-pairs", type=int, default=1_500_000)
    args = ap.parse_args()
    extra = ["--target-pairs", str(args.target_pairs)]

    r8 = run_bench(8, args.sf_dir, extra)
    print(json.dumps(r8))
    r32 = run_bench(32, args.sf_dir, extra)
    print(json.dumps(r32))

    eff = {
        "sf": r8["sf"],
        "p8": r8["pairs_scored_per_sec"], "p32": r32["pairs_scored_per_sec"],
        "h8": r8["hard_pairs_scored_per_sec"], "h32": r32["hard_pairs_scored_per_sec"],
    }
    eff["e_mixed"] = round(eff["p32"] / (4 * eff["p8"]), 3) if eff["p8"] else 0.0
    eff["e_hard"] = round(eff["h32"] / (4 * eff["h8"]), 3) if eff["h8"] else 0.0

    result = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff["e_hard"],
        "unit": "ratio",
        "sf": eff["sf"],
        "mixed": {"tput_local8": eff["p8"], "tput_local32": eff["p32"], "efficiency": eff["e_mixed"]},
        "kernel_bound": {"tput_local8": eff["h8"], "tput_local32": eff["h32"], "efficiency": eff["e_hard"]},
        "runs": {"local8": r8, "local32": r32},
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    patch_baseline(eff)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))


if __name__ == "__main__":
    main()
