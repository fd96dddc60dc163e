"""Spark-free hardware control for the N-vs-4N scaling evidence: K
independent pinned Python processes run the banded kernel on identical
bench-shaped batches (full-DP near-dup pairs, string lengths drawn from the
bench corpus's fingerprint distribution, Arrow-sized 3072-pair batches) with
zero scheduler / shuffle / JVM involvement. Whatever efficiency THIS loses
going N -> 4N processes is the box's own ceiling (shared L3 / DRAM
bandwidth / hypervisor steal) — no Spark job on the same box can beat it,
so measured-Spark-efficiency ÷ control-efficiency isolates the engine's
software overhead from the hardware wall.

Writes BENCH_KERNEL_CONTROL.json. Usage:
  python scripts/kernel_control.py [--procs 2 8 32] [--batches 40]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = 3072
# representative fingerprint lengths (bench corpus: min 42 / median 170 /
# p90 425 / max 582)
LENGTHS = [42, 96, 170, 240, 330, 425, 582]


def _make_batch(seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz 0123456789", dtype=np.uint8)
    a_list, b_list = [], []
    for i in range(BATCH):
        ln = LENGTHS[i % len(LENGTHS)]
        s = rng.choice(alphabet, size=ln).tobytes().decode()
        pos = int(rng.integers(0, ln))
        a_list.append(s)
        b_list.append(s[:pos] + s[pos + 1:])  # distance-1 near-dup: full DP
    return a_list, b_list


def _worker(core: int, n_batches: int, out_q) -> None:
    os.sched_setaffinity(0, {core})
    from liblevenshtein_spark.kernels.banded import batch_banded_distance

    a, b = _make_batch(seed=1234 + core)
    batch_banded_distance(a, b, 2, "standard")  # warmup / numpy import paid
    t0 = time.time()
    total = 0
    for _ in range(n_batches):
        d = batch_banded_distance(a, b, 2, "standard")
        total += len(d)
    out_q.put((total, time.time() - t0))


def measure(n_procs: int, n_batches: int) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(c, n_batches, q))
             for c in range(n_procs)]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    total = sum(r[0] for r in results)
    return round(total / wall, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--attempts", type=int, default=3)
    args = ap.parse_args()

    best = {}
    for rep in range(args.attempts):  # interleaved best-of-N (noisy VM)
        for n in args.procs:
            t = measure(n, args.batches)
            best[n] = max(best.get(n, 0.0), t)
            print(json.dumps({"attempt": rep, "procs": n, "pairs_per_sec": t}),
                  flush=True)
    result = {
        "metric": "kernel_control_pairs_per_sec",
        "unit": "pairs/sec",
        "config": f"pure numpy kernel, {BATCH}-pair batches, bench-corpus "
                  f"length mix {LENGTHS}, distance-1 full-DP pairs, "
                  "1 pinned process per core, best-of-%d" % args.attempts,
        "tput": best,
    }
    sizes = sorted(best)
    for lo in sizes:
        for hi in sizes:
            if hi == 4 * lo:
                result[f"efficiency_{lo}_to_{hi}"] = round(best[hi] / (4 * best[lo]), 3)
    with open(os.path.join(REPO, "BENCH_KERNEL_CONTROL.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
