"""Hardware scaling ceiling for the N→4N core proxy (no Spark).

The north-rule scaling criterion is defined for N vs 4N EXECUTORS on a
real cluster, where 4x executors bring 4x memory bandwidth and
unchanged per-core clocks. The sandbox proxy (local[8] vs local[32],
or 2 vs 8 executors on a localhost standalone cluster — both measured,
both agree) runs on ONE physical box, so going 8→32 active cores
divides per-core memory bandwidth by 4 and drops turbo clocks. This
tool measures what that silicon ceiling is for plain numpy — no JVM,
no Spark, no shuffle — so the engine's measured ratio can be read
against the maximum ANY workload could achieve on this host:

  stream kernel (a*b+a, sum): memory-bandwidth-bound, like scans
  sort kernel (np.sort):      cache/branch-bound, like window sorts

Usage: python tools/bench_hw_ceiling.py [--procs 8,32] [--trials 3]
Prints one JSON line; run in a quiet window (loadavg < ~3) — co-tenant
load suppresses the high-parallelism side and understates the ceiling.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np


def _work(kind: str, dur: float, q) -> None:
    rng = np.random.default_rng(0)
    a = rng.random(2_000_000)
    b = rng.random(2_000_000)
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        if kind == "stream":
            c = a * b + a
            _ = c.sum()
        else:
            _ = np.sort(a)
        n += 1
    q.put(n)


def aggregate_rate(procs: int, kind: str, dur: float = 6.0) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_work, args=(kind, dur, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / dur


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="8,32")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.procs.split(","))
    out = {"procs": [lo, hi], "loadavg_start": os.getloadavg()[0]}
    for kind in ("stream", "sort"):
        # interleave lo/hi trials so a co-tenant load storm cannot hit
        # only one side of the ratio; max per level = noise floor
        pairs = [(aggregate_rate(lo, kind), aggregate_rate(hi, kind))
                 for _ in range(args.trials)]
        best_lo = max(p[0] for p in pairs)
        best_hi = max(p[1] for p in pairs)
        out[kind] = {
            f"rate_{lo}p": round(best_lo, 1),
            f"rate_{hi}p": round(best_hi, 1),
            "ratio": round(best_hi / best_lo, 3),
            "hw_efficiency": round(best_hi / (hi / lo * best_lo), 3),
        }
    out["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
