#!/usr/bin/env python
"""Paired platform-scaling ceilings at N vs 4N taskset-pinned cores, via a
fork pool (no Spark): what ANY parallel job can achieve on this shared
host, by bottleneck class.

Two kernels, because one number misleads:

  * ``spin``  — integer ALU spin, zero memory traffic: the CPU-bound
    ceiling (what `scaling_run.py` / `consumer_scaling_run.py` pair with);
  * ``stream`` — large out-of-cache numpy copies: the DRAM-bandwidth
    ceiling.  Memory bandwidth is SHARED across cores, so 4 pinned cores
    enjoy far more bandwidth per core than 16 — a bandwidth-bound job has
    a structurally lower 4->16 ceiling than a CPU-bound one on the same
    box.  Allocation-heavy whole-stage-codegen maps (array folds over
    string arrays) sit near THIS ceiling, not the spin one — measured in
    `dedup_scaling_500k.json`, where the zero-shuffle repetition pass
    scales well below the shuffle-heavy join.

Usage: python BENCH/platform_probe_run.py [--cpus 4,16] [--json out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _spin(args) -> int:
    n_iters, _ = args
    x = 0
    for i in range(n_iters):
        x = (x * 1103515245 + 12345 + i) & 0x7FFFFFFF
    return x


def _stream(args) -> float:
    _, n_copies = args
    import numpy as np

    a = np.arange(16_000_000, dtype=np.float64)  # 128 MB >> LLC
    b = np.empty_like(a)  # preallocated: pure read+write DRAM traffic,
    s = 0.0               # no mmap/page-fault churn in the timed loop
    for _ in range(n_copies):
        np.copyto(b, a)
        b += 1.0
        s += float(b[-1])
    return s


def measure(kernel, cpus: int, per_task) -> float:
    os.sched_setaffinity(0, set(range(cpus)))
    try:
        with mp.get_context("fork").Pool(cpus) as pool:
            t0 = time.time()
            pool.map(kernel, [per_task] * cpus)
            return time.time() - t0
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


def main() -> None:
    lo, hi = 4, 16
    if "--cpus" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--cpus") + 1].split(","))
    factor = hi / lo
    load_pre = round(os.getloadavg()[0], 2)
    result = {
        "what": (
            "taskset-pinned fork-pool ceilings by bottleneck class: per-core "
            "work is FIXED, so perfect scaling = equal wall at both levels; "
            "efficiency = wall_lo / wall_hi"
        ),
        "loadavg_pre": load_pre,
    }
    # per-core work fixed => ideal scaling gives the SAME wall at each level
    for name, kernel, per_task in (
        ("spin", _spin, (60_000_000, 0)),
        ("stream", _stream, (0, 48)),
    ):
        measure(kernel, lo, per_task)  # warmup/page-fault
        walls = {}
        for _ in range(4):  # interleaved best-of-4
            for c in (lo, hi):
                walls.setdefault(c, []).append(measure(kernel, c, per_task))
        w_lo, w_hi = min(walls[lo]), min(walls[hi])
        result[name] = {
            f"wall_{lo}": round(w_lo, 2),
            f"wall_{hi}": round(w_hi, 2),
            "ceiling": round(w_lo / w_hi, 3),
        }
    result["loadavg_post"] = round(os.getloadavg()[0], 2)
    print(json.dumps(result, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
