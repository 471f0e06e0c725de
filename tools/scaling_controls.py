"""Hardware controls for the scaling-efficiency evidence.

Runs two Ray-free workloads at the same two parallelism levels as
``bench.py --scaling`` (default 7 vs 28 workers) in fresh
``multiprocessing`` pools:

1. SPIN — pure integer arithmetic, no memory traffic.  Efficiency ≈ 1
   proves the cores are real (not an oversubscribed cgroup).
2. KERNEL — the actual butteraugli compare (64 px, same operating point
   as the bench headline) under raw multiprocessing, no Ray.  Its
   efficiency is the MEMORY-BUS ceiling of this box: Ray Data cannot
   scale better than this on one node, so bench --scaling numbers
   should be read against it.

Usage: python tools/scaling_controls.py [lo hi]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPIN_ITERS = 30_000_000
KERNEL_REPEATS = 30
PX = 64


def _spin(_: int) -> int:
    acc = 0
    for i in range(SPIN_ITERS):
        acc = (acc + i * i) & 0xFFFFFFFF
    return acc


_PAIR = None


def _kernel_init() -> None:
    global _PAIR
    from butteraugli_ray.corpus.generators import generate_image_pair
    _PAIR = generate_image_pair("gradient_h_shift_15", PX, PX)


def _kernel(_: int) -> float:
    from butteraugli_ray.metric import butteraugli_srgb
    s = 0.0
    for _i in range(KERNEL_REPEATS):
        s = butteraugli_srgb(*_PAIR).score
    return s


def _run(n_workers: int, fn, n_tasks: int, initializer=None) -> float:
    """tasks/sec with a fresh pool (pool build excluded from timing
    via a 1-task warmup that also pays any per-worker import cost)."""
    with mp.get_context("spawn").Pool(n_workers,
                                      initializer=initializer) as pool:
        pool.map(fn, range(n_workers))          # warmup / imports
        t0 = time.time()
        pool.map(fn, range(n_tasks))
        return n_tasks / (time.time() - t0)


def main() -> None:
    lo, hi = (int(x) for x in (sys.argv[1:3] or ["7", "28"]))
    out = {"metric": f"scaling_controls_{lo}_to_{hi}",
           "spin_iters": SPIN_ITERS, "kernel_px": PX,
           "kernel_repeats": KERNEL_REPEATS}
    for name, fn, init, per in (("spin", _spin, None, 4),
                                ("kernel", _kernel, _kernel_init, 8)):
        r_lo = _run(lo, fn, lo * per, init)
        r_hi = _run(hi, fn, hi * per, init)
        out[f"{name}_per_sec_{lo}"] = round(r_lo, 2)
        out[f"{name}_per_sec_{hi}"] = round(r_hi, 2)
        out[f"{name}_efficiency"] = round((r_hi / r_lo) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
