"""Reproduce BASELINE.md's large-media head-to-head table.

Times the one-shot / warm-reference / strip compare paths single-thread
at 720p and 1080p, then full-node concurrent warm compares at two actor
counts (bus-saturation check).  Usage:

    python tools/bench_large_media.py [--quick]

Prints one JSON line per row.  Standalone script — owns its Ray session.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pair(w: int, h: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    noise = rng.integers(-6, 7, (h, w, 3), dtype=np.int16)
    b = np.clip(a.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return a, b


def best_of(fn, trials: int) -> float:
    fn()                    # warmup: LUT build, allocator, page faults
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def single_thread(sizes, trials):
    from butteraugli_ray.metric.api import butteraugli_srgb
    from butteraugli_ray.metric.precompute import ReferencePrecompute
    from butteraugli_ray.metric.strip import butteraugli_strip
    for (w, h) in sizes:
        a, b = make_pair(w, h)
        full_s = best_of(lambda: butteraugli_srgb(a, b), trials)
        ref = ReferencePrecompute(a)
        warm_s = best_of(lambda: ref.compare_srgb(b), trials)
        strip_s = best_of(lambda: butteraugli_strip(a, b, strip_height=384),
                          trials)
        print(json.dumps({"bench": "single_thread", "size": f"{w}x{h}",
                          "full_ms": round(full_s * 1e3, 1),
                          "warm_ms": round(warm_s * 1e3, 1),
                          "strip_ms": round(strip_s * 1e3, 1)}))


def concurrent_warm(sizes, n_actors_list, per_actor):
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)

    @ray.remote
    class Cmp:
        def __init__(self, w, h, strip):
            from butteraugli_ray.metric.precompute import ReferencePrecompute
            self.a, self.b = make_pair(w, h)
            self.strip = strip
            self.ref = None if strip else ReferencePrecompute(self.a)

        def run(self, n):
            from butteraugli_ray.metric.strip import butteraugli_strip
            t0 = time.perf_counter()
            for _ in range(n):
                if self.strip:
                    butteraugli_strip(self.a, self.b, strip_height=384)
                else:
                    self.ref.compare_srgb(self.b)
            return time.perf_counter() - t0

    for (w, h) in sizes:
        for strip in (False, True):
            for n_actors in n_actors_list:
                actors = [Cmp.remote(w, h, strip) for _ in range(n_actors)]
                ray.get([a.run.remote(1) for a in actors])   # warmup
                t0 = time.perf_counter()
                ray.get([a.run.remote(per_actor) for a in actors])
                wall = time.perf_counter() - t0
                cps = n_actors * per_actor / wall
                print(json.dumps({
                    "bench": "concurrent", "size": f"{w}x{h}",
                    "mode": "strip" if strip else "warm",
                    "n_actors": n_actors, "cmp_per_sec": round(cps, 2)}))
                for a in actors:
                    ray.kill(a)
    ray.shutdown()


def main():
    quick = "--quick" in sys.argv
    sizes = [(1280, 720)] if quick else [(1280, 720), (1920, 1080)]
    single_thread(sizes, trials=1 if quick else 3)
    concurrent_warm(sizes, [14] if quick else [14, 28],
                    per_actor=2 if quick else 4)


if __name__ == "__main__":
    main()
