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


def measured_bus_bandwidth_gbs(n_mb: int = 256) -> float:
    """Memory-bus bandwidth via a STREAM-triad-style numpy pass
    (a = b*s + c over arrays far beyond LLC): bytes moved ≈ 3 arrays
    per pass (2 reads + 1 write).  Single-thread measurement — numpy
    elementwise ops don't multithread, matching the per-actor compare."""
    n = n_mb * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.ones(n)
    a = b * 1.5 + c                      # warmup + allocation
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        np.multiply(b, 1.5, out=a)
        np.add(a, c, out=a)
    dt = time.perf_counter() - t0
    # 2 passes per rep; each pass touches 3 arrays (triad split in two)
    return reps * (3 + 2) * n * 8 / dt / 1e9


# ST3-math traffic estimate: ~40 plane-sized intermediates per side and
# scale (SURVEY §1.1 PsychoImage 10 planes ×2 scales ×2 sides + blur
# H/V passes + Malta reads) touched ~3× each → ≈ 120 plane traversals
# of 4-byte floats per compare.  Used with the measured bus bandwidth
# to cap the actor pool where compares saturate the bus instead of a
# hard-coded constant (VERDICT r2 #9).
TRAFFIC_PLANE_TRAVERSALS = 120


def auto_strip_cap(w: int, h: int, t_single_s: float, bw_gbs: float,
                   n_cpus: int) -> int:
    bytes_per_cmp = TRAFFIC_PLANE_TRAVERSALS * w * h * 4
    cap = bw_gbs * 1e9 * t_single_s / bytes_per_cmp
    return int(np.clip(round(cap), 4, n_cpus))


def single_thread(sizes, trials):
    from butteraugli_ray.metric.api import butteraugli_srgb
    from butteraugli_ray.metric.precompute import ReferencePrecompute
    from butteraugli_ray.metric.strip import butteraugli_strip
    out = {}
    for (w, h) in sizes:
        a, b = make_pair(w, h)
        full_s = best_of(lambda: butteraugli_srgb(a, b), trials)
        ref = ReferencePrecompute(a)
        warm_s = best_of(lambda: ref.compare_srgb(b), trials)
        strip_s = best_of(lambda: butteraugli_strip(a, b, strip_height=384),
                          trials)
        ref.prepare_strip_cache(384)
        stripw_s = best_of(lambda: ref.compare_strip(
            b, strip_height=384, cache_reference=True), trials)
        print(json.dumps({"bench": "single_thread", "size": f"{w}x{h}",
                          "full_ms": round(full_s * 1e3, 1),
                          "warm_ms": round(warm_s * 1e3, 1),
                          "strip_ms": round(strip_s * 1e3, 1),
                          "strip_warm_ms": round(stripw_s * 1e3, 1)}))
        out[(w, h)] = stripw_s
    return out


def concurrent_warm(sizes, n_actors_list, per_actor):
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)

    @ray.remote
    class Cmp:
        def __init__(self, w, h, mode):
            from butteraugli_ray.metric.precompute import ReferencePrecompute
            self.a, self.b = make_pair(w, h)
            self.mode = mode
            self.ref = None
            if mode == "warm":
                self.ref = ReferencePrecompute(self.a)
            elif mode == "strip_warm":
                self.ref = ReferencePrecompute(self.a, strip_only=True)
                self.ref.prepare_strip_cache(384)

        def run(self, n):
            from butteraugli_ray.metric.strip import butteraugli_strip
            t0 = time.perf_counter()
            for _ in range(n):
                if self.mode == "strip":
                    butteraugli_strip(self.a, self.b, strip_height=384)
                elif self.mode == "strip_warm":
                    self.ref.compare_strip(self.b, strip_height=384,
                                           cache_reference=True)
                else:
                    self.ref.compare_srgb(self.b)
            return time.perf_counter() - t0

    for (w, h) in sizes:
        for mode in ("warm", "strip", "strip_warm"):
            for n_actors in sorted(set(n_actors_list.get((w, h, mode),
                                                         n_actors_list.get(
                                                             "default", [14])))):
                actors = [Cmp.remote(w, h, mode) for _ in range(n_actors)]
                ray.get([a.run.remote(1) for a in actors])   # warmup
                t0 = time.perf_counter()
                ray.get([a.run.remote(per_actor) for a in actors])
                wall = time.perf_counter() - t0
                cps = n_actors * per_actor / wall
                print(json.dumps({
                    "bench": "concurrent", "size": f"{w}x{h}",
                    "mode": mode,
                    "n_actors": n_actors, "cmp_per_sec": round(cps, 2)}))
                for a in actors:
                    ray.kill(a)
    ray.shutdown()


def main():
    quick = "--quick" in sys.argv
    sizes = [(1280, 720)] if quick else [(1280, 720), (1920, 1080)]
    n_cpus = len(os.sched_getaffinity(0))
    bw = measured_bus_bandwidth_gbs()
    print(json.dumps({"bench": "bus_bandwidth", "gbs": round(bw, 1)}))
    stripw = single_thread(sizes, trials=1 if quick else 3)
    caps = {}
    for (w, h) in sizes:
        cap = auto_strip_cap(w, h, stripw[(w, h)], bw, n_cpus)
        caps[(w, h)] = cap
        print(json.dumps({"bench": "auto_cap", "size": f"{w}x{h}",
                          "cap": cap}))
    n_actors = {"default": [14] if quick else [8, 14, 20, 28]}
    for (w, h) in sizes:
        for mode in ("warm", "strip", "strip_warm"):
            base = n_actors["default"]
            n_actors[(w, h, mode)] = sorted(set(base + [caps[(w, h)]]))
    concurrent_warm(sizes, n_actors, per_actor=2 if quick else 4)


if __name__ == "__main__":
    main()
