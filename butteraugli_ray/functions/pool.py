"""Actor-pool sizing shared by every stateful map_batches stage.

A fixed pool of ``n`` actors reserves ``n`` CPUs for the stage's whole
lifetime.  When ``n`` >= the cluster's CPUs the pool starves every
downstream task — measured: the MinHash verify pipeline deadlocks
outright under ``ray.init(num_cpus=4)`` with a fixed 4-actor bander
pool, because the groupby shuffle behind it can never get a CPU while
the actors hold them all.

Two safe shapes:
- fixed pool CAPPED below the cluster CPU count (full parallelism from
  the first batch; downstream always has headroom) — used when the
  cluster size is known at pipeline-build time;
- autoscaling ``(1, n)`` (can never wedge anything, but measured ~1-4 s
  of ramp per stage on a 32-CPU suite run) — the fallback when Ray
  isn't initialised yet and the cap can't be known.
"""


def actor_pool(n):
    """Normalize a requested actor count for
    ``map_batches(Cls, concurrency=…)``: a fixed count capped at
    cluster CPUs - 2 when the cluster is known, else an autoscaling
    ``(1, n)`` spec.  Tuples pass through so callers can pin a floor."""
    if isinstance(n, tuple):
        return n
    n = max(1, int(n or 4))
    import ray
    if not ray.is_initialized():
        return (1, n)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min(n, cpus - 2))


_BROADCAST_CACHE: dict = {}


def broadcast_get(ref):
    """Per-worker-process cache around ``ray.get`` for ``ray.put``
    broadcasts read inside PLAIN ``map_batches`` functions (stateless
    tasks).  Worker processes persist across tasks, so the object
    deserializes once per worker — the actor-pool ``__init__`` benefit
    without reserving CPUs for a fixed pool (two fixed pools feeding a
    shuffle can hold every CPU on a small cluster and wedge the
    downstream join; see the deadlock note above).  Bounded: keeps the
    8 most recent refs so a long-lived worker can't pin dead objects.
    """
    import ray
    key = ref.hex() if hasattr(ref, "hex") else ref
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        if len(_BROADCAST_CACHE) >= 8:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        _BROADCAST_CACHE[key] = hit
    return hit
