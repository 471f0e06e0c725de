"""Actor-pool sizing shared by every stateful map_batches stage.

A FIXED pool of ``n`` actors reserves ``n`` CPUs for the stage's whole
lifetime.  When ``n`` >= the cluster's CPUs the pool starves every
downstream task — measured: the MinHash verify pipeline deadlocks
outright under ``ray.init(num_cpus=4)`` with a fixed 4-actor bander
pool, because the groupby shuffle behind it can never get a CPU while
the actors hold them all.  An AUTOSCALING ``(1, n)`` pool starts at one
actor and grows only while CPUs are actually free, so a stage can never
wedge the pipeline regardless of cluster size — and still reaches the
same ``n``-actor parallelism on a big cluster.
"""


def actor_pool(n):
    """Normalize a requested actor count into an autoscaling
    ``(min=1, max=n)`` pool spec for ``map_batches(Cls, concurrency=…)``.
    Tuples pass through untouched so callers can still pin a floor."""
    if isinstance(n, tuple):
        return n
    return (1, max(1, int(n or 4)))
