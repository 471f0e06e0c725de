"""Distributed PageRank over an edge Dataset (power iteration).

Each iteration is ONE streaming ``map_batches`` pass over the edges:
the rank/out-degree vector broadcasts via ``ray.put`` (bounded by the
GRAPH's node count — for the dup-similarity graphs this engine builds,
that's the candidate-pair population, the same driver bound the
connected-components candidate set already accepts), every batch emits
per-destination contribution partials combined per batch (vectorized
pandas groupby), and the driver reduces the tiny partials.  At a node
count too large to broadcast, the same loop runs with the rank vector
sharded by node-hash bucket and a per-iteration bucketed join — the
shape is documented here and in SCALE.md; the broadcast variant is the
right call below ~10^8 nodes (8 B/node).

Reference analog: the reference has no graph ops; this extends the
engine's iterative-algorithm family (Lloyd k-means, IRLS, CC label
propagation) with the canonical power-iteration shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank(edges_ds, n_iters: int = 10, d: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> pd.DataFrame:
    """Fixed-iteration PageRank over directed (src, dst) edges (pass
    both directions for an undirected graph).  Nodes = every endpoint;
    with undirected input every node has out-degree ≥ 1, so no
    dangling-mass term.  Returns (node, rank) with Σrank = 1.

    Deterministic: fixed iteration count, partials reduced on the
    driver in block order, node axis sorted."""
    import ray as _ray

    edges = edges_ds.materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(src_col, as_index=False).agg(deg=(dst_col, "size"))
        dsts = pd.DataFrame({src_col: df[dst_col].unique(), "deg": 0})
        return pd.concat([out, dsts], ignore_index=True)

    parts = edges.map_batches(deg_partial, batch_format="pandas").to_pandas()
    deg = parts.groupby(src_col)["deg"].sum()
    nodes = np.sort(deg.index.to_numpy(dtype=np.int64))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    degv = deg.reindex(nodes).to_numpy(dtype=np.float64)
    pos = pd.Series(np.arange(n, dtype=np.int64), index=nodes)
    rank = np.full(n, 1.0 / n)

    for _ in range(n_iters):
        w = np.divide(rank, degv, out=np.zeros_like(rank), where=degv > 0)
        wref = _ray.put(dict(zip(nodes.tolist(), w.tolist())))

        def contrib(df: pd.DataFrame, _ref=wref) -> pd.DataFrame:
            wm = _ray.get(_ref)
            c = df[src_col].map(wm).to_numpy(dtype=np.float64)
            g = pd.DataFrame({"node": df[dst_col], "c": c})
            return g.groupby("node", as_index=False)["c"].sum()

        agg = (edges.map_batches(contrib, batch_format="pandas")
               .to_pandas().groupby("node")["c"].sum())
        new = np.full(n, (1.0 - d) / n)
        idx = pos.reindex(agg.index.to_numpy(dtype=np.int64)).to_numpy(
            dtype=np.int64)
        new[idx] += d * agg.to_numpy(dtype=np.float64)
        rank = new
    return pd.DataFrame({"node": nodes, "rank": rank})
