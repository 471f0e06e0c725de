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


def triangle_count(edges_ds, a_col: str = "id_a", b_col: str = "id_b",
                   n_parts: int = 64) -> dict:
    """Distributed exact triangle count over an ORIENTED edge list
    (``a < b`` per row, no duplicates) — the canonical two-round
    wedge-check shape (node-iterator with id orientation):

      0. degree orientation — node degrees (bounded by the node count,
         the CC/pagerank bound) rank every node by ``(degree, id)``;
         edges re-orient from lower to higher RANK and nodes are
         replaced by their rank ints.  This caps every pivot's
         out-degree at O(√m) (the classic node-iterator bound), so the
         wedge term Σ deg⁺² survives skewed similarity graphs — a raw
         id orientation lets one hub node pay deg² alone.
      1. wedge generation — oriented edges shuffle ONCE by
         ``hash(pivot)``; each partition emits, per pivot, every
         out-neighbor pair ``(b, c), rank(b) < rank(c)`` in a single
         vectorized pass (``dedup.pairs_within_groups`` over rank ints
         — no per-pivot Python).  A triangle is generated exactly
         once, at its lowest-rank vertex.
      2. closure check — wedges and edges co-locate with ONE more
         shuffle on a shared ``(b, c)`` bucket key; each partition
         counts wedge rows whose ``(b, c)`` also appears as an edge
         (vectorized two-column merge) and emits a single int partial.

    Only wedges and edge keys ever move; the driver reduces B partial
    counts.  Returns ``{"n_nodes", "n_edges", "n_triangles"}``."""
    edges = edges_ds.materialize()

    mask = np.int64((1 << max(n_parts - 1, 1).bit_length()) - 1)
    n_edges = edges.count()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate([
            df[a_col].to_numpy(dtype=np.int64),
            df[b_col].to_numpy(dtype=np.int64)]))
        return pd.DataFrame({"node": u})

    # distinct endpoints: per-block unique partials, driver union —
    # bounded by the graph's node count (the CC/pagerank bound)
    nodes = np.unique(edges.map_batches(
        node_partial, batch_format="pandas").to_pandas()["node"].to_numpy())

    # degrees on the same node-bounded table → (degree, id) ranks
    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        ends = np.concatenate([df[a_col].to_numpy(np.int64),
                               df[b_col].to_numpy(np.int64)])
        u, c = np.unique(ends, return_counts=True)
        return pd.DataFrame({"node": u, "d": c.astype(np.int64)})

    dp = (edges.map_batches(deg_part, batch_format="pandas")
          .to_pandas().groupby("node", as_index=False)["d"].sum())
    deg = np.zeros(len(nodes), dtype=np.int64)
    deg[np.searchsorted(nodes, dp["node"].to_numpy(np.int64))] = \
        dp["d"].to_numpy(np.int64)
    rank_of = np.empty(len(nodes), dtype=np.int64)
    rank_of[np.lexsort((nodes, deg))] = np.arange(len(nodes),
                                                  dtype=np.int64)
    import ray
    lut_ref = ray.put((nodes, rank_of))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        from .pool import broadcast_get
        nv, rk = broadcast_get(lut_ref)
        ra = rk[np.searchsorted(nv, df[a_col].to_numpy(np.int64))]
        rb = rk[np.searchsorted(nv, df[b_col].to_numpy(np.int64))]
        return pd.DataFrame({a_col: np.minimum(ra, rb),
                             b_col: np.maximum(ra, rb)})

    edges = edges.map_batches(orient,
                              batch_format="pandas").materialize()

    def tag_pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[a_col, b_col]].copy()
        df["__part"] = df[a_col].to_numpy(dtype=np.int64) & mask
        return df

    def emit_wedges(g: pd.DataFrame) -> pd.DataFrame:
        from .dedup import pairs_within_groups
        # multiset: each pivot's (b, c) wedge is distinct — do NOT
        # dedup across pivots or closures undercount
        w = pairs_within_groups(g, a_col, id_col=b_col, unique=False)
        if not len(w):
            return pd.DataFrame({"b": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64"),
                                 "side": pd.Series([], dtype="int64")})
        return pd.DataFrame({"b": w["id_a"], "c": w["id_b"],
                             "side": np.zeros(len(w), dtype=np.int64)})

    wedges = (edges.map_batches(tag_pivot, batch_format="pandas")
              .groupby("__part")
              .map_groups(emit_wedges, batch_format="pandas"))

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": df[a_col].astype("int64"),
                             "c": df[b_col].astype("int64"),
                             "side": np.ones(len(df), dtype=np.int64)})

    def tag_bc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__p2"] = ((df["b"].to_numpy(dtype=np.int64) * np.int64(31)
                       + df["c"].to_numpy(dtype=np.int64)) & mask)
        return df

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 1][["b", "c"]]
        w = g[g["side"] == 0][["b", "c"]]
        n = int(len(w.merge(e, on=["b", "c"])))
        return pd.DataFrame({"n": [n]})

    both = (wedges.union(edges.map_batches(edge_rows,
                                           batch_format="pandas"))
            .map_batches(tag_bc, batch_format="pandas"))
    parts = (both.groupby("__p2")
             .map_groups(close_count, batch_format="pandas").to_pandas())
    return {"n_nodes": int(len(nodes)), "n_edges": int(n_edges),
            "n_triangles": int(parts["n"].sum())}


def kcore(edges_ds, k: int = 2, a_col: str = "id_a", b_col: str = "id_b",
          max_rounds: int = 200):
    """k-core decomposition by iterative peeling over undirected
    (a, b) edges: repeatedly drop nodes with degree < k inside the
    surviving subgraph until a fixpoint; returns
    ``(DataFrame[node, deg], rounds)`` where ``deg`` is the node's
    degree WITHIN the k-core.

    Distributed shape: the edge set streams once per round (degree
    partials are vectorized np.unique counts, combined on the driver);
    the alive-node set broadcasts via ``ray.put`` — bounded by the
    similarity graph's node population, the same driver bound
    ``pagerank`` and the CC candidate set accept.  Peeling is monotone
    (alive set only shrinks), so the loop terminates in ≤ rounds-of-
    peeling passes; beyond ~10⁸ nodes shard the alive set by node-hash
    bucket and turn the membership test into a bucketed semi-join,
    leaving the loop unchanged."""
    import ray as _ray

    edges = edges_ds.materialize()

    def all_nodes(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate([
            df[a_col].to_numpy(np.int64), df[b_col].to_numpy(np.int64)]))
        return pd.DataFrame({"node": u})

    nodes = edges.map_batches(all_nodes, batch_format="pandas").to_pandas()
    alive = np.unique(nodes["node"].to_numpy(np.int64))
    empty = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                          "deg": pd.Series([], dtype="int64")})
    rounds = 0
    while rounds < max_rounds:
        aref = _ray.put(alive)

        def deg_alive(df: pd.DataFrame, _ref=aref) -> pd.DataFrame:
            al = _ray.get(_ref)
            a = df[a_col].to_numpy(np.int64)
            b = df[b_col].to_numpy(np.int64)
            m = np.isin(a, al) & np.isin(b, al)
            both = np.concatenate([a[m], b[m]])
            if not len(both):
                return pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"),
                     "deg": pd.Series([], dtype="int64")})
            u, c = np.unique(both, return_counts=True)
            return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

        parts = edges.map_batches(deg_alive,
                                  batch_format="pandas").to_pandas()
        rounds += 1
        if not len(parts):
            return empty, rounds
        degs = parts.groupby("node")["deg"].sum()
        keep = degs[degs >= k]
        new_alive = np.sort(keep.index.to_numpy(np.int64))
        if len(new_alive) == len(alive):
            out = pd.DataFrame({
                "node": new_alive,
                "deg": keep.reindex(new_alive).to_numpy(np.int64)})
            return out, rounds
        alive = new_alive
        if not len(alive):
            return empty, rounds
    raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")


def bfs_levels(edges_ds, seeds: np.ndarray,
               a_col: str = "id_a", b_col: str = "id_b",
               max_rounds: int = 64):
    """Multi-source BFS over undirected (a, b) edges: every node
    reachable from any seed gets ``level`` = hop distance to its
    NEAREST seed (seeds are level 0) — the distance-to-labeled-node
    operator behind label spreading / influence radius analyses.
    Returns ``(DataFrame[node, level], rounds)``.

    Distributed shape: one streaming edge pass per frontier round; the
    frontier and visited sets broadcast via ``ray.put`` — bounded by
    the graph's node population, the same driver bound ``kcore`` /
    ``pagerank`` accept (shard by node-hash bucket past ~10⁸ nodes).
    BFS frontiers are monotone (visited only grows), so the loop ends
    in ≤ eccentricity rounds."""
    import ray as _ray

    edges = edges_ds.materialize()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    nodes = [seeds]
    levels = [np.zeros(len(seeds), dtype=np.int64)]
    frontier = seeds
    visited = seeds
    rounds = 0
    while frontier.size and rounds < max_rounds:
        fref = _ray.put(frontier)
        vref = _ray.put(visited)

        def expand(df: pd.DataFrame, _f=fref, _v=vref) -> pd.DataFrame:
            f = _ray.get(_f)
            v = _ray.get(_v)
            a = df[a_col].to_numpy(np.int64)
            b = df[b_col].to_numpy(np.int64)
            nxt = np.concatenate([b[np.isin(a, f)], a[np.isin(b, f)]])
            nxt = np.unique(nxt)
            return pd.DataFrame({"node": nxt[~np.isin(nxt, v)]})

        parts = edges.map_batches(expand, batch_format="pandas").to_pandas()
        rounds += 1
        new = (np.unique(parts["node"].to_numpy(np.int64))
               if len(parts) else np.array([], dtype=np.int64))
        if not new.size:
            break
        nodes.append(new)
        levels.append(np.full(len(new), rounds, dtype=np.int64))
        visited = np.union1d(visited, new)
        frontier = new
    out = pd.DataFrame({"node": np.concatenate(nodes),
                        "level": np.concatenate(levels)})
    return out.sort_values("node").reset_index(drop=True), rounds
