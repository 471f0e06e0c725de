"""Exact range-partitioned global ranking and NTILE semantics."""

import numpy as np
import pandas as pd


def test_ntile_matches_sql_semantics():
    from butteraugli_ray.functions.rank import ntile_of
    # N=10, k=4 → tile sizes 3,3,2,2 (first N%k tiles get the extra row)
    got = ntile_of(np.arange(1, 11), 10, 4)
    assert got.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # N < k → one row per tile, tiles N+1..k empty
    got = ntile_of(np.arange(1, 4), 3, 5)
    assert got.tolist() == [1, 2, 3]
    # exact division
    got = ntile_of(np.arange(1, 9), 8, 4)
    assert got.tolist() == [1, 1, 2, 2, 3, 3, 4, 4]


def test_range_partition_rank_exact_with_ties(ray_session):
    import ray.data as rd
    from butteraugli_ray.functions.rank import range_partition_rank
    rng = np.random.default_rng(7)
    # heavy ties: only 40 distinct values over 3000 rows
    df = pd.DataFrame({
        "event_id": np.arange(3000, dtype=np.int64),
        "value": rng.integers(0, 40, 3000).astype(np.float64)})
    ranked, n = range_partition_rank(rd.from_pandas(df), "value",
                                     "event_id", n_buckets=8)
    assert n == 3000
    got = (ranked.to_pandas().sort_values("event_id")
           .reset_index(drop=True))
    exp_rank = (df.sort_values(["value", "event_id"])
                .assign(rank=np.arange(1, 3001, dtype=np.int64))
                .sort_values("event_id").reset_index(drop=True))
    assert (got["rank"].to_numpy() == exp_rank["rank"].to_numpy()).all()
    # ranks are a permutation of 1..N (total order, no gaps/dups)
    assert sorted(got["rank"]) == list(range(1, 3001))


def test_range_partition_scan_exact_prefix_sum(ray_session):
    import ray.data as rd
    from butteraugli_ray.functions.rank import range_partition_scan
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "tok": rng.integers(1, 500, 2000).astype(np.int64)})
    scanned, total = range_partition_scan(rd.from_pandas(df), "doc_id",
                                          "tok", n_buckets=8)
    assert total == int(df["tok"].sum())
    got = (scanned.to_pandas().sort_values("doc_id")
           .reset_index(drop=True))
    exp = np.cumsum(df["tok"].to_numpy(dtype=np.int64))
    assert (got["running_sum"].to_numpy() == exp).all()


def test_pca_fit_matches_full_numpy(ray_session):
    import ray.data as rd
    from butteraugli_ray.functions.ann import pca_fit, pca_project
    rng = np.random.default_rng(17)
    # anisotropic cloud: known dominant directions
    base = rng.normal(size=(500, 8)) * np.array(
        [5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    df = pd.DataFrame({"vec_id": np.arange(500, dtype=np.int64),
                       "embedding": list(base.astype(np.float32))})
    mean, comps, evals, ratio = pca_fit(rd.from_pandas(df), k=3)
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    exp_mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:3]
    assert np.allclose(mean, exp_mean, atol=1e-9)
    assert np.allclose(evals, ev[order], rtol=1e-9)
    assert np.allclose(ratio, ev[order] / np.trace(cov), rtol=1e-9)
    # components span the same directions (sign-canonicalized)
    for i, j in enumerate(order):
        assert abs(abs(np.dot(comps[i], evec[:, j])) - 1.0) < 1e-9
    # projection: variance along pc0 equals the top eigenvalue
    proj = (pca_project(rd.from_pandas(df), mean, comps)
            .to_pandas())
    p = np.stack(proj["pc"].to_numpy())
    assert np.allclose(p.var(axis=0, ddof=1), evals, rtol=1e-9)


def test_kmeans_fit_matches_single_process_lloyd(ray_session):
    import ray.data as rd
    from butteraugli_ray.functions.ann import kmeans_fit
    rng = np.random.default_rng(23)
    true_c = rng.normal(size=(4, 12)) * 4.0
    x = np.concatenate([true_c[i % 4] + rng.normal(size=(1, 12)) * 0.2
                        for i in range(600)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(600, dtype=np.int64),
                       "embedding": list(x)})
    cent, inertia, iters, sizes = kmeans_fit(
        rd.from_pandas(df), k=4, max_iters=30)
    # single-process Lloyd with the SAME deterministic init
    xd = x.astype(np.float64)
    c = xd[:4].copy()
    exp_iters = 0
    for _ in range(30):
        exp_iters += 1
        d2 = (np.sum(xd * xd, 1)[:, None] - 2.0 * (xd @ c.T)
              + np.sum(c * c, 1)[None, :])
        a = np.argmin(d2, axis=1)
        exp_inertia = float(d2[np.arange(len(xd)), a].sum())
        exp_sizes = np.bincount(a, minlength=4)
        newc = np.stack([xd[a == i].mean(0) if (a == i).any() else c[i]
                         for i in range(4)])
        shift = float(np.max(np.linalg.norm(newc - c, axis=1)
                             / np.maximum(np.linalg.norm(c, axis=1),
                                          1e-12)))
        c = newc
        if shift < 1e-6:
            break
    assert iters == exp_iters
    assert np.allclose(cent, c, atol=1e-8)
    assert sizes.tolist() == exp_sizes.tolist()
    assert abs(inertia - exp_inertia) / exp_inertia < 1e-9
    # clusters recovered the generating centers
    d = np.linalg.norm(cent[:, None, :] - true_c[None, :, :], axis=2)
    assert (d.min(axis=0) < 0.5).all()


def test_kmeans_fit_rerun_bit_identical_and_assign_cent(ray_session):
    """Two fits over the same data are BIT-identical (sorted partial
    reduction — the property the dynamic kmeans_clusters oracle relies
    on), and sizes/inertia correspond to assignment against the
    returned PRE-UPDATE centroids."""
    import ray.data as rd
    from butteraugli_ray.functions.ann import kmeans_fit
    rng = np.random.default_rng(7)
    x = rng.normal(size=(500, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(500, dtype=np.int64),
                       "embedding": list(x)})
    r1 = kmeans_fit(rd.from_pandas(df), k=5, max_iters=12,
                    return_assign_cent=True)
    r2 = kmeans_fit(rd.from_pandas(df), k=5, max_iters=12,
                    return_assign_cent=True)
    cent, inertia, iters, sizes, acent = r1
    assert (cent == r2[0]).all() and (acent == r2[4]).all()
    assert inertia == r2[1] and iters == r2[2]
    assert sizes.tolist() == r2[3].tolist()
    # recompute assignment against acent: sizes/inertia must agree
    xd = x.astype(np.float64)
    d2 = (np.sum(xd * xd, 1)[:, None] - 2.0 * (xd @ acent.T)
          + np.sum(acent * acent, 1)[None, :])
    a = np.argmin(d2, axis=1)
    assert np.bincount(a, minlength=5).tolist() == sizes.tolist()
    exp_in = float(d2[np.arange(len(xd)), a].sum())
    assert abs(inertia - exp_in) / exp_in < 1e-9
    # and the POST-update centroids are the per-cluster means
    for i in range(5):
        if (a == i).any():
            assert np.allclose(cent[i], xd[a == i].mean(0), atol=1e-12)


def test_grouped_quantile_exact_matches_duckdb(ray_session):
    """Distributed histogram-refinement selection == DuckDB
    quantile_cont at several q, including a tiny collect_cap that
    forces multiple refinement rounds."""
    import duckdb
    import ray.data as rd
    from butteraugli_ray.functions.rank import grouped_quantile_exact
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "value"])
    con = duckdb.connect()
    for q, cap in ((0.5, 65536), (0.5, 64), (0.9, 64), (0.1, 256)):
        got = (grouped_quantile_exact(ds, "event_type", "value", q=q,
                                      collect_cap=cap, n_bins=32)
               .sort_values("event_type").reset_index(drop=True))
        want = con.execute(
            f"SELECT event_type, quantile_cont(value, {q}) AS q FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY 1 ORDER BY 1"
        ).df()
        assert got["event_type"].tolist() == want["event_type"].tolist()
        np.testing.assert_allclose(got["quantile"].to_numpy(),
                                   want["q"].to_numpy(), rtol=1e-12,
                                   err_msg=f"q={q} cap={cap}")


def test_grouped_quantile_exact_massive_ties(ray_session):
    """A group whose values are one massive tie must fall through to
    the tie-collapsed collect and still be exact."""
    import ray.data as rd
    from butteraugli_ray.functions.rank import grouped_quantile_exact
    rng = np.random.default_rng(3)
    vals = np.concatenate([np.full(5000, 7.0), rng.normal(size=5000)])
    df = pd.DataFrame({"k": ["t"] * 5000 + ["n"] * 5000, "v": vals})
    got = (grouped_quantile_exact(rd.from_pandas(df), "k", "v", q=0.5,
                                  collect_cap=128, n_bins=16)
           .set_index("k")["quantile"])
    assert got["t"] == 7.0
    assert got["n"] == np.quantile(vals[5000:], 0.5)


def test_pq_ann_recall(ray_session):
    """PQ asymmetric-distance top-k recalls >= 0.5 of the exact
    brute-force neighbors at k=10 (m=4 subspaces, 16 codes) and the
    distributed codebooks reproduce a single-process PQ encode."""
    from butteraugli_ray.pipelines.queries import q_ann_pq
    out = q_ann_pq("/root/testdata/sf0.001", k=10)
    assert set(out["query_id"]) == {0, 1, 2}
    assert (out.groupby("query_id").size() == 10).all()
    assert (out.groupby("query_id")["recall"].first() >= 0.5).all(), \
        out.groupby("query_id")["recall"].first()


def test_pagerank_matches_numpy(ray_session):
    """Distributed power iteration == dense numpy PageRank on a seeded
    random graph (same fixed iteration count and damping)."""
    import ray.data as rd
    from butteraugli_ray.functions.graph import pagerank
    rng = np.random.default_rng(7)
    n = 40
    src, dst = [], []
    for _ in range(200):
        a, b = rng.integers(0, n, 2)
        if a != b:
            src += [a, b]
            dst += [b, a]
    edges = pd.DataFrame({"src": np.array(src, np.int64),
                          "dst": np.array(dst, np.int64)})
    got = pagerank(rd.from_pandas(edges), n_iters=10, d=0.85)

    nodes = np.sort(np.unique(np.concatenate([src, dst])))
    pos = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    a = np.zeros((m, m))
    for s, t in zip(src, dst):
        a[pos[t], pos[s]] += 1.0
    deg = a.sum(axis=0)
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        r = (1 - 0.85) / m + 0.85 * (a @ (r / deg))
    assert got["node"].to_numpy().tolist() == nodes.tolist()
    np.testing.assert_allclose(got["rank"].to_numpy(), r, rtol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_triangle_count_matches_bruteforce(ray_session):
    """Distributed wedge+closure count == brute-force triple loop on a
    random oriented graph (plus planted cliques so the count is big)."""
    import itertools
    import ray.data as rd
    from butteraugli_ray.functions.graph import triangle_count
    rng = np.random.default_rng(11)
    n = 60
    edge_set = set()
    # random edges
    for _ in range(300):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edge_set.add((min(a, b), max(a, b)))
    # planted 5-clique on nodes 100..104 (disjoint ids)
    for a, b in itertools.combinations(range(100, 105), 2):
        edge_set.add((a, b))
    edges = pd.DataFrame(sorted(edge_set), columns=["id_a", "id_b"])
    exp = 0
    es = set(map(tuple, edges.to_numpy()))
    nodes = sorted({v for e in es for v in e})
    for x, y in es:
        for z in nodes:
            if z > y and (x, z) in es and (y, z) in es:
                exp += 1
    got = triangle_count(rd.from_pandas(edges), n_parts=8)
    assert got["n_triangles"] == exp
    assert exp >= 10                      # the clique alone gives C(5,3)=10
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(nodes)


def test_auc_exact_matches_bruteforce_with_ties(ray_session):
    """Distributed tie-averaged rank-sum AUC == the O(n²) pairwise
    definition (wins + half-ties) on data with heavy planted ties."""
    import ray.data as rd
    from butteraugli_ray.functions.rank import auc_exact
    rng = np.random.default_rng(7)
    n = 400
    # quantized scores force large tie blocks; labels correlate weakly
    score = np.round(rng.normal(size=n), 1)
    y = (score + rng.normal(scale=1.5, size=n) > 0).astype(np.int64)
    df = pd.DataFrame({"score": score, "y": y})
    got = auc_exact(rd.from_pandas(df).repartition(7), "score", "y",
                    n_buckets=5)
    pos, neg = score[y == 1], score[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    exp = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got["n_pos"] == int(y.sum())
    assert got["n_neg"] == int((1 - y).sum())
    assert abs(got["auc"] - exp) < 1e-12


def test_grouped_weighted_median_matches_bruteforce(ray_session):
    """Histogram-refinement weighted median == the O(n log n) local
    definition (smallest v with cumweight ≥ half) with heavy ties and a
    collect cap small enough to force refinement rounds."""
    import ray.data as rd
    from butteraugli_ray.functions.rank import grouped_weighted_median_exact
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=n),
        "v": np.round(rng.lognormal(3, 1, size=n), 2),
        "w": rng.integers(1, 9, size=n).astype(np.int64)})
    got = grouped_weighted_median_exact(
        rd.from_pandas(df).repartition(6), "k", "v", "w",
        collect_cap=64, n_bins=16)
    for k, sub in df.groupby("k"):
        sub = sub.sort_values("v")
        cum = sub["w"].cumsum()
        exp = float(sub.loc[cum >= 0.5 * sub["w"].sum(), "v"].iloc[0])
        assert float(got.loc[got["k"] == k, "wmedian"].iloc[0]) == exp


def test_kcore_peels_pendants_keeps_clique(ray_session):
    """2-core of (4-clique + pendant chain hanging off it) is exactly
    the clique; a pure tree has an empty 2-core."""
    import itertools
    import ray.data as rd
    from butteraugli_ray.functions.graph import kcore
    clique = list(itertools.combinations([10, 11, 12, 13], 2))
    chain = [(13, 20), (20, 21), (21, 22)]
    edges = pd.DataFrame(clique + chain, columns=["id_a", "id_b"])
    out, rounds = kcore(rd.from_pandas(edges).repartition(3), k=2)
    assert sorted(out["node"]) == [10, 11, 12, 13]
    assert (out["deg"] == 3).all()
    assert rounds >= 2                      # chain peels over ≥2 rounds
    tree = pd.DataFrame([(1, 2), (2, 3), (2, 4)], columns=["id_a", "id_b"])
    empty, _ = kcore(rd.from_pandas(tree), k=2)
    assert len(empty) == 0


def test_avg_rank_matches_pandas_average_rank(ray_session):
    """range_partition_avg_rank == pandas rank(method='average') —
    heavy planted ties straddling bucket boundaries exercise the
    equal-values-share-a-bucket invariant; the tie partials sum to
    the global Σ(t³−t)."""
    import ray.data as rd
    from butteraugli_ray.functions.rank import range_partition_avg_rank
    rng = np.random.default_rng(7)
    v = np.round(rng.normal(0, 1, 5000), 1)          # many ties
    df = pd.DataFrame({"rid": np.arange(5000), "v": v})
    ranked, n = range_partition_avg_rank(
        rd.from_pandas(df).repartition(8), "v", n_buckets=16)
    got = ranked.to_pandas().sort_values("rid").reset_index(drop=True)
    assert n == 5000
    exp = df["v"].rank(method="average").to_numpy()
    np.testing.assert_allclose(
        got.sort_values("rid")["avg_rank"].to_numpy(), exp)
    t = pd.Series(v).value_counts().to_numpy(np.float64)
    assert got["__tie_part"].sum() == (t ** 3 - t).sum()


def test_rank_reduce_one_shuffle_parity(ray_session):
    """range_partition_rank_reduce partials reduce to the same
    rank-sum a full avg-rank attach produces."""
    import ray.data as rd
    from butteraugli_ray.functions.rank import range_partition_rank_reduce
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": np.round(rng.uniform(0, 10, 3000), 1),
                       "flag": rng.integers(0, 2, 3000)})

    def red(d, ar, tie, n):
        m = d["flag"].to_numpy() == 1
        return pd.DataFrame({"r1": [float(ar[m].sum())],
                             "ties": [tie]})

    parts, n = range_partition_rank_reduce(
        rd.from_pandas(df).repartition(6), "v", red, n_buckets=8)
    assert n == 3000
    exp_rank = df["v"].rank(method="average").to_numpy()
    exp_r1 = float(exp_rank[df["flag"].to_numpy() == 1].sum())
    assert abs(parts["r1"].sum() - exp_r1) <= 1e-9 * abs(exp_r1)
    t = df["v"].value_counts().to_numpy(np.float64)
    assert parts["ties"].sum() == (t ** 3 - t).sum()
