"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (``ray.put`` once, read per actor), partial top-k
per batch, final merge on the driver.  Only (query_id, vec_id, sim)
triples move; never the embeddings.

Scale path: IVF — k-means-lite centroids from a sample, assign each
vector to its centroid inside ``map_batches``, search only the nprobe
closest centroid partitions per query.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd



def _safe_concurrency(requested):
    """Pool spec capped to leave >=2 cluster CPUs free — a fixed pool
    >= num_cpus starves its own producer/consumer stages in local mode
    (see functions/pool.py)."""
    from .pool import actor_pool
    return actor_pool(requested or 4)

def _normalize(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """map_batches stage: batch embeddings × broadcast queries → per-batch
    partial top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(q)            # [nq, d]
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(np.stack(df[self.emb_col].to_numpy()))
        sims = emb @ self.q.T             # [n, nq]
        ids = df[self.id_col].to_numpy()
        k = min(self.k, len(df))
        out = {"query_id": [], "vec_id": [], "sim": []}
        # per-query partial top-k within this batch
        top = np.argpartition(-sims, k - 1, axis=0)[:k]   # [k, nq]
        for qi in range(self.q.shape[0]):
            rows = top[:, qi]
            out["query_id"].extend([qi] * k)
            out["vec_id"].extend(ids[rows].tolist())
            out["sim"].extend(sims[rows, qi].tolist())
        return pd.DataFrame(out)


def knn_cosine(ds, queries: np.ndarray, k: int, id_col: str = "vec_id",
               emb_col: str = "embedding", concurrency: int = None) -> pd.DataFrame:
    """Exact cosine top-k; returns (query_id, vec_id, sim, rank) sorted.

    Deterministic tie-break: higher sim first, then lower vec_id.
    """
    import ray
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs=dict(queries_ref=qref, k=k,
                                                   id_col=id_col, emb_col=emb_col),
        batch_format="pandas", concurrency=_safe_concurrency(concurrency))
    pdf = partials.to_pandas()
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "vec_id", "sim", "rank"])


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100 TB scale path
# ---------------------------------------------------------------------------

def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 10,
                seed: int = 3) -> np.ndarray:
    """Small k-means on a driver-side sample → centroid matrix."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IVFAssigner:
    def __init__(self, centroids_ref, emb_col: str = "embedding"):
        import ray
        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.cent = c
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(np.stack(df[self.emb_col].to_numpy()))
        out = df.copy()
        out["centroid"] = np.argmax(emb @ self.cent.T, axis=1).astype(np.int32)
        return out


def knn_cosine_ivf(ds, queries: np.ndarray, k: int, n_clusters: int = 16,
                   nprobe: int = 4, sample_size: int = 2048,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   concurrency: int = None, seed: int = 3,
                   sample: np.ndarray = None) -> pd.DataFrame:
    """IVF ANN: probe only the nprobe nearest centroid partitions.

    Approximate — recall governed by nprobe/n_clusters; partitioning
    assumption: vectors co-located by centroid assignment (the
    ``groupby(centroid)`` shuffle).  Pass ``sample`` (an [n, d] matrix)
    for deterministic centroids — ``ds.limit`` depends on block
    completion order under the streaming executor.
    """
    import ray
    if sample is None:
        sample_rows = ds.limit(sample_size).to_pandas()
        sample = np.stack(sample_rows[emb_col].to_numpy())
    cent = kmeans_lite(sample, n_clusters, seed=seed)
    cref = ray.put(cent)
    assigned = ds.map_batches(IVFAssigner, fn_constructor_kwargs=dict(
        centroids_ref=cref, emb_col=emb_col), batch_format="pandas",
        concurrency=_safe_concurrency(concurrency))

    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]    # [nq, nprobe]
    probe_set = {}
    for qi in range(len(q)):
        for c in probes[qi]:
            probe_set.setdefault(int(c), []).append(qi)
    pref = ray.put((q, probe_set))

    def search_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qm, pset = ray.get(pref)
        c = int(g["centroid"].iloc[0])
        qids = pset.get(c, [])
        if not qids:
            return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
        emb = _normalize(np.stack(g[emb_col].to_numpy()))
        ids = g[id_col].to_numpy()
        sims = emb @ qm[qids].T
        kk = min(k, len(g))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        out = {"query_id": [], "vec_id": [], "sim": []}
        for j, qi in enumerate(qids):
            rows = top[:, j]
            out["query_id"].extend([qi] * kk)
            out["vec_id"].extend(ids[rows].tolist())
            out["sim"].extend(sims[rows, j].tolist())
        return pd.DataFrame(out)

    pdf = assigned.groupby("centroid").map_groups(search_bucket,
                                                  batch_format="pandas").to_pandas()
    out = []
    for qi, g in pdf.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "vec_id", "sim", "rank"])


# ---------------------------------------------------------------------------
# Distributed PCA over an embedding column
# ---------------------------------------------------------------------------

def pca_fit(ds, emb_col: str = "embedding", k: int = 4):
    """Distributed PCA: one pass of per-batch second-moment partials —
    (n, Σx, XᵀX), each a d² float64 block independent of batch size —
    summed on the driver (associative; a tree reduce at cluster scale),
    then a d×d eigendecomposition that costs O(d³) ONCE regardless of
    row count.  Returns (mean [d], components [k,d], explained_var [k],
    explained_var_ratio [k]) with components sign-canonicalized
    (largest-|coord| positive) so results are deterministic.

    The embeddings themselves never move: only d²-sized partials
    shuffle, the 100 TB-safe shape for covariance-family reductions."""
    import pickle

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        payload = pickle.dumps(
            (len(x), x.sum(axis=0), x.T @ x), protocol=4)
        return pd.DataFrame({"part": [payload]})

    n_total = 0
    s = None
    xtx = None
    for b in (ds.map_batches(partial, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=1024)):
        for raw in b["part"]:
            n_i, s_i, xtx_i = pickle.loads(raw)
            n_total += n_i
            s = s_i if s is None else s + s_i
            xtx = xtx_i if xtx is None else xtx + xtx_i
    if n_total < 2:
        raise ValueError("PCA needs at least 2 rows")
    mean = s / n_total
    cov = (xtx - n_total * np.outer(mean, mean)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T
    # canonical sign: the largest-|coordinate| entry of each component
    # is positive (eigh sign is otherwise arbitrary)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov))
    ratio = evals / total_var if total_var > 0 else np.zeros_like(evals)
    return mean, comps, evals, ratio


def pca_project(ds, mean: np.ndarray, components: np.ndarray,
                emb_col: str = "embedding", out_col: str = "pc"):
    """Project every embedding onto the fitted components inside
    map_batches (mean/components ship once via ray.put, read per
    task) → Dataset with ``out_col`` list<double> of length k."""
    import ray as _ray
    ref = _ray.put((np.asarray(mean, dtype=np.float64),
                    np.asarray(components, dtype=np.float64)))

    def project(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        m, c = _ray.get(_ref)
        x = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        proj = (x - m) @ c.T
        out = df.drop(columns=[emb_col]).copy()
        out[out_col] = list(proj)
        return out

    return ds.map_batches(project, batch_format="pandas")


# ---------------------------------------------------------------------------
# Distributed k-means (full Lloyd iterations)
# ---------------------------------------------------------------------------

def kmeans_fit(ds, k: int = 8, emb_col: str = "embedding",
               id_col: str = "vec_id", max_iters: int = 20,
               tol: float = 1e-6, return_assign_cent: bool = False):
    """Full distributed Lloyd k-means over an embedding column.

    Each iteration is ONE streaming pass: centroids broadcast via
    ray.put, every batch computes its partial (per-cluster count,
    per-cluster vector sum [k,d], inertia) — so only k·d-sized partials
    ever leave a worker, never the vectors.  The driver reduces
    partials (associative; tree-reduce at cluster scale), recomputes
    centroids, and stops when the max relative centroid shift < tol.
    Initialization is DETERMINISTIC: the k vectors with the smallest
    ``id_col`` values (a pushdown-friendly sorted-limit read), so runs
    are reproducible regardless of block arrival order.

    Returns (centroids [k,d], inertia, n_iters, sizes [k]); with
    ``return_assign_cent=True`` appends the centroids the FINAL
    assignment used (pre-update — ``sizes``/``inertia`` are computed
    against these, which is what an external assignment check needs)."""
    import pickle

    import ray as _ray

    ds = ds.materialize()          # Lloyd takes max_iters passes; scan once
    init_rows = (ds.sort(id_col).limit(k).to_pandas())
    cent = np.stack(init_rows[emb_col].to_numpy()).astype(np.float64)
    if len(cent) < k:
        raise ValueError(f"need >= {k} rows to initialize k-means")

    inertia = np.inf
    sizes = np.zeros(k, dtype=np.int64)
    for it in range(1, max_iters + 1):
        cref = _ray.put(cent)

        def partial(df: pd.DataFrame, _ref=cref) -> pd.DataFrame:
            c = _ray.get(_ref)
            x = np.stack(df[emb_col].to_numpy()).astype(np.float64)
            # ||x-c||² = ||x||² - 2 x·c + ||c||²  (vectorized assign)
            d2 = (np.sum(x * x, axis=1)[:, None]
                  - 2.0 * (x @ c.T) + np.sum(c * c, axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            vsum = np.zeros_like(c)
            np.add.at(vsum, a, x)
            iner = float(d2[np.arange(len(x)), a].sum())
            return pd.DataFrame({"part": [pickle.dumps(
                (cnt, vsum, iner), protocol=4)]})

        cnt = np.zeros(k, dtype=np.int64)
        vsum = np.zeros_like(cent)
        new_inertia = 0.0
        raws = []
        for b in (ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=1024)):
            raws.extend(b["part"])
        # float partial sums are not associative: reduce in a SORTED
        # (content-deterministic) order so repeated runs over the same
        # blocks are BIT-IDENTICAL regardless of block arrival order
        # (the kmeans dynamic oracle re-runs the fit and embeds the
        # centroids — run-to-run ulp drift would poison it)
        for raw in sorted(raws):
            c_i, v_i, in_i = pickle.loads(raw)
            cnt += c_i
            vsum += v_i
            new_inertia += in_i
        nonempty = cnt > 0
        new_cent = cent.copy()                   # empty cluster keeps pos
        new_cent[nonempty] = vsum[nonempty] / cnt[nonempty, None]
        denom = np.maximum(np.linalg.norm(cent, axis=1), 1e-12)
        shift = float(np.max(np.linalg.norm(new_cent - cent, axis=1)
                             / denom))
        assign_cent = cent                       # what the assignment used
        cent, inertia, sizes = new_cent, new_inertia, cnt
        if shift < tol:
            break
    if return_assign_cent:
        return cent, inertia, it, sizes, assign_cent
    return cent, inertia, it, sizes


def logreg_fit(ds, x_col: str = "x", y_col: str = "y",
               n_iters: int = 6, l2: float = 1e-3):
    """Distributed logistic regression via IRLS (Newton): each
    iteration is ONE streaming pass where every batch emits only
    (XᵀSX [d²], Xᵀ(y−p) [d]) partials — the covariance-family shape
    pca_fit uses, independent of row count — and the driver solves the
    d×d system.  Deterministic (no sampling, fixed iteration count,
    associative float partials reduced in driver order).

    ``x_col`` holds list<float> feature vectors (bias appended here),
    ``y_col`` a 0/1 label.  Returns (w [d+1], n_rows).  At 100 TB you
    would subsample the training pass (hash_frac) — scoring stays
    full-corpus either way."""
    import pickle

    import ray as _ray

    ds = ds.materialize()                    # IRLS takes n_iters passes
    first = ds.take(1)[0]
    d = len(first[x_col]) + 1
    w = np.zeros(d, dtype=np.float64)
    n_rows = 0
    for it in range(n_iters):
        wref = _ray.put(w)

        def partial(df: pd.DataFrame, _ref=wref) -> pd.DataFrame:
            ww = _ray.get(_ref)
            x = np.stack(df[x_col].to_numpy()).astype(np.float64)
            x = np.hstack([x, np.ones((len(x), 1))])
            y = df[y_col].to_numpy(dtype=np.float64)
            z = x @ ww
            p = 1.0 / (1.0 + np.exp(-z))
            s = np.maximum(p * (1.0 - p), 1e-6)
            return pd.DataFrame({"part": [pickle.dumps(
                (x.T @ (x * s[:, None]), x.T @ (y - p), len(x)),
                protocol=4)]})

        h = np.zeros((d, d))
        g = np.zeros(d)
        n_rows = 0
        for b in (ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=1024)):
            for raw in b["part"]:
                h_i, g_i, n_i = pickle.loads(raw)
                h += h_i
                g += g_i
                n_rows += n_i
        # True L2-regularized Newton step: the gradient carries the
        # matching -l2*w term (bias excluded), not just the Hessian
        # ridge — otherwise this is damped Newton, not the stated
        # penalized-IRLS objective.
        reg = np.eye(d)
        reg[-1, -1] = 0.0                    # don't penalize the bias
        w = w + np.linalg.solve(h + l2 * reg, g - l2 * (reg @ w))
    return w, n_rows


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bounded ANN scale path
# ---------------------------------------------------------------------------

def pq_train(ds, m: int = 4, k_codes: int = 16,
             emb_col: str = "embedding", id_col: str = "vec_id",
             max_iters: int = 10, tol: float = 1e-6):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the d dims split into
    ``m`` equal subspaces, ALL clustered together — each Lloyd
    iteration is ONE streaming pass whose batches emit the stacked
    per-subspace sufficient statistics ([m, kc] counts + [m, kc, sub]
    vector sums), so the pass count is iters, not m × iters, and
    vectors never leave workers.  Vectors are L2-normalized first so
    the asymmetric L2 distance ranks like cosine.  Init is
    deterministic (k_codes smallest ``id_col`` rows, kmeans_fit rule).

    Returns codebooks [m, k_codes, sub] float64.  At 100 TB the train
    pass runs on a hash-sampled slice; encode/search stay full-corpus
    (codes are 1 byte per subspace per vector)."""
    import pickle

    import ray as _ray

    ds = ds.materialize()
    init_rows = ds.sort(id_col).limit(k_codes).to_pandas()
    if len(init_rows) < k_codes:
        raise ValueError(f"need >= {k_codes} rows to initialize PQ")
    x0 = _normalize(np.stack(init_rows[emb_col].to_numpy()))
    d = x0.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = np.ascontiguousarray(
        x0.reshape(k_codes, m, sub).transpose(1, 0, 2)).astype(np.float64)

    for _ in range(max_iters):
        bref = _ray.put(books)

        def partial(df: pd.DataFrame, _ref=bref) -> pd.DataFrame:
            b = _ray.get(_ref)                       # [m, kc, sub]
            x = _normalize(np.stack(df[emb_col].to_numpy()))
            xs = x.reshape(len(x), m, sub)
            d2 = (np.einsum("nsk,nsk->ns", xs, xs)[:, :, None]
                  - 2.0 * np.einsum("nsk,sck->nsc", xs, b)
                  + np.einsum("sck,sck->sc", b, b)[None])
            codes = np.argmin(d2, axis=2)            # [n, m]
            cnt = np.zeros((m, b.shape[1]), dtype=np.int64)
            vsum = np.zeros_like(b)
            for s in range(m):                       # m is tiny (4-16)
                np.add.at(cnt[s], codes[:, s], 1)
                np.add.at(vsum[s], codes[:, s], xs[:, s, :])
            return pd.DataFrame({"part": [pickle.dumps((cnt, vsum),
                                                       protocol=4)]})

        cnt = np.zeros((m, k_codes), dtype=np.int64)
        vsum = np.zeros_like(books)
        raws = []
        for blk in (ds.map_batches(partial, batch_format="pandas")
                    .iter_batches(batch_format="pandas", batch_size=1024)):
            raws.extend(blk["part"])
        # sorted (content-deterministic) reduce order — float sums are
        # not associative and the ann_pq dynamic oracle re-runs this
        # fit and embeds the codebooks, so repeated runs over the same
        # blocks must be BIT-IDENTICAL (the kmeans_fit rule)
        for raw in sorted(raws):
            c_i, v_i = pickle.loads(raw)
            cnt += c_i
            vsum += v_i
        new_books = books.copy()                     # empty code keeps pos
        nz = cnt > 0
        new_books[nz] = vsum[nz] / cnt[nz][:, None]
        shift = float(np.max(np.linalg.norm(new_books - books, axis=2)
                             / np.maximum(np.linalg.norm(books, axis=2),
                                          1e-12)))
        books = new_books
        if shift < tol:
            break
    return books


class PQScorer:
    """map_batches stage: encode each batch against the broadcast
    codebooks and score the broadcast queries via the asymmetric
    distance LUT — one [m, k_codes] table per query, then a gather-sum
    over the per-row codes.  Emits per-batch partial top-k rows."""

    def __init__(self, books_ref, queries_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        import ray
        self.books = ray.get(books_ref)            # [m, kc, sub]
        q = _normalize(ray.get(queries_ref))       # [nq, d]
        m, kc, sub = self.books.shape
        # LUT[q, s, c] = ||q_s - books[s, c]||²
        qs = q.reshape(len(q), m, sub)
        diff = qs[:, :, None, :] - self.books[None, :, :, :]
        self.lut = np.einsum("qsck,qsck->qsc", diff, diff)  # [nq, m, kc]
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        x = _normalize(np.stack(df[self.emb_col].to_numpy()))
        m, kc, sub = self.books.shape
        xs = x.reshape(len(x), m, sub)
        # encode: nearest sub-centroid per subspace (vectorized)
        d2 = (np.einsum("nsk,nsk->ns", xs, xs)[:, :, None]
              - 2.0 * np.einsum("nsk,sck->nsc", xs, self.books)
              + np.einsum("sck,sck->sc", self.books, self.books)[None])
        codes = np.argmin(d2, axis=2)              # [n, m]
        # ADC: adist[n, q] = Σ_s LUT[q, s, codes[n, s]]
        adist = self.lut[:, np.arange(m)[None, :], codes].sum(axis=2).T
        ids = df[self.id_col].to_numpy()
        k = min(self.k, len(df))
        top = np.argpartition(adist, k - 1, axis=0)[:k]    # [k, nq]
        out = {"query_id": [], "vec_id": [], "adist": []}
        for qi in range(adist.shape[1]):
            rows = top[:, qi]
            out["query_id"].extend([qi] * k)
            out["vec_id"].extend(ids[rows].tolist())
            out["adist"].extend(adist[rows, qi].tolist())
        return pd.DataFrame({"query_id": np.array(out["query_id"], np.int64),
                             "vec_id": np.array(out["vec_id"], np.int64),
                             "adist": np.array(out["adist"], np.float64)})


def knn_pq(ds, queries: np.ndarray, k: int, books: np.ndarray,
           id_col: str = "vec_id", emb_col: str = "embedding",
           concurrency: int = 4) -> pd.DataFrame:
    """PQ asymmetric-distance top-k: codebooks + queries broadcast once
    (ray.put), per-batch encode + LUT gather-sum partials, driver-side
    final k-merge — only (query, id, adist) triples ever move."""
    import ray as _ray
    bref, qref = _ray.put(books), _ray.put(np.asarray(queries, np.float64))
    parts = ds.map_batches(
        PQScorer, fn_constructor_kwargs=dict(
            books_ref=bref, queries_ref=qref, k=k,
            id_col=id_col, emb_col=emb_col),
        batch_format="pandas", concurrency=_safe_concurrency(concurrency),
    ).to_pandas()
    out = (parts.sort_values(["query_id", "adist", "vec_id"])
           .groupby("query_id", group_keys=False).head(k)
           .reset_index(drop=True))
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out
