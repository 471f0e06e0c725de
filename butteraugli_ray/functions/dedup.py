"""Deduplication operators over a Ray Dataset of documents.

Each flavor is expressed Ray-Data-first (SURVEY.md §2.8 + the
training-data additions):

- exact:      content-hash column (vectorized) → groupby(hash) → keep
              first / emit duplicate groups.  Hash-partition shuffle on
              the 2-column projection only.
- MinHash+LSH: shingle → minhash signature per batch → explode to
              (band, band_hash, doc_id) rows → groupby band bucket →
              candidate pairs → exact-Jaccard verify.  Shuffles only
              signature rows, never text.
- SimHash:    64-bit weighted token hash; near-dup = small Hamming
              distance, bucketed by 16-bit chunks (pigeonhole: d≤3 ⇒
              one of 4 chunks equal).
- embedding:  cosine near-dup within LSH (random hyperplane) buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import WS_TOKEN_RE, fingerprint_md5


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["content_hash"] = fingerprint_md5(df[text_col])
    return df


def exact_dup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset(content_hash, n_dups, keep_id, dup_ids) for groups with >1 doc."""
    hashed = ds.map_batches(lambda df: add_content_hash(df, text_col)[[id_col, "content_hash"]],
                            batch_format="pandas")

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows <= 1:
            return pa.table({"content_hash": pa.array([], pa.string()),
                             "n_dups": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "dup_ids": pa.array([], pa.list_(pa.int64()))})
        ids = sorted(g[id_col].to_pylist())
        return pa.table({"content_hash": pa.array([g["content_hash"][0].as_py()]),
                         "n_dups": pa.array([g.num_rows], pa.int64()),
                         "keep_id": pa.array([ids[0]], pa.int64()),
                         "dup_ids": pa.array([ids[1:]], pa.list_(pa.int64()))})

    return hashed.groupby("content_hash").map_groups(per_group, batch_format="pyarrow")


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct content hash (first-wins)."""
    hashed = ds.map_batches(lambda df: add_content_hash(df, text_col),
                            batch_format="pandas")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """num_perms universal-hash minhash over word shingles; stateful
    (permutation table built once per actor)."""

    def __init__(self, num_perms: int = 128, shingle: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perms, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perms, dtype=np.uint64)
        self.num_perms = num_perms
        self.shingle = shingle

    def shingles(self, text: str) -> np.ndarray:
        toks = WS_TOKEN_RE.findall(text.lower())
        k = self.shingle
        if len(toks) < k:
            items = [" ".join(toks)] if toks else []
        else:
            items = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if not items:
            return np.zeros(0, dtype=np.uint64)
        from .sketches import hash64
        return np.unique(hash64(items))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perms, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*x + b) mod p over the 61-bit Mersenne prime
            prod = (self.a[None, :] * (sh[:, None] & _MERSENNE) + self.b[None, :])
            h = (prod & _MERSENNE) + (prod >> np.uint64(61))
            h = np.where(h >= _MERSENNE, h - _MERSENNE, h)
        return h.min(axis=0)

    def jaccard(self, a: str, b: str) -> float:
        sa, sb = set(self.shingles(a).tolist()), set(self.shingles(b).tolist())
        if not sa and not sb:
            return 1.0
        if not sa or not sb:
            return 0.0
        return len(sa & sb) / len(sa | sb)


class MinHashBander:
    """map_batches actor: text → exploded (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perms: int = 128, bands: int = 16,
                 shingle: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perms % bands == 0
        self.mh = MinHasher(num_perms, shingle, seed)
        self.bands = bands
        self.rows_per_band = num_perms // bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        for _id, text in zip(df[self.id_col], df[self.text_col]):
            sig = self.mh.signature(text or "")
            bs = sig.reshape(self.bands, self.rows_per_band)
            # one stable 64-bit hash per band
            with np.errstate(over="ignore"):
                h = np.uint64(1469598103934665603) * np.ones(self.bands, np.uint64)
                for r in range(self.rows_per_band):
                    h = (h ^ bs[:, r]) * np.uint64(1099511628211)
            ids.extend([_id] * self.bands)
            band_ids.extend(range(self.bands))
            band_hashes.extend(h.tolist())
        return pd.DataFrame({"doc_id": ids, "band_id": band_ids,
                             "band_hash": np.array(band_hashes, dtype=np.uint64).astype(np.int64)})


def minhash_candidate_pairs(ds, num_perms=128, bands=16, shingle=3, seed=7,
                            id_col="doc_id", text_col="text", concurrency=4):
    """→ Dataset(id_a, id_b) candidate near-dup pairs (id_a < id_b),
    deduplicated across bands."""
    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(num_perms=num_perms, bands=bands,
                                   shingle=shingle, seed=seed,
                                   id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=concurrency)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64())})

    pairs = (banded.groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pyarrow"))
    # dedup pairs discovered in multiple bands: NATIVE count aggregate
    # (vectorized partial+final, no per-pair Python), then drop the count
    uniq = pairs.groupby(["id_a", "id_b"]).count()
    return uniq.map_batches(lambda t: t.select(["id_a", "id_b"]),
                            batch_format="pyarrow")


def verify_jaccard_pairs(pairs_df: pd.DataFrame, texts: dict, threshold: float,
                         num_perms=128, shingle=3, seed=7) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs (broadcast text
    lookup for the candidate subset)."""
    mh = MinHasher(num_perms, shingle, seed)
    out = {"id_a": [], "id_b": [], "jaccard": []}
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        j = mh.jaccard(texts.get(a, ""), texts.get(b, ""))
        if j >= threshold:
            out["id_a"].append(a)
            out["id_b"].append(b)
            out["jaccard"].append(j)
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word tokens (term-frequency weighted)."""

    def __init__(self, id_col="doc_id", text_col="text", seed: int = 11):
        self.id_col, self.text_col = id_col, text_col
        self.seed = seed

    def simhash(self, text: str) -> int:
        from .sketches import hash64
        toks = WS_TOKEN_RE.findall((text or "").lower())
        if not toks:
            return 0
        uniq, counts = np.unique(toks, return_counts=True)
        hs = hash64(list(uniq), seed=self.seed)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Emit exploded (chunk_id, chunk_val, doc_id, simhash) rows — one
        per 16-bit pigeonhole chunk — so ONE groupby covers all 4 bucket
        tables (hamming ≤ 3 guarantees ≥1 chunk collides; wider budgets
        still catch most near-dups)."""
        sh = np.array([self.simhash(t) for t in df[self.text_col]], dtype=np.uint64)
        ids = df[self.id_col].to_numpy()
        n = len(df)
        chunk_id = np.repeat(np.arange(4, dtype=np.int32), n)
        chunk_val = np.concatenate([
            ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            for c in range(4)])
        return pd.DataFrame({self.id_col: np.tile(ids, 4),
                             "simhash": np.tile(sh.astype(np.int64), 4),
                             "chunk_id": chunk_id,
                             "chunk_val": chunk_val})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_candidate_pairs(ds, max_hamming: int = 3, concurrency: int = 4,
                            id_col="doc_id", text_col="text"):
    """Near-dup candidates via pigeonhole bucketing on 16-bit chunks, then
    exact Hamming verification inside each bucket."""
    hashed = ds.map_batches(SimHasher, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
                            batch_format="pandas", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy()
        out = {"id_a": [], "id_b": [], "hamming": []}
        for i in range(len(g)):
            d = hamming64(np.repeat(sh[i], len(g) - i - 1), sh[i + 1:])
            ok = np.nonzero(d <= max_hamming)[0]
            for j in ok:
                out["id_a"].append(ids[i])
                out["id_b"].append(ids[i + 1 + j])
                out["hamming"].append(int(d[j]))
        return pd.DataFrame({"id_a": pd.Series(out["id_a"], dtype="int64"),
                             "id_b": pd.Series(out["id_b"], dtype="int64"),
                             "hamming": pd.Series(out["hamming"], dtype="int64")})

    pairs = hashed.groupby(["chunk_id", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pandas")

    # dedup pairs found in multiple chunk buckets: NATIVE min aggregate
    # (hamming is identical for every rediscovery of the same pair)
    from ray.data.aggregate import Min
    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))
    return uniq.map_batches(lambda t: t.select(["id_a", "id_b", "hamming"]),
                            batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Connected components over candidate pairs (duplicate GROUPS)
# ---------------------------------------------------------------------------

def connected_components(pairs_ds, max_iters: int = 10):
    """Min-label propagation over (id_a, id_b) edges → Dataset(node, label)
    where ``label`` is the smallest id in each connected component.

    Shuffle-only implementation (no joins): each round, every node's
    group (its current label + incident edges) broadcasts its min label
    to itself and its neighbors, then a groupby-min installs the new
    labels.  Converges in O(component diameter) rounds; ``max_iters``
    bounds the cost (duplicate clusters are shallow in practice).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_edges(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks() if isinstance(t["id_a"], pa.ChunkedArray) else t["id_a"]
        b = t["id_b"].combine_chunks() if isinstance(t["id_b"], pa.ChunkedArray) else t["id_b"]
        return pa.table({"node": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                         "nbr": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])})

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["node"],
                         "nbr": pa.nulls(t.num_rows, pa.int64())})

    def first_label(g: pa.Table) -> pa.Table:
        return pa.table({"node": g["node"].slice(0, 1),
                         "label": pa.array([pc.min(g["label"]).as_py()], pa.int64()),
                         "nbr": pa.nulls(1, pa.int64())})

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").map_groups(first_label, batch_format="pyarrow"))

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "label": pa.nulls(t.num_rows, pa.int64()),
                         "nbr": t["nbr"]})

    edge_msgs = edges.map_batches(edge_rows, batch_format="pyarrow")

    def propagate(g: pa.Table) -> pa.Table:
        lbls = pc.drop_null(g["label"])
        if len(lbls) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64())})
        m = pc.min(lbls).as_py()
        nbrs = pc.drop_null(g["nbr"]).unique()
        node = g["node"][0].as_py()
        targets = [node] + nbrs.to_pylist()
        return pa.table({"node": pa.array(targets, pa.int64()),
                         "label": pa.array([m] * len(targets), pa.int64()),
                         "nbr": pa.nulls(len(targets), pa.int64())})

    def collapse(g: pa.Table) -> pa.Table:
        return pa.table({"node": g["node"].slice(0, 1),
                         "label": pa.array([pc.min(g["label"]).as_py()], pa.int64()),
                         "nbr": pa.nulls(1, pa.int64())})

    for _ in range(max_iters):
        merged = labels.union(edge_msgs)
        labels = (merged.groupby("node").map_groups(propagate, batch_format="pyarrow")
                  .groupby("node").map_groups(collapse, batch_format="pyarrow"))

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["label"]}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (hyperplane-LSH bucketed)
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5,
                 emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.emb_col = emb_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df[self.emb_col].to_numpy())
        proj = emb @ self.planes
        bits = (proj > 0).astype(np.uint32)
        bucket = np.zeros(len(df), dtype=np.int64)
        for k in range(bits.shape[1]):
            bucket |= bits[:, k].astype(np.int64) << k
        out = df.copy()
        out["bucket"] = bucket
        return out


def embedding_near_dup_pairs(ds, dim: int, threshold: float = 0.95,
                             n_planes: int = 8, seed: int = 5,
                             id_col: str = "vec_id", emb_col: str = "embedding",
                             concurrency: int = 4):
    """cosine ≥ threshold pairs found within hyperplane-LSH buckets.

    Recall note: a single hyperplane table misses pairs split by a plane;
    at corpus scale run multiple tables (seeds) and union, same shape.
    """
    bucketed = ds.map_batches(
        HyperplaneBucketer, fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes,
                                                       seed=seed, emb_col=emb_col),
        batch_format="pandas", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        emb = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        emb = emb / norm
        sims = emb @ emb.T
        iu = np.triu_indices(len(g), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame({"id_a": ids[iu[0][mask]], "id_b": ids[iu[1][mask]],
                             "cosine": sims[iu][mask]})

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
