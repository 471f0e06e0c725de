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

from .pool import actor_pool
import pyarrow.compute as pc

from .text import WS_TOKEN_RE, fingerprint_md5


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    df = df.copy()
    df["content_hash"] = fingerprint_md5(df[text_col])
    return df


def dup_keep_dataset(hashed, hash_col: str = "content_hash",
                     id_col: str = "doc_id", n_buckets: int = 64):
    """DISTRIBUTED (hash, n, keep_id) rows for every DUPLICATED hash —
    ``dup_keep_table`` without the driver collect, for callers that
    cap the broadcast and fall back to a partitioned join when the
    duplicate population is pathologically large (the rows stay in the
    object store; count() to size them)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(hash_col, as_index=False).agg(
            n=(id_col, "size"), keep_id=(id_col, "min"))
        g["n"] = g["n"].astype("int64")
        g["keep_id"] = g["keep_id"].astype("int64")
        g["__b"] = (pd.util.hash_pandas_object(
            g[hash_col], index=False).to_numpy()
            % n_buckets).astype("int64") if len(g) \
            else pd.Series([], dtype="int64")
        return g

    def combine(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(hash_col, as_index=False).agg(
            n=("n", "sum"), keep_id=("keep_id", "min"))
        s = s[s["n"] > 1]
        return pa.table(
            {hash_col: pa.array(s[hash_col], pa.string()),
             "n": pa.array(s["n"].astype("int64"), pa.int64()),
             "keep_id": pa.array(s["keep_id"].astype("int64"), pa.int64())})

    return (hashed.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(combine, batch_format="pandas"))


def dup_keep_table(hashed, hash_col: str = "content_hash",
                   id_col: str = "doc_id",
                   n_buckets: int = 64) -> pd.DataFrame:
    """(hash, n, keep_id) for every DUPLICATED hash — the tiny
    broadcast side of exact dedup.  Per-batch (count, min) combiner →
    int64 hash-bucket shuffle → one vectorized pandas combine per
    bucket with the n>1 filter inside, so only duplicated hashes ever
    reach the driver (never a per-key aggregate, never text)."""
    return dup_keep_dataset(hashed, hash_col=hash_col, id_col=id_col,
                            n_buckets=n_buckets).to_pandas()


def exact_dup_groups(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64):
    """→ Dataset(content_hash, n_dups, keep_id, dup_ids) for groups
    with >1 doc.  The duplicated-hash set is found first (bucketed
    keep-table, tiny); only rows OF those hashes are shuffled for the
    dup_ids lists, and the list build is one vectorized in-bucket
    groupby — never a Python call per unique hash."""
    import ray as _ray
    hashed = ds.map_batches(
        lambda df: add_content_hash(df, text_col)[[id_col, "content_hash"]],
        batch_format="pandas")
    keep = dup_keep_table(hashed, id_col=id_col, n_buckets=n_buckets)
    dref = _ray.put(frozenset(keep["content_hash"]))

    def dup_rows(df: pd.DataFrame, _ref=dref) -> pd.DataFrame:
        dset = _ray.get(_ref)
        sel = df[df["content_hash"].isin(dset)].copy()
        sel["__b"] = (pd.util.hash_pandas_object(
            sel["content_hash"], index=False).to_numpy()
            % n_buckets).astype("int64") if len(sel) \
            else pd.Series([], dtype="int64")
        return sel

    def build_groups(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([_c := "content_hash", id_col])
        gb = g.groupby(_c)[id_col]
        agg = gb.agg(list)
        return pa.table({
            "content_hash": pa.array(agg.index, pa.string()),
            "n_dups": pa.array([len(v) for v in agg], pa.int64()),
            "keep_id": pa.array([v[0] for v in agg], pa.int64()),
            "dup_ids": pa.array([v[1:] for v in agg],
                                pa.list_(pa.int64()))})

    return (hashed.map_batches(dup_rows, batch_format="pandas")
            .groupby("__b").map_groups(build_groups,
                                       batch_format="pandas"))


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct content hash (first-wins).

    The rows themselves NEVER shuffle: the (tiny) duplicated-hash
    keep-table broadcasts via ``ray.put`` and every batch filters
    itself — a row survives iff its hash is unique or its id is the
    keeper."""
    import ray as _ray
    hashed = ds.map_batches(lambda df: add_content_hash(df, text_col),
                            batch_format="pandas")
    keep = dup_keep_table(
        hashed.map_batches(lambda df: df[[id_col, "content_hash"]],
                           batch_format="pandas"), id_col=id_col)
    kref = _ray.put(dict(zip(keep["content_hash"],
                             keep["keep_id"].astype("int64"))))

    def keep_rows(df: pd.DataFrame, _ref=kref) -> pd.DataFrame:
        km = _ray.get(_ref)
        # Nullable Int64 keeps the lookup exact: a float64 intermediate
        # (Series.map w/ NaN) would silently miscompare ids above 2^53.
        keep_id = pd.array(
            df["content_hash"].map(lambda h, _k=km: _k.get(h)),
            dtype="Int64")
        miss = keep_id.isna()
        mask = np.asarray(miss) | (
            df[id_col].to_numpy(dtype=np.int64)
            == keep_id.to_numpy(dtype=np.int64,
                                na_value=np.iinfo(np.int64).min))
        return df[mask]

    return hashed.map_batches(keep_rows, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the word k-shingles of ``text``
    (lowercased ``\\S+`` tokens joined by single spaces; texts shorter
    than k tokens contribute one whole-text shingle)."""
    toks = WS_TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        items = [" ".join(toks)] if toks else []
    else:
        items = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not items:
        return np.zeros(0, dtype=np.uint64)
    from .sketches import hash64
    return np.unique(hash64(items))


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
        return shingle_hashes(text, self.shingle)

    def _universal(self, sh: np.ndarray) -> np.ndarray:
        """[n] shingle hashes → [n, num_perms] universal hashes."""
        with np.errstate(over="ignore"):
            # exact (a*x + b) mod p, p = 2^61-1: the 122-bit product is
            # built from 32-bit limbs (hi/lo uint64 halves with carry),
            # then reduced via 2^61 ≡ 1 (mod p) chunk folding — the true
            # universal hash, not the wrap-mod-2^64 approximation
            x = sh[:, None] & _MERSENNE
            a, b = self.a[None, :], self.b[None, :]
            a_hi, a_lo = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
            x_hi, x_lo = x >> np.uint64(32), x & np.uint64(0xFFFFFFFF)
            ll = a_lo * x_lo
            mid = a_lo * x_hi + a_hi * x_lo          # < 2^62, no overflow
            hh = a_hi * x_hi
            shifted = mid << np.uint64(32)
            lo = ll + shifted
            carry = (lo < ll).astype(np.uint64)
            hi = hh + (mid >> np.uint64(32)) + carry
            h = ((lo & _MERSENNE)
                 + (((lo >> np.uint64(61)) | (hi << np.uint64(3))) & _MERSENNE)
                 + (hi >> np.uint64(58))
                 + b)
            for _ in range(2):                        # fold < 4p → < p
                h = (h & _MERSENNE) + (h >> np.uint64(61))
            h = np.where(h >= _MERSENNE, h - _MERSENNE, h)
        return h

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_perms, dtype=np.uint64)
        return self._universal(sh).min(axis=0)

    # bound on concatenated shingles per _universal call.  Keep the
    # [chunk, num_perms] uint64 temporaries ≤ ~2 MB: this host shows a
    # >100× per-row cliff once they exceed the cache-resident regime
    # (measured 9.5 μs/row at 2048 rows vs 668 μs/row at 8192), so
    # bigger chunks are dramatically SLOWER despite fewer numpy calls
    _CHUNK_SHINGLES = 2048

    def signatures_batch(self, shingle_lists) -> np.ndarray:
        """[k arrays of shingle hashes] → [k, num_perms] signatures in
        a handful of numpy passes: concatenate → one universal-hash
        matrix → segment-min via ``np.minimum.reduceat`` at the doc
        offsets.  ~10 numpy calls per chunk instead of ~10 per doc."""
        k = len(shingle_lists)
        out = np.zeros((k, self.num_perms), dtype=np.uint64)
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        nz = np.nonzero(lens)[0]
        pos = 0
        while pos < len(nz):
            take, tot = 0, 0
            while (pos + take < len(nz)
                   and (take == 0 or tot + lens[nz[pos + take]]
                        <= self._CHUNK_SHINGLES)):
                tot += lens[nz[pos + take]]
                take += 1
            idx = nz[pos:pos + take]
            cat = np.concatenate([shingle_lists[i] for i in idx])
            h = self._universal(cat)
            offsets = np.r_[0, np.cumsum(lens[idx])][:-1]
            out[idx] = np.minimum.reduceat(h, offsets, axis=0)
            pos += take
        return out

    def jaccard(self, a: str, b: str) -> float:
        sa, sb = set(self.shingles(a).tolist()), set(self.shingles(b).tolist())
        if not sa and not sb:
            return 1.0
        if not sa or not sb:
            return 0.0
        return len(sa & sb) / len(sa | sb)


class MinHashBander:
    """map_batches actor: text → exploded (band_hash, doc_id) rows.

    The FNV fold is SEEDED PER BAND (init xored with band_id × golden
    ratio), so a single 64-bit ``band_hash`` column already encodes the
    band identity and ONE single-key groupby buckets all bands.  This
    matters: Ray's multi-column groupby takes a per-group Python path
    ~7× slower than single-int64-key grouping (measured 14.2s vs 2.0s on
    91k rows / 83k groups at 32 CPUs); cross-band FNV collisions (2⁻⁶⁴)
    can only add candidates, which exact-Jaccard verification removes.
    """

    def __init__(self, num_perms: int = 128, bands: int = 16,
                 shingle: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perms % bands == 0
        self.mh = MinHasher(num_perms, shingle, seed)
        self.bands = bands
        self.rows_per_band = num_perms // bands
        self.id_col, self.text_col = id_col, text_col
        with np.errstate(over="ignore"):
            self._init = (np.uint64(1469598103934665603)
                          ^ (np.arange(bands, dtype=np.uint64)
                             * np.uint64(0x9E3779B97F4A7C15)))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # shingle extraction is per-doc string work (inherent); the
        # universal-hash/min and the FNV band fold are batched across
        # the whole input (signatures_batch + one fold loop over
        # rows_per_band on an [n_docs, bands] matrix)
        shingle_lists = [self.mh.shingles(t or "")
                         for t in df[self.text_col]]
        sigs = self.mh.signatures_batch(shingle_lists)
        n = len(df)
        bs = sigs.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            h = np.broadcast_to(self._init, (n, self.bands)).copy()
            for r in range(self.rows_per_band):
                h = (h ^ bs[:, :, r]) * np.uint64(1099511628211)
        ids = np.repeat(df[self.id_col].to_numpy(), self.bands)
        return pd.DataFrame({"doc_id": ids,
                             "band_hash": h.reshape(-1).astype(np.int64)})


def _dedup_pairs_native(pairs_ds, extra_col: str | None = None,
                        n_buckets: int = 64):
    """Distinct (id_a, id_b) rows via the hash-bucketed combine — a
    per-batch dedup partial, one int64 bucket shuffle, one vectorized
    pandas dedup per bucket (Ray's per-key aggregate path measured
    ~0.08-0.8 ms/key).  ``extra_col`` (identical across rediscoveries
    of a pair, e.g. hamming) survives via min."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if extra_col:
            g = df.groupby(["id_a", "id_b"], as_index=False)[extra_col].min()
        else:
            g = df[["id_a", "id_b"]].drop_duplicates()
        a = g["id_a"].to_numpy(dtype=np.int64)
        b = g["id_b"].to_numpy(dtype=np.int64)
        g = g.copy()
        g["__b"] = ((a * 1000003 + b) % n_buckets).astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if extra_col:
            out = g.groupby(["id_a", "id_b"],
                            as_index=False)[extra_col].min()
        else:
            out = g[["id_a", "id_b"]].drop_duplicates()
        out = out.copy()
        out["id_a"] = out["id_a"].astype("int64")
        out["id_b"] = out["id_b"].astype("int64")
        return out

    return (pairs_ds.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(combine, batch_format="pandas"))


def pairs_within_groups(df: pd.DataFrame, group_col: str,
                        id_col: str = "doc_id",
                        unique: bool = True) -> pd.DataFrame:
    """All (id_a < id_b) pairs within each ``group_col`` group,
    VECTORIZED: sort once, then one triu gather per distinct group
    size — no per-group Python (a hash-bucketed partition holds many
    thousands of groups; per-group calls dominated the old path).

    ``unique=True`` (default) dedups pairs ACROSS groups so candidate
    emission is a set per call (two LSH bands agreeing emit one pair);
    pass ``unique=False`` when the multiset matters (triangle wedges:
    each pivot's (b, c) is a distinct wedge to close)."""
    df = (df[[group_col, id_col]].drop_duplicates()
          .sort_values([group_col, id_col]))
    g = df[group_col].to_numpy()
    ids = df[id_col].to_numpy(dtype=np.int64)
    if len(ids) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    new = np.r_[True, g[1:] != g[:-1]]
    gidx = np.cumsum(new) - 1
    counts = np.bincount(gidx)
    starts = np.r_[0, np.cumsum(counts)][:-1]
    out_a, out_b = [], []
    for s in np.unique(counts):
        if s < 2:
            continue
        sel = np.nonzero(counts == s)[0]
        mat = ids[starts[sel][:, None] + np.arange(s)[None, :]]   # (G, s)
        iu, ju = np.triu_indices(s, 1)
        out_a.append(mat[:, iu].ravel())
        out_b.append(mat[:, ju].ravel())
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    out = pd.DataFrame({"id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b)})
    # two groups in the same partition can emit the same (a, b) pair
    # (e.g. two LSH bands agreeing) — dedup so the emission is a set
    # per call (hypothesis-found contract hole), unless the caller
    # needs the multiset (triangle wedges)
    return out.drop_duplicates(ignore_index=True) if unique else out


def minhash_candidate_pairs(ds, num_perms=128, bands=16, shingle=3, seed=7,
                            id_col="doc_id", text_col="text", concurrency=4,
                            dedup: bool = True, n_parts: int = 64):
    """→ Dataset(id_a, id_b) candidate near-dup pairs (id_a < id_b),
    deduplicated across bands.  Pass ``dedup=False`` when a downstream
    per-pair grouping (e.g. ``verify_jaccard_pairs_ds``) dedups anyway —
    saves one shuffle.

    Bucketing shape: band buckets are grouped by ``band_hash mod
    n_parts`` (ONE shuffle into n_parts partitions), then pair emission
    inside each partition is a single vectorized pass over all its
    buckets — NOT a per-bucket ``map_groups`` (one Python call per
    distinct band_hash ≈ one per doc×bands at low dup rates; measured
    ~4.5 s of pure call overhead on 91k rows / 83k buckets)."""
    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(num_perms=num_perms, bands=bands,
                                   shingle=shingle, seed=seed,
                                   id_col=id_col, text_col=text_col),
        batch_format="pandas", concurrency=actor_pool(concurrency))

    mask = np.int64((1 << max(n_parts - 1, 1).bit_length()) - 1)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["band_hash"].to_numpy() & mask
        return df

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return pairs_within_groups(g, "band_hash")

    pairs = (banded.map_batches(tag, batch_format="pandas")
             .groupby("__part")
             .map_groups(part_pairs, batch_format="pandas"))
    if not dedup:
        return pairs
    # dedup pairs discovered in multiple bands: NATIVE count aggregate on
    # a packed single key (Ray multi-key grouping is ~7× slower)
    return _dedup_pairs_native(pairs)


def verify_jaccard_pairs_ds(pairs_ds, docs_ds, threshold: float,
                            num_perms=128, shingle=3, seed=7,
                            id_col: str = "doc_id", text_col: str = "text"):
    """Distributed exact-Jaccard verification: candidate texts travel to
    the pairs through a tagged union — NO driver-side text table.

    Shape: only the candidate ID set (ints, ≪ corpus — LSH banding
    keeps it so) is collected and broadcast as a semi-join filter; the
    corpus scan keeps just candidate texts, which union with the pair
    halves and co-locate in TWO small shuffles:

        groupby(doc_id):  (pair-half rows ∪ candidate text rows)
                          → each half picks up its side's text
        groupby(id_a,id_b): both halves meet → exact Jaccard → verdict

    Per-group Python is bounded by the candidate count, never the
    corpus.  (Only candidate rows ever shuffle; non-candidates are
    dropped at the scan.)
    """
    # pairs are small by design (LSH banding); pin them so the id-set
    # pass and the union don't re-execute the whole candidate pipeline.
    # The from_arrow_refs rebuild matters: Dataset.union composes the
    # inputs' LOGICAL plans, and a MaterializedDataset's logical plan
    # still carries the full upstream lineage — union(materialized, x)
    # re-executes the entire candidate pipeline (measured: 2× banding
    # + an extra sort, ~100 s of the 188 s minhash wall at 1M docs).
    # Rebuilding from the materialized block refs gives union a pure
    # InputData plan with nothing upstream to re-run (zero-copy refs).
    import ray as _ray
    pairs_ds = _ray.data.from_arrow_refs(
        pairs_ds.materialize().to_arrow_refs())
    ids_small = pairs_ds.map_batches(
        lambda t: pa.table({"doc_id": pa.concat_arrays([
            t["id_a"].combine_chunks().cast(pa.int64()),
            t["id_b"].combine_chunks().cast(pa.int64())]).unique()}),
        batch_format="pyarrow").to_pandas()
    cand_set = set(ids_small["doc_id"].tolist())

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    if not cand_set:
        return pairs_ds.map_batches(lambda df: _empty(), batch_format="pandas")

    # tagged rows: side 0/1 = pair half (needs text of doc_id), side 2 =
    # candidate text carrier
    def halves(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": pd.concat([df["id_a"], df["id_b"]]).astype("int64"),
            "id_a": pd.concat([df["id_a"], df["id_a"]]).astype("int64"),
            "id_b": pd.concat([df["id_b"], df["id_b"]]).astype("int64"),
            "side": np.repeat([0, 1], len(df)).astype(np.int64),
            "text": [""] * (2 * len(df)),
        })

    def text_rows(df: pd.DataFrame, _s=cand_set) -> pd.DataFrame:
        sel = df[df[id_col].isin(_s)]
        return pd.DataFrame({
            "doc_id": sel[id_col].astype("int64"),
            "id_a": np.full(len(sel), -1, dtype=np.int64),
            "id_b": np.full(len(sel), -1, dtype=np.int64),
            "side": np.full(len(sel), 2, dtype=np.int64),
            "text": sel[text_col].astype(str),
        })

    tagged = (pairs_ds.map_batches(halves, batch_format="pandas")
              .union(docs_ds.map_batches(text_rows, batch_format="pandas")))

    # both co-location steps are HASH-BUCKETED partition groupbys with a
    # vectorized pandas merge inside — not per-doc / per-pair map_groups
    # (one Python call per candidate doc and per candidate pair adds
    # seconds of pure call overhead even at a few thousand candidates)
    mask = np.int64(63)

    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["doc_id"].to_numpy(dtype=np.int64) & mask
        return df

    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        texts = (g.loc[g["side"] == 2, ["doc_id", "text"]]
                 .drop_duplicates("doc_id"))
        h = g[g["side"] != 2].drop(columns=["text"])
        m = h.merge(texts, on="doc_id", how="left")
        a = m["id_a"].to_numpy(dtype=np.int64)
        b = m["id_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"pair_key": (a << 32) | b,
                             "side": m["side"].astype("int64"),
                             "text": m["text"].fillna("")})

    with_text = (tagged.map_batches(tag_doc, batch_format="pandas")
                 .groupby("__part").map_groups(attach_part,
                                               batch_format="pandas"))
    mh = MinHasher(num_perms, shingle, seed)   # tiny; ships in the closure

    def tag_pair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["pair_key"].to_numpy(dtype=np.int64) & mask
        return df

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.loc[g["side"] == 0, ["pair_key", "text"]]
             .drop_duplicates("pair_key").rename(columns={"text": "ta"}))
        b = (g.loc[g["side"] == 1, ["pair_key", "text"]]
             .drop_duplicates("pair_key").rename(columns={"text": "tb"}))
        m = a.merge(b, on="pair_key", how="outer")
        out = {"id_a": [], "id_b": [], "jaccard": []}
        for key, ta, tb in zip(m["pair_key"],
                               m["ta"].fillna(""), m["tb"].fillna("")):
            j = mh.jaccard(ta, tb)      # per-pair work is inherent here
            if j >= threshold:
                key = int(key)
                out["id_a"].append(key >> 32)
                out["id_b"].append(key & 0xFFFFFFFF)
                out["jaccard"].append(j)
        if not out["id_a"]:
            return _empty()
        return pd.DataFrame({"id_a": pd.Series(out["id_a"], dtype="int64"),
                             "id_b": pd.Series(out["id_b"], dtype="int64"),
                             "jaccard": pd.Series(out["jaccard"],
                                                  dtype="float64")})

    return (with_text.map_batches(tag_pair, batch_format="pandas")
            .groupby("__part").map_groups(verify_part,
                                          batch_format="pandas"))


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
# Exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------

class NgramShingler:
    """map_batches actor: text → exploded (doc_id, sh, n_sh) rows, one
    per distinct word-k-shingle hash.  Every row carries its document's
    shingle-set size so the downstream pair aggregate needs NO extra
    join against a per-doc size table."""

    def __init__(self, shingle: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.k = shingle
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, shs, ns = [], [], []
        for _id, text in zip(df[self.id_col], df[self.text_col]):
            sh = shingle_hashes(text or "", self.k)
            if len(sh) == 0:
                continue
            ids.append(np.full(len(sh), _id, dtype=np.int64))
            shs.append(sh.astype(np.int64))
            ns.append(np.full(len(sh), len(sh), dtype=np.int64))
        if not ids:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "sh": pd.Series([], dtype="int64"),
                                 "n_sh": pd.Series([], dtype="int64")})
        return pd.DataFrame({"doc_id": np.concatenate(ids),
                             "sh": np.concatenate(shs),
                             "n_sh": np.concatenate(ns)})


def ngram_jaccard_pairs_prefix(sh_rows, threshold: float,
                               n_buckets: int = 32,
                               broadcast_limit: int = 256 << 20):
    """EXACT prefix-filtered Jaccard join over materialized shingle rows
    (doc_id, sh, n_sh) → Dataset(doc_a, doc_b, jaccard ≥ threshold).

    PPJoin-family bound (public literature): order shingles globally by
    ascending (document-frequency, sh); any pair with J ≥ t must share a
    shingle inside each doc's first ``|x| - ⌈t·|x|⌉ + 1`` shingles in
    that order (J ≥ t ⇒ |A∩B| ≥ t·max(|A|,|B|)).  So candidates come
    from a self-join of PREFIXES only — the hot stopword shingles that
    make the naive self-join quadratic have maximal df and fall OUTSIDE
    most prefixes — and the exact intersection is then recomputed from
    the full shingle sets of candidates only.  Bucketed linear shuffles,
    no Σ df² term:

        1. df attach     (bucket by sh:   value_counts in-bucket)
        2. prefix select (bucket by doc:  sort (df, sh), cumcount < p)
        3. candidates    (self-join of prefix rows on sh, pair dedup,
                          PPJoin length filter min ≥ t·max)
        4. set build     (bucket by doc:  candidate docs' sorted shingle
                          sets packed as ONE bytes value per doc)
        5. set attach    (small side: broadcast the packed sets once via
                          ray.put and verify in one map_batches; big
                          side: two bucketed merges by doc_a then doc_b
                          — row count stays #pairs either way)
        6. verify        (sorted-array intersection per pair)
    """
    from .joins import hash_join

    mask = np.int64((1 << max(n_buckets - 1, 1).bit_length()) - 1)

    # 1. attach per-shingle document frequency (all rows of a shingle
    #    co-locate, so df is computable in-bucket — no join)
    def tag_sh(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = df["sh"].to_numpy(dtype=np.int64) & mask
        return df

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns="__b").copy()
        out["df"] = out["sh"].map(out["sh"].value_counts()).astype("int64")
        return out

    with_df = (sh_rows.map_batches(tag_sh, batch_format="pandas")
               .groupby("__b").map_groups(attach_df, batch_format="pandas"))

    # 2. per-doc prefix: first (n_sh - ceil(t*n_sh) + 1) shingles by
    #    ascending (df, sh)
    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = df["doc_id"].to_numpy(dtype=np.int64) & mask
        return df

    def prefix_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "df", "sh"])
        rank = df.groupby("doc_id").cumcount().to_numpy()
        n = df["n_sh"].to_numpy(dtype=np.int64)
        p = n - np.ceil(threshold * n).astype(np.int64) + 1
        return df[rank < p][["doc_id", "sh", "n_sh"]]

    prefixes = (with_df.map_batches(tag_doc, batch_format="pandas")
                .groupby("__b").map_groups(prefix_rows,
                                           batch_format="pandas")
                .materialize())

    # 3. candidate pairs from the prefix self-join (dedup by packed key)
    def side(a: str, n: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({a: df["doc_id"], n: df["n_sh"],
                                 "sh": df["sh"]})
        return fn

    co = hash_join(prefixes.map_batches(side("id_a", "n_a"),
                                        batch_format="pandas"),
                   prefixes.map_batches(side("id_b", "n_b"),
                                        batch_format="pandas"),
                   key="sh", n_buckets=n_buckets)

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["id_a"] < df["id_b"]]
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        if len(b) and b.max() >= (1 << 31):
            raise ValueError("pair packing needs ids < 2^31")
        n_a = df["n_a"].to_numpy(dtype=np.int64)
        n_b = df["n_b"].to_numpy(dtype=np.int64)
        # PPJoin length filter: J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)
        # (I ≤ min and union ≥ max).  Tiny epsilon keeps boundary pairs.
        keep = (np.minimum(n_a, n_b) + 1e-9
                >= threshold * np.maximum(n_a, n_b))
        a, b, n_a, n_b = a[keep], b[keep], n_a[keep], n_b[keep]
        key = a * (1 << 32) + b
        out = pd.DataFrame({"pair_key": key, "n_a": n_a, "n_b": n_b})
        out["__b"] = out["pair_key"].to_numpy() & mask
        return out

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("pair_key").drop(columns="__b")

    cands = (co.map_batches(pair_rows, batch_format="pandas")
             .groupby("__b").map_groups(dedup_pairs, batch_format="pandas")
             .materialize())

    # 4. pack each CANDIDATE doc's sorted shingle set into one bytes
    #    value (int64 little-endian) — a plain Arrow binary column, so a
    #    doc's set is ONE row from here on, never an exploded rowset.
    def cand_doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        key = df["pair_key"].to_numpy(dtype=np.int64)
        d = np.unique(np.concatenate([key >> 32, key & 0xFFFFFFFF]))
        return pd.DataFrame({"doc_id": d,
                             "sh": np.full(len(d), -1, dtype=np.int64),
                             "n_sh": np.full(len(d), -1, dtype=np.int64)})

    tagged = (cands.map_batches(cand_doc_rows, batch_format="pandas")
              .union(sh_rows)
              .map_batches(tag_doc, batch_format="pandas"))

    def build_sets(df: pd.DataFrame) -> pd.DataFrame:
        flag = df["sh"].to_numpy(dtype=np.int64) == -1
        wanted = df.loc[flag, "doc_id"].unique()
        shs = df[~flag]
        shs = shs[shs["doc_id"].isin(wanted)]
        packed = (shs.sort_values(["doc_id", "sh"]).groupby("doc_id")["sh"]
                  .apply(lambda s: s.to_numpy(dtype="<i8").tobytes()))
        return pd.DataFrame({"doc_id": packed.index.to_numpy(np.int64),
                             "sh_set": packed.to_numpy()})

    doc_sets = (tagged.groupby("__b").map_groups(build_sets,
                                                 batch_format="pandas")
                .materialize())

    # 6. exact Jaccard from two sorted packed sets (shared by both
    #    attach strategies below)
    def _jaccard_rows(key, n_a, n_b, sets_a, sets_b):
        inter = np.empty(len(key), dtype=np.float64)
        for i, (sa, sb) in enumerate(zip(sets_a, sets_b)):
            inter[i] = len(np.intersect1d(
                np.frombuffer(sa, dtype="<i8"),
                np.frombuffer(sb, dtype="<i8"), assume_unique=True))
        union = n_a + n_b - inter
        j = np.where(union > 0, inter / np.maximum(union, 1.0), 1.0)
        out = pd.DataFrame({"doc_a": key >> 32, "doc_b": key & 0xFFFFFFFF,
                            "jaccard": np.round(j, 6)})
        return out[j >= threshold]

    # 5a. small-side fast path: candidate docs' packed sets fit in one
    #     broadcast object — ship ONCE via ray.put, verify pairs in a
    #     single map_batches, zero further shuffles.  (Bounded by the
    #     CANDIDATE docs only, not the corpus; still auto-falls back to
    #     the bucketed merge when the packed sets outgrow the limit.)
    if doc_sets.size_bytes() <= broadcast_limit:
        import ray as _ray
        lut = {}
        for b in doc_sets.iter_batches(batch_format="pandas",
                                       batch_size=65536):
            lut.update(zip(b["doc_id"].to_numpy(np.int64), b["sh_set"]))
        lut_ref = _ray.put(lut)

        def verify_bcast(df: pd.DataFrame, _ref=lut_ref) -> pd.DataFrame:
            sets = _ray.get(_ref)
            key = df["pair_key"].to_numpy(dtype=np.int64)
            return _jaccard_rows(
                key,
                df["n_a"].to_numpy(dtype=np.float64),
                df["n_b"].to_numpy(dtype=np.float64),
                [sets[k] for k in (key >> 32)],
                [sets[k] for k in (key & 0xFFFFFFFF)])

        return cands.map_batches(verify_bcast, batch_format="pandas")

    # 5b. attach each side's set bytes by bucketed tagged-union merge
    #    (row count stays #pairs; payload volume is Σ_pairs |A|+|B| —
    #    bounded by the length-filtered candidate count, not by df²).
    #    Sentinels (-1 / b"") instead of nulls: a null in an int64
    #    column promotes to float64, which corrupts 63-bit pair_keys.
    def _attach_side(pairs, shift: int, out_col: str, prev: list[str]):
        def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            key = df["pair_key"].to_numpy(dtype=np.int64)
            doc = (key >> 32) if shift else (key & 0xFFFFFFFF)
            out = pd.DataFrame({"pair_key": key,
                                "n_a": df["n_a"].to_numpy(np.int64),
                                "n_b": df["n_b"].to_numpy(np.int64)})
            for c in prev:
                out[c] = df[c].to_numpy()
            out["__doc"] = doc
            out["__sh_set"] = np.full(n, b"", dtype=object)
            out["__b"] = doc & mask
            return out

        def tag_sets(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            doc = df["doc_id"].to_numpy(np.int64)
            out = pd.DataFrame({"pair_key": np.full(n, -1, dtype=np.int64),
                                "n_a": np.full(n, -1, dtype=np.int64),
                                "n_b": np.full(n, -1, dtype=np.int64)})
            for c in prev:
                out[c] = np.full(n, b"", dtype=object)
            out["__doc"] = doc
            out["__sh_set"] = df["sh_set"].to_numpy(dtype=object)
            out["__b"] = doc & mask
            return out

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            is_pair = df["pair_key"].to_numpy(dtype=np.int64) != -1
            p = df[is_pair].drop(columns=["__sh_set", "__b"])
            s = df[~is_pair][["__doc", "__sh_set"]]
            m = p.merge(s, on="__doc", how="inner")
            return m.drop(columns=["__doc"]).rename(
                columns={"__sh_set": out_col})

        return (pairs.map_batches(tag_pairs, batch_format="pandas")
                .union(doc_sets.map_batches(tag_sets,
                                            batch_format="pandas"))
                .groupby("__b").map_groups(merge, batch_format="pandas"))

    cur = _attach_side(cands, 1, "set_a", [])
    cur = _attach_side(cur, 0, "set_b", ["set_a"])

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        return _jaccard_rows(df["pair_key"].to_numpy(dtype=np.int64),
                             df["n_a"].to_numpy(dtype=np.float64),
                             df["n_b"].to_numpy(dtype=np.float64),
                             df["set_a"], df["set_b"])

    return cur.map_batches(verify, batch_format="pandas")


def ngram_jaccard_pairs(ds, threshold: float = 0.6, shingle: int = 3,
                        n_buckets: int = 32, concurrency: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_df: int | None = None,
                        method: str = "full"):
    """EXACT n-gram Jaccard similarity join → Dataset(doc_a, doc_b,
    jaccard) for every pair with Jaccard ≥ ``threshold`` (doc_a <
    doc_b).  Unlike MinHash+LSH this has no false negatives: candidates
    are every pair sharing ≥1 shingle (the inverted-index / PPJoin
    family shape).

    Distributed shape — shingle-partitioned self-join, all-native
    aggregates, no text ever shuffles:

        docs ─NgramShingler→ (doc_id, sh, n_sh)      [materialized once]
             ─hash_join(sh)→ (id_a, n_a, id_b, n_b)  co-occurrence rows
             ─filter a<b → groupby(pair) COUNT + MIN → |A∩B|, |A|, |B|
             ─jaccard = c / (n_a + n_b - c) ≥ threshold

    Scale notes: the self-join volume is Σ_sh df(sh)² — dominated by
    hot shingles.  ``max_df`` is the scale valve (PPJoin-literature df
    cap): shingles appearing in more than ``max_df`` docs are dropped
    BEFORE the join, bounding per-shingle join fan-out at max_df².
    This keeps candidate RECALL for genuinely similar pairs (near-dups
    share many rare shingles) but makes reported intersection counts
    lower bounds — i.e. jaccard becomes approximate-from-below and the
    result may miss pairs whose overlap is mostly stopword shingles.
    Default None = exact.  Salt residual hot shingles via
    ``hash_join(hot_keys=...)``.  Shingles travel as 64-bit hashes
    (collision odds 2⁻⁶⁴ — identical to the MinHash verify path's
    hashed-shingle Jaccard).
    """
    import pyarrow.compute as pc
    from .joins import hash_join

    sh_rows = ds.map_batches(
        NgramShingler,
        fn_constructor_kwargs=dict(shingle=shingle, id_col=id_col,
                                   text_col=text_col),
        batch_format="pandas", concurrency=actor_pool(concurrency)).materialize()

    if max_df is not None:
        # one bucketed pass: co-locate all rows of a shingle, drop the
        # ones whose document frequency exceeds the cap (set sizes n_sh
        # keep their ORIGINAL values so jaccard stays a lower bound)
        dfmask = np.int64(63)

        def tag_sh(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = df["sh"].to_numpy(dtype=np.int64) & dfmask
            return df

        def drop_hot(df: pd.DataFrame) -> pd.DataFrame:
            cnt = df["sh"].map(df["sh"].value_counts())
            return df[cnt <= max_df].drop(columns="__b")

        sh_rows = (sh_rows.map_batches(tag_sh, batch_format="pandas")
                   .groupby("__b").map_groups(drop_hot,
                                              batch_format="pandas")
                   .materialize())

    if method == "prefix":
        return ngram_jaccard_pairs_prefix(sh_rows, threshold,
                                          n_buckets=n_buckets)

    def side(a: str, n: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({a: df["doc_id"], n: df["n_sh"],
                                 "sh": df["sh"]})
        return fn

    left = sh_rows.map_batches(side("id_a", "n_a"), batch_format="pandas")
    right = sh_rows.map_batches(side("id_b", "n_b"), batch_format="pandas")
    co = hash_join(left, right, key="sh", n_buckets=n_buckets)

    # power-of-two partition count for the pair aggregate (masked mod)
    nparts = 1 << max(n_buckets - 1, 1).bit_length()

    def ordered(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["id_a"], t["id_b"]))
        a = pc.cast(t["id_a"], pa.int64())
        b = pc.cast(t["id_b"], pa.int64())
        # pack (a, b) into one int64 — single-int64-key grouping is far
        # cheaper than string keys (see MinHashBander note); requires
        # ids < 2^31, which doc ids satisfy (hash-keyed corpora should
        # fall back to a string pack)
        if t.num_rows and pc.max(b).as_py() >= (1 << 31):
            raise ValueError("ngram_jaccard int64 pair packing needs ids < 2^31")
        key = pc.add(pc.multiply(a, pa.scalar(1 << 32, pa.int64())), b)
        return pa.table({"pair_key": key,
                         "__pb": pc.bit_wise_and(key, pa.scalar(nparts - 1,
                                                                pa.int64())),
                         "n_a": pc.cast(t["n_a"], pa.int64()),
                         "n_b": pc.cast(t["n_b"], pa.int64())})

    # Per-pair counts via HASH-BUCKETED vectorized pandas groupby —
    # NOT ray.data groupby(pair_key): with ~1 distinct pair per row the
    # sort-based aggregate degenerates (measured 255 s for 1.65 M rows /
    # 1.45 M groups at sf0.1 vs ~2 s bucketed).  Bucket count bounds
    # per-task memory: rows_per_task ≈ total_co_rows / nparts.
    def agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pair_key", as_index=False).agg(
            n_common=("n_a", "size"), n_a=("n_a", "first"),
            n_b=("n_b", "first"))
        c = g["n_common"].to_numpy(dtype=np.float64)
        union = (g["n_a"].to_numpy(dtype=np.float64)
                 + g["n_b"].to_numpy(dtype=np.float64) - c)
        j = np.where(union > 0, c / np.maximum(union, 1.0), 1.0)
        key = g["pair_key"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"doc_a": key >> 32,
                            "doc_b": key & 0xFFFFFFFF,
                            "jaccard": np.round(j, 6)})
        return out[j >= threshold]

    return (co.map_batches(ordered, batch_format="pyarrow")
            .groupby("__pb").map_groups(agg_bucket, batch_format="pandas"))


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
        """Emit exploded (chunk_key, doc_id, simhash) rows — one per
        16-bit pigeonhole chunk — so ONE groupby covers all 4 bucket
        tables (hamming ≤ 3 guarantees ≥1 chunk collides; wider budgets
        still catch most near-dups).  chunk_key packs (chunk_id << 16) |
        chunk_val into a single int64 — exact, and single-key grouping
        avoids Ray's slow multi-key path."""
        sh = np.array([self.simhash(t) for t in df[self.text_col]], dtype=np.uint64)
        ids = df[self.id_col].to_numpy()
        n = len(df)
        chunk_id = np.repeat(np.arange(4, dtype=np.int64), n)
        chunk_val = np.concatenate([
            ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            for c in range(4)])
        return pd.DataFrame({self.id_col: np.tile(ids, 4),
                             "simhash": np.tile(sh.astype(np.int64), 4),
                             "chunk_key": (chunk_id << 16) | chunk_val})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_candidate_pairs(ds, max_hamming: int = 3, concurrency: int = 4,
                            id_col="doc_id", text_col="text",
                            n_parts: int = 64):
    """Near-dup candidates via pigeonhole bucketing on 16-bit chunks, then
    exact Hamming verification inside each bucket.

    Same bucketed-partition shape as ``minhash_candidate_pairs``: one
    shuffle on ``chunk_key mod n_parts``, then vectorized pair emission
    + one batched Hamming pass per partition (no per-bucket Python —
    up to 4×2¹⁶ distinct chunk buckets otherwise)."""
    hashed = ds.map_batches(SimHasher, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
                            batch_format="pandas", concurrency=actor_pool(concurrency))
    return fingerprint_candidate_pairs(hashed, max_hamming=max_hamming,
                                       id_col=id_col, n_parts=n_parts)


def fingerprint_candidate_pairs(hashed, max_hamming: int = 3,
                                id_col: str = "doc_id",
                                n_parts: int = 64):
    """Pigeonhole pairing over PRE-COMPUTED exploded fingerprint rows
    (id, simhash, chunk_key) — the SimHash back half, reusable by any
    64-bit fingerprint source (text SimHash, image pHash): one shuffle
    on ``chunk_key mod n_parts``, vectorized in-partition pair emission,
    one batched Hamming pass, then the bucketed cross-chunk dedup."""
    mask = np.int64((1 << max(n_parts - 1, 1).bit_length()) - 1)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["chunk_key"].to_numpy() & mask
        return df

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        pairs = pairs_within_groups(g, "chunk_key", id_col)
        if not len(pairs):
            return empty
        sh_map = g.drop_duplicates(id_col).set_index(id_col)["simhash"]
        ha = sh_map.loc[pairs["id_a"]].to_numpy(dtype=np.int64)
        hb = sh_map.loc[pairs["id_b"]].to_numpy(dtype=np.int64)
        d = hamming64(ha, hb)
        keep = d <= max_hamming
        return pd.DataFrame({"id_a": pairs["id_a"].to_numpy()[keep],
                             "id_b": pairs["id_b"].to_numpy()[keep],
                             "hamming": d[keep]})

    pairs = (hashed.map_batches(tag, batch_format="pandas")
             .groupby("__part").map_groups(part_pairs, batch_format="pandas"))

    # dedup pairs found in multiple chunk buckets: NATIVE single-key
    # aggregate (hamming is identical for every rediscovery of a pair)
    return _dedup_pairs_native(pairs, extra_col="hamming")


# ---------------------------------------------------------------------------
# Connected components over candidate pairs (duplicate GROUPS)
# ---------------------------------------------------------------------------

def _auto_buckets(n_rows: int) -> int:
    """Bucket count targeting ~50k rows/bucket: small inputs get few
    buckets (a 64-way shuffle of 1k rows is pure scheduling overhead —
    measured 139 s vs 40 s for the CC pytest at 4 CPUs), huge inputs
    scale up to 1024."""
    b = max(8, min(1024, n_rows // 50_000 + 8))
    return 1 << (b - 1).bit_length()


def connected_components(pairs_ds, max_iters: int = 10,
                         n_buckets: int | None = None):
    """Min-label propagation over (id_a, id_b) edges → Dataset(node, label)
    where ``label`` is the smallest id in each connected component.

    Shuffle-only implementation (no joins): each round, labels and edges
    are co-bucketed by ``node & (n_buckets-1)`` and each bucket emits —
    with VECTORIZED pandas, never per-node Python — one self-message
    ``(node, label)`` plus one ``(nbr, label_of_node)`` per incident
    edge, tagged with the TARGET's bucket; a second bucketed pass
    collapses messages to per-node min labels.  So each round costs two
    shuffles over O(V+E) int64 rows and exactly 2×``n_buckets`` Python
    group calls — never a per-node native aggregate (Ray's sort-based
    groupby degenerates at ~1 distinct group per row: 72 s for a 3k-node
    graph vs ~1 s/round bucketed).  Labels only decrease, so
    ``sum(label)`` is a monotone convergence certificate: the loop exits
    early once it stops moving.  Converges in O(component diameter)
    rounds; ``max_iters`` bounds the cost (duplicate clusters are
    shallow in practice).
    """
    # nbr == -1 marks a label row (sentinel keeps every column int64 so
    # pandas blocks never promote to float/nullable across the union)

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        return pd.DataFrame({"node": node,
                             "label": np.full(len(node), -1, dtype=np.int64),
                             "nbr": nbr})

    raw_edges = pairs_ds.map_batches(to_edges, batch_format="pandas").materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(raw_edges.count())
    n_buckets = 1 << max(int(n_buckets) - 1, 1).bit_length()
    mask = np.int64(n_buckets - 1)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = df["node"].to_numpy(dtype=np.int64) & mask
        return df

    edge_msgs = raw_edges.map_batches(add_bucket,
                                      batch_format="pandas").materialize()

    def bucket_collapse(df: pd.DataFrame) -> pd.DataFrame:
        """messages (node, label) → label rows (node, min label, nbr=-1)
        bucketed by node — vectorized per bucket."""
        lbl = df.groupby("node")["label"].min()
        node = lbl.index.to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": node,
                             "label": lbl.to_numpy(dtype=np.int64),
                             "nbr": np.full(len(node), -1, dtype=np.int64),
                             "__b": node & mask})

    def init_msgs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "label": df["node"],
                             "__b": df["__b"]})

    labels = (edge_msgs.map_batches(init_msgs, batch_format="pandas")
              .groupby("__b").map_groups(bucket_collapse,
                                         batch_format="pandas")
              .repartition(n_buckets)   # coalesce: keep block count flat
              .materialize())

    def bucket_propagate(df: pd.DataFrame) -> pd.DataFrame:
        """co-bucketed labels+edges → messages tagged by TARGET bucket."""
        is_lab = df["nbr"].to_numpy() == -1
        lab = df[is_lab]
        edg = df[~is_lab]
        lbl = lab.groupby("node")["label"].min()
        nbr_label = lbl.reindex(edg["node"].to_numpy()).to_numpy()
        out_node = np.concatenate([
            lbl.index.to_numpy(dtype=np.int64),
            edg["nbr"].to_numpy(dtype=np.int64)])
        out_label = np.concatenate([
            lbl.to_numpy(dtype=np.int64),
            nbr_label.astype(np.int64)])
        return pd.DataFrame({"node": out_node, "label": out_label,
                             "__b": out_node & mask})

    prev_sum = None
    for _ in range(max_iters):
        merged = labels.union(edge_msgs)
        labels = (merged.groupby("__b").map_groups(bucket_propagate,
                                                   batch_format="pandas")
                  .groupby("__b").map_groups(bucket_collapse,
                                             batch_format="pandas")
                  .repartition(n_buckets)  # block count would otherwise
                  .materialize())          # grow every round (3-way union)
        cur_sum = labels.sum("label")    # monotone ⇒ unchanged = converged
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["label"]}),
        batch_format="pyarrow")


def connected_components_star(pairs_ds, max_iters: int = 30,
                              n_buckets: int | None = None):
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public algorithm): the edge set itself is
    rewritten every round until each component is a star centred on its
    minimum node, so convergence is O(log² n) ROUNDS REGARDLESS OF
    DIAMETER — the scale path for deep/general graphs, where plain
    min-label propagation (``connected_components``) needs
    O(diameter) rounds.  Per round: one bucketed adjacency pass
    (vectorized per bucket, never per-node Python) + one bucketed
    canonical-edge dedup — two shuffles of O(E) int64 rows.

    large-star(u): every neighbor v > u re-attaches to m = min(Γ⁺(u));
    small-star(u): every v ≤ u (and u) attaches to m.  Both preserve
    connectivity and never raise the component minimum.
    """
    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({"lo": lo, "hi": hi})

    raw = pairs_ds.map_batches(canon, batch_format="pandas").materialize()
    if n_buckets is None:
        n_buckets = _auto_buckets(raw.count())
    n_buckets = 1 << max(int(n_buckets) - 1, 1).bit_length()
    mask = np.int64(n_buckets - 1)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = df["lo"].to_numpy(dtype=np.int64) & mask
        return df

    def bucket_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["lo", "hi"])

    edges = (raw.map_batches(add_bucket, batch_format="pandas")
             .groupby("__b").map_groups(bucket_dedup, batch_format="pandas")
             .materialize())

    def adjacency(df: pd.DataFrame) -> pd.DataFrame:
        lo = df["lo"].to_numpy(dtype=np.int64)
        hi = df["hi"].to_numpy(dtype=np.int64)
        u = np.concatenate([lo, hi])
        v = np.concatenate([hi, lo])
        return pd.DataFrame({"u": u, "v": v, "__b": u & mask})

    def star(large: bool):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            mv = df.groupby("u")["v"].min()
            m = np.minimum(mv.to_numpy(), mv.index.to_numpy())
            m_of_u = df["u"].map(pd.Series(m, index=mv.index)).to_numpy()
            uu = df["u"].to_numpy()
            vv = df["v"].to_numpy()
            if large:
                sel = vv > uu
                src, dst = vv[sel], m_of_u[sel]
            else:
                sel = vv <= uu
                # Γ⁺ includes u itself: attach u to m too
                src = np.concatenate([vv[sel], mv.index.to_numpy()])
                dst = np.concatenate([m_of_u[sel], m])
            keep = src != dst
            src, dst = src[keep], dst[keep]
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            return pd.DataFrame({"lo": lo, "hi": hi, "__b": lo & mask})
        return fn

    def round_once(edges, large: bool):
        return (edges.map_batches(adjacency, batch_format="pandas")
                .groupby("__b").map_groups(star(large),
                                           batch_format="pandas")
                .groupby("__b").map_groups(bucket_dedup,
                                           batch_format="pandas")
                .repartition(n_buckets)
                .materialize())

    def fingerprint(edges):
        # (count, Σlo, Σhi) of the deduped canonical edge set — equality
        # across a full LS+SS pair is the convergence signal
        n = edges.count()
        return (n, edges.sum("lo") if n else 0, edges.sum("hi") if n else 0)

    prev = fingerprint(edges)
    for _ in range(max_iters):
        edges = round_once(edges, large=True)
        edges = round_once(edges, large=False)
        cur = fingerprint(edges)
        if cur == prev:
            break
        prev = cur

    # at convergence each component is a star (hi → lo=min); labels:
    def labels_from_stars(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("u")["v"].min()
        lbl = np.minimum(m.to_numpy(), m.index.to_numpy())
        return pd.DataFrame({"node": m.index.to_numpy(dtype=np.int64),
                             "label": lbl.astype(np.int64)})

    return (edges.map_batches(adjacency, batch_format="pandas")
            .groupby("__b").map_groups(labels_from_stars,
                                       batch_format="pandas")
            .map_batches(lambda df: df[["node", "label"]],
                         batch_format="pandas"))


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
                             concurrency: int = 4, n_tables: int = 1):
    """cosine ≥ threshold pairs found within hyperplane-LSH buckets.

    ``n_tables`` > 1 runs that many independent hyperplane tables
    (seeds ``seed, seed+1, …``) and unions their pairs (native
    single-key dedup): a pair split by a plane in one table survives
    in another — per-table miss probability is (1-(1-θ/π)^planes),
    multiplied across tables.  One table keeps round-1 behavior.
    """
    def one_table(table_seed: int):
        bucketed = ds.map_batches(
            HyperplaneBucketer,
            fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes,
                                       seed=table_seed, emb_col=emb_col),
            batch_format="pandas", concurrency=actor_pool(concurrency))

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
            return pd.DataFrame({"id_a": ids[iu[0][mask]],
                                 "id_b": ids[iu[1][mask]],
                                 "cosine": sims[iu][mask]})

        return bucketed.groupby("bucket").map_groups(bucket_pairs,
                                                     batch_format="pandas")

    pairs = one_table(seed)
    if n_tables <= 1:
        return pairs
    for t in range(1, n_tables):
        pairs = pairs.union(one_table(seed + t))
    # cosine is identical for every rediscovery of a pair → Min keeps it
    return _dedup_pairs_native(pairs, extra_col="cosine")


def semdedup(ds, centroids: np.ndarray, threshold: float = 0.65,
             emb_col: str = "embedding", id_col: str = "vec_id",
             max_cluster: int = 4096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): within each
    k-means cluster, drop every point whose cosine similarity to an
    already-kept point exceeds ``threshold``; candidates are visited
    centroid-FARTHEST-first (the paper's keep rule — retains
    cluster-edge diversity), ties broken on ``id_col`` so the result
    is deterministic under any block order.

    Scale shape: centroids broadcast via ``ray.put``; assignment is a
    vectorized per-batch matmul; the quadratic pairwise step runs
    per CLUSTER inside ``groupby``/``map_groups`` — never global
    all-pairs.  Hot clusters above ``max_cluster`` are ENFORCED
    bounded: a first cheap pass counts cluster sizes, and oversized
    clusters are sub-split by deterministic random-hyperplane sign
    buckets (seeded per cluster) BEFORE the shuffle, so both the
    quadratic cost and the per-task group memory are capped by
    ``max_cluster`` in expectation, not by the data.  Near-identical
    vectors land in the same sign bucket, so planted near-dups are
    still removed; the (paper-consistent) approximation is that
    moderate-similarity pairs straddling a hyperplane survive.
    Returns a Dataset of (id, cluster, kept)."""
    import ray as _ray
    c = np.asarray(centroids, dtype=np.float64)
    cref = _ray.put(c)

    def assign(df: pd.DataFrame, _ref=cref) -> pd.DataFrame:
        cen = _ray.get(_ref)
        x = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ cen.T)
              + (cen * cen).sum(1)[None, :])
        return pd.DataFrame({id_col: df[id_col].astype("int64"),
                             "cluster": np.argmin(d2, 1).astype("int64"),
                             emb_col: df[emb_col]})

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()

    # pass 1: cluster sizes via per-batch partials (tiny: ≤ k rows
    # each) — Arrow-native on the pruned cluster column so the
    # embedding lists never convert to pandas for this scan
    def size_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["cluster"])
        return pa.table({"cluster": vc.field("values"),
                         "n": vc.field("counts")})

    sizes = (assigned.select_columns(["cluster"])
             .map_batches(size_partial, batch_format="pyarrow")
             .to_pandas().groupby("cluster")["n"].sum())
    hot = {int(cid): min(int(np.ceil(np.log2(n / max_cluster))), 16)
           for cid, n in sizes.items() if n > max_cluster}
    dim = c.shape[1]
    planes = {cid: np.random.default_rng(1_000_003 * (cid + 1))
              .normal(size=(bits, dim)) for cid, bits in hot.items()}
    pref = _ray.put(planes)

    def subkey(df: pd.DataFrame, _p=pref) -> pd.DataFrame:
        pl = _ray.get(_p)
        df = df.copy()
        sub = np.zeros(len(df), dtype=np.int64)
        if pl:
            cl = df["cluster"].to_numpy()
            for cid, hp in pl.items():
                m = cl == cid
                if m.any():
                    x = np.stack(df.loc[m, emb_col].to_numpy()) \
                        .astype(np.float64)
                    signs = (x @ hp.T) > 0
                    sub[m] = signs @ (1 << np.arange(hp.shape[0],
                                                     dtype=np.int64))
        df["__g"] = df["cluster"].to_numpy(dtype=np.int64) * (1 << 16) + sub
        return df

    def dedup_cluster(g: pd.DataFrame, _ref=cref) -> pd.DataFrame:
        cen = _ray.get(_ref)
        cid = int(g["cluster"].iloc[0])
        x = np.stack(g[emb_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        xn = x / n
        cv = cen[cid]
        cv = cv / max(np.linalg.norm(cv), 1e-12)
        simc = xn @ cv
        ids = g[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, simc))        # farthest-from-centroid first
        kept_idx: list = []
        kept = np.zeros(len(g), dtype=bool)
        for i in order:
            if not kept_idx or (xn[kept_idx] @ xn[i]).max() <= threshold:
                kept_idx.append(i)
                kept[i] = True
        out = pd.DataFrame({id_col: ids, "cluster": cid, "kept": kept})
        return out.sort_values(id_col)

    if not hot:
        # nothing oversized — skip the subkey pass, shuffle on the
        # cluster id directly (identical semantics, one fewer scan)
        return assigned.groupby("cluster").map_groups(
            dedup_cluster, batch_format="pandas")
    return (assigned.map_batches(subkey, batch_format="pandas")
            .groupby("__g")
            .map_groups(dedup_cluster, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Edit-distance similarity join (q-gram count filter + vectorized DP)
# ---------------------------------------------------------------------------

def levenshtein_batch(str_a, str_b) -> np.ndarray:
    """Exact Levenshtein distance for n string pairs at once — the DP
    runs VECTORIZED ACROSS PAIRS (one (n × len_b) numpy row per DP
    step), with the sequential in-row dependency
    cur[j] = min(indep[j], cur[j-1]+1) collapsed to a prefix-min:
    cur[j] = j + min(i, min_{k<=j}(indep[k]-k)).  Distances are over
    UTF-8 BYTES (ASCII ⇒ chars), matching DuckDB's levenshtein().

    Cost O(len_a · len_b) vector steps total for the whole batch — no
    per-pair Python.  Intended for post-blocking verify stages where
    keys are short (<=64 B); quadratic in key length by nature."""
    sa = pd.Series(list(str_a), dtype=object).fillna("").str.encode("utf-8")
    sb = pd.Series(list(str_b), dtype=object).fillna("").str.encode("utf-8")
    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = sa.str.len().to_numpy(dtype=np.int64)
    lb = sb.str.len().to_numpy(dtype=np.int64)
    ma, mb = max(int(la.max()), 1), max(int(lb.max()), 1)
    A = np.frombuffer(np.array(sa.to_numpy(), dtype=f"S{ma}").tobytes(),
                      dtype=np.uint8).reshape(n, ma)
    B = np.frombuffer(np.array(sb.to_numpy(), dtype=f"S{mb}").tobytes(),
                      dtype=np.uint8).reshape(n, mb)
    dist = np.zeros(n, dtype=np.int64)
    m0 = la == 0
    dist[m0] = lb[m0]
    jj = np.arange(1, mb + 1, dtype=np.int64)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    for i in range(1, ma + 1):
        cost = (A[:, i - 1, None] != B).astype(np.int64)
        indep = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        run = np.minimum.accumulate(indep - jj, axis=1)
        prev = np.concatenate(
            [np.full((n, 1), i, dtype=np.int64),
             jj + np.minimum(run, i)], axis=1)
        m = la == i
        if m.any():
            dist[m] = prev[m, lb[m]]
    return dist


def edit_distance_pairs(ds, d_max: int = 2, q: int = 3,
                        n_buckets: int = 16,
                        id_col: str = "doc_id", text_col: str = "text"):
    """EXACT edit-distance similarity join → Dataset(id_a, id_b, dist)
    for every unordered pair with levenshtein <= ``d_max``.  No false
    negatives: candidates come from the POSITIONAL q-gram COUNT FILTER
    (Gravano et al., VLDB 2001) — if ed(a,b) <= d then a and b share at
    least max(|a|,|b|) - q + 1 - d*q positional q-grams — then every
    candidate is verified with the vectorized Levenshtein DP.

    Distributed shape (mirrors ngram_jaccard_pairs + Ed-Join prefix
    filtering, Xiao et al. 2008) — ONE gram shuffle end-to-end:

        keys ─gram pass→ (gh, id, m)   gh = q bytes packed into an
             int64 plus an occurrence index (multiset-exact, no string
             hashing); strings too short for the bound to bite
             (m <= q-1+d*q) ALSO emit negative LENGTH-BAND keys
             -(1+m+t), t=0..d — any two such strings within the length
             filter share a band key, so the degenerate regime rides
             the SAME inverted-index join instead of a special path
        ─global gram df (bucketed partials, small-domain table) →
             PREFIX PRUNE: each string indexes only its d*q+1 RAREST
             grams under the global (df, gh) total order — lossless by
             the prefix-filter lemma (required overlap t = max(m)-q+1
             -d*q admits a prefix of |G|-t+1 <= d*q+1 grams), and it
             kills the Σ df² hot-gram blowup a raw inverted index
             suffers on shared-vocabulary corpora (measured 111 s →
             ~8 s at sf0.1); the STRING RIDES WITH ITS PREFIX GRAMS
             (≤ d*q+1 copies of a short key) so the verify needs no
             re-join against the input
        ─ONE shuffle: grams → hash(gh) partitions; inside each
             partition a single vectorized pass emits candidate pairs
             per gram group (triu gather), length-filters
             |m_a-m_b| <= d_max, locally dedups, and DP-verifies with
             the texts already co-resident in the partition
        ─output-bounded pair dedup (verified pairs only — a pair that
             shares prefix grams in several partitions is rediscovered
             once per partition)

    Scale notes: the df table is bounded by the DISTINCT gram domain
    (≤ alphabet^q × max occurrence), not by corpus size, and rides to
    the prune stage as a broadcast small side; candidate volume is
    Σ_gh df_prefix(gh)² over RAREST-gram document frequencies.  Keys
    are expected SHORT (fingerprint prefixes), so 100 TB corpora block
    on ~48-byte keys, not documents; the only post-gram shuffle is the
    verified-output dedup, bounded by |result|.  Byte-oriented: supply
    ASCII/normalized keys (the q-gram bound counts bytes, as does the
    DP)."""
    from .joins import _bucket_of

    if not (1 <= q <= 7):
        raise ValueError("edit_distance_pairs packs q grams into int64: 1<=q<=7")
    cutoff = q - 1 + d_max * q

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").str.encode("utf-8")
        ml = s.str.len().to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        if not len(df):
            return pd.DataFrame({"gh": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "m": pd.Series([], dtype="int64")})
        mx = max(int(ml.max()), q)
        A = np.frombuffer(np.array(s.to_numpy(), dtype=f"S{mx}").tobytes(),
                          dtype=np.uint8).reshape(len(df), mx)
        k = np.maximum(ml - q + 1, 0)
        rows = np.repeat(np.arange(len(df)), k)
        starts = (np.arange(int(k.sum()), dtype=np.int64)
                  - np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k))
        gram = np.zeros(len(rows), dtype=np.int64)
        for t in range(q):
            gram = (gram << 8) | A[rows, starts + t].astype(np.int64)
        occ = (pd.DataFrame({"r": rows, "g": gram})
               .groupby(["r", "g"], sort=False).cumcount()
               .to_numpy(dtype=np.int64))
        out = pd.DataFrame({"gh": (gram << 16) | occ,
                            id_col: ids[rows], "m": ml[rows]})
        sh = np.nonzero(ml <= cutoff)[0]
        if len(sh):
            t = np.tile(np.arange(d_max + 1, dtype=np.int64), len(sh))
            srows = np.repeat(sh, d_max + 1)
            band = pd.DataFrame({"gh": -(1 + ml[srows] + t),
                                 id_col: ids[srows], "m": ml[srows]})
            out = pd.concat([out, band], ignore_index=True)
        return out

    # pass 1: global gram document frequencies — a domain-bounded small
    # table (distinct grams, not corpus rows), reduced from per-batch
    # value_counts partials and broadcast to pass 2 in the task closure
    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["gh"].value_counts()
        return pd.DataFrame({"gh": vc.index.to_numpy(dtype=np.int64),
                             "n": vc.to_numpy(dtype=np.int64)})

    df_map = (ds.map_batches(gram_rows, batch_format="pandas")
              .map_batches(df_partial, batch_format="pandas")
              .to_pandas().groupby("gh")["n"].sum())
    plen = d_max * q + 1

    # pass 2: regenerate grams and keep only each string's plen RAREST
    # under the global (df, gh) order — prune and generation share one
    # batch fn so a string's gram set is never split across blocks.
    # Short strings (m <= cutoff) are exempt: their band keys + full
    # gram set ARE the prefix (required overlap <= 0).  The text rides
    # with each surviving gram row (≤ plen short-key copies) so the
    # verify stage never re-joins against the input, and the partition
    # tag is computed here — pass 2 feeds the ONE shuffle directly.
    def pruned_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = gram_rows(df)
        if not len(g):
            g[text_col] = pd.Series([], dtype=object)
            g["__part"] = pd.Series([], dtype="int64")
            return g
        g = g.assign(__df=g["gh"].map(df_map).fillna(0)
                     .to_numpy(dtype=np.int64))
        short = g["m"].to_numpy() <= cutoff
        pruned = (g[~short].sort_values(["__df", "gh"], kind="mergesort")
                  .groupby(id_col, sort=False).head(plen))
        out = (pd.concat([pruned, g[short]], ignore_index=True)
               .drop(columns="__df"))
        txt = pd.Series(df[text_col].fillna("").to_numpy(),
                        index=df[id_col].to_numpy(dtype=np.int64))
        out[text_col] = txt.reindex(out[id_col].to_numpy()).to_numpy()
        out["__part"] = _bucket_of(out["gh"].to_numpy(), n_buckets)
        return out

    # the one shuffle: gram rows → hash(gh) partitions; each partition
    # holds every (id, m, text) row of its gram groups, so candidate
    # emission, the |m_a-m_b| length filter, local pair dedup and the
    # vectorized DP verify all happen in a single task with no re-join
    def part_verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "dist": pd.Series([], dtype="int64")})
        pairs = pairs_within_groups(g, "gh", id_col=id_col)
        if not len(pairs):
            return empty
        pairs = pairs.drop_duplicates()
        u = g.drop_duplicates(id_col)
        lut = u.set_index(u[id_col].to_numpy(dtype=np.int64))
        ia = pairs["id_a"].to_numpy(dtype=np.int64)
        ib = pairs["id_b"].to_numpy(dtype=np.int64)
        ma = lut["m"].reindex(ia).to_numpy(dtype=np.int64)
        mb = lut["m"].reindex(ib).to_numpy(dtype=np.int64)
        keep = np.abs(ma - mb) <= d_max
        if not keep.any():
            return empty
        ia, ib = ia[keep], ib[keep]
        d = levenshtein_batch(lut[text_col].reindex(ia),
                              lut[text_col].reindex(ib))
        hit = d <= d_max
        return pd.DataFrame({"id_a": ia[hit], "id_b": ib[hit],
                             "dist": d[hit]})

    verified = (ds.map_batches(pruned_rows, batch_format="pandas")
                .groupby("__part")
                .map_groups(part_verify, batch_format="pandas"))

    # a pair that shares prefix grams in several partitions is verified
    # once per partition — dedup the OUTPUT (bounded by |result|, not by
    # candidate volume); dist is identical across rediscoveries
    return _dedup_pairs_native(verified, extra_col="dist",
                               n_buckets=max(n_buckets // 4, 4))
