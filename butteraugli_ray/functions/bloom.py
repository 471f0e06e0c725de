"""Distributed Bloom-filter membership: semi/anti joins that never
shuffle the big side.

The 100 TB pattern: a Bloom filter over the SMALL side's keys is a
fixed-size bitmap (``m`` bits for a target false-positive rate),
regardless of how many rows the big side has.  Build it with one pass
of per-block partial bitmaps OR-reduced together, ``ray.put`` it once,
and filter the big side inside ``map_batches`` — zero shuffle of the
big side.  Because Bloom filters have false positives (never false
negatives), exactness is restored by verifying only the small
"maybe-member" fraction with a bucketed hash semi/anti join:

  semi join:  keep = verify(maybe)                  (non-members never
                                                     leave their block)
  anti join:  keep = definite-non-members ∪ anti-verify(maybe)

Reference analog: the reference filters candidate work the same
keep-only-what-might-match way (butteraugli/src/diff.rs:700-763 scale
gating); here the filter is membership rather than perceptual scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(v: np.ndarray, c: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(33))) * c
        return v ^ (v >> np.uint64(29))


def _as_u64(values) -> np.ndarray:
    """Canonicalize key values to uint64 (strings via hash64)."""
    values = np.asarray(values)
    if values.dtype == object:
        try:
            values = values.astype(np.int64)
        except (TypeError, ValueError, OverflowError):
            from .sketches import hash64
            return hash64(list(values))
    if np.issubdtype(values.dtype, np.integer):
        return values.astype(np.uint64)
    from .sketches import hash64
    return hash64([str(v) for v in values])


class BloomFilter:
    """Fixed-size Bloom filter with vectorized add/contains.

    ``k`` probe positions come from double hashing (h1 + i*h2) mod m —
    the standard Kirsch–Mitzenmacher construction, so only two 64-bit
    mixes per value regardless of k."""

    def __init__(self, m_bits: int, k: int):
        if m_bits <= 0 or k <= 0:
            raise ValueError("m_bits and k must be positive")
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, n_expected: int, fpr: float = 0.01) -> "BloomFilter":
        """m = -n·ln p / ln²2 bits, k = (m/n)·ln 2 (textbook optimum)."""
        n = max(int(n_expected), 1)
        m = max(int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))), 8)
        k = max(int(round((m / n) * math.log(2))), 1)
        return cls(m, k)

    def _positions(self, values) -> np.ndarray:
        """[len(values), k] bit positions."""
        v = _as_u64(values)
        h1 = _mix(v, _MIX1)
        h2 = _mix(v, _MIX2) | np.uint64(1)          # odd → full period
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None])
                    % np.uint64(self.m)).astype(np.int64)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m, other.k) != (self.m, self.k):
            raise ValueError("cannot merge differently-sized blooms")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds, key: str, n_expected: int | None = None,
                fpr: float = 0.01) -> BloomFilter:
    """One pass over ``ds``: per-block partial bitmaps, OR-reduced.

    Each block contributes one fixed-size bitmap row (m/8 bytes), so
    the reduce input is #blocks × m/8 — independent of row count.  With
    fpr=1% a 10⁸-key side is ~120 MB; the OR-reduce is associative and
    could tree-reduce across nodes, here a driver loop suffices."""
    if n_expected is None:
        n_expected = ds.count()
    proto = BloomFilter.sized(n_expected, fpr)
    m, k = proto.m, proto.k

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = BloomFilter(m, k)
        b.add(df[key].to_numpy())
        return pd.DataFrame({"bits": [b.bits.tobytes()]})

    out = BloomFilter(m, k)
    for batch in (ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=256)):
        for raw in batch["bits"]:
            np.bitwise_or(out.bits, np.frombuffer(raw, dtype=np.uint8),
                          out=out.bits)
    return out


def _distinct_keys(small_ds, key: str):
    def proj(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key]].drop_duplicates(key)
    return small_ds.map_batches(proj, batch_format="pandas")


def bloom_semi_join(big_ds, small_ds, key: str, fpr: float = 0.01,
                    n_buckets: int | None = None, exact: bool = True):
    """EXACT semi join: rows of ``big_ds`` whose ``key`` appears in
    ``small_ds`` — bloom prefilter on the big side (no shuffle), then a
    bucketed hash semi join of only the surviving maybe-members.

    ``exact=False`` skips the verify shuffle and returns the bloom
    survivors directly (up to ``fpr`` false positives) — the cheap mode
    when a downstream stage re-checks membership anyway."""
    import ray as _ray
    bloom_ref = _ray.put(build_bloom(small_ds, key, fpr=fpr))

    def prefilter(df: pd.DataFrame, _ref=bloom_ref) -> pd.DataFrame:
        b = _ray.get(_ref)
        return df[b.contains(df[key].to_numpy())]

    maybe = big_ds.map_batches(prefilter, batch_format="pandas")
    if not exact:
        return maybe
    from .joins import hash_join
    if n_buckets is None:
        from .dedup import _auto_buckets
        maybe = maybe.materialize()
        n_buckets = _auto_buckets(maybe.count())
    return hash_join(maybe, _distinct_keys(small_ds, key), key,
                     n_buckets=n_buckets)


def bloom_anti_join(big_ds, small_ds, key: str, fpr: float = 0.01,
                    n_buckets: int | None = None):
    """EXACT anti join: rows of ``big_ds`` whose ``key`` does NOT
    appear in ``small_ds``.

    No-false-negative property ⇒ a row outside the bloom is DEFINITELY
    absent from the small side and is kept without ever leaving its
    block; only the ~fpr maybe-member fraction takes the bucketed
    anti-verify shuffle.  At 100 TB that shrinks the shuffled volume by
    1/fpr (100× at the 1% default)."""
    import ray as _ray
    bloom_ref = _ray.put(build_bloom(small_ds, key, fpr=fpr))

    def split(keep_definite: bool):
        def fn(df: pd.DataFrame, _ref=bloom_ref) -> pd.DataFrame:
            b = _ray.get(_ref)
            m = b.contains(df[key].to_numpy())
            return df[~m] if keep_definite else df[m]
        return fn

    definite = big_ds.map_batches(split(True), batch_format="pandas")
    maybe = big_ds.map_batches(split(False), batch_format="pandas")
    if n_buckets is None:
        from .dedup import _auto_buckets
        maybe = maybe.materialize()
        n_buckets = _auto_buckets(maybe.count())

    # bucketed anti-verify of the maybe rows (probe/build tagged union;
    # sentinel flag column, never null-padding — int64 columns survive)
    from .joins import _bucket_of

    def tag(side_flag: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = np.int64(side_flag)
            df["__b"] = _bucket_of(df[key].to_numpy(), n_buckets)
            return df
        return fn

    probe = maybe.map_batches(tag(0), batch_format="pandas")
    build = _distinct_keys(small_ds, key).map_batches(
        tag(1), batch_format="pandas")

    import pyarrow as pa
    pschema = probe.schema()
    pcols = [c for c in (pschema.names if pschema else [])
             if not c.startswith("__")]
    # dtype-aware sentinels so the union keeps each column's type
    # (filling 0 into a string column — or None into int64 — would
    # promote the whole column on union)
    def _sentinel(typ):
        if isinstance(typ, pa.DataType):
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                return ""
            if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
                return b""
            if pa.types.is_floating(typ):
                return 0.0
            if pa.types.is_boolean(typ):
                return False
            return 0
        # pandas-block schema: numpy dtypes / python classes
        try:
            d = np.dtype(typ)
        except TypeError:
            return ""
        if d.kind in ("O", "U", "S"):
            return ""
        if d.kind == "f":
            return 0.0
        if d.kind == "b":
            return False
        return 0

    fills = {}
    if pschema is not None:
        for name, typ in zip(pschema.names, pschema.types):
            if not name.startswith("__"):
                fills[name] = _sentinel(typ)

    def pad(df: pd.DataFrame) -> pd.DataFrame:
        for c in pcols:
            if c not in df.columns:
                df[c] = fills.get(c, 0)
        return df[pcols + ["__side", "__b"]]

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        side = df["__side"].to_numpy(dtype=np.int64)
        present = set(df.loc[side == 1, key])
        p = df[side == 0]
        return p[~p[key].isin(present)][pcols]

    verified = (probe.map_batches(pad, batch_format="pandas")
                .union(build.map_batches(pad, batch_format="pandas"))
                .groupby("__b").map_groups(anti, batch_format="pandas"))
    # definite non-members never left their block; verified survivors of
    # the maybe fraction rejoin them here
    return definite.map_batches(lambda df: df[pcols],
                                batch_format="pandas").union(verified)
