"""Mergeable sketches for distributed column statistics.

All sketches follow the StripReducer shape
(/root/reference/butteraugli/src/strip.rs:127-209): a small partial
state produced per block/partition, an associative+commutative
``merge``, and a cheap ``finalize`` — so a corpus-wide statistic ships
only sketch bytes through the shuffle, never rows.

- HyperLogLog (p=12, 4096 registers): doc_id uniqueness estimate,
  ~1.04/√m ≈ 1.6% standard error.
- TDigest (merging variant, Dunning & Ertl): score quantiles.
- FixedHistogram: fixed-bin counts → KS / PSI drift vs a baseline.

Hashing is vectorized via polars' 64-bit row hash.
"""

from __future__ import annotations

import numpy as np


def polars_ready():
    """Import polars and wait until it is FULLY initialized.

    polars populates its namespace during module exec, and Ray Data's
    own sort path imports it concurrently inside the same worker
    process — a UDF thread can observe the half-initialized module and
    crash with ``AttributeError: module 'polars' has no attribute
    'Series'`` (seen intermittently under the full test suite).  The
    attribute probe below returns only once the racing import has
    finished; the retry budget is far above any real import time."""
    import time
    import polars as pl
    for _ in range(500):
        if hasattr(pl, "Series") and hasattr(pl, "from_arrow"):
            return pl
        time.sleep(0.01)
    return pl


def hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of a string/number sequence → uint64."""
    pl = polars_ready()
    s = pl.Series("v", values)
    return s.hash(seed=seed).to_numpy().astype(np.uint64)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HyperLogLog:
    P = 12
    M = 1 << P

    def __init__(self, registers: np.ndarray | None = None):
        self.registers = (registers if registers is not None
                          else np.zeros(self.M, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        idx = (h >> np.uint64(64 - self.P)).astype(np.int64)
        rest = (h << np.uint64(self.P)) | np.uint64(1 << (self.P - 1))
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        # count leading zeros via float log2 trick is lossy; do 6-step binary
        shift = 32
        acc = np.zeros(len(h), dtype=np.uint64)
        while shift:
            mask = (cur >> np.uint64(64 - shift)) == 0
            acc = np.where(mask, acc + np.uint64(shift), acc)
            cur = np.where(mask, cur << np.uint64(shift), cur)
            shift //= 2
        lz = acc.astype(np.uint8) + 1
        np.maximum.at(self.registers, idx, lz)
        return self

    def add(self, values, seed: int = 0) -> "HyperLogLog":
        return self.add_hashes(hash64(values, seed))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        reg = self.registers.astype(np.float64)
        est = alpha * m * m / np.sum(2.0 ** (-reg))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        return cls(np.frombuffer(b, dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# t-digest (merging variant)
# ---------------------------------------------------------------------------

class TDigest:
    """Compact merging t-digest with the k1 scale function."""

    def __init__(self, compression: float = 100.0, means=None, weights=None):
        self.compression = compression
        self.means = np.asarray(means, dtype=np.float64) if means is not None else np.empty(0)
        self.weights = np.asarray(weights, dtype=np.float64) if weights is not None else np.empty(0)

    def add(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[np.isfinite(values)]
        if len(values) == 0:
            return self
        means = np.concatenate([self.means, values])
        weights = np.concatenate([self.weights, np.ones(len(values))])
        self.means, self.weights = self._compress(means, weights)
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        m, w = self._compress(means, weights)
        return TDigest(self.compression, m, w)

    def _compress(self, means, weights):
        if len(means) == 0:
            return means, weights
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        q0 = 0.0
        c = self.compression
        for i in range(1, len(means)):
            q = q0 + (cur_w + weights[i]) / total
            # k1 scale bound
            k0 = _k1(q0, c)
            k1v = _k1(min(q, 1.0), c)
            if k1v - k0 <= 1.0:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        return np.array(out_m), np.array(out_w)

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        target = q * total
        return float(np.interp(target, cum, self.means))

    def to_dict(self) -> dict:
        return {"compression": self.compression,
                "means": self.means.tolist(), "weights": self.weights.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        return cls(d["compression"], d["means"], d["weights"])


def _k1(q: float, compression: float) -> float:
    q = min(max(q, 1e-12), 1.0 - 1e-12)
    return compression / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)


# ---------------------------------------------------------------------------
# Fixed-bin histogram + drift metrics
# ---------------------------------------------------------------------------

class FixedHistogram:
    def __init__(self, lo: float, hi: float, n_bins: int = 64,
                 counts: np.ndarray | None = None,
                 n_under: int = 0, n_over: int = 0):
        self.lo, self.hi, self.n_bins = float(lo), float(hi), int(n_bins)
        self.counts = (counts if counts is not None
                       else np.zeros(n_bins, dtype=np.int64))
        self.n_under, self.n_over = int(n_under), int(n_over)

    def add(self, values: np.ndarray) -> "FixedHistogram":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        self.n_under += int((v < self.lo).sum())
        self.n_over += int((v >= self.hi).sum())
        inb = v[(v >= self.lo) & (v < self.hi)]
        idx = ((inb - self.lo) / (self.hi - self.lo) * self.n_bins).astype(np.int64)
        np.add.at(self.counts, np.clip(idx, 0, self.n_bins - 1), 1)
        return self

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        assert (self.lo, self.hi, self.n_bins) == (other.lo, other.hi, other.n_bins)
        return FixedHistogram(self.lo, self.hi, self.n_bins,
                              self.counts + other.counts,
                              self.n_under + other.n_under,
                              self.n_over + other.n_over)

    def total(self) -> int:
        return int(self.counts.sum()) + self.n_under + self.n_over

    def to_dict(self) -> dict:
        return {"lo": self.lo, "hi": self.hi, "n_bins": self.n_bins,
                "counts": self.counts.tolist(),
                "n_under": self.n_under, "n_over": self.n_over}

    @classmethod
    def from_dict(cls, d: dict) -> "FixedHistogram":
        return cls(d["lo"], d["hi"], d["n_bins"],
                   np.array(d["counts"], dtype=np.int64),
                   d["n_under"], d["n_over"])


def ks_statistic(a: FixedHistogram, b: FixedHistogram) -> float:
    """Two-sample KS statistic approximated on the shared fixed bins."""
    ca = np.concatenate([[a.n_under], a.counts, [a.n_over]]).astype(np.float64)
    cb = np.concatenate([[b.n_under], b.counts, [b.n_over]]).astype(np.float64)
    ta, tb = ca.sum(), cb.sum()
    if ta == 0 or tb == 0:
        return float("nan")
    return float(np.abs(np.cumsum(ca) / ta - np.cumsum(cb) / tb).max())


def psi(expected: FixedHistogram, actual: FixedHistogram,
        eps: float = 1e-6) -> float:
    """Population Stability Index over the shared fixed bins."""
    ce = np.concatenate([[expected.n_under], expected.counts, [expected.n_over]]).astype(np.float64)
    ca = np.concatenate([[actual.n_under], actual.counts, [actual.n_over]]).astype(np.float64)
    te, ta = ce.sum(), ca.sum()
    if te == 0 or ta == 0:
        return float("nan")
    pe = np.maximum(ce / te, eps)
    pa_ = np.maximum(ca / ta, eps)
    return float(np.sum((pa_ - pe) * np.log(pa_ / pe)))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (frequent items)
# ---------------------------------------------------------------------------

class MisraGries:
    """Mergeable Misra-Gries frequent-items summary with ``capacity``
    counters: every item with true frequency > N/(capacity+1) is
    guaranteed present, and each kept count undercounts by at most
    N/(capacity+1) (Agarwal et al., "Mergeable Summaries", PODS'12
    merge rule: add counters, then subtract the (capacity+1)-th largest
    and drop non-positive).  Partial per block, associative merge,
    finalize = top-k — the shuffle ships ≤ ``capacity`` (item, count)
    pairs per partition, never rows."""

    def __init__(self, capacity: int = 256, counters: dict | None = None):
        self.capacity = int(capacity)
        self.counters: dict = counters if counters is not None else {}

    def add_counts(self, items, counts) -> "MisraGries":
        """Bulk-add pre-aggregated (item, count) pairs — call with the
        output of a vectorized per-batch value_counts."""
        c = self.counters
        for it, n in zip(items, counts):
            c[it] = c.get(it, 0) + int(n)
        self._shrink()
        return self

    def add(self, values) -> "MisraGries":
        import pandas as pd
        vc = pd.Series(values).value_counts()
        return self.add_counts(vc.index.tolist(), vc.to_numpy())

    def _shrink(self) -> None:
        c = self.counters
        if len(c) <= self.capacity:
            return
        # subtract the (capacity+1)-th largest count from everyone and
        # drop non-positive — one decrement batch, exact MG semantics
        counts = sorted(c.values(), reverse=True)
        dec = counts[self.capacity]
        self.counters = {k: v - dec for k, v in c.items() if v - dec > 0}

    def merge(self, other: "MisraGries") -> "MisraGries":
        c = dict(self.counters)
        for k, v in other.counters.items():
            c[k] = c.get(k, 0) + v
        out = MisraGries(self.capacity, c)
        out._shrink()
        return out

    def top(self, k: int) -> list[tuple]:
        """Top-k (item, lower-bound count), count-desc then item-asc for
        determinism."""
        return sorted(self.counters.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

class CountMinSketch:
    """Frequency sketch: k independent hash rows × width w of int64
    counters; estimate(x) = min over rows (always ≥ true count; error
    ≤ e·N/w with prob 1−e^−k).  Row hashes are md5-derived
    (``md5_number_lower(f"{row}:{value}") % w``) so BOTH the counters
    and the per-key estimates are bit-reproducible in DuckDB — the CMS
    estimate itself carries a full SQL oracle, like md5_bucket /
    fingerprint_md5.  Counters are a flat int64 buffer → bytes
    accumulator, Arrow-native through any groupby shuffle (the
    HLL/t-digest convention in rayaggs.py)."""

    def __init__(self, k: int = 4, w: int = 512,
                 counts: np.ndarray | None = None):
        self.k, self.w = int(k), int(w)
        self.counts = (counts if counts is not None
                       else np.zeros((k, w), dtype=np.int64))

    @staticmethod
    def _buckets(values, k: int, w: int) -> np.ndarray:
        """[len(values), k] md5 row-buckets; md5 runs once per UNIQUE
        (row, value) — vocab-bounded like md5_bucket."""
        import pandas as pd

        from .text import md5_bucket
        s = pd.Series(values, dtype=object).astype(str)
        out = np.empty((len(s), k), dtype=np.int64)
        for j in range(k):
            out[:, j] = md5_bucket(str(j) + ":" + s, w)
        return out

    def add_counts(self, values, counts) -> "CountMinSketch":
        c = np.asarray(counts, dtype=np.int64)
        if not len(c):
            return self
        b = self._buckets(values, self.k, self.w)
        for j in range(self.k):                   # k is tiny (4-8)
            np.add.at(self.counts[j], b[:, j], c)
        return self

    def estimate(self, values) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=np.int64)
        b = self._buckets(values, self.k, self.w)
        per_row = np.stack([self.counts[j, b[:, j]] for j in range(self.k)])
        return per_row.min(axis=0).astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.k, self.w) == (other.k, other.w)
        return CountMinSketch(self.k, self.w, self.counts + other.counts)

    def to_bytes(self) -> bytes:
        return (np.array([self.k, self.w], dtype=np.int64).tobytes()
                + self.counts.tobytes())

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CountMinSketch":
        k, w = np.frombuffer(raw[:16], dtype=np.int64)
        counts = np.frombuffer(raw[16:], dtype=np.int64).reshape(
            int(k), int(w)).copy()
        return cls(int(k), int(w), counts)
