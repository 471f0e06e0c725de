"""Ray-native AggregateFn wrappers for the mergeable sketches.

These plug the sketch partial+final pattern (strip.rs:127-209 shape)
directly into ``Dataset.aggregate`` / ``groupby().aggregate`` — Ray
accumulates per block, merges associatively, finalizes once:

    ds.aggregate(hll_distinct("user_id"))
    ds.groupby("lang").aggregate(tdigest_quantile("n_chars", 0.5))
    ds.aggregate(score_partials_agg("score"))
"""

from __future__ import annotations

import numpy as np
from ray.data.aggregate import AggregateFn

from .sketches import FixedHistogram, HyperLogLog, TDigest



def _col_numpy(block, col: str) -> np.ndarray:
    """Column values from an Arrow or pandas block → float64 ndarray."""
    vals = block[col]
    if hasattr(vals, "to_pylist"):            # pyarrow
        return np.asarray(vals.to_pylist(), dtype=np.float64)
    return np.asarray(vals, dtype=np.float64)  # pandas Series / ndarray


def hll_distinct(col: str, alias: str | None = None) -> AggregateFn:
    """Approximate COUNT(DISTINCT col) via HyperLogLog registers.

    The accumulator travels as BYTES (serialized registers), not a
    Python object: ``groupby().aggregate`` stores accumulators in
    Arrow blocks between the map and reduce stages, and a bytes column
    stays Arrow-native where an object column would force a
    conversion-error fallback."""

    def accumulate_block(acc: bytes, block) -> bytes:
        vals = block[col]
        if hasattr(vals, "to_pylist"):
            vals = vals.to_pylist()
        else:
            vals = list(vals)
        hll = HyperLogLog.from_bytes(acc) if acc else HyperLogLog()
        return hll.add([str(v) for v in vals]).to_bytes()

    def merge(a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return (HyperLogLog.from_bytes(a)
                .merge(HyperLogLog.from_bytes(b)).to_bytes())

    return AggregateFn(
        init=lambda k: b"",
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=lambda acc: float(
            round(HyperLogLog.from_bytes(acc).estimate())) if acc else 0.0,
        name=alias or f"hll_distinct({col})",
    )


def tdigest_quantile(col: str, q: float, alias: str | None = None,
                     compression: float = 100.0) -> AggregateFn:
    """Approximate quantile via merging t-digest.  Accumulators travel
    as pickled BYTES (see hll_distinct) so ``groupby().aggregate``
    keeps them in Arrow blocks between map and reduce."""
    import pickle

    def _load(acc: bytes) -> TDigest:
        if not acc:
            return TDigest(compression)
        means, weights = pickle.loads(acc)
        return TDigest(compression, means, weights)

    def _dump(td: TDigest) -> bytes:
        return pickle.dumps((td.means, td.weights), protocol=4)

    def accumulate_block(acc: bytes, block) -> bytes:
        return _dump(_load(acc).add(_col_numpy(block, col)))

    def merge(a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return _dump(_load(a).merge(_load(b)))

    return AggregateFn(
        init=lambda k: b"",
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=lambda acc: float(_load(acc).quantile(q)),
        name=alias or f"p{int(q * 100)}({col})",
    )


def histogram_agg(col: str, lo: float, hi: float, n_bins: int = 64,
                  alias: str | None = None) -> AggregateFn:
    """Fixed-bin histogram partials → serialized dict (drift input).
    Bytes accumulator (see hll_distinct) so per-group use stays
    Arrow-native."""
    import pickle

    def _load(acc: bytes) -> FixedHistogram:
        if not acc:
            return FixedHistogram(lo, hi, n_bins)
        return pickle.loads(acc)

    def accumulate_block(acc: bytes, block) -> bytes:
        return pickle.dumps(_load(acc).add(_col_numpy(block, col)),
                            protocol=4)

    def merge(a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return pickle.dumps(_load(a).merge(_load(b)), protocol=4)

    return AggregateFn(
        init=lambda k: b"",
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=lambda acc: _load(acc).to_dict(),
        name=alias or f"hist({col})",
    )


def score_partials_agg(col: str, alias: str | None = None) -> AggregateFn:
    """StripReducer-shaped score aggregation: {max, Σp3, Σp6, Σp12, n}
    merged associatively → (max_norm, pnorm_3) — the distributed analog
    of compute_score_from_diffmap (diff.rs:485-548)."""

    def accumulate_block(acc: dict, block) -> dict:
        d = _col_numpy(block, col)
        d = d[np.isfinite(d)]
        d3 = d * d * d
        d6 = d3 * d3
        return {"max": max(acc["max"], float(d.max()) if d.size else 0.0),
                "sum_p3": acc["sum_p3"] + float(d3.sum()),
                "sum_p6": acc["sum_p6"] + float(d6.sum()),
                "sum_p12": acc["sum_p12"] + float((d6 * d6).sum()),
                "pixels": acc["pixels"] + int(d.size)}

    def merge(a: dict, b: dict) -> dict:
        return {"max": max(a["max"], b["max"]),
                "sum_p3": a["sum_p3"] + b["sum_p3"],
                "sum_p6": a["sum_p6"] + b["sum_p6"],
                "sum_p12": a["sum_p12"] + b["sum_p12"],
                "pixels": a["pixels"] + b["pixels"]}

    def finalize(p: dict) -> dict:
        if p["pixels"] == 0:
            return {"max_norm": 0.0, "pnorm_3": 0.0}
        inv = 1.0 / p["pixels"]
        pn = ((inv * p["sum_p3"]) ** (1 / 3) + (inv * p["sum_p6"]) ** (1 / 6)
              + (inv * p["sum_p12"]) ** (1 / 12)) / 3.0
        return {"max_norm": p["max"], "pnorm_3": pn}

    return AggregateFn(
        init=lambda k: {"max": 0.0, "sum_p3": 0.0, "sum_p6": 0.0,
                        "sum_p12": 0.0, "pixels": 0},
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=finalize,
        name=alias or f"score_partials({col})",
    )


def heavy_hitters(col: str, k: int = 10, capacity: int = 256,
                  alias: str | None = None) -> AggregateFn:
    """Approximate top-k frequent values via a mergeable Misra-Gries
    summary (guaranteed to contain every item with frequency >
    N/(capacity+1); counts are lower bounds).  Finalizes to a list of
    (item, count) pairs, count-desc."""
    import pickle

    from .sketches import MisraGries

    def _load(acc: bytes) -> MisraGries:
        return pickle.loads(acc) if acc else MisraGries(capacity)

    def accumulate_block(acc: bytes, block) -> bytes:
        import pandas as pd
        vals = block[col]
        if hasattr(vals, "to_pylist"):
            vals = vals.to_pylist()
        vc = pd.Series(list(vals)).value_counts()
        return pickle.dumps(
            _load(acc).add_counts(vc.index.tolist(), vc.to_numpy()),
            protocol=4)

    def merge(a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return pickle.dumps(_load(a).merge(_load(b)), protocol=4)

    def finalize(acc: bytes) -> str:
        import json
        # JSON string, not a list of tuples: finalized values land in
        # Arrow blocks too, and a nested Python list would force an
        # ArrowConversionError fallback at the reduce stage
        return json.dumps([[str(i), int(c)] for i, c in _load(acc).top(k)])

    return AggregateFn(
        init=lambda key: b"",
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=finalize,
        name=alias or f"top{k}({col})",
    )
