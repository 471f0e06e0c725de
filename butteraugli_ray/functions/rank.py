"""Exact global window ranking via range partitioning.

``ORDER BY`` window functions (rank, row_number, NTILE) need a total
order — but a naive global sort materializes the whole dataset through
one all-to-all exchange.  The range-partition form keeps it to ONE
bucketed shuffle plus tiny metadata:

  1. per-block t-digest partials → driver merge → B-1 boundary values.
     Boundaries only affect BALANCE, never correctness: any increasing
     cut points give exact ranks, so the approximate digest is fine.
  2. each row tags its range bucket (vectorized searchsorted on the
     order column — equal values never split across buckets).
  3. native per-bucket counts → cumulative offsets on the driver
     (B rows of metadata, independent of data size).
  4. per-bucket sort by (col, tiebreak): global rank = bucket offset +
     local position.  One map_groups call per BUCKET (bounded B), not
     per key — the scale-safe granularity.

Reference analog: the reference's strip walker tiles a global
computation into bounded-memory ranges the same way
(butteraugli/src/strip.rs:583-905); here the range is over a sort key
rather than image rows.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd


def ntile_of(rank: np.ndarray, n_rows: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based ranks: the first ``n_rows % k`` tiles
    hold ``n_rows // k + 1`` rows, the rest ``n_rows // k``."""
    rank = np.asarray(rank, dtype=np.int64)
    size = n_rows // k
    rem = n_rows % k
    cut = rem * (size + 1)
    small = np.maximum(size, 1)                      # guard N < k
    return np.where(rank <= cut,
                    (rank - 1) // (size + 1) + 1,
                    rem + (rank - cut - 1) // small + 1).astype(np.int64)


def _range_bucketize(ds, col: str, n_buckets: int | None):
    """Shared skeleton: t-digest boundaries over ``col`` (balance only)
    → materialized dataset with an ``__rb`` range-bucket tag.  Equal
    values always share a bucket."""
    from ..functions.sketches import TDigest
    from .dedup import _auto_buckets

    src = ds.materialize()
    n_rows = src.count()
    if n_rows == 0:
        return src, 0
    if n_buckets is None:
        n_buckets = _auto_buckets(n_rows)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        td = TDigest().add(df[col].to_numpy(dtype=np.float64))
        return pd.DataFrame({"td": [json.dumps(td.to_dict())]})

    merged = TDigest()
    for b in (src.map_batches(partial, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=4096)):
        for s in b["td"]:
            merged = merged.merge(TDigest.from_dict(json.loads(s)))
    bounds = np.unique(np.array(
        [merged.quantile(i / n_buckets) for i in range(1, n_buckets)],
        dtype=np.float64))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rb"] = np.searchsorted(
            bounds, df[col].to_numpy(dtype=np.float64),
            side="right").astype(np.int64)
        return df

    return src.map_batches(tag, batch_format="pandas").materialize(), n_rows


def _bucket_offsets(tagged) -> dict:
    """Per-bucket cumulative row offsets WITHOUT Ray's sort-based
    groupby: per-batch ``__rb`` value_counts partials (≤ n_buckets
    rows each) reduce on the driver — the native
    ``groupby('__rb').count()`` this replaces SORTED the whole dataset
    just to count 64 buckets (measured ~40% of spearman_corr's wall at
    sf0.1)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["__rb"].value_counts()
        return pd.DataFrame({"__rb": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    parts = (tagged.map_batches(partial, batch_format="pandas")
             .to_pandas())
    counts = (parts.groupby("__rb", as_index=False)["n"].sum()
              .sort_values("__rb"))
    return dict(zip(
        counts["__rb"].to_numpy(dtype=np.int64),
        np.concatenate([[0], np.cumsum(
            counts["n"].to_numpy(dtype=np.int64))[:-1]])))


def range_partition_rank(ds, col: str, tiebreak: str,
                         n_buckets: int | None = None,
                         out_col: str = "rank"):
    """Add an EXACT 1-based global rank by ``(col, tiebreak)`` to every
    row of ``ds`` → (Dataset with ``out_col`` int64, total row count).

    ``tiebreak`` must be unique per row (a key column) so the order —
    and therefore the rank — is total and deterministic."""
    tagged, n_rows = _range_bucketize(ds, col, n_buckets)
    if n_rows == 0:
        return tagged, 0

    # per-bucket counts → cumulative offsets (tiny driver metadata)
    offsets = _bucket_offsets(tagged)

    # in-bucket sort → rank = offset + local position
    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        df = df.sort_values([col, tiebreak]).drop(columns="__rb")
        df[out_col] = offsets[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    ranked = tagged.groupby("__rb").map_groups(rank_bucket,
                                               batch_format="pandas")
    return ranked, n_rows


def range_partition_avg_rank(ds, col: str, n_buckets: int | None = None,
                             out_col: str = "avg_rank",
                             tie_col: str = "__tie_part"):
    """Attach the EXACT tie-averaged global rank of ``col`` to every
    row → (Dataset, total row count).  This is the rank Spearman /
    Mann-Whitney need: rows with equal values share the MEAN of the
    ordinal positions they'd occupy (SQL's
    ``RANK() + (COUNT(*) OVER (PARTITION BY col) - 1) / 2.0``).

    Exactness argument: ``_range_bucketize`` applies unique t-digest
    boundaries with ``side='right'``, so equal values never straddle
    range buckets — an in-bucket tie group IS the global tie group and
    avg rank = bucket offset + mean in-bucket position.  ``tie_col``
    carries each bucket's Σ(t³−t) tie-correction partial on its first
    row (0 elsewhere) so rank-test variances reduce in the same
    downstream pass instead of a second shuffle."""
    tagged, n_rows = _range_bucketize(ds, col, n_buckets)
    if n_rows == 0:
        return tagged, 0

    offsets = _bucket_offsets(tagged)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        df = df.sort_values(col).drop(columns="__rb")
        pos = pd.Series(
            offsets[b] + np.arange(1, len(df) + 1, dtype=np.float64),
            index=df.index)
        df[out_col] = pos.groupby(df[col]).transform("mean")
        t = df[col].value_counts().to_numpy(dtype=np.float64)
        tp = np.zeros(len(df), dtype=np.float64)
        tp[0] = float((t ** 3 - t).sum())
        df[tie_col] = tp
        return df

    ranked = tagged.groupby("__rb").map_groups(rank_bucket,
                                               batch_format="pandas")
    return ranked, n_rows


def range_partition_rank_reduce(ds, col: str, reducer,
                                n_buckets: int | None = None):
    """Tie-averaged global ranks REDUCED per bucket instead of
    attached per row → (partials DataFrame, n_rows).

    ``reducer(df, avg_rank, tie_sum, n_rows)`` receives each bucket's
    rows (sorted by ``col``, ``__rb`` dropped), their EXACT global
    tie-averaged ranks, the bucket's Σ(t³−t) tie partial and the total
    row count, and returns a SMALL partial DataFrame.  One shuffle
    total (the rank map_groups) — rank statistics that never need
    per-row ranks downstream (Spearman, Mann-Whitney) skip
    ``range_partition_avg_rank``'s full ranked dataset and the second
    combiner pass over it (measured: spearman_corr 14.0 s → one-shuffle
    shape at sf0.1/32)."""
    tagged, n_rows = _range_bucketize(ds, col, n_buckets)
    if n_rows == 0:
        return pd.DataFrame(), 0
    offsets = _bucket_offsets(tagged)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        df = df.sort_values(col).drop(columns="__rb")
        pos = pd.Series(
            offsets[b] + np.arange(1, len(df) + 1, dtype=np.float64),
            index=df.index)
        ar = pos.groupby(df[col]).transform("mean").to_numpy(np.float64)
        t = df[col].value_counts().to_numpy(dtype=np.float64)
        return reducer(df, ar, float((t ** 3 - t).sum()), n_rows)

    parts = (tagged.groupby("__rb")
             .map_groups(bucket, batch_format="pandas").to_pandas())
    return parts, n_rows


def grouped_quantile_exact(ds, key: str, col: str, q: float = 0.5,
                           n_bins: int = 512,
                           collect_cap: int = 65536,
                           max_rounds: int = 8) -> pd.DataFrame:
    """EXACT per-group quantile (``quantile_cont`` interpolation — the
    pandas/DuckDB contract: rank h=(n-1)·q, v = v₁+(h-⌊h⌋)·(v₂-v₁)) of
    a continuous column without ever materializing a whole key group in
    one task (the distributed selection / histogram-refinement
    algorithm).

    Passes (each a streaming ``map_batches`` whose partials are bounded
    by groups × bins, never by rows):

      1. per-group (count, min, max) partials → driver merge → the two
         median ranks (pandas/DuckDB interpolation contract).
      2. ≤ ``max_rounds`` refinement passes: per-group fixed-bin counts
         of the active value range; the driver walks the cumulative
         counts and shrinks the range to the bins containing the target
         ranks (each round divides the candidate count by ~``n_bins``;
         the below-range rank offset is RE-MEASURED each round so float
         edge rounding can never miscount).
      3. final pass: (value, count) pairs inside the residual range —
         bounded by DISTINCT values there (≤ candidate count, and ties
         collapse), walked on the driver exactly like the
         q_quality_percentile histogram.

    Groups already ≤ ``collect_cap`` skip straight to pass 3.  A group
    whose candidate range stops shrinking (massive ties) also falls
    through to pass 3, where the tie collapse bounds the collect."""
    src = ds.materialize()                   # 2-4 passes over the data

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col]].dropna()
        if not len(d):
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 "n": pd.Series([], dtype="int64"),
                                 "lo": pd.Series([], dtype="float64"),
                                 "hi": pd.Series([], dtype="float64")})
        return d.groupby(key, as_index=False).agg(
            n=(col, "size"), lo=(col, "min"), hi=(col, "max"))

    parts = src.map_batches(stats_partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "quantile": pd.Series([], dtype="float64")})
    stats = parts.groupby(key, as_index=False).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    state: dict = {}
    for _, r in stats.iterrows():
        n = int(r["n"])
        h = (n - 1) * q                       # 0-indexed continuous rank
        k1 = int(np.floor(h))
        k2 = int(np.ceil(h))
        state[r[key]] = {"lo": float(r["lo"]), "hi": float(r["hi"]),
                         "k1": k1, "k2": k2, "w": h - k1, "n_range": n}

    def _relax(x: float, up: bool) -> float:
        for _ in range(4):                    # few ulps of safety margin
            x = np.nextafter(x, np.inf if up else -np.inf)
        return float(x)

    for _ in range(max_rounds):
        active = {k: (s["lo"], s["hi"]) for k, s in state.items()
                  if s["n_range"] > collect_cap and s["lo"] < s["hi"]}
        if not active:
            break

        def hist_partial(df: pd.DataFrame, _b=dict(active)) -> pd.DataFrame:
            d = df[[key, col]].dropna()
            rows = {"k": [], "below": [], "hist": []}
            for kk, (lo, hi) in _b.items():
                v = d.loc[d[key] == kk, col].to_numpy(dtype=np.float64)
                rows["k"].append(kk)
                rows["below"].append(int((v < lo).sum()))
                v = v[(v >= lo) & (v <= hi)]
                idx = np.clip(((v - lo) / (hi - lo) * n_bins)
                              .astype(np.int64), 0, n_bins - 1)
                rows["hist"].append(np.bincount(idx, minlength=n_bins)
                                    .astype(np.int64).tobytes())
            return pd.DataFrame(rows)

        hp = src.map_batches(hist_partial, batch_format="pandas").to_pandas()
        progressed = False
        for kk, (lo, hi) in active.items():
            sel = hp[hp["k"] == kk]
            below = int(sel["below"].sum())
            hist = np.zeros(n_bins, dtype=np.int64)
            for b in sel["hist"]:
                hist += np.frombuffer(b, dtype=np.int64)
            cum = below + np.cumsum(hist)
            s = state[kk]
            b1 = int(np.searchsorted(cum, s["k1"] + 1))
            b2 = int(np.searchsorted(cum, s["k2"] + 1))
            w = (hi - lo) / n_bins
            new_lo = _relax(lo + b1 * w, up=False)
            new_hi = _relax(min(lo + (b2 + 1) * w, hi), up=True)
            new_n = int(hist[b1:b2 + 1].sum())   # candidates in bins b1..b2
            if new_lo > lo or new_hi < hi:
                progressed = True
                s["lo"], s["hi"], s["n_range"] = max(new_lo, lo), \
                    min(new_hi, hi), new_n
        if not progressed:
            break                             # massive ties → collect

    bounds = {k: (s["lo"], s["hi"]) for k, s in state.items()}

    def vc_partial(df: pd.DataFrame, _b=dict(bounds)) -> pd.DataFrame:
        d = df[[key, col]].dropna()
        rows = {"k": [], "below": [], "val": [], "cnt": []}
        for kk, (lo, hi) in _b.items():
            v = d.loc[d[key] == kk, col].to_numpy(dtype=np.float64)
            nb = int((v < lo).sum())
            v = v[(v >= lo) & (v <= hi)]
            vals, cnts = np.unique(v, return_counts=True)
            rows["k"].append(kk)
            rows["below"].append(nb)
            rows["val"].append(vals.tobytes())
            rows["cnt"].append(cnts.astype(np.int64).tobytes())
        return pd.DataFrame(rows)

    vp = src.map_batches(vc_partial, batch_format="pandas").to_pandas()
    out_k, out_m = [], []
    for kk, s in state.items():
        sel = vp[vp["k"] == kk]
        below = int(sel["below"].sum())
        vals = np.concatenate([np.frombuffer(b, dtype=np.float64)
                               for b in sel["val"]]) if len(sel) else \
            np.empty(0)
        cnts = np.concatenate([np.frombuffer(b, dtype=np.int64)
                               for b in sel["cnt"]]) if len(sel) else \
            np.empty(0, dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        uv, start = np.unique(vals, return_index=True)
        uc = np.add.reduceat(cnts, start) if len(vals) else cnts
        cum = below + np.cumsum(uc)
        v1 = float(uv[np.searchsorted(cum, s["k1"] + 1)])
        v2 = float(uv[np.searchsorted(cum, s["k2"] + 1)])
        out_k.append(kk)
        out_m.append(v1 + s["w"] * (v2 - v1))   # quantile_cont formula
    return pd.DataFrame({key: out_k, "quantile": out_m})


def grouped_median_exact(ds, key: str, col: str, **kw) -> pd.DataFrame:
    """Exact per-group median — ``grouped_quantile_exact`` at q=0.5."""
    out = grouped_quantile_exact(ds, key, col, q=0.5, **kw)
    return out.rename(columns={"quantile": "median"})


def range_partition_scan(ds, order_col: str, val_col: str,
                         n_buckets: int | None = None,
                         out_col: str = "running_sum"):
    """Add an EXACT inclusive global prefix sum of ``val_col`` in
    ``order_col`` order → (Dataset with ``out_col`` int64, grand
    total).  Same one-shuffle shape as the rank: per-bucket native SUMs
    reduce to tiny driver offsets, then one in-bucket cumsum per
    BUCKET.  ``order_col`` must be unique (a key) so the scan order is
    total; sums are int64 (token counts, bytes, row weights).

    This is the sequence-packing / token-budget-sharding primitive: a
    shard assignment like ``(running_sum - v) // capacity`` follows
    from the scan with plain vectorized arithmetic."""
    from ray.data.aggregate import Sum

    tagged, n_rows = _range_bucketize(ds, order_col, n_buckets)
    if n_rows == 0:
        return tagged, 0

    sums = tagged.groupby("__rb").aggregate(
        Sum(val_col, alias_name="__s")).to_pandas().sort_values("__rb")
    offsets = dict(zip(
        sums["__rb"].to_numpy(dtype=np.int64),
        np.concatenate([[0], np.cumsum(
            sums["__s"].to_numpy(dtype=np.int64))[:-1]])))
    total = int(sums["__s"].sum())

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        df = df.sort_values(order_col).drop(columns="__rb")
        df[out_col] = offsets[b] + np.cumsum(
            df[val_col].to_numpy(dtype=np.int64))
        return df

    scanned = tagged.groupby("__rb").map_groups(scan_bucket,
                                                batch_format="pandas")
    return scanned, total


def range_partition_running_max(ds, order_col: str, val_col: str,
                                n_buckets: int | None = None,
                                out_col: str = "prior_max",
                                tiebreak: str | None = None):
    """Add the EXCLUSIVE global prefix max of ``val_col`` in
    ``order_col`` order (each row sees the max of strictly-PRIOR rows;
    the first row gets sentinel −1) → (Dataset, n_rows).  This is the
    event-time WATERMARK primitive: in arrival order, the watermark a
    row observes is the max event time among earlier arrivals.

    Same one-shuffle shape as the prefix sum; bucket maxima reduce via
    per-batch partials (never the native sort-count path — the
    _bucket_offsets lesson), prefix-max offsets are driver metadata,
    and one in-bucket shifted cummax finishes.  ``val_col`` must be
    int64 and nonnegative (epoch-µs timestamps)."""
    tagged, n_rows = _range_bucketize(ds, order_col, n_buckets)
    if n_rows == 0:
        return tagged, 0

    def mpart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("__rb", as_index=False)[val_col].max()
        g.columns = ["__rb", "m"]
        return g

    parts = (tagged.map_batches(mpart, batch_format="pandas")
             .to_pandas())
    bm = (parts.groupby("__rb", as_index=False)["m"].max()
          .sort_values("__rb"))
    pmax = np.maximum.accumulate(bm["m"].to_numpy(dtype=np.int64))
    off = dict(zip(bm["__rb"].to_numpy(np.int64),
                   np.concatenate([[-1], pmax[:-1]])))

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        order = [order_col, tiebreak] if tiebreak else [order_col]
        df = df.sort_values(order).drop(columns="__rb")
        v = df[val_col].to_numpy(np.int64)
        excl = np.empty(len(v), dtype=np.int64)
        excl[0] = off[b]
        if len(v) > 1:
            np.maximum.accumulate(v[:-1], out=excl[1:])
            excl[1:] = np.maximum(excl[1:], off[b])
        df[out_col] = excl
        return df

    scanned = tagged.groupby("__rb").map_groups(scan_bucket,
                                                batch_format="pandas")
    return scanned, n_rows


def auc_exact(ds, score_col: str, label_col: str,
              n_buckets: int | None = None) -> dict:
    """EXACT ROC AUC of ``score_col`` against binary ``label_col``
    (0/1 int) via the tie-averaged rank-sum (Mann-Whitney) identity:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻),   R⁺ = Σ over positives of
        the AVERAGE 1-based rank of their score (ties share the mean
        of their rank block — the trapezoidal-ROC tie convention).

    One range-bucket shuffle (same skeleton as ``range_partition_rank``;
    equal scores never split across buckets), then each bucket emits a
    THREE-int partial: (rows, positives, local doubled rank-sum
    Σ_v p_v·(2·L_v + c_v + 1) over its distinct values).  The driver
    folds B partials with arbitrary-precision Python ints (2·rank sums
    stay integers, so the result is arithmetic-exact at any n — no
    float cumsum ever happens on row-cardinality data).

    Returns ``{"n_pos", "n_neg", "auc"}`` (auc as float)."""
    tagged, n_rows = _range_bucketize(ds, score_col, n_buckets)
    if n_rows == 0:
        return {"n_pos": 0, "n_neg": 0, "auc": float("nan")}

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__rb"].iloc[0])
        v = df[score_col].to_numpy(dtype=np.float64)
        y = df[label_col].to_numpy(dtype=np.int64)
        order = np.argsort(v, kind="stable")
        v, y = v[order], y[order]
        uv, start, cnt = np.unique(v, return_index=True,
                                   return_counts=True)
        pos = np.add.reduceat(y, start) if len(v) else \
            np.empty(0, dtype=np.int64)
        before = start.astype(np.int64)          # rows < v inside bucket
        s2 = int((pos * (2 * before + cnt + 1)).sum())
        return pd.DataFrame({"__rb": [b], "n": [len(v)],
                             "npos": [int(y.sum())], "s2": [s2]})

    p = (tagged.groupby("__rb")
         .map_groups(bucket_partial, batch_format="pandas")
         .to_pandas().sort_values("__rb"))
    ns = p["n"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(ns)[:-1]])
    r2 = 0
    for off, pb, s2 in zip(offsets, p["npos"], p["s2"]):
        r2 += int(s2) + 2 * int(off) * int(pb)     # global doubled R⁺
    n_pos = int(p["npos"].sum())
    n_neg = int(n_rows) - n_pos
    if n_pos == 0 or n_neg == 0:
        return {"n_pos": n_pos, "n_neg": n_neg, "auc": float("nan")}
    num = r2 - n_pos * (n_pos + 1)                  # 2·(R⁺ − n⁺(n⁺+1)/2)
    return {"n_pos": n_pos, "n_neg": n_neg,
            "auc": num / (2.0 * n_pos * n_neg)}


def grouped_weighted_median_exact(ds, key: str, col: str, wcol: str,
                                  q: float = 0.5,
                                  n_bins: int = 512,
                                  collect_cap: int = 65536,
                                  max_rounds: int = 8) -> pd.DataFrame:
    """EXACT per-group WEIGHTED quantile: the smallest value v with
    cumulative weight(rows ≤ v) ≥ q · total_weight (the lower weighted
    median convention — what a cumsum-window SQL formulation computes).
    Weights must be integral (cast to int64) so every cumulative sum is
    arithmetic-exact and engine/oracle can never disagree at a
    threshold boundary.

    Same histogram-refinement skeleton as ``grouped_quantile_exact``:
    per-group (total-weight, min, max) partials → ≤ ``max_rounds``
    fixed-bin WEIGHT-sum passes (partials bounded by groups × bins,
    below-range weight RE-MEASURED each round) → final (value, weight)
    collect inside the residual range, bounded by distinct values
    there.  No task ever materializes a key group."""
    src = ds.materialize()

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, col, wcol]].dropna()
        if not len(d):
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 "w": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "lo": pd.Series([], dtype="float64"),
                                 "hi": pd.Series([], dtype="float64")})
        d = d.assign(__w=d[wcol].to_numpy(dtype=np.int64))
        return d.groupby(key, as_index=False).agg(
            w=("__w", "sum"), n=(col, "size"),
            lo=(col, "min"), hi=(col, "max"))

    parts = src.map_batches(stats_partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "wmedian": pd.Series([], dtype="float64")})
    stats = parts.groupby(key, as_index=False).agg(
        w=("w", "sum"), n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    state: dict = {}
    for _, r in stats.iterrows():
        # target weight: integral when q·w is (q=0.5, even w); exact
        # float otherwise — both sides compare cum ≥ target identically
        state[r[key]] = {"lo": float(r["lo"]), "hi": float(r["hi"]),
                         "target": q * int(r["w"]),
                         "n_range": int(r["n"])}

    def _relax(x: float, up: bool) -> float:
        for _ in range(4):
            x = np.nextafter(x, np.inf if up else -np.inf)
        return float(x)

    for _ in range(max_rounds):
        active = {k: (s["lo"], s["hi"]) for k, s in state.items()
                  if s["n_range"] > collect_cap and s["lo"] < s["hi"]}
        if not active:
            break

        def hist_partial(df: pd.DataFrame, _b=dict(active)) -> pd.DataFrame:
            d = df[[key, col, wcol]].dropna()
            rows = {"k": [], "below": [], "hist": [], "cnt": []}
            for kk, (lo, hi) in _b.items():
                sel = d[d[key] == kk]
                v = sel[col].to_numpy(dtype=np.float64)
                w = sel[wcol].to_numpy(dtype=np.int64)
                rows["k"].append(kk)
                rows["below"].append(int(w[v < lo].sum()))
                m = (v >= lo) & (v <= hi)
                v, w = v[m], w[m]
                idx = np.clip(((v - lo) / (hi - lo) * n_bins)
                              .astype(np.int64), 0, n_bins - 1)
                rows["hist"].append(np.bincount(
                    idx, weights=w.astype(np.float64),
                    minlength=n_bins).astype(np.int64).tobytes())
                rows["cnt"].append(np.bincount(idx, minlength=n_bins)
                                   .astype(np.int64).tobytes())
            return pd.DataFrame(rows)

        hp = src.map_batches(hist_partial, batch_format="pandas").to_pandas()
        progressed = False
        for kk, (lo, hi) in active.items():
            sel = hp[hp["k"] == kk]
            below = int(sel["below"].sum())
            hist = np.zeros(n_bins, dtype=np.int64)
            cnts = np.zeros(n_bins, dtype=np.int64)
            for b, c in zip(sel["hist"], sel["cnt"]):
                hist += np.frombuffer(b, dtype=np.int64)
                cnts += np.frombuffer(c, dtype=np.int64)
            cum = below + np.cumsum(hist)
            s = state[kk]
            b1 = int(np.searchsorted(cum, s["target"], side="left"))
            # cum[b1] is the first bin where cum ≥ target
            b1 = min(b1, n_bins - 1)
            w = (hi - lo) / n_bins
            new_lo = _relax(lo + b1 * w, up=False)
            new_hi = _relax(min(lo + (b1 + 1) * w, hi), up=True)
            new_n = int(cnts[b1])
            if new_lo > lo or new_hi < hi:
                progressed = True
                s["lo"], s["hi"] = max(new_lo, lo), min(new_hi, hi)
                s["n_range"] = new_n
        if not progressed:
            break

    bounds = {k: (s["lo"], s["hi"]) for k, s in state.items()}

    def vc_partial(df: pd.DataFrame, _b=dict(bounds)) -> pd.DataFrame:
        d = df[[key, col, wcol]].dropna()
        rows = {"k": [], "below": [], "val": [], "wt": []}
        for kk, (lo, hi) in _b.items():
            sel = d[d[key] == kk]
            v = sel[col].to_numpy(dtype=np.float64)
            w = sel[wcol].to_numpy(dtype=np.int64)
            nb = int(w[v < lo].sum())
            m = (v >= lo) & (v <= hi)
            v, w = v[m], w[m]
            order = np.argsort(v, kind="stable")
            v, w = v[order], w[order]
            uv, start = np.unique(v, return_index=True)
            uw = np.add.reduceat(w, start) if len(v) else w
            rows["k"].append(kk)
            rows["below"].append(nb)
            rows["val"].append(uv.tobytes())
            rows["wt"].append(uw.astype(np.int64).tobytes())
        return pd.DataFrame(rows)

    vp = src.map_batches(vc_partial, batch_format="pandas").to_pandas()
    out_k, out_v = [], []
    for kk, s in state.items():
        sel = vp[vp["k"] == kk]
        below = int(sel["below"].sum())
        vals = np.concatenate([np.frombuffer(b, dtype=np.float64)
                               for b in sel["val"]]) if len(sel) else \
            np.empty(0)
        wts = np.concatenate([np.frombuffer(b, dtype=np.int64)
                              for b in sel["wt"]]) if len(sel) else \
            np.empty(0, dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        uv, start = np.unique(vals, return_index=True)
        uw = np.add.reduceat(wts, start) if len(vals) else wts
        cum = below + np.cumsum(uw)
        i = int(np.searchsorted(cum, s["target"], side="left"))
        out_k.append(kk)
        out_v.append(float(uv[min(i, len(uv) - 1)]))
    return pd.DataFrame({key: out_k, "wmedian": out_v})
