"""Joins for two large sides: explicit partitioned hash join.

Ray Data's guide pattern (both sides large): add ``bucket = hash(key) % B``
to both sides, group matching buckets, and merge pairwise inside
``map_groups`` — an explicit hash-partitioned join whose only movement
is the bucket shuffle.  Skewed keys are salted: a hot key's probe rows
split across ``k`` sub-buckets while the build side's hot rows replicate
``k`` ways, bounding any single task at ~1/k of the hot key
(SURVEY.md §4 skew requirement).

Small-side joins should NOT use this — broadcast them
(``ray.put`` + lookup in ``map_batches``; see q_revenue_by_nation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(values: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket hash; int64 keys use a mix hash, other
    dtypes (strings) a vectorized 64-bit row hash.

    Integral keys that arrive as object/float (pandas promotes int64
    through None-padding and unions — e.g. the output of a previous
    hash_join) are canonicalized back to int64 FIRST: both sides of a
    join must take the same hash path or buckets disagree and matching
    rows silently drop."""
    values = np.asarray(values)
    if values.dtype == object:
        try:
            values = values.astype(np.int64)
        except (TypeError, ValueError, OverflowError):
            pass
    elif (np.issubdtype(values.dtype, np.floating) and len(values)
          and np.isfinite(values).all() and (values == np.floor(values)).all()):
        values = values.astype(np.int64)
    if np.issubdtype(values.dtype, np.integer):
        v = values.astype(np.uint64)
        with np.errstate(over="ignore"):
            v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            v = v ^ (v >> np.uint64(33))
        return (v % np.uint64(n_buckets)).astype(np.int64)
    from .sketches import hash64
    return (hash64(list(values)) % np.uint64(n_buckets)).astype(np.int64)


def hash_join(left_ds, right_ds, key: str, n_buckets: int = 32,
              hot_keys: dict | None = None, how: str = "inner"):
    """Join two Datasets on an int64 ``key`` → Dataset of merged rows.

    ``hot_keys``: {key_value: salt_factor} — probe(left) rows of a hot
    key scatter across ``salt_factor`` sub-buckets; build(right) rows
    replicate to all of them.
    """
    hot_keys = hot_keys or {}
    if hot_keys and max(hot_keys.values()) > 4096:
        raise ValueError("salt factors above 4096 break bucket-key packing")
    if how in ("outer", "right") and hot_keys:
        # build-side replication would duplicate unmatched right rows
        # once per salt; outer semantics need each right row exactly once
        raise ValueError("hot_keys salting supports inner/left joins only")
    if how not in ("inner", "left", "outer", "right"):
        raise ValueError(f"unsupported join how={how!r}")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            keys = df[key].to_numpy()
            bucket = _bucket_of(keys, n_buckets)
            salt = np.zeros(len(df), dtype=np.int64)
            frames = []
            if hot_keys:
                for hk, k in hot_keys.items():
                    m = keys == hk
                    if not m.any():
                        continue
                    if side == "left":
                        # scatter probe rows across k salts
                        salt[m] = np.arange(int(m.sum())) % k
                    else:
                        # replicate build rows to every salt
                        rep = df[m]
                        for s in range(1, k):
                            extra = rep.copy()
                            extra["__salt"] = s
                            frames.append(extra)
            df["__bucket"] = bucket
            df["__salt"] = salt
            df["__side"] = side
            if frames:
                for f in frames:
                    f["__bucket"] = _bucket_of(f[key].to_numpy(), n_buckets)
                    f["__side"] = side
                df = pd.concat([df] + frames, ignore_index=True)
            return df
        return fn

    left = left_ds.map_batches(tag("left"), batch_format="pandas")
    right = right_ds.map_batches(tag("right"), batch_format="pandas")

    # union needs identical schemas: pad each side with the other's columns
    lschema = left.schema()
    rschema = right.schema()
    if lschema is None or rschema is None:
        # an empty side: inner join is empty; emit zero rows with the
        # non-empty side's columns (minus the tags).  outer (and the
        # side-preserving left/right cases) pass the surviving side
        # through unchanged — its columns are all we know about.
        base = lschema or rschema
        cols = ([c for c in base.names if not c.startswith("__")]
                if base is not None else [])
        src = left_ds if lschema is not None else right_ds
        keep_rows = (how == "outer"
                     or (how == "left" and lschema is not None)
                     or (how == "right" and rschema is not None))

        def trim(df: pd.DataFrame) -> pd.DataFrame:
            out = df if keep_rows else df.head(0)
            return out[[c for c in cols if c in out.columns]]

        return src.map_batches(trim, batch_format="pandas")
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    all_cols = list(dict.fromkeys(list(lcols) + list(rcols)))

    def pad(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            for c in cols:
                if c not in df.columns:
                    df[c] = None
            return df[all_cols]
        return fn

    both = left.map_batches(pad(all_cols), batch_format="pandas").union(
        right.map_batches(pad(all_cols), batch_format="pandas"))

    join_cols_l = [c for c in lcols if c not in ("__bucket", "__salt", "__side")]
    join_cols_r = [c for c in rcols if c not in ("__bucket", "__salt", "__side")]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "left"][join_cols_l]
        r = g[g["__side"] == "right"][join_cols_r]
        empty_out = pd.DataFrame(columns=[c for c in all_cols
                                          if not c.startswith("__")])
        if not len(l):
            if how in ("inner", "left") or not len(r):
                return empty_out
            # outer/right: right-only bucket — emit r padded with l cols
            merged = r.copy()
            for c in join_cols_l:
                if c != key:
                    merged[c] = None
        elif not len(r):            # probe side alone in the bucket
            if how in ("inner", "right"):
                return empty_out
            merged = l.copy()       # left/outer keep unmatched probe rows
            for c in join_cols_r:
                if c != key:
                    merged[c] = None
        else:
            merged = l.merge(r, on=key, how=how)
        for c in all_cols:
            if c.startswith("__"):
                continue
            if c not in merged.columns:
                merged[c] = None
        # keep the join key integral for chained joins (see _bucket_of)
        if merged[key].dtype != np.int64:
            try:
                merged[key] = merged[key].astype("int64")
            except (TypeError, ValueError):
                pass
        return merged[[c for c in all_cols if not c.startswith("__")]]

    # single packed key: Ray's multi-key groupby takes a per-group Python
    # path ~7× slower than single-int64 grouping (salt < 4096 by design)
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df["__bkey"] = df["__bucket"].astype("int64") * 4096 + df["__salt"].astype("int64")
        return df.drop(columns=["__bucket", "__salt"])

    return (both.map_batches(pack, batch_format="pandas")
            .groupby("__bkey").map_groups(merge_bucket,
                                          batch_format="pandas"))


