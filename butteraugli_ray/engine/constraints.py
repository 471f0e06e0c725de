"""Declarative constraint suites — the validation engine's user-facing
DSL (SURVEY.md §2.12 extension surface; reference analog: the CLI's
threshold/param constraint checks, /root/reference/butteraugli-cli/src/
main.rs arg validation, generalized to whole-table data constraints in
the style of public data-quality frameworks' check vocabularies).

A suite is a list of plain-dict specs::

    {"table": "orders", "column": "o_totalprice",
     "kind": "range", "min": 0.0}
    {"table": "orders", "column": "o_custkey", "kind": "foreign_key",
     "ref_table": "customer", "ref_column": "c_custkey"}

``audit_constraints`` compiles the suite into ONE vectorized
``map_batches`` pass per table carrying ALL row-local checks,
sufficient-stat gates, PSI histograms (cid|bin rows) and unique
non-null counts through a single Sum-aggregate shuffle (the projection
is pruned to exactly the referenced columns).  Extra passes exist only
where the check's semantics force a different data movement: one
hash-bucketed distinct-count shuffle per distinct column (shared
between ``unique`` and ``distinct_count_min``; the functions/dedup.py
combiner shape — Ray's native groupby never runs at value
cardinality) and one group-hash bucket shuffle per ``monotonic``
check.  ``row_count_ratio_between`` reads only parquet metadata.  Whenever a
suite needs more than one consumption of a table (shared scan + any
extra-pass kind), the pruned projection is materialized once — ONE
storage read per table per audit; the extra passes then stream
object-store blocks (spill-backed), never the source again.
``foreign_key`` builds the distinct reference-key set with the same
bucketed partial and broadcasts it via ``ray.put``
(dimension-bounded; for fact→fact keys at 100 TB route through
``functions.bloom`` + the partitioned semi-join in
``functions/joins.py`` instead — the broadcast here is the dim-table
path).  Nothing materializes a table on the driver: row-local partials
reduce to one row per (constraint × block), unique/fk partials to one
row per (bucket × batch-distinct value).

``suite_oracle_sql`` generates the matching ANSI-SQL audit (UNION ALL,
one SELECT per constraint) so every suite is DuckDB-checkable — the
engine and the oracle are compiled from the SAME spec list.

Violation semantics (identical on both sides):

- ``not_null``     — rows where the column IS NULL.
- ``unique``       — ``count(col) - count(DISTINCT col)``: non-null
                     rows beyond the first occurrence of their value.
- ``range``        — non-null values outside [min, max] (either bound
                     optional).
- ``in_set``       — non-null values not in the allowed set.
- ``regex``        — non-null strings not matching the pattern
                     (``re.search`` / DuckDB ``regexp_matches`` — use
                     anchors for full-match semantics).
- ``foreign_key``  — non-null values absent from the reference
                     column's distinct set.
- ``row_count_min``— table-level: total rows below the floor (the
                     violation count is the shortfall).
- ``monotonic``    — grouped order check (the north-star span
                     offset-monotonicity shape): within each
                     ``group_by`` group, ``column`` must be
                     non-decreasing along ``order_by`` (ties broken by
                     the value itself, so the count is deterministic);
                     nulls in ``column`` are ignored and n_rows is the
                     non-null count.  Engine: one group-hash bucket
                     shuffle + sort-within-bucket + vectorized diff
                     (the q_user_gap_stats shape); oracle:
                     ``lag() OVER (PARTITION BY g ORDER BY o, c)``.
- ``null_ratio_max``  — threshold check: if nulls/rows > max_ratio the
                     violation count is the null count, else 0.
- ``distinct_count_min`` — shortfall of COUNT(DISTINCT col) below
                     min_distinct (bucketed exact distinct).
- ``distinct_count_max`` — overshoot of COUNT(DISTINCT col) above
                     max_distinct — the key-cardinality-explosion
                     gate (same bucketed distinct, shared per column).
- ``mean_between`` / ``stddev_between`` — statistical gate: violation
                     count 1 if AVG(col) / STDDEV_SAMP(col) falls
                     outside [min, max], else 0.  Engine computes from
                     (n, Σx, Σx²) sufficient-stat partials — pick
                     bounds away from float round-off of the true
                     statistic.
- ``psi_max``      — distribution-drift gate: population stability
                     index between the rows whose ``split_column`` is
                     in ``baseline_values`` vs ``current_values``,
                     over fixed ``edges`` bins (eps-smoothed
                     proportions); violation count 1 if PSI >
                     ``max_psi``.  Empty sides pass (no drift
                     evidence).  n_rows = rows considered (both
                     sides).
- ``row_count_ratio_between`` — table-level cross-table volume gate:
                     count(table)/count(ref_table) outside
                     [min, max] → violation count 1.  Metadata-only.
- ``min_between`` / ``max_between`` — statistic gates on the column's
                     global MIN / MAX; the extrema ride the shared
                     scan through dedicated Max/Min aggregate slots.
- ``freshness``    — recency gate on a timestamp column:
                     max(column) must be within ``max_lag_seconds``
                     of ``as_of`` (an explicit ISO timestamp — never
                     wall-clock, so runs are reproducible).  Rides
                     the shared scan (epoch-µs through the max slot,
                     exact in float64 to ~year 2255); an all-null
                     column passes (no evidence), matching SQL NULL
                     CASE propagation.
- ``corr_between`` — sample Pearson correlation of ``column`` vs
                     ``with_column`` outside [min, max] → 1.  Rides
                     the shared scan via (n, Σx, Σy, Σxx, Σyy, Σxy)
                     sufficient stats; n < 2 or zero variance → NULL
                     → passes (DuckDB ``corr`` semantics).
- ``entropy_between`` — Shannon entropy (nats) of a categorical
                     column outside [min, max] → 1.  One bucketed
                     value-count shuffle bounded by the distinct set;
                     H = ln N − Σ n·ln n / N finished on the driver.
- ``unique_together`` — composite-key uniqueness over ``columns``:
                     all-non-null rows beyond the first occurrence of
                     their tuple (count FILTER − count DISTINCT tuple).
                     The non-null count rides the shared scan; the
                     distinct count is one tuple-hash bucket shuffle.
- ``quantile_between`` — EXACT global quantile gate
                     (``quantile_cont`` interpolation at rank
                     (n−1)·q): the distributed histogram-refinement
                     selection from functions/rank.py with a constant
                     group, never a global sort.
- ``psi_snapshot`` — drift gate against a BASELINE SNAPSHOT: the
                     spec embeds the baseline histogram
                     (``edges`` + ``baseline_counts``, e.g. from
                     ``profile_snapshot`` of a previous run) and the
                     audit compares the current run's distribution to
                     it (eps-smoothed PSI over the fixed bins, same
                     formula as psi_max).  ``profile_snapshot`` /
                     ``drift_suite_from_snapshot`` compile the
                     profile→audit round trip.
- ``ks_max``       — exact two-sample Kolmogorov-Smirnov drift gate
                     between ``baseline_values`` / ``current_values``
                     rows of ``split_column`` (q_ks_drift_exact
                     machinery: bin-count partials → one bin-key
                     shuffle → per-bin tie-collapsed sup |F0−F1|).
                     Rows matching both value sets count as baseline;
                     an empty side passes.

Row-local kinds (not_null/range/in_set/regex/foreign_key/satisfies)
accept an optional ``mostly`` (0, 1] tolerance — Great-Expectations
semantics: the check passes when n_violations ≤ (1 − mostly) ·
n_rows, the identical float64 product on both engines.  A ``mostly``
spec's display column is suffixed ``~{mostly}`` so it never collides
with a strict twin on the same column.

``check_schemas`` / ``schema_oracle_sql`` are the schema half:
expected (column, type, ordinal) specs vs actual parquet footers, per
column status ok / type_mismatch / position_mismatch / missing /
unexpected — no data scan.

``violation_rows`` / ``violations_oracle_sql`` are the row-level
companion (the north rule's "pass/fail AND violation rows"): for the
row-local kinds + unique + monotonic they emit one row per violating
record — (table_name, column_name, check, key) with ``key`` the
table's configured key column cast to string (unique emits each
duplicated VALUE instead) — again compiled from the same specs on
both sides.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd

KINDS = ("not_null", "unique", "range", "in_set", "regex",
         "foreign_key", "row_count_min", "monotonic", "null_ratio_max",
         "distinct_count_min", "mean_between", "stddev_between",
         "psi_max", "row_count_ratio_between", "satisfies",
         "functional_dependency", "min_between", "max_between",
         "freshness", "corr_between", "entropy_between",
         "unique_together", "quantile_between", "ks_max",
         "psi_snapshot", "distinct_count_max")

# kinds accepting the optional ``mostly`` tolerance (Great-Expectations
# semantics): the check passes when
# n_violations <= (1 - mostly) * n_rows — the threshold is the SAME
# float64 product on both engines ((1.0 - mostly) * count(*)), so the
# comparison can only knife-edge when the true violation ratio sits
# exactly on the tolerance; pick ``mostly`` away from the data's ratio.
MOSTLY_KINDS = ("not_null", "range", "in_set", "regex", "foreign_key",
                "satisfies")

# PSI smoothing epsilon — identical literal in engine and generated SQL
PSI_EPS = 1e-6

# driver threads used to overlap the independent extra-pass helper
# executions within one table's audit (each thread drives its own
# streaming executor over the SAME materialized blocks — pure
# wall-clock overlap, results unchanged)
AUDIT_PARALLELISM = 8


import threading as _threading

# Ray's read-plan creation (path resolution) does guarded lazy imports
# that are NOT thread-safe when the import legitimately fails (e.g.
# fsspec's http module without aiohttp: two racing threads can observe
# a half-initialized module and crash with an ImportError the guard
# doesn't catch).  Plan creation is cheap metadata work — serialize it;
# plan EXECUTION stays fully concurrent.
_READ_PLAN_LOCK = _threading.Lock()


def _locked(read):
    """Wrap an injected ``read(table, columns)`` so concurrent audit
    threads never create read plans simultaneously."""
    def _read(table, columns):
        with _READ_PLAN_LOCK:
            return read(table, columns)
    return _read

# kinds whose violations are identifiable rows (violation_rows support)
# (unique_together emits each duplicated composite VALUE as a
# '|'-joined string — use int/string key columns so the Python str()
# and SQL VARCHAR casts render identically)
ROW_KINDS = ("not_null", "range", "in_set", "regex", "foreign_key",
             "unique", "monotonic", "satisfies",
             "functional_dependency", "unique_together")

# satisfies operators: one vocabulary shared by the vectorized engine
# mask and the generated SQL predicate (both sides require non-null
# operands, so pandas NaN-compares-False and SQL NULL-propagation
# never diverge)
SAT_OPS = ("<", "<=", ">", ">=", "=", "<>")


def _disp_col(spec: dict) -> str:
    """Display column for output rows / cids.  Cross-column kinds
    encode the whole predicate so two checks on the same table never
    collide (and the audit row names what was actually checked)."""
    kind = spec["kind"]
    if "name" in spec:
        # explicit display override — the escape hatch when two specs
        # of the same kind target the same column (e.g. two ks_max
        # splits over one measure)
        base = spec["name"]
    elif kind == "satisfies":
        rhs = (spec["right_column"] if "right_column" in spec
               else str(spec["right_value"]))
        base = f"{spec['left']}{spec['op']}{rhs}"
    elif kind == "functional_dependency":
        base = f"{spec['column']}->{spec['determines']}"
    elif kind == "unique_together":
        base = "+".join(spec["columns"])
    elif kind == "corr_between":
        base = f"{spec['column']}~{spec['with_column']}"
    elif kind == "quantile_between":
        base = f"{spec['column']}@{spec['q']}"
    else:
        base = spec.get("column", "*")
    if "mostly" in spec:
        base = f"{base}~{spec['mostly']}"
    return base


def _cid(spec: dict) -> str:
    """Stable display key: table/column/kind (column '*' for
    table-level checks)."""
    return f"{spec['table']}.{_disp_col(spec)}.{spec['kind']}"


def _validate_suite(suite: List[dict]) -> None:
    seen = set()
    for s in suite:
        if s["kind"] not in KINDS:
            raise ValueError(f"unknown constraint kind {s['kind']!r}")
        if s["kind"] not in ("row_count_min", "row_count_ratio_between",
                             "satisfies", "unique_together") \
                and "column" not in s:
            raise ValueError(f"{s['kind']} needs a column: {s}")
        if s["kind"] == "range" and ("min" not in s and "max" not in s):
            raise ValueError(f"range needs min and/or max: {s}")
        if "mostly" in s:
            if s["kind"] not in MOSTLY_KINDS:
                raise ValueError(
                    f"mostly only applies to {MOSTLY_KINDS}: {s}")
            if not (0.0 < float(s["mostly"]) <= 1.0):
                raise ValueError(f"mostly must be in (0, 1]: {s}")
        if s["kind"] in ("min_between", "max_between", "corr_between",
                         "entropy_between", "quantile_between") and (
                "min" not in s and "max" not in s):
            raise ValueError(f"{s['kind']} needs min and/or max: {s}")
        if s["kind"] == "freshness" and (
                "as_of" not in s or "max_lag_seconds" not in s):
            raise ValueError(
                f"freshness needs as_of/max_lag_seconds: {s}")
        if s["kind"] == "corr_between" and "with_column" not in s:
            raise ValueError(f"corr_between needs with_column: {s}")
        if s["kind"] == "unique_together" and (
                len(s.get("columns", [])) < 2):
            raise ValueError(
                f"unique_together needs >= 2 columns: {s}")
        if s["kind"] == "quantile_between" and not (
                "q" in s and 0.0 <= float(s["q"]) <= 1.0):
            raise ValueError(f"quantile_between needs q in [0, 1]: {s}")
        if s["kind"] == "ks_max":
            for f in ("split_column", "baseline_values",
                      "current_values", "max_ks"):
                if f not in s:
                    raise ValueError(f"ks_max needs {f}: {s}")
        if s.get("severity", "error") not in ("error", "warn"):
            raise ValueError(f"severity must be error|warn: {s}")
        if s["kind"] == "psi_snapshot":
            for f in ("edges", "baseline_counts", "max_psi"):
                if f not in s:
                    raise ValueError(f"psi_snapshot needs {f}: {s}")
            if list(s["edges"]) != sorted(s["edges"]):
                raise ValueError(f"psi_snapshot edges must be sorted: {s}")
            if len(s["baseline_counts"]) != len(s["edges"]) + 1:
                raise ValueError(
                    f"psi_snapshot needs len(edges)+1 baseline_counts: {s}")
        if s["kind"] == "in_set" and not s.get("values"):
            raise ValueError(f"in_set needs values: {s}")
        if s["kind"] == "regex" and not s.get("pattern"):
            raise ValueError(f"regex needs pattern: {s}")
        if s["kind"] == "foreign_key" and (
                "ref_table" not in s or "ref_column" not in s):
            raise ValueError(f"foreign_key needs ref_table/ref_column: {s}")
        if s["kind"] == "row_count_min" and "min_rows" not in s:
            raise ValueError(f"row_count_min needs min_rows: {s}")
        if s["kind"] == "monotonic" and (
                "group_by" not in s or "order_by" not in s):
            raise ValueError(f"monotonic needs group_by/order_by: {s}")
        if s["kind"] == "null_ratio_max" and "max_ratio" not in s:
            raise ValueError(f"null_ratio_max needs max_ratio: {s}")
        if s["kind"] == "distinct_count_min" and "min_distinct" not in s:
            raise ValueError(f"distinct_count_min needs min_distinct: {s}")
        if s["kind"] == "distinct_count_max" and "max_distinct" not in s:
            raise ValueError(f"distinct_count_max needs max_distinct: {s}")
        if s["kind"] in ("mean_between", "stddev_between") and (
                "min" not in s and "max" not in s):
            raise ValueError(f"{s['kind']} needs min and/or max: {s}")
        if s["kind"] == "psi_max":
            for f in ("split_column", "baseline_values",
                      "current_values", "edges", "max_psi"):
                if f not in s:
                    raise ValueError(f"psi_max needs {f}: {s}")
            if list(s["edges"]) != sorted(s["edges"]):
                raise ValueError(f"psi_max edges must be sorted: {s}")
        if s["kind"] == "row_count_ratio_between" and (
                "ref_table" not in s
                or ("min" not in s and "max" not in s)):
            raise ValueError(
                f"row_count_ratio_between needs ref_table and "
                f"min and/or max: {s}")
        if s["kind"] == "satisfies":
            if "left" not in s or "op" not in s:
                raise ValueError(f"satisfies needs left/op: {s}")
            if s["op"] not in SAT_OPS:
                raise ValueError(
                    f"satisfies op must be one of {SAT_OPS}: {s}")
            if ("right_column" in s) == ("right_value" in s):
                raise ValueError(
                    f"satisfies needs exactly one of right_column/"
                    f"right_value: {s}")
        if s["kind"] == "functional_dependency" and "determines" not in s:
            raise ValueError(
                f"functional_dependency needs determines: {s}")
        k = _cid(s)
        if k in seen:
            raise ValueError(f"duplicate constraint {k}")
        seen.add(k)


# ---------------------------------------------------------------------------
# Engine side
# ---------------------------------------------------------------------------

def _distinct_nonnull_count(ds, column: str, n_buckets: int = 64) -> int:
    """Exact COUNT(DISTINCT col) via per-batch unique partials → one
    int64 hash-bucket shuffle → per-bucket nunique.  Bounded by the
    per-batch distinct set, never per-key Python (functions/dedup.py
    combiner shape)."""
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df[column].dropna().drop_duplicates()
        b = (pd.util.hash_pandas_object(u, index=False).to_numpy()
             % n_buckets).astype("int64") if len(u) else \
            np.array([], dtype="int64")
        return pd.DataFrame({"v": u.to_numpy(), "__b": b})

    def combine(g: pd.DataFrame) -> "pa.Table":
        return pa.table({"nd": pa.array([int(g["v"].nunique())],
                                        pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    return int(parts["nd"].sum()) if len(parts) else 0


def _distinct_tuple_count(ds, columns: List[str],
                          n_buckets: int = 64) -> int:
    """Exact COUNT(DISTINCT (c1, .., ck)) over rows with ALL columns
    non-null — the composite-key twin of _distinct_nonnull_count (same
    per-batch-distinct partial → tuple-hash bucket shuffle → one
    vectorized drop_duplicates per bucket)."""
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[columns].dropna().drop_duplicates()
        b = (pd.util.hash_pandas_object(sub, index=False).to_numpy()
             % n_buckets).astype("int64") if len(sub) else \
            np.array([], dtype="int64")
        sub = sub.reset_index(drop=True)
        sub["__b"] = b
        return sub

    def combine(g: pd.DataFrame) -> "pa.Table":
        return pa.table({"nd": pa.array(
            [int(len(g[columns].drop_duplicates()))], pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    return int(parts["nd"].sum()) if len(parts) else 0


def _duplicated_tuples(ds, columns: List[str],
                       n_buckets: int = 64) -> list:
    """Distinct all-non-null column TUPLES occurring more than once,
    rendered as '|'-joined strings (rows mode of unique_together).
    Same bucketed (tuple, count) combiner as _duplicated_values."""
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[columns].dropna()
        vc = sub.groupby(columns, sort=False).size().reset_index(
            name="n")
        b = (pd.util.hash_pandas_object(vc[columns], index=False)
             .to_numpy() % n_buckets).astype("int64") if len(vc) else \
            np.array([], dtype="int64")
        vc["__b"] = b
        return vc

    def combine(g: pd.DataFrame) -> "pa.Table":
        tot = g.groupby(columns, sort=False)["n"].sum().reset_index()
        dup = tot[tot["n"] > 1]
        keys = ["|".join(str(v) for v in row)
                for row in dup[columns].itertuples(index=False)]
        return pa.table({"v": pa.array(keys, pa.string())})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    return parts["v"].tolist() if len(parts) else []


def _entropy_stats(ds, column: str, n_buckets: int = 64):
    """(N, Σ n_v·ln n_v) for Shannon entropy of a categorical column:
    per-batch value-count partials → value-hash bucket shuffle →
    per-bucket global counts → the two scalars.  Shuffle volume is
    bounded by the distinct-value set; entropy = ln N − Σ n ln n / N
    is finished on the driver from n_buckets partial pairs."""
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].dropna().value_counts()
        v = vc.index.to_numpy()
        b = (pd.util.hash_pandas_object(pd.Series(v), index=False)
             .to_numpy() % n_buckets).astype("int64") if len(v) else \
            np.array([], dtype="int64")
        return pd.DataFrame({"v": v, "n": vc.to_numpy(dtype="int64"),
                             "__b": b})

    def combine(g: pd.DataFrame) -> "pa.Table":
        tot = g.groupby("v", sort=False)["n"].sum().to_numpy(
            dtype="float64")
        return pa.table({
            "n": pa.array([float(tot.sum())], pa.float64()),
            "nlogn": pa.array([float((tot * np.log(tot)).sum())],
                              pa.float64())})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    if not len(parts):
        return 0.0, 0.0
    return float(parts["n"].sum()), float(parts["nlogn"].sum())


def _exact_ks(ds, spec: dict, n_bins: int = 64):
    """Exact two-sample KS statistic between the rows whose
    ``split_column`` is in ``baseline_values`` vs ``current_values``
    (the q_ks_drift_exact shape: fixed-bin (bin, side) count partials
    → driver cumulative offsets → one bin-key shuffle; each bin task
    sorts only its value range and emits its local tie-collapsed
    sup |F0−F1|).  Returns (ks, n0, n1); ks is 0.0 when a side is
    empty."""
    col, sc = spec["column"], spec["split_column"]
    base = frozenset(spec["baseline_values"])
    curr = frozenset(spec["current_values"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[sc, col]].dropna(subset=[col])
        in_b = sub[sc].isin(base).to_numpy()
        in_c = sub[sc].isin(curr).to_numpy()
        keep = in_b | in_c
        return pd.DataFrame({
            "value": sub[col].to_numpy(dtype="float64")[keep],
            # baseline wins rows in both sides (SQL mirrors: s0 checked
            # first) — sides must partition the pool exactly once
            "side": np.where(in_b[keep], 0, 1).astype("int64")})

    pool = ds.map_batches(prep, batch_format="pandas").materialize()

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        s = df["side"].to_numpy(np.int64)
        return pd.DataFrame({
            "lo": [float(v.min()) if len(v) else np.inf],
            "hi": [float(v.max()) if len(v) else -np.inf],
            "n0": [int((s == 0).sum())], "n1": [int((s == 1).sum())]})

    st = pool.map_batches(stats, batch_format="pandas").to_pandas()
    if not len(st):
        return 0.0, 0, 0
    n0, n1 = int(st["n0"].sum()), int(st["n1"].sum())
    if n0 == 0 or n1 == 0:
        return 0.0, n0, n1
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    inner = np.linspace(lo, hi, n_bins + 1)[1:-1]

    def binof(v: np.ndarray) -> np.ndarray:
        return np.searchsorted(inner, v, side="right").astype(np.int64)

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"b": binof(df["value"].to_numpy(np.float64)),
                          "side": df["side"].to_numpy(np.int64)})
        out = g.groupby(["b", "side"], as_index=False).size().rename(
            columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    bc = (pool.map_batches(bin_counts, batch_format="pandas")
          .to_pandas().groupby(["b", "side"], as_index=False)["n"].sum())
    off = np.zeros((2, n_bins), dtype=np.int64)
    for side in (0, 1):
        per = np.zeros(n_bins, dtype=np.int64)
        sel = bc[bc["side"] == side]
        per[sel["b"].to_numpy(np.int64)] = sel["n"].to_numpy(np.int64)
        off[side] = np.concatenate([[0], np.cumsum(per)[:-1]])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["value", "side"]].copy()
        out["__bin"] = binof(df["value"].to_numpy(np.float64))
        return out

    import pyarrow as pa

    def bin_ks(g: pd.DataFrame) -> "pa.Table":
        b = int(g["__bin"].iloc[0])
        v = g["value"].to_numpy(np.float64)
        s = g["side"].to_numpy(np.int64)
        order = np.argsort(v, kind="mergesort")
        v, s = v[order], s[order]
        c0 = np.cumsum(s == 0)
        c1 = np.cumsum(s == 1)
        last = np.nonzero(np.r_[v[1:] != v[:-1], True])[0]
        f0 = (off[0][b] + c0[last]) / np.float64(n0)
        f1 = (off[1][b] + c1[last]) / np.float64(n1)
        return pa.table({"dmax": pa.array(
            [float(np.abs(f0 - f1).max())], pa.float64())})

    out = (pool.map_batches(tag, batch_format="pandas")
           .groupby("__bin").map_groups(bin_ks, batch_format="pandas")
           .to_pandas())
    return (float(out["dmax"].max()) if len(out) else 0.0), n0, n1


def _quantile_exact(ds, column: str, q: float):
    """Exact global quantile_cont of one column — the
    grouped_quantile_exact machinery with a constant group key (the
    projection is already pruned to the one column)."""
    from butteraugli_ray.functions.rank import grouped_quantile_exact

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[column]].copy()
        out["__g"] = np.int64(0)
        return out

    tagged = ds.map_batches(add_key, batch_format="pandas")
    res = grouped_quantile_exact(tagged, "__g", column, q=q)
    if not len(res):
        return None
    return float(res["quantile"].iloc[0])


def _ts_to_micros(v: pd.Series) -> np.ndarray:
    """Timestamp series → int64 epoch microseconds (exact in float64
    to year ~2255; parquet timestamps are µs so ns truncation is
    lossless)."""
    return v.to_numpy(dtype="datetime64[us]").astype("int64")


def _monotonic_check(ds, spec: dict, key: str | None = None,
                     n_buckets: int = 64):
    """Grouped non-decreasing check.  One group-hash bucket shuffle,
    sort-within-bucket by (group, order, value), vectorized adjacent
    diff (the repo's q_user_gap_stats window shape — never per-key
    Python).  Returns (n_nonnull, n_violations) when ``key`` is None,
    else the list of key values (as strings) of violating rows.
    ``n_buckets`` bounds per-task group fan-in; raise it with data
    volume (buckets, not groups, are the unit of shuffle)."""
    import pyarrow as pa

    col, g, o = spec["column"], spec["group_by"], spec["order_by"]
    # dedupe: key/order/group may coincide (e.g. order_by == key)
    want = list(dict.fromkeys([g, o, col] + ([key] if key else [])))

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[want].dropna(subset=[col])
        b = (pd.util.hash_pandas_object(sub[g], index=False).to_numpy()
             % n_buckets).astype("int64") if len(sub) else \
            np.array([], dtype="int64")
        sub = sub.reset_index(drop=True)
        sub["__b"] = b
        return sub

    def check(gr: pd.DataFrame) -> "pa.Table":
        # key as final tie-break in rows mode: which ROW flags under a
        # full (o, value) tie depends on tie order, so pin it on both
        # sides (the violation COUNT is tie-invariant — audit mode
        # needs no key)
        gr = gr.sort_values([g, o, col] + ([key] if key else []),
                            kind="mergesort")
        v = gr[col].to_numpy()
        grp = gr[g].to_numpy()
        bad = np.zeros(len(gr), dtype=bool)
        if len(gr) > 1:
            bad[1:] = (v[1:] < v[:-1]) & (grp[1:] == grp[:-1])
        if key is None:
            return pa.table({"n": pa.array([len(gr)], pa.int64()),
                             "viol": pa.array([int(bad.sum())], pa.int64())})
        return pa.table({"key": pa.array(
            gr[key].to_numpy()[bad].astype(str))})

    out = (ds.map_batches(bucket, batch_format="pandas")
           .groupby("__b").map_groups(check, batch_format="pandas")
           .to_pandas())
    if key is None:
        return ((int(out["n"].sum()), int(out["viol"].sum()))
                if len(out) else (0, 0))
    return out["key"].tolist()


import operator as _operator

# engine-side callables for SAT_OPS ("=" / "<>" are pandas eq/ne)
_SAT_OP_FN = {"<": _operator.lt, "<=": _operator.le,
              ">": _operator.gt, ">=": _operator.ge,
              "=": _operator.eq, "<>": _operator.ne}


def _fd_violating_keys(ds, a: str, b: str, n_buckets: int = 64,
                       as_keys: bool = False):
    """Determinant values of a functional dependency a → b with more
    than one distinct non-null dependent.  Per-batch distinct (a, b)
    pair partials → determinant-hash bucket shuffle → ONE vectorized
    nunique per bucket (functions/dedup.py combiner shape): shuffle
    volume is bounded by the distinct-pair set and no per-key Python
    ever runs.  Returns the violating-key COUNT, or the keys as
    strings when ``as_keys``."""
    import pyarrow as pa

    cols = list(dict.fromkeys([a, b]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[cols].dropna().drop_duplicates()
        bkt = (pd.util.hash_pandas_object(sub[a], index=False)
               .to_numpy() % n_buckets).astype("int64") if len(sub) \
            else np.array([], dtype="int64")
        sub = sub.reset_index(drop=True)
        sub["__b"] = bkt
        return sub

    def combine(g: pd.DataFrame) -> "pa.Table":
        nd = g.drop_duplicates(cols).groupby(a, sort=False)[b].nunique()
        bad = nd[nd > 1]
        if as_keys:
            return pa.table({"k": pa.array(
                bad.index.to_numpy().astype(str))})
        return pa.table({"n": pa.array([int(len(bad))], pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    if as_keys:
        return parts["k"].tolist() if len(parts) else []
    return int(parts["n"].sum()) if len(parts) else 0


def _ref_key_set(read, spec: dict):
    """Distinct reference keys for a foreign_key spec, as a driver-side
    numpy array ready for ray.put (dim-table path; see module doc for
    the 100 TB fact→fact alternative)."""
    ref = read(spec["ref_table"], [spec["ref_column"]])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df[spec["ref_column"]].dropna().drop_duplicates()
        return pd.DataFrame({"v": u.to_numpy()})

    parts = ref.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.unique(parts["v"]) if len(parts) else np.array([])


def audit_constraints(read, suite: List[dict]) -> pd.DataFrame:
    """Run a constraint suite.  ``read(table, columns)`` →
    ray.data.Dataset (injected so pipelines and tests control the
    source).  Returns one row per constraint:
    (table_name, column_name, check, n_rows, n_violations, passed),
    sorted by the three key columns."""
    import ray as _ray

    _validate_suite(suite)
    read = _locked(read)
    by_table: Dict[str, List[dict]] = {}
    for s in suite:
        by_table.setdefault(s["table"], []).append(s)

    def _audit_one(table: str, specs: List[dict]) -> list:
        rows = []
        row_local = [s for s in specs if s["kind"] in
                     ("not_null", "range", "in_set", "regex",
                      "foreign_key", "row_count_min", "null_ratio_max",
                      "mean_between", "stddev_between", "satisfies",
                      "min_between", "max_between", "freshness",
                      "corr_between")]
        uniques = [s for s in specs if s["kind"] == "unique"]
        monotonics = [s for s in specs if s["kind"] == "monotonic"]
        distincts = [s for s in specs if s["kind"] in
                     ("distinct_count_min", "distinct_count_max")]
        psis = [s for s in specs if s["kind"] == "psi_max"]
        snaps = [s for s in specs if s["kind"] == "psi_snapshot"]
        ratios = [s for s in specs
                  if s["kind"] == "row_count_ratio_between"]
        fds = [s for s in specs
               if s["kind"] == "functional_dependency"]
        sats = [s for s in specs if s["kind"] == "satisfies"]
        togethers = [s for s in specs if s["kind"] == "unique_together"]
        entropies = [s for s in specs if s["kind"] == "entropy_between"]
        quantiles = [s for s in specs if s["kind"] == "quantile_between"]
        kss = [s for s in specs if s["kind"] == "ks_max"]
        corrs = [s for s in specs if s["kind"] == "corr_between"]
        cols = sorted({s["column"] for s in specs if "column" in s}
                      | {s[k] for s in monotonics
                         for k in ("group_by", "order_by")}
                      | {s["split_column"] for s in psis + kss}
                      | {s["column"] for s in snaps}
                      | {s["determines"] for s in fds}
                      | {s["left"] for s in sats}
                      | {s["right_column"] for s in sats
                         if "right_column" in s}
                      | {c for s in togethers for c in s["columns"]}
                      | {s["with_column"] for s in corrs})
        ds = read(table, cols or None)

        # ONE storage read per table per audit: every kind beyond the
        # shared sufficient-stat scan (bucketed distinct / monotonic /
        # fd / tuple-distinct / entropy / quantile / ks) consumes the
        # lazy Dataset again, and each consumption would re-read the
        # parquet.  When more than one consumption is coming,
        # materialize the PRUNED projection once — the helpers then
        # stream object-store blocks (spill-backed) instead of paying
        # another full storage scan per constraint kind.  At 100 TB
        # this turns a ~10-scan suite into one scan + local re-reads.
        n_consume = (
            int(bool(row_local or uniques or togethers or psis or snaps))
            + len({s["column"] for s in uniques}
                  | {s["column"] for s in distincts})
            + len(monotonics) + len(fds) + len(togethers)
            + len(entropies) + len(quantiles) + len(kss))
        if n_consume >= 2:
            ds = ds.materialize()

        # one broadcast ref-set per fk spec (dim-bounded)
        fk_refs = {}
        for s in row_local:
            if s["kind"] == "foreign_key":
                fk_refs[_cid(s)] = _ray.put(_ref_key_set(read, s))

        compiled = []
        for s in row_local:
            kind, cid = s["kind"], _cid(s)
            if kind == "not_null":
                col = s["column"]
                compiled.append((cid, lambda df, c=col:
                                 int(df[c].isna().sum())))
            elif kind == "range":
                col, lo, hi = s["column"], s.get("min"), s.get("max")

                def f(df, c=col, lo=lo, hi=hi):
                    v = df[c].dropna().to_numpy()
                    bad = np.zeros(len(v), dtype=bool)
                    if lo is not None:
                        bad |= v < lo
                    if hi is not None:
                        bad |= v > hi
                    return int(bad.sum())
                compiled.append((cid, f))
            elif kind == "in_set":
                col, allowed = s["column"], frozenset(s["values"])
                compiled.append((cid, lambda df, c=col, a=allowed:
                                 int((~df[c].dropna().isin(a)).sum())))
            elif kind == "regex":
                col, pat = s["column"], re.compile(s["pattern"])
                compiled.append((cid, lambda df, c=col, p=pat:
                                 int((~df[c].dropna().str.contains(p))
                                     .sum())))
            elif kind == "foreign_key":
                col, ref = s["column"], fk_refs[_cid(s)]

                def f(df, c=col, r=ref):
                    keys = _ray.get(r)
                    v = df[c].dropna()
                    return int((~v.isin(keys)).sum())
                compiled.append((cid, f))
            elif kind == "row_count_min":
                compiled.append((cid, lambda df: 0))  # resolved below
            elif kind == "null_ratio_max":
                # s0 = null count; thresholded on the driver
                col = s["column"]
                compiled.append((cid, lambda df, c=col:
                                 (0, float(df[c].isna().sum()), 0.0, 0.0)))
            elif kind in ("mean_between", "stddev_between"):
                # sufficient stats (n, Σx, Σx²); gated on the driver
                col = s["column"]

                def f(df, c=col):
                    v = df[c].dropna().to_numpy(dtype="float64")
                    return (0, float(len(v)), float(v.sum()),
                            float((v * v).sum()))
                compiled.append((cid, f))
            elif kind == "satisfies":
                op = _SAT_OP_FN[s["op"]]
                left = s["left"]
                if "right_column" in s:
                    rc = s["right_column"]

                    def f(df, l=left, r=rc, o=op):
                        m = df[l].notna() & df[r].notna()
                        return int((~o(df[l], df[r]) & m).sum())
                else:
                    rv = s["right_value"]

                    def f(df, l=left, rv=rv, o=op):
                        return int((~o(df[l], rv)
                                    & df[l].notna()).sum())
                compiled.append((cid, f))
            elif kind in ("min_between", "max_between"):
                # per-batch extrema ride the m0 (max) / m1 (min) slots
                col = s["column"]

                def f(df, c=col):
                    v = df[c].dropna().to_numpy(dtype="float64")
                    return (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                            float(v.max()) if len(v) else -np.inf,
                            float(v.min()) if len(v) else np.inf)
                compiled.append((cid, f))
            elif kind == "freshness":
                # max epoch-µs through the m0 slot (exact in float64)
                col = s["column"]

                def f(df, c=col):
                    v = df[c].dropna()
                    mx = float(_ts_to_micros(v).max()) if len(v) \
                        else -np.inf
                    return (0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                            mx, np.inf)
                compiled.append((cid, f))
            elif kind == "corr_between":
                # Pearson sufficient stats over rows with BOTH columns
                # non-null: (n, Σx, Σy, Σxx, Σyy, Σxy) in s0..s5
                cx, cy = s["column"], s["with_column"]

                def f(df, cx=cx, cy=cy):
                    sub = df[list(dict.fromkeys([cx, cy]))].dropna()
                    x = sub[cx].to_numpy(dtype="float64")
                    y = sub[cy].to_numpy(dtype="float64")
                    return (0, float(len(x)), float(x.sum()),
                            float(y.sum()), float((x * x).sum()),
                            float((y * y).sum()), float((x * y).sum()))
                compiled.append((cid, f))

        # unique's non-null count rides the same shared scan (s0)
        for s in uniques:
            compiled.append((_cid(s), lambda df, c=s["column"]:
                             (0, float(df[c].notna().sum()), 0.0, 0.0)))

        # unique_together's all-non-null row count rides it too
        for s in togethers:
            compiled.append((_cid(s), lambda df, cc=tuple(s["columns"]):
                             (0, float(df[list(cc)].notna().all(axis=1)
                                       .sum()), 0.0, 0.0)))

        # psi histograms ride the shared scan too: one cid row per bin
        # (cid|bin, s0=baseline count, s1=current count) through the
        # SAME Sum-aggregate shuffle — no second pass over the table
        psi_parts = []
        for s in psis:
            psi_parts.append((_cid(s), s["column"], s["split_column"],
                              np.asarray(s["edges"], dtype="float64"),
                              frozenset(s["baseline_values"]),
                              frozenset(s["current_values"])))

        snap_parts = [(_cid(s), s["column"],
                       np.asarray(s["edges"], dtype="float64"))
                      for s in snaps]

        def partial(df: pd.DataFrame, _c=tuple(compiled),
                    _p=tuple(psi_parts),
                    _sn=tuple(snap_parts)) -> pd.DataFrame:
            res = []
            for _, fn in _c:
                r = fn(df)
                if not isinstance(r, tuple):
                    r = (r,)
                # pad to (nv, s0..s5, m0, m1): sums default 0, the
                # max slot -inf, the min slot +inf
                r = r + (0.0,) * (7 - len(r)) if len(r) < 7 else r
                if len(r) < 9:
                    r = r + (-np.inf, np.inf)
                res.append(r)
            cids = [cid for cid, _ in _c]
            slots = [[r[i] for r in res] for i in range(9)]
            for cid, col, sc, edges, base, curr in _p:
                sub = df[list(dict.fromkeys([sc, col]))].dropna(
                    subset=[col])
                v = sub[col].to_numpy(dtype="float64")
                bins = np.searchsorted(edges, v, side="right")
                nb = len(edges) + 1
                ne = np.bincount(bins[sub[sc].isin(base).to_numpy()],
                                 minlength=nb)
                na = np.bincount(bins[sub[sc].isin(curr).to_numpy()],
                                 minlength=nb)
                for i in range(nb):
                    cids.append(f"{cid}|{i}")
                    slots[0].append(0)
                    slots[1].append(float(ne[i]))
                    slots[2].append(float(na[i]))
                    for j in range(3, 7):
                        slots[j].append(0.0)
                    slots[7].append(-np.inf)
                    slots[8].append(np.inf)
            for cid, col, edges in _sn:
                v = df[col].dropna().to_numpy(dtype="float64")
                bins = np.searchsorted(edges, v, side="right")
                na = np.bincount(bins, minlength=len(edges) + 1)
                for i in range(len(edges) + 1):
                    cids.append(f"{cid}|{i}")
                    slots[0].append(0)
                    slots[1].append(float(na[i]))
                    for j in range(2, 7):
                        slots[j].append(0.0)
                    slots[7].append(-np.inf)
                    slots[8].append(np.inf)
            return pd.DataFrame({
                "cid": cids,
                "n_rows": np.int64(len(df)),
                "n_viol": np.array(slots[0], dtype="int64"),
                "s0": np.array(slots[1], dtype="float64"),
                "s1": np.array(slots[2], dtype="float64"),
                "s2": np.array(slots[3], dtype="float64"),
                "s3": np.array(slots[4], dtype="float64"),
                "s4": np.array(slots[5], dtype="float64"),
                "s5": np.array(slots[6], dtype="float64"),
                "m0": np.array(slots[7], dtype="float64"),
                "m1": np.array(slots[8], dtype="float64")})

        from ray.data.aggregate import Max, Min, Sum
        _agg_cols = ["n_rows", "n_viol", "s0", "s1", "s2", "s3", "s4",
                     "s5", "m0", "m1"]

        def _shared_scan() -> pd.DataFrame:
            return (ds.map_batches(partial, batch_format="pandas")
                    .groupby("cid")
                    .aggregate(Sum("n_rows", alias_name="n_rows"),
                               Sum("n_viol", alias_name="n_viol"),
                               Sum("s0", alias_name="s0"),
                               Sum("s1", alias_name="s1"),
                               Sum("s2", alias_name="s2"),
                               Sum("s3", alias_name="s3"),
                               Sum("s4", alias_name="s4"),
                               Sum("s5", alias_name="s5"),
                               Max("m0", alias_name="m0"),
                               Min("m1", alias_name="m1"))
                    .to_pandas())

        # The extra-pass helpers are independent Dataset consumptions
        # over the SAME materialized blocks — launch them concurrently
        # from driver threads (each gets its own streaming executor) so
        # the per-job fixed overhead overlaps instead of serializing.
        # Results are computed identically either way; only wall-clock
        # changes.
        from concurrent.futures import ThreadPoolExecutor
        futs = {}
        with ThreadPoolExecutor(max_workers=AUDIT_PARALLELISM) as tpe:
            if compiled or psi_parts or snap_parts:
                futs["agg"] = tpe.submit(_shared_scan)
            for col in sorted({s["column"] for s in uniques}
                              | {s["column"] for s in distincts}):
                futs[("nd", col)] = tpe.submit(
                    _distinct_nonnull_count, ds, col)
            for i, s in enumerate(monotonics):
                futs[("mono", i)] = tpe.submit(_monotonic_check, ds, s)
            for i, s in enumerate(fds):
                futs[("fd", i)] = tpe.submit(
                    _fd_violating_keys, ds, s["column"], s["determines"])
            for i, s in enumerate(togethers):
                futs[("tup", i)] = tpe.submit(
                    _distinct_tuple_count, ds, list(s["columns"]))
            for i, s in enumerate(entropies):
                futs[("ent", i)] = tpe.submit(
                    _entropy_stats, ds, s["column"])
            for i, s in enumerate(quantiles):
                futs[("qnt", i)] = tpe.submit(
                    _quantile_exact, ds, s["column"], float(s["q"]))
            for i, s in enumerate(kss):
                futs[("ks", i)] = tpe.submit(_exact_ks, ds, s)
            for i, s in enumerate(ratios):
                # metadata-only count of the un-transformed ref read
                futs[("ratio", i)] = tpe.submit(
                    lambda rt=s["ref_table"]: int(read(rt, None).count()))

        agg = (futs["agg"].result() if "agg" in futs
               else pd.DataFrame(columns=["cid"] + _agg_cols))
        agg_map = {r["cid"]: (int(r["n_rows"]), int(r["n_viol"]),
                              float(r["s0"]), float(r["s1"]),
                              float(r["s2"]), float(r["s3"]),
                              float(r["s4"]), float(r["s5"]),
                              float(r["m0"]), float(r["m1"]))
                   for _, r in agg.iterrows()}
        _Z = (0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -np.inf, np.inf)
        n_table = next(iter(agg_map.values()))[0] if agg_map else (
            int(ds.count()) if (uniques or monotonics or distincts
                                or psis or ratios or fds or togethers
                                or entropies or quantiles or kss
                                or snaps)
            else 0)

        def _gate(stat, lo, hi) -> int:
            """1 when a non-null statistic falls outside [lo, hi] —
            the shared CASE shape (NULL statistics pass, matching SQL
            NULL propagation into CASE → ELSE 0)."""
            return int(stat is not None and (
                (lo is not None and stat < lo)
                or (hi is not None and stat > hi)))

        for s in row_local:
            cid = _cid(s)
            (n_rows, n_viol, s0, s1, s2, s3, s4, s5,
             m0, m1) = agg_map.get(cid, _Z)
            if s["kind"] == "row_count_min":
                n_viol = max(0, int(s["min_rows"]) - n_rows)
            elif s["kind"] == "null_ratio_max":
                # same inequality shape as the generated SQL:
                # nulls > max_ratio * rows
                n_viol = int(s0) if s0 > float(s["max_ratio"]) * n_rows \
                    else 0
            elif s["kind"] == "mean_between":
                mean = s1 / s0 if s0 else None
                n_viol = _gate(mean, s.get("min"), s.get("max"))
            elif s["kind"] == "stddev_between":
                if s0 > 1:
                    var = max(0.0, (s2 - s1 * s1 / s0) / (s0 - 1.0))
                    sd = float(np.sqrt(var))
                else:
                    sd = None
                n_viol = _gate(sd, s.get("min"), s.get("max"))
            elif s["kind"] == "min_between":
                stat = m1 if np.isfinite(m1) else None
                n_viol = _gate(stat, s.get("min"), s.get("max"))
            elif s["kind"] == "max_between":
                stat = m0 if np.isfinite(m0) else None
                n_viol = _gate(stat, s.get("min"), s.get("max"))
            elif s["kind"] == "freshness":
                cutoff = (pd.Timestamp(s["as_of"])
                          - pd.Timedelta(seconds=float(
                              s["max_lag_seconds"])))
                cut_us = float(cutoff.value // 1000)
                n_viol = int(np.isfinite(m0) and m0 < cut_us)
            elif s["kind"] == "corr_between":
                # sample Pearson from (n, Σx, Σy, Σxx, Σyy, Σxy) —
                # DuckDB corr() semantics: NULL (→ pass) when n < 2 or
                # either variance is 0
                n, sx, sy, sxx, syy, sxy = s0, s1, s2, s3, s4, s5
                stat = None
                if n >= 2:
                    vx, vy = sxx - sx * sx / n, syy - sy * sy / n
                    if vx > 0 and vy > 0:
                        stat = (sxy - sx * sy / n) / float(
                            np.sqrt(vx * vy))
                n_viol = _gate(stat, s.get("min"), s.get("max"))
            allowed = ((1.0 - float(s["mostly"])) * n_rows
                       if "mostly" in s else 0.0)
            rows.append((s["table"], _disp_col(s), s["kind"],
                         n_rows, n_viol, allowed))

        for i, s in enumerate(monotonics):
            nn, n_viol = futs[("mono", i)].result()
            rows.append((s["table"], _disp_col(s), "monotonic",
                         nn, n_viol, 0.0))

        # exact distinct counts, shared between unique and
        # distinct_count_min specs on the same column (one future per
        # column, already resolved)
        def nd_of(column: str) -> int:
            return futs[("nd", column)].result()

        for s in distincts:
            nd = nd_of(s["column"])
            over = (max(0, int(s["min_distinct"]) - nd)
                    if s["kind"] == "distinct_count_min"
                    else max(0, nd - int(s["max_distinct"])))
            rows.append((s["table"], _disp_col(s), s["kind"],
                         n_table, over, 0.0))

        for i, s in enumerate(fds):
            nbad = futs[("fd", i)].result()
            rows.append((s["table"], _disp_col(s),
                         "functional_dependency", n_table, nbad, 0.0))

        for s in psis:
            cid = _cid(s)
            nb = len(s["edges"]) + 1
            ne = np.array([agg_map.get(f"{cid}|{i}", _Z)[2]
                           for i in range(nb)])
            na = np.array([agg_map.get(f"{cid}|{i}", _Z)[3]
                           for i in range(nb)])
            te, ta = float(ne.sum()), float(na.sum())
            if te == 0 or ta == 0:
                n_viol = 0
            else:
                pe, pa_ = ne / te, na / ta
                psi = float(((pa_ - pe) * np.log((pa_ + PSI_EPS)
                                                 / (pe + PSI_EPS))).sum())
                n_viol = int(psi > float(s["max_psi"]))
            rows.append((s["table"], _disp_col(s), "psi_max",
                         int(te + ta), n_viol, 0.0))

        for s in snaps:
            cid = _cid(s)
            nb = len(s["edges"]) + 1
            ne = np.asarray(s["baseline_counts"], dtype="float64")
            na = np.array([agg_map.get(f"{cid}|{i}", _Z)[2]
                           for i in range(nb)])
            te, ta = float(ne.sum()), float(na.sum())
            if te == 0 or ta == 0:
                n_viol = 0
            else:
                pe, pa_ = ne / te, na / ta
                psi = float(((pa_ - pe) * np.log((pa_ + PSI_EPS)
                                                 / (pe + PSI_EPS))).sum())
                n_viol = int(psi > float(s["max_psi"]))
            rows.append((s["table"], _disp_col(s), "psi_snapshot",
                         int(ta), n_viol, 0.0))

        for i, s in enumerate(ratios):
            # both counts come from parquet metadata (Dataset.count on
            # an un-transformed read) — no data scan
            n_ref = futs[("ratio", i)].result()
            lo, hi = s.get("min"), s.get("max")
            if n_ref == 0:
                n_viol = 0
            else:
                ratio = n_table / n_ref
                n_viol = int((lo is not None and ratio < lo)
                             or (hi is not None and ratio > hi))
            rows.append((s["table"], "*", "row_count_ratio_between",
                         n_table, n_viol, 0.0))

        for s in uniques:
            # non-null count came through the shared scan (s0); the
            # distinct count is the bucketed combiner (cached per
            # column, shared with distinct_count_min)
            nn = int(agg_map.get(_cid(s), _Z)[2])
            nd = nd_of(s["column"])
            rows.append((s["table"], _disp_col(s), "unique",
                         n_table, nn - nd, 0.0))

        for i, s in enumerate(togethers):
            # all-non-null row count rode the shared scan (s0); the
            # composite distinct is its own bucketed tuple combiner
            nn = int(agg_map.get(_cid(s), _Z)[2])
            nd = futs[("tup", i)].result()
            rows.append((s["table"], _disp_col(s), "unique_together",
                         n_table, nn - nd, 0.0))

        for i, s in enumerate(entropies):
            n, nlogn = futs[("ent", i)].result()
            stat = float(np.log(n) - nlogn / n) if n > 0 else None
            rows.append((s["table"], _disp_col(s), "entropy_between",
                         n_table, _gate(stat, s.get("min"),
                                        s.get("max")), 0.0))

        for i, s in enumerate(quantiles):
            stat = futs[("qnt", i)].result()
            rows.append((s["table"], _disp_col(s), "quantile_between",
                         n_table, _gate(stat, s.get("min"),
                                        s.get("max")), 0.0))

        for i, s in enumerate(kss):
            ks, n0, n1 = futs[("ks", i)].result()
            n_viol = int(n0 > 0 and n1 > 0 and ks > float(s["max_ks"]))
            rows.append((s["table"], _disp_col(s), "ks_max",
                         n0 + n1, n_viol, 0.0))
        return rows

    # tables audit concurrently too (driver threads; each table's
    # pipeline is independent) — assembly order stays deterministic
    from concurrent.futures import ThreadPoolExecutor as _TPE
    with _TPE(max_workers=min(AUDIT_PARALLELISM,
                              max(1, len(by_table)))) as tpe:
        tfuts = {t: tpe.submit(_audit_one, t, sp)
                 for t, sp in sorted(by_table.items())}
    rows = []
    for t in sorted(tfuts):
        rows.extend(tfuts[t].result())

    out = pd.DataFrame(rows, columns=["table_name", "column_name",
                                      "check", "n_rows", "n_violations",
                                      "__allowed"])
    sev_map = {(s["table"], _disp_col(s), s["kind"]):
               s.get("severity", "error") for s in suite}
    out.insert(3, "severity", [
        sev_map[(t, c, k)] for t, c, k in zip(
            out["table_name"], out["column_name"], out["check"])])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_violations"] = out["n_violations"].astype("int64")
    # int64 0/1, not bool: the driver value-hash and DuckDB agree on
    # integers unambiguously.  The tolerance threshold defaults to 0.0
    # (passed ⇔ no violations) and is (1 - mostly) · n_rows for specs
    # carrying ``mostly`` — the identical float64 product the generated
    # SQL compares against.
    out["passed"] = (out["n_violations"]
                     <= out["__allowed"]).astype("int64")
    out = out.drop(columns="__allowed")
    return (out.sort_values(["table_name", "column_name", "check"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Oracle side — SQL generated from the same specs
# ---------------------------------------------------------------------------

def _sql_quote(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(float(v)) if isinstance(v, float) else str(v)


def _viol_expr(s: dict) -> str:
    kind = s["kind"]
    c = s.get("column")
    if kind == "not_null":
        return f"count(*) - count({c})"
    if kind == "unique":
        return f"count({c}) - count(DISTINCT {c})"
    if kind == "range":
        conds = []
        if s.get("min") is not None:
            conds.append(f"{c} < {_sql_quote(s['min'])}")
        if s.get("max") is not None:
            conds.append(f"{c} > {_sql_quote(s['max'])}")
        return ("count(*) FILTER (WHERE " + " OR ".join(conds) + ")")
    if kind == "in_set":
        vals = ", ".join(_sql_quote(v) for v in sorted(s["values"]))
        return (f"count(*) FILTER (WHERE {c} IS NOT NULL "
                f"AND {c} NOT IN ({vals}))")
    if kind == "regex":
        return (f"count(*) FILTER (WHERE {c} IS NOT NULL AND NOT "
                f"regexp_matches({c}, {_sql_quote(s['pattern'])}))")
    if kind == "row_count_min":
        return (f"CASE WHEN count(*) < {int(s['min_rows'])} "
                f"THEN {int(s['min_rows'])} - count(*) ELSE 0 END")
    if kind == "null_ratio_max":
        r = _sql_quote(float(s["max_ratio"]))
        return (f"CASE WHEN (count(*) - count({c})) > {r} * count(*) "
                f"THEN count(*) - count({c}) ELSE 0 END")
    if kind == "distinct_count_min":
        m = int(s["min_distinct"])
        return (f"CASE WHEN count(DISTINCT {c}) < {m} "
                f"THEN {m} - count(DISTINCT {c}) ELSE 0 END")
    if kind == "distinct_count_max":
        m = int(s["max_distinct"])
        return (f"CASE WHEN count(DISTINCT {c}) > {m} "
                f"THEN count(DISTINCT {c}) - {m} ELSE 0 END")
    if kind == "row_count_ratio_between":
        ratio = (f"CAST(count(*) AS DOUBLE) / "
                 f"NULLIF((SELECT count(*) FROM {s['ref_table']}), 0)")
        conds = []
        if s.get("min") is not None:
            conds.append(f"{ratio} < {_sql_quote(s['min'])}")
        if s.get("max") is not None:
            conds.append(f"{ratio} > {_sql_quote(s['max'])}")
        return ("CASE WHEN " + " OR ".join(conds) + " THEN 1 ELSE 0 END")
    if kind in ("mean_between", "stddev_between", "min_between",
                "max_between", "corr_between", "quantile_between"):
        expr = {"mean_between": f"avg({c})",
                "stddev_between": f"stddev_samp({c})",
                "min_between": f"min({c})",
                "max_between": f"max({c})",
                "corr_between": f"corr({c}, {s.get('with_column')})",
                "quantile_between":
                    f"quantile_cont({c}, {s.get('q')})"}[kind]
        conds = []
        if s.get("min") is not None:
            conds.append(f"{expr} < {_sql_quote(s['min'])}")
        if s.get("max") is not None:
            conds.append(f"{expr} > {_sql_quote(s['max'])}")
        return ("CASE WHEN " + " OR ".join(conds) + " THEN 1 ELSE 0 END")
    if kind == "freshness":
        cutoff = (pd.Timestamp(s["as_of"])
                  - pd.Timedelta(seconds=float(s["max_lag_seconds"])))
        lit = cutoff.strftime("%Y-%m-%d %H:%M:%S.%f")
        return (f"CASE WHEN max({c}) < TIMESTAMP '{lit}' "
                f"THEN 1 ELSE 0 END")
    if kind == "entropy_between":
        # Shannon entropy (nats) via a scalar subquery over the global
        # value counts: H = ln N − Σ n·ln n / N (COALESCE: an empty
        # column has no entropy evidence → 0 violations, matching the
        # engine's None-passes gate)
        t = s["table"]
        h = "ln(sum(n)) - sum(n * ln(n)) / sum(n)"
        conds = []
        if s.get("min") is not None:
            conds.append(f"{h} < {_sql_quote(s['min'])}")
        if s.get("max") is not None:
            conds.append(f"{h} > {_sql_quote(s['max'])}")
        return (f"coalesce((SELECT CASE WHEN {' OR '.join(conds)} "
                f"THEN 1 ELSE 0 END FROM (SELECT count(*) AS n "
                f"FROM {t} WHERE {c} IS NOT NULL GROUP BY {c}) __e), 0)")
    if kind == "unique_together":
        cc = list(s["columns"])
        nn = " AND ".join(f"{x} IS NOT NULL" for x in cc)
        tup = ", ".join(cc)
        return (f"count(*) FILTER (WHERE {nn}) - count(DISTINCT "
                f"CASE WHEN {nn} THEN ({tup}) END)")
    if kind == "satisfies":
        left, op = s["left"], s["op"]
        if "right_column" in s:
            r = s["right_column"]
            return (f"count(*) FILTER (WHERE {left} IS NOT NULL AND "
                    f"{r} IS NOT NULL AND NOT ({left} {op} {r}))")
        return (f"count(*) FILTER (WHERE {left} IS NOT NULL AND NOT "
                f"({left} {op} {_sql_quote(s['right_value'])}))")
    if kind == "functional_dependency":
        t, a, b = s["table"], s["column"], s["determines"]
        # uncorrelated scalar subquery: distinct determinants mapping
        # to >1 distinct dependent (same null semantics as the engine
        # pass — rows with a null on either side are out of scope)
        return (f"(SELECT count(*) FROM (SELECT {a} FROM {t} "
                f"WHERE {a} IS NOT NULL AND {b} IS NOT NULL "
                f"GROUP BY {a} HAVING count(DISTINCT {b}) > 1) __fd)")
    raise ValueError(kind)


def _monotonic_subquery(s: dict, key: str | None = None) -> str:
    """FROM-clause subquery shared by the audit and rows oracles:
    non-null values with their lagged predecessor within (group,
    order, value[, key]) — the same deterministic tie-break the
    engine sorts by (key only in rows mode; see _monotonic_check)."""
    t, c, g, o = s["table"], s["column"], s["group_by"], s["order_by"]
    tie = f", {key}" if key else ""
    return (f"(SELECT *, lag({c}) OVER (PARTITION BY {g} "
            f"ORDER BY {o}, {c}{tie}) AS __prev FROM {t} "
            f"WHERE {c} IS NOT NULL) __m")


def _psi_select(s: dict) -> str:
    """One audit SELECT computing the PSI gate in SQL from the same
    fixed-edge integer bin counts the engine aggregates: bin = number
    of edges <= value (np.searchsorted side='right'), proportions
    smoothed by PSI_EPS, empty sides short-circuit to 0 violations
    (CASE order matches _psi_check)."""
    t, c, sc = s["table"], s["column"], s["split_column"]
    disp = _disp_col(s)
    edges = list(s["edges"])
    bvals = ", ".join(_sql_quote(v) for v in sorted(s["baseline_values"]))
    cvals = ", ".join(_sql_quote(v) for v in sorted(s["current_values"]))
    bin_expr = "CASE " + " ".join(
        f"WHEN {c} < {_sql_quote(float(e))} THEN {i}"
        for i, e in enumerate(edges)) + f" ELSE {len(edges)} END"
    eps = repr(PSI_EPS)
    thr = _sql_quote(float(s["max_psi"]))
    return (
        f"SELECT '{t}' AS table_name, '{disp}' AS column_name, "
        f"'psi_max' AS \"check\", "
        f"'{s.get('severity', 'error')}' AS severity, "
        f"CAST(sum(ne) + sum(na) AS BIGINT) AS n_rows, "
        f"CAST(CASE WHEN sum(ne) = 0 OR sum(na) = 0 THEN 0 "
        f"WHEN sum((pa - pe) * ln((pa + {eps}) / (pe + {eps}))) "
        f"> {thr} THEN 1 ELSE 0 END AS BIGINT) AS n_violations, "
        f"CAST(0.0 AS DOUBLE) AS max_viol "
        f"FROM (SELECT ne, na, "
        f"CAST(ne AS DOUBLE) / NULLIF(sum(ne) OVER (), 0) AS pe, "
        f"CAST(na AS DOUBLE) / NULLIF(sum(na) OVER (), 0) AS pa "
        f"FROM (SELECT {bin_expr} AS bin, "
        f"count(*) FILTER (WHERE {sc} IN ({bvals})) AS ne, "
        f"count(*) FILTER (WHERE {sc} IN ({cvals})) AS na "
        f"FROM {t} WHERE {c} IS NOT NULL AND "
        f"({sc} IN ({bvals}) OR {sc} IN ({cvals})) "
        f"GROUP BY 1) __h) __p")


def _psi_snapshot_select(s: dict) -> str:
    """One audit SELECT computing the snapshot-PSI gate in SQL: the
    baseline histogram is embedded as a VALUES table (the same
    literals the engine spec carries), the current histogram comes
    from the same fixed-edge bin CASE as the engine's searchsorted,
    missing bins COALESCE to 0 through the LEFT JOIN."""
    t, c = s["table"], s["column"]
    disp = _disp_col(s)
    edges = list(s["edges"])
    ne = [float(v) for v in s["baseline_counts"]]
    vals = ", ".join(f"({i}, {_sql_quote(v)})" for i, v in enumerate(ne))
    bin_expr = "CASE " + " ".join(
        f"WHEN {c} < {_sql_quote(float(e))} THEN {i}"
        for i, e in enumerate(edges)) + f" ELSE {len(edges)} END"
    eps = repr(PSI_EPS)
    thr = _sql_quote(float(s["max_psi"]))
    return (
        f"SELECT '{t}' AS table_name, '{disp}' AS column_name, "
        f"'psi_snapshot' AS \"check\", "
        f"'{s.get('severity', 'error')}' AS severity, "
        f"CAST(coalesce(sum(na), 0) AS BIGINT) AS n_rows, "
        f"CAST(CASE WHEN coalesce(sum(na), 0) = 0 OR sum(ne) = 0 THEN 0 "
        f"WHEN sum((pa - pe) * ln((pa + {eps}) / (pe + {eps}))) "
        f"> {thr} THEN 1 ELSE 0 END AS BIGINT) AS n_violations, "
        f"CAST(0.0 AS DOUBLE) AS max_viol "
        f"FROM (SELECT ne, na, "
        f"ne / NULLIF(sum(ne) OVER (), 0) AS pe, "
        f"CAST(na AS DOUBLE) / NULLIF(sum(na) OVER (), 0) AS pa "
        f"FROM (SELECT b.ne AS ne, coalesce(cur.na, 0) AS na "
        f"FROM (VALUES {vals}) b(bin, ne) "
        f"LEFT JOIN (SELECT {bin_expr} AS bin, count(*) AS na "
        f"FROM {t} WHERE {c} IS NOT NULL GROUP BY 1) cur "
        f"ON b.bin = cur.bin) __j) __p")


def _ks_select(s: dict) -> str:
    """One audit SELECT computing the exact two-sample KS gate in SQL
    from the same pool the engine builds: window ECDFs over the value
    order (RANGE frames tie-collapse exactly like the engine's
    last-index-per-value), counts divided as doubles — bit-identical
    c/n terms on both sides.  Rows in both value sets count as
    baseline (the engine's side-0-wins rule)."""
    t, c, sc = s["table"], s["column"], s["split_column"]
    disp = _disp_col(s)
    bvals = ", ".join(_sql_quote(v) for v in sorted(s["baseline_values"]))
    cvals = ", ".join(_sql_quote(v) for v in sorted(s["current_values"]))
    thr = _sql_quote(float(s["max_ks"]))
    return (
        f"SELECT '{t}' AS table_name, '{disp}' AS column_name, "
        f"'ks_max' AS \"check\", "
        f"'{s.get('severity', 'error')}' AS severity, "
        f"CAST(coalesce(max(n0t + n1t), 0) AS BIGINT) AS n_rows, "
        f"CAST(CASE WHEN coalesce(max(n0t), 0) = 0 "
        f"OR coalesce(max(n1t), 0) = 0 THEN 0 "
        f"WHEN max(abs(c0 / n0t - c1 / n1t)) > {thr} "
        f"THEN 1 ELSE 0 END AS BIGINT) AS n_violations, "
        f"CAST(0.0 AS DOUBLE) AS max_viol "
        f"FROM (SELECT "
        f"CAST(sum(s0) OVER (ORDER BY v) AS DOUBLE) AS c0, "
        f"CAST(sum(s1) OVER (ORDER BY v) AS DOUBLE) AS c1, "
        f"CAST(sum(s0) OVER () AS DOUBLE) AS n0t, "
        f"CAST(sum(s1) OVER () AS DOUBLE) AS n1t "
        f"FROM (SELECT {c} AS v, "
        f"CASE WHEN {sc} IN ({bvals}) THEN 1 ELSE 0 END AS s0, "
        f"CASE WHEN {sc} IN ({bvals}) THEN 0 "
        f"WHEN {sc} IN ({cvals}) THEN 1 ELSE 0 END AS s1 "
        f"FROM {t} WHERE {c} IS NOT NULL AND "
        f"({sc} IN ({bvals}) OR {sc} IN ({cvals}))) __p) __e")


def suite_oracle_sql(suite: List[dict],
                     table_defs: Dict[str, str] | None = None) -> str:
    """ANSI-SQL audit equivalent to ``audit_constraints`` for the same
    suite — one SELECT per constraint, UNION ALL, same column names and
    ordering as the engine output.  Each SELECT also emits its
    tolerance threshold (max_viol: 0.0, or (1 − mostly) · count(*) for
    ``mostly`` specs); the outer query folds it into ``passed`` and
    drops it.

    ``table_defs`` optionally maps suite table names to parquet paths:
    each becomes a leading CTE (``name AS (SELECT * FROM
    read_parquet('path'))``) so suites audit ANY parquet — e.g. the
    derived interleaved corpus — without pre-registered views."""
    _validate_suite(suite)
    selects = []
    for s in suite:
        t, c, kind = s["table"], _disp_col(s), s["kind"]
        mv = (f"(1.0 - {_sql_quote(float(s['mostly']))}) * count(*)"
              if "mostly" in s else "0.0")
        tail = f", CAST({mv} AS DOUBLE) AS max_viol"
        sev = s.get("severity", "error")
        head = (f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
                f"'{kind}' AS \"check\", '{sev}' AS severity, "
                f"count(*) AS n_rows, ")
        if kind == "foreign_key":
            rt, rc = s["ref_table"], s["ref_column"]
            selects.append(
                head
                + f"CAST(count(*) FILTER (WHERE {s['column']} IS NOT NULL "
                f"AND r.__k IS NULL) AS BIGINT) AS n_violations{tail} "
                f"FROM {t} LEFT JOIN (SELECT DISTINCT {rc} AS __k "
                f"FROM {rt}) r ON {t}.{s['column']} = r.__k")
        elif kind == "monotonic":
            selects.append(
                head
                + f"CAST(count(*) FILTER (WHERE {s['column']} < __prev) "
                f"AS BIGINT) AS n_violations{tail} "
                f"FROM {_monotonic_subquery(s)}")
        elif kind == "psi_max":
            selects.append(_psi_select(s))
        elif kind == "psi_snapshot":
            selects.append(_psi_snapshot_select(s))
        elif kind == "ks_max":
            selects.append(_ks_select(s))
        else:
            selects.append(head
                           + f"CAST({_viol_expr(s)} AS BIGINT) "
                           f"AS n_violations{tail} FROM {t}")
    body = "\nUNION ALL\n".join(selects)
    defs = "".join(
        f"{name} AS (SELECT * FROM read_parquet('{path}')),\n"
        for name, path in sorted((table_defs or {}).items()))
    return (f"WITH {defs}audit AS (\n{body}\n)\n"
            "SELECT table_name, column_name, \"check\", severity, "
            "n_rows, n_violations, "
            "CAST(n_violations <= max_viol AS BIGINT) AS passed "
            "FROM audit ORDER BY table_name, column_name, \"check\"")


# ---------------------------------------------------------------------------
# Violation rows — the row-level companion to the counts audit
# ---------------------------------------------------------------------------

def violation_rows(read, suite: List[dict],
                   keys: Dict[str, str]) -> pd.DataFrame:
    """Emit one row per violating record for every ROW_KINDS constraint
    in ``suite`` (others are skipped): (table_name, column_name, check,
    key), ``key`` = the table's key column (``keys[table]``) cast to
    string — except ``unique``, which emits each duplicated VALUE once.

    Shapes: row-local kinds share one pruned scan per table and filter
    inside ``map_batches`` (output bounded by the violation count, the
    input never leaves its task); unique routes through the bucketed
    distinct combiner emitting values with count > 1; monotonic reuses
    the bucketed window check in key-emitting mode."""
    import ray as _ray

    _validate_suite(suite)
    read = _locked(read)
    suite = [s for s in suite if s["kind"] in ROW_KINDS]
    by_table: Dict[str, List[dict]] = {}
    for s in suite:
        by_table.setdefault(s["table"], []).append(s)

    def _rows_one(table: str, specs: List[dict]) -> list:
        frames = []
        key = keys[table]
        row_local = [s for s in specs if s["kind"] in
                     ("not_null", "range", "in_set", "regex",
                      "foreign_key", "satisfies")]
        uniques = [s for s in specs if s["kind"] == "unique"]
        monotonics = [s for s in specs if s["kind"] == "monotonic"]
        fds = [s for s in specs
               if s["kind"] == "functional_dependency"]
        sats = [s for s in specs if s["kind"] == "satisfies"]
        togethers = [s for s in specs if s["kind"] == "unique_together"]
        cols = sorted({s["column"] for s in specs if "column" in s}
                      | {s[k] for s in monotonics
                         for k in ("group_by", "order_by")}
                      | {s["determines"] for s in fds}
                      | {s["left"] for s in sats}
                      | {s["right_column"] for s in sats
                         if "right_column" in s}
                      | {c for s in togethers for c in s["columns"]}
                      | {key})
        ds = read(table, cols)

        # same one-read rule as audit_constraints: the row-local emit
        # pass plus each bucketed helper (unique / unique_together /
        # fd / monotonic) is its own consumption of the lazy Dataset
        n_consume = (int(bool(row_local)) + len(uniques)
                     + len(togethers) + len(fds) + len(monotonics))
        if n_consume >= 2:
            ds = ds.materialize()

        fk_refs = {_cid(s): _ray.put(_ref_key_set(read, s))
                   for s in row_local if s["kind"] == "foreign_key"}

        compiled = []  # (column, kind, mask_fn) — mask over df rows
        for s in row_local:
            kind, col = s["kind"], s.get("column")
            if kind == "satisfies":
                op = _SAT_OP_FN[s["op"]]
                left = s["left"]
                if "right_column" in s:
                    rc = s["right_column"]
                    compiled.append((_disp_col(s), kind,
                                     lambda df, l=left, r=rc, o=op:
                                     df[l].notna() & df[r].notna()
                                     & ~o(df[l], df[r])))
                else:
                    rv = s["right_value"]
                    compiled.append((_disp_col(s), kind,
                                     lambda df, l=left, rv=rv, o=op:
                                     df[l].notna() & ~o(df[l], rv)))
            elif kind == "not_null":
                compiled.append((_disp_col(s), kind,
                                 lambda df, c=col: df[c].isna()))
            elif kind == "range":
                lo, hi = s.get("min"), s.get("max")

                def mk(df, c=col, lo=lo, hi=hi):
                    v = df[c]
                    bad = pd.Series(False, index=df.index)
                    if lo is not None:
                        bad |= v < lo
                    if hi is not None:
                        bad |= v > hi
                    return bad & v.notna()
                compiled.append((_disp_col(s), kind, mk))
            elif kind == "in_set":
                allowed = frozenset(s["values"])
                compiled.append((_disp_col(s), kind,
                                 lambda df, c=col, a=allowed:
                                 df[c].notna() & ~df[c].isin(a)))
            elif kind == "regex":
                pat = re.compile(s["pattern"])
                compiled.append((_disp_col(s), kind,
                                 lambda df, c=col, p=pat:
                                 df[c].notna()
                                 & ~df[c].str.contains(p).fillna(False)))
            elif kind == "foreign_key":
                ref = fk_refs[_cid(s)]

                def mk(df, c=col, r=ref):
                    return df[c].notna() & ~df[c].isin(_ray.get(r))
                compiled.append((_disp_col(s), kind, mk))

        # same wall-clock overlap as audit_constraints: every helper is
        # an independent consumption of the materialized blocks
        from concurrent.futures import ThreadPoolExecutor
        futs = {}
        with ThreadPoolExecutor(max_workers=AUDIT_PARALLELISM) as tpe:
            if compiled:
                import pyarrow as pa

                def emit(df: pd.DataFrame,
                         _c=tuple(compiled)) -> "pa.Table":
                    # typed Arrow output: empty object-dtype pandas
                    # columns break Ray's block size estimation
                    cols_, checks_, keys_ = [], [], []
                    for col, kind, mask_fn in _c:
                        k = df.loc[mask_fn(df), key].astype(str).tolist()
                        cols_ += [col] * len(k)
                        checks_ += [kind] * len(k)
                        keys_ += k
                    return pa.table({
                        "column_name": pa.array(cols_, pa.string()),
                        "check": pa.array(checks_, pa.string()),
                        "key": pa.array(keys_, pa.string())})

                futs["emit"] = tpe.submit(
                    lambda: ds.map_batches(
                        emit, batch_format="pandas").to_pandas())
            for i, s in enumerate(uniques):
                futs[("uniq", i)] = tpe.submit(
                    _duplicated_values, ds, s["column"])
            for i, s in enumerate(togethers):
                futs[("tup", i)] = tpe.submit(
                    _duplicated_tuples, ds, list(s["columns"]))
            for i, s in enumerate(fds):
                futs[("fd", i)] = tpe.submit(
                    _fd_violating_keys, ds, s["column"], s["determines"],
                    as_keys=True)
            for i, s in enumerate(monotonics):
                futs[("mono", i)] = tpe.submit(
                    _monotonic_check, ds, s, key=key)

        if compiled:
            part = futs["emit"].result()
            part.insert(0, "table_name", table)
            frames.append(part)

        for i, s in enumerate(uniques):
            vals = futs[("uniq", i)].result()
            frames.append(pd.DataFrame({
                "table_name": table, "column_name": s["column"],
                "check": "unique", "key": [str(v) for v in vals]}))

        for i, s in enumerate(togethers):
            vals = futs[("tup", i)].result()
            frames.append(pd.DataFrame({
                "table_name": table, "column_name": _disp_col(s),
                "check": "unique_together", "key": vals}))

        for i, s in enumerate(fds):
            ks = futs[("fd", i)].result()
            frames.append(pd.DataFrame({
                "table_name": table, "column_name": _disp_col(s),
                "check": "functional_dependency",
                "key": [str(v) for v in ks]}))

        for i, s in enumerate(monotonics):
            ks = futs[("mono", i)].result()
            frames.append(pd.DataFrame({
                "table_name": table, "column_name": s["column"],
                "check": "monotonic", "key": ks}))
        return frames

    from concurrent.futures import ThreadPoolExecutor as _TPE
    with _TPE(max_workers=min(AUDIT_PARALLELISM,
                              max(1, len(by_table)))) as tpe:
        tfuts = {t: tpe.submit(_rows_one, t, sp)
                 for t, sp in sorted(by_table.items())}
    frames = []
    for t in sorted(tfuts):
        frames.extend(tfuts[t].result())

    out = (pd.concat(frames, ignore_index=True) if frames
           else pd.DataFrame(columns=["table_name", "column_name",
                                      "check", "key"]))
    for c in out.columns:
        out[c] = out[c].astype(str)
    return (out.sort_values(list(out.columns))
            .reset_index(drop=True))


def _duplicated_values(ds, column: str, n_buckets: int = 64) -> list:
    """Distinct non-null values occurring more than once: per-batch
    (value, count) partials → bucket shuffle → per-bucket sum, emit
    count > 1.  Output bounded by the duplicated-value set."""
    import pyarrow as pa

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[column].dropna().value_counts()
        v = vc.index.to_numpy()
        b = (pd.util.hash_pandas_object(pd.Series(v), index=False)
             .to_numpy() % n_buckets).astype("int64") if len(v) else \
            np.array([], dtype="int64")
        return pd.DataFrame({"v": v, "n": vc.to_numpy(dtype="int64"),
                             "__b": b})

    def combine(g: pd.DataFrame) -> "pa.Table":
        tot = g.groupby("v", sort=False)["n"].sum()
        dup = tot[tot > 1].index.to_numpy()
        return pa.table({"v": pa.array(dup.astype(str))})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__b").map_groups(combine, batch_format="pandas")
             .to_pandas())
    return parts["v"].tolist() if len(parts) else []


def violations_oracle_sql(suite: List[dict],
                          keys: Dict[str, str]) -> str:
    """ANSI-SQL equivalent of ``violation_rows`` for the same suite —
    one SELECT per ROW_KINDS constraint, UNION ALL, identical
    (table_name, column_name, check, key) semantics."""
    _validate_suite(suite)
    selects = []
    for s in suite:
        if s["kind"] not in ROW_KINDS:
            continue
        t, disp, kind = s["table"], _disp_col(s), s["kind"]
        # the DISPLAY label goes in the column_name literal; SQL
        # expressions always use the raw column (a mostly/name suffix
        # in the display would otherwise parse as an operator)
        c = s.get("column")
        k = keys[t]
        head = (f"SELECT '{t}' AS table_name, '{disp}' AS column_name, "
                f"'{kind}' AS \"check\", ")
        if kind == "not_null":
            selects.append(head + f"CAST({k} AS VARCHAR) AS key "
                           f"FROM {t} WHERE {c} IS NULL")
        elif kind == "range":
            conds = []
            if s.get("min") is not None:
                conds.append(f"{c} < {_sql_quote(s['min'])}")
            if s.get("max") is not None:
                conds.append(f"{c} > {_sql_quote(s['max'])}")
            selects.append(head + f"CAST({k} AS VARCHAR) AS key FROM {t} "
                           f"WHERE {c} IS NOT NULL AND "
                           f"({' OR '.join(conds)})")
        elif kind == "in_set":
            vals = ", ".join(_sql_quote(v) for v in sorted(s["values"]))
            selects.append(head + f"CAST({k} AS VARCHAR) AS key FROM {t} "
                           f"WHERE {c} IS NOT NULL AND {c} NOT IN ({vals})")
        elif kind == "regex":
            selects.append(head + f"CAST({k} AS VARCHAR) AS key FROM {t} "
                           f"WHERE {c} IS NOT NULL AND NOT "
                           f"regexp_matches({c}, "
                           f"{_sql_quote(s['pattern'])})")
        elif kind == "foreign_key":
            rt, rc = s["ref_table"], s["ref_column"]
            selects.append(
                head + f"CAST({t}.{k} AS VARCHAR) AS key FROM {t} "
                f"LEFT JOIN (SELECT DISTINCT {rc} AS __k FROM {rt}) r "
                f"ON {t}.{c} = r.__k "
                f"WHERE {t}.{c} IS NOT NULL AND r.__k IS NULL")
        elif kind == "unique":
            selects.append(
                head + f"CAST({c} AS VARCHAR) AS key FROM {t} "
                f"WHERE {c} IS NOT NULL GROUP BY {c} "
                f"HAVING count(*) > 1")
        elif kind == "monotonic":
            selects.append(
                head + f"CAST({k} AS VARCHAR) AS key "
                f"FROM {_monotonic_subquery(s, key=k)} "
                f"WHERE {c} < __prev")
        elif kind == "satisfies":
            left, op = s["left"], s["op"]
            if "right_column" in s:
                r = s["right_column"]
                cond = (f"{left} IS NOT NULL AND {r} IS NOT NULL "
                        f"AND NOT ({left} {op} {r})")
            else:
                cond = (f"{left} IS NOT NULL AND NOT ({left} {op} "
                        f"{_sql_quote(s['right_value'])})")
            selects.append(head + f"CAST({k} AS VARCHAR) AS key "
                           f"FROM {t} WHERE {cond}")
        elif kind == "functional_dependency":
            a, b = s["column"], s["determines"]
            selects.append(
                head + f"CAST({a} AS VARCHAR) AS key FROM {t} "
                f"WHERE {a} IS NOT NULL AND {b} IS NOT NULL "
                f"GROUP BY {a} HAVING count(DISTINCT {b}) > 1")
        elif kind == "unique_together":
            cc = list(s["columns"])
            nn = " AND ".join(f"{x} IS NOT NULL" for x in cc)
            keyexpr = " || '|' || ".join(
                f"CAST({x} AS VARCHAR)" for x in cc)
            selects.append(
                head + f"{keyexpr} AS key FROM {t} "
                f"WHERE {nn} GROUP BY {', '.join(cc)} "
                f"HAVING count(*) > 1")
    body = "\nUNION ALL\n".join(selects)
    return (f"WITH viols AS (\n{body}\n)\n"
            "SELECT * FROM viols "
            "ORDER BY table_name, column_name, \"check\", key")


# ---------------------------------------------------------------------------
# Baseline snapshots — profile a run, audit the next run against it
# ---------------------------------------------------------------------------

def profile_snapshot(read, tables: Dict[str, List[str]],
                     n_bins: int = 16) -> dict:
    """Distribution snapshot of numeric columns for drift auditing:
    ``tables[table] = [column, ...]`` → one JSON-serializable dict
    per column with (n, nulls, mean, edges, counts).  Two pruned
    passes per table (min/max extrema, then fixed-bin counts), both
    one-row-per-batch sufficient-stat partials — at 100 TB this is
    two streaming scans, never a collect.  Feed the result to
    ``drift_suite_from_snapshot`` on the NEXT run of the pipeline."""
    snap: dict = {}
    for table in sorted(tables):
        cols = list(tables[table])
        ds = read(table, cols)

        def extrema(df: pd.DataFrame, _cols=tuple(cols)) -> pd.DataFrame:
            rec = {}
            for c in _cols:
                v = df[c].dropna().to_numpy(dtype="float64")
                rec[f"{c}__lo"] = [float(v.min()) if len(v) else np.inf]
                rec[f"{c}__hi"] = [float(v.max()) if len(v) else -np.inf]
                rec[f"{c}__n"] = [int(len(v))]
                rec[f"{c}__nulls"] = [int(df[c].isna().sum())]
                rec[f"{c}__sum"] = [float(v.sum())]
            return pd.DataFrame(rec)

        ext = ds.map_batches(extrema, batch_format="pandas").to_pandas()
        meta = {}
        for c in cols:
            lo, hi = float(ext[f"{c}__lo"].min()), \
                float(ext[f"{c}__hi"].max())
            n = int(ext[f"{c}__n"].sum())
            meta[c] = {"n": n, "nulls": int(ext[f"{c}__nulls"].sum()),
                       "mean": float(ext[f"{c}__sum"].sum()) / n
                       if n else None,
                       "lo": lo, "hi": hi}

        # inner edges only (first/last bins are open, so the audit run
        # can never fall off the histogram)
        edge_map = {c: np.linspace(meta[c]["lo"], meta[c]["hi"],
                                   n_bins + 1)[1:-1]
                    for c in cols if meta[c]["n"]
                    and meta[c]["lo"] < meta[c]["hi"]}

        def counts(df: pd.DataFrame,
                   _e=dict(edge_map)) -> pd.DataFrame:
            rec = {}
            for c, edges in _e.items():
                v = df[c].dropna().to_numpy(dtype="float64")
                bins = np.searchsorted(edges, v, side="right")
                rec[c] = [np.bincount(
                    bins, minlength=len(edges) + 1).tolist()]
            return pd.DataFrame(rec)

        cts = ds.map_batches(counts, batch_format="pandas").to_pandas() \
            if edge_map else pd.DataFrame()
        snap[table] = {}
        for c in cols:
            rec = dict(meta[c])
            if c in edge_map:
                rec["edges"] = [float(e) for e in edge_map[c]]
                rec["counts"] = np.sum(
                    [np.asarray(x) for x in cts[c]], axis=0
                ).astype(int).tolist()
            snap[table][c] = rec
    return snap


def drift_suite_from_snapshot(snap: dict, max_psi: float = 0.1
                              ) -> List[dict]:
    """Compile a profile snapshot into a psi_snapshot constraint suite
    — the baseline-vs-next-run drift audit the north rule asks for.
    Columns without a histogram (all-null or constant) are skipped."""
    suite = []
    for table in sorted(snap):
        for c in sorted(snap[table]):
            rec = snap[table][c]
            if "edges" not in rec:
                continue
            suite.append({"table": table, "column": c,
                          "kind": "psi_snapshot",
                          "edges": list(rec["edges"]),
                          "baseline_counts": list(rec["counts"]),
                          "max_psi": max_psi})
    return suite


# ---------------------------------------------------------------------------
# Schema checks — declarative expected-schema validation (footer-only)
# ---------------------------------------------------------------------------

def _arrow_to_sql(t) -> str:
    """Map an Arrow type to the DuckDB type name information_schema
    reports for a parquet-backed view — the shared vocabulary between
    the engine's footer read and the generated oracle."""
    import pyarrow as pa
    if pa.types.is_int64(t):
        return "BIGINT"
    if pa.types.is_int32(t):
        return "INTEGER"
    if pa.types.is_int16(t):
        return "SMALLINT"
    if pa.types.is_int8(t):
        return "TINYINT"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_float32(t):
        return "FLOAT"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_boolean(t):
        return "BOOLEAN"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _arrow_to_sql(t.value_type) + "[]"
    return str(t).upper()


def check_schemas(read_schema, expected: Dict[str, List[tuple]]
                  ) -> pd.DataFrame:
    """Validate actual table schemas against a declarative expectation:
    ``expected[table] = [(column_name, sql_type), ...]`` in ordinal
    order.  ``read_schema(table)`` → pyarrow.Schema (a parquet FOOTER
    read — schema validation never scans data, so at 100 TB this is
    one metadata fetch per table, not a job).

    One output row per column in the union of expected and actual:
    (table_name, column_name, expected_pos, actual_pos, expected_type,
    actual_type, status) with status priority
    missing > unexpected > type_mismatch > position_mismatch > ok —
    identical semantics to ``schema_oracle_sql``'s FULL OUTER JOIN."""
    rows = []
    for table in sorted(expected):
        want = {c: (i + 1, ty)
                for i, (c, ty) in enumerate(expected[table])}
        sch = read_schema(table)
        have = {f.name: (i + 1, _arrow_to_sql(f.type))
                for i, f in enumerate(sch)}
        for c in sorted(set(want) | set(have)):
            ep, et = want.get(c, (-1, ""))
            ap, at = have.get(c, (-1, ""))
            if c not in have:
                status = "missing"
            elif c not in want:
                status = "unexpected"
            elif et != at:
                status = "type_mismatch"
            elif ep != ap:
                status = "position_mismatch"
            else:
                status = "ok"
            rows.append((table, c, ep, ap, et, at, status))
    out = pd.DataFrame(rows, columns=[
        "table_name", "column_name", "expected_pos", "actual_pos",
        "expected_type", "actual_type", "status"])
    out["expected_pos"] = out["expected_pos"].astype("int64")
    out["actual_pos"] = out["actual_pos"].astype("int64")
    return (out.sort_values(["table_name", "column_name"])
            .reset_index(drop=True))


def schema_oracle_sql(expected: Dict[str, List[tuple]]) -> str:
    """ANSI-SQL equivalent of ``check_schemas`` over
    information_schema.columns — the expectation list is embedded as a
    VALUES table, the comparison is one FULL OUTER JOIN."""
    vals = []
    for table in sorted(expected):
        for i, (c, ty) in enumerate(expected[table]):
            vals.append(f"('{table}', '{c}', {i + 1}, '{ty}')")
    tables = ", ".join(f"'{t}'" for t in sorted(expected))
    return f"""
WITH expected(table_name, column_name, ordinal, data_type) AS (
  VALUES {', '.join(vals)}
), actual AS (
  SELECT table_name, column_name,
         CAST(ordinal_position AS BIGINT) AS ordinal, data_type
  FROM information_schema.columns
  WHERE table_name IN ({tables})
)
SELECT coalesce(e.table_name, a.table_name) AS table_name,
       coalesce(e.column_name, a.column_name) AS column_name,
       coalesce(e.ordinal, -1) AS expected_pos,
       coalesce(a.ordinal, -1) AS actual_pos,
       coalesce(e.data_type, '') AS expected_type,
       coalesce(a.data_type, '') AS actual_type,
       CASE WHEN a.column_name IS NULL THEN 'missing'
            WHEN e.column_name IS NULL THEN 'unexpected'
            WHEN e.data_type <> a.data_type THEN 'type_mismatch'
            WHEN e.ordinal <> a.ordinal THEN 'position_mismatch'
            ELSE 'ok' END AS status
FROM expected e FULL OUTER JOIN actual a
  ON e.table_name = a.table_name AND e.column_name = a.column_name
ORDER BY table_name, column_name"""


# expected schemas for the schema_check query: documents/embeddings
# exact, events expects value:VARCHAR (planted type_mismatch) and
# omits props (unexpected) and adds quality_score (missing), orders
# swaps the first two ordinals (position_mismatch)
EXPECTED_SCHEMAS: Dict[str, List[tuple]] = {
    "documents": [("doc_id", "BIGINT"), ("text", "VARCHAR"),
                  ("lang", "VARCHAR"), ("source", "VARCHAR"),
                  ("n_chars", "BIGINT")],
    "embeddings": [("vec_id", "BIGINT"), ("embedding", "FLOAT[]"),
                   ("label", "INTEGER")],
    "events": [("event_id", "BIGINT"), ("ts", "TIMESTAMP"),
               ("user_id", "BIGINT"), ("event_type", "VARCHAR"),
               ("value", "VARCHAR"), ("quality_score", "DOUBLE")],
    "orders": [("o_custkey", "BIGINT"), ("o_orderkey", "BIGINT"),
               ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DOUBLE"),
               ("o_orderdate", "TIMESTAMP"),
               ("o_orderpriority", "VARCHAR")],
}


# ---------------------------------------------------------------------------
# The default suite over the testdata tables (q_constraint_audit)
# ---------------------------------------------------------------------------

DEFAULT_SUITE: List[dict] = [
    {"table": "orders", "column": "o_orderkey", "kind": "not_null"},
    {"table": "orders", "column": "o_orderkey", "kind": "unique"},
    {"table": "orders", "column": "o_totalprice", "kind": "range",
     "min": 0.0},
    # deliberately stricter than the data: 'P' rows count as violations
    {"table": "orders", "column": "o_orderstatus", "kind": "in_set",
     "values": ["O", "F"]},
    {"table": "orders", "column": "o_orderpriority", "kind": "regex",
     "pattern": "^[1-5]-"},
    {"table": "orders", "column": "o_custkey", "kind": "foreign_key",
     "ref_table": "customer", "ref_column": "c_custkey"},
    {"table": "orders", "kind": "row_count_min", "min_rows": 100},
    {"table": "lineitem", "column": "l_quantity", "kind": "range",
     "min": 1.0, "max": 50.0},
    # data max is 0.10 — the tail above 0.05 is the planted failure
    {"table": "lineitem", "column": "l_discount", "kind": "range",
     "min": 0.0, "max": 0.05},
    {"table": "lineitem", "column": "l_orderkey", "kind": "foreign_key",
     "ref_table": "orders", "ref_column": "o_orderkey"},
    {"table": "events", "column": "value", "kind": "not_null"},
    # 'error' events violate on purpose (freshness of the check path)
    {"table": "events", "column": "event_type", "kind": "in_set",
     "values": ["click", "view", "purchase", "signup"]},
    {"table": "events", "column": "props", "kind": "regex",
     "pattern": '^\\{"k": [0-9]+\\}$'},
    {"table": "documents", "column": "doc_id", "kind": "unique"},
    {"table": "documents", "column": "lang", "kind": "in_set",
     "values": ["en", "de", "fr", "es", "zh"]},
    # data min is < 100: short docs are flagged
    {"table": "documents", "column": "n_chars", "kind": "range",
     "min": 100.0},
    {"table": "customer", "column": "c_name", "kind": "regex",
     "pattern": "^Customer#[0-9]+$"},
    {"table": "customer", "column": "c_acctbal", "kind": "range",
     "min": -1000.0, "max": 10000.0},
    # grouped window check (north-star span-offset shape): event values
    # per user are NOT monotone in time — deliberate failing check
    {"table": "events", "column": "value", "kind": "monotonic",
     "group_by": "user_id", "order_by": "ts"},
    {"table": "events", "column": "value", "kind": "null_ratio_max",
     "max_ratio": 0.01},
    # events.value mean is ~49.6: deliberate failing gate
    {"table": "events", "column": "value", "kind": "mean_between",
     "min": 60.0},
    {"table": "lineitem", "column": "l_quantity", "kind": "mean_between",
     "min": 20.0, "max": 30.0},
    {"table": "lineitem", "column": "l_quantity",
     "kind": "stddev_between", "min": 10.0, "max": 20.0},
    # only 3 order statuses exist: deliberate shortfall of 1
    {"table": "orders", "column": "o_orderstatus",
     "kind": "distinct_count_min", "min_distinct": 4},
    {"table": "documents", "column": "lang",
     "kind": "distinct_count_min", "min_distinct": 5},
    # cardinality caps: 5 langs ≤ 10 passes; 20 sources > 10 is the
    # planted key-explosion failure (distinct count shared per column)
    {"table": "documents", "column": "lang",
     "kind": "distinct_count_max", "max_distinct": 10},
    {"table": "documents", "column": "source",
     "kind": "distinct_count_max", "max_distinct": 10},
    # drift gates (the north rule's distribution-drift category): view
    # vs click event values are both ~uniform → PSI ≈ 0.003-0.005,
    # comfortably under 0.1
    {"table": "events", "column": "value", "kind": "psi_max",
     "split_column": "event_type", "baseline_values": ["view"],
     "current_values": ["click"],
     "edges": [10.0, 25.0, 50.0, 75.0, 90.0], "max_psi": 0.1},
    # en vs zh doc-length PSI ≈ 0.01-0.07 across sf: deliberate drift
    # failure at 0.002 — severity WARN (drift alerts shouldn't gate
    # the job; the CLI exit code only counts error-severity failures)
    {"table": "documents", "column": "n_chars", "kind": "psi_max",
     "split_column": "lang", "baseline_values": ["en"],
     "current_values": ["zh"],
     "edges": [200.0, 500.0, 1000.0, 2000.0], "max_psi": 0.002,
     "severity": "warn"},
    # cross-table volume sanity: ~4 lineitems per order
    {"table": "lineitem", "kind": "row_count_ratio_between",
     "ref_table": "orders", "min": 2.0, "max": 8.0},
    # events per document is ~20: deliberate failure at max 5
    {"table": "events", "kind": "row_count_ratio_between",
     "ref_table": "documents", "max": 5.0},
    # cross-column row predicates (Deequ-style 'satisfies'):
    # extendedprice strictly dominates quantity (passes); tax covering
    # discount is FALSE for roughly half the rows (planted failure —
    # counts-only here; the bounded rows-mode twin lives in
    # VIOLATION_SUITE)
    {"table": "lineitem", "kind": "satisfies",
     "left": "l_extendedprice", "op": ">",
     "right_column": "l_quantity"},
    {"table": "lineitem", "kind": "satisfies",
     "left": "l_tax", "op": ">=", "right_column": "l_discount"},
    # functional dependencies: every order has exactly one customer
    # (passes); lang does NOT determine source (all 5 langs violate)
    {"table": "orders", "column": "o_orderkey",
     "kind": "functional_dependency", "determines": "o_custkey"},
    {"table": "documents", "column": "lang",
     "kind": "functional_dependency", "determines": "source"},
    # ---- statistic gates on extrema (ride the shared scan's Max/Min
    # slots): quantity min is exactly 1.0 (passes); event values start
    # near 0 so a floor of 5 fails; top order price is always ≥ 1000
    {"table": "lineitem", "column": "l_quantity", "kind": "min_between",
     "min": 0.5, "max": 1.5},
    {"table": "events", "column": "value", "kind": "min_between",
     "min": 5.0},
    {"table": "orders", "column": "o_totalprice", "kind": "max_between",
     "min": 1000.0},
    # freshness: events end 2024-01-30 → a 30-day lag from Feb 10
    # passes; orders end 2001-08-01 → any 2002 as_of fails
    {"table": "events", "column": "ts", "kind": "freshness",
     "as_of": "2024-02-10T00:00:00", "max_lag_seconds": 30 * 86400},
    {"table": "orders", "column": "o_orderdate", "kind": "freshness",
     "as_of": "2002-06-01T00:00:00", "max_lag_seconds": 30 * 86400},
    # correlation gates: value⊥user_id (|r| ≈ 0.01 → within ±0.1);
    # price is NOT correlated with quantity in this synthetic data so
    # a 0.5 floor is the planted failure
    {"table": "events", "column": "value", "kind": "corr_between",
     "with_column": "user_id", "min": -0.1, "max": 0.1},
    {"table": "lineitem", "column": "l_extendedprice",
     "kind": "corr_between", "with_column": "l_quantity", "min": 0.5},
    # categorical entropy gates: lang entropy ≈ 1.47-1.52 nats (in
    # [1.2, 1.7]); 3 near-uniform order statuses ≈ ln 3 ≈ 1.0986 → a
    # 1.15 floor fails
    {"table": "documents", "column": "lang", "kind": "entropy_between",
     "min": 1.2, "max": 1.7},
    {"table": "orders", "column": "o_orderstatus",
     "kind": "entropy_between", "min": 1.15},
    # composite uniqueness: event_id alone is unique (passes);
    # (l_orderkey, l_linenumber) collides in this synthetic lineitem
    {"table": "events", "kind": "unique_together",
     "columns": ["event_id", "user_id"]},
    {"table": "lineitem", "kind": "unique_together",
     "columns": ["l_orderkey", "l_linenumber"]},
    # exact-quantile gates (quantile_cont contract): median event
    # value ≈ 34.6-35.7; doc-length p90 ≈ 480-500 → a 300 cap fails
    {"table": "events", "column": "value", "kind": "quantile_between",
     "q": 0.5, "min": 20.0, "max": 60.0},
    {"table": "documents", "column": "n_chars",
     "kind": "quantile_between", "q": 0.9, "max": 300.0},
    # exact two-sample KS drift gates: view-vs-click event values are
    # near-identical (KS ≈ 0.03-0.07 < 0.15); en-vs-zh doc lengths
    # differ (KS ≈ 0.08-0.09 > 0.01 — planted drift failure)
    {"table": "events", "column": "value", "kind": "ks_max",
     "split_column": "event_type", "baseline_values": ["view"],
     "current_values": ["click"], "max_ks": 0.15},
    {"table": "documents", "column": "n_chars", "kind": "ks_max",
     "split_column": "lang", "baseline_values": ["en"],
     "current_values": ["zh"], "max_ks": 0.01},
    # snapshot drift: the embedded baseline histogram matches the
    # stable event-value shape (~[0.33, 0.22, 0.15, 0.10, 0.20] across
    # sf → PSI ≲ 1e-3); the uniform doc-length baseline is the planted
    # drift failure (two empty tails → PSI ≫ 0.25)
    {"table": "events", "column": "value", "kind": "psi_snapshot",
     "edges": [20.0, 40.0, 60.0, 80.0],
     "baseline_counts": [326, 224, 148, 101, 199], "max_psi": 0.05},
    {"table": "documents", "column": "n_chars", "kind": "psi_snapshot",
     "edges": [200.0, 500.0, 1000.0, 2000.0],
     "baseline_counts": [200, 200, 200, 200, 200], "max_psi": 0.25},
    # 'mostly' tolerance: ~1/3 of orders are status P → 50% tolerance
    # passes where the strict twin above fails; only half the doc
    # sources are allowed → 90% tolerance still fails
    {"table": "orders", "column": "o_orderstatus", "kind": "in_set",
     "values": ["O", "F"], "mostly": 0.5},
    {"table": "documents", "column": "source", "kind": "in_set",
     "values": [f"src{i}" for i in range(10)], "mostly": 0.9},
]

# key column per testdata table for violation_rows / its oracle
VIOLATION_KEYS: Dict[str, str] = {
    "orders": "o_orderkey", "lineitem": "l_orderkey",
    "events": "event_id", "documents": "doc_id",
    "customer": "c_custkey",
}

# the rows-level suite (q_constraint_violations): every ROW_KINDS kind
# represented, violation volume bounded (the big l_discount tail from
# DEFAULT_SUITE is counts-only — at 100 TB you gate row emission the
# same way: audit everything, emit rows only for checks whose
# violation set is actionably small)
VIOLATION_SUITE: List[dict] = [
    {"table": "documents", "column": "n_chars", "kind": "range",
     "min": 100.0},
    {"table": "documents", "column": "doc_id", "kind": "unique"},
    {"table": "events", "column": "event_type", "kind": "in_set",
     "values": ["click", "view", "purchase", "signup"]},
    {"table": "events", "column": "value", "kind": "monotonic",
     "group_by": "user_id", "order_by": "ts"},
    {"table": "events", "column": "value", "kind": "not_null"},
    {"table": "orders", "column": "o_custkey", "kind": "foreign_key",
     "ref_table": "customer", "ref_column": "c_custkey"},
    {"table": "customer", "column": "c_name", "kind": "regex",
     "pattern": "^Customer#[0-9]+$"},
    # cross-column predicate in rows mode — the right-tail of value
    # (~1.3% of events) is the bounded planted violation set
    {"table": "events", "kind": "satisfies", "left": "value",
     "op": "<=", "right_value": 99.5},
    # fd rows mode: keys are the violating DETERMINANT values (≤5
    # langs), never per-row output
    {"table": "documents", "column": "lang",
     "kind": "functional_dependency", "determines": "source"},
    # composite-uniqueness rows mode: keys are the duplicated (lang,
    # source) VALUE pairs — bounded by 5 langs × 20 sources, never the
    # underlying row count
    {"table": "documents", "kind": "unique_together",
     "columns": ["lang", "source"]},
]
