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
``map_batches`` pass per table (all row-local checks of a table share
the scan; the projection is pruned to exactly the referenced columns)
plus, per ``unique`` constraint, one hash-bucketed distinct-count
shuffle (the functions/dedup.py combiner shape — Ray's native groupby
never runs at value cardinality).  ``foreign_key`` builds the distinct
reference-key set with the same bucketed partial and broadcasts it via
``ray.put`` (dimension-bounded; for fact→fact keys at 100 TB route
through ``functions.bloom`` + the partitioned semi-join in
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
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd

KINDS = ("not_null", "unique", "range", "in_set", "regex",
         "foreign_key", "row_count_min")


def _cid(spec: dict) -> str:
    """Stable display key: table/column/kind (column '*' for
    table-level checks)."""
    return f"{spec['table']}.{spec.get('column', '*')}.{spec['kind']}"


def _validate_suite(suite: List[dict]) -> None:
    seen = set()
    for s in suite:
        if s["kind"] not in KINDS:
            raise ValueError(f"unknown constraint kind {s['kind']!r}")
        if s["kind"] != "row_count_min" and "column" not in s:
            raise ValueError(f"{s['kind']} needs a column: {s}")
        if s["kind"] == "range" and ("min" not in s and "max" not in s):
            raise ValueError(f"range needs min and/or max: {s}")
        if s["kind"] == "in_set" and not s.get("values"):
            raise ValueError(f"in_set needs values: {s}")
        if s["kind"] == "regex" and not s.get("pattern"):
            raise ValueError(f"regex needs pattern: {s}")
        if s["kind"] == "foreign_key" and (
                "ref_table" not in s or "ref_column" not in s):
            raise ValueError(f"foreign_key needs ref_table/ref_column: {s}")
        if s["kind"] == "row_count_min" and "min_rows" not in s:
            raise ValueError(f"row_count_min needs min_rows: {s}")
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
    by_table: Dict[str, List[dict]] = {}
    for s in suite:
        by_table.setdefault(s["table"], []).append(s)

    rows = []
    for table, specs in sorted(by_table.items()):
        row_local = [s for s in specs if s["kind"] in
                     ("not_null", "range", "in_set", "regex",
                      "foreign_key", "row_count_min")]
        uniques = [s for s in specs if s["kind"] == "unique"]
        cols = sorted({s["column"] for s in specs if "column" in s})
        ds = read(table, cols or None)

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

        def partial(df: pd.DataFrame, _c=tuple(compiled)) -> pd.DataFrame:
            return pd.DataFrame({
                "cid": [cid for cid, _ in _c],
                "n_rows": np.int64(len(df)),
                "n_viol": np.array([fn(df) for _, fn in _c],
                                   dtype="int64")})

        from ray.data.aggregate import Sum
        agg = (ds.map_batches(partial, batch_format="pandas")
               .groupby("cid")
               .aggregate(Sum("n_rows", alias_name="n_rows"),
                          Sum("n_viol", alias_name="n_viol"))
               .to_pandas())
        agg_map = {r["cid"]: (int(r["n_rows"]), int(r["n_viol"]))
                   for _, r in agg.iterrows()}
        n_table = next(iter(agg_map.values()))[0] if agg_map else 0

        for s in row_local:
            cid = _cid(s)
            n_rows, n_viol = agg_map.get(cid, (0, 0))
            if s["kind"] == "row_count_min":
                n_viol = max(0, int(s["min_rows"]) - n_rows)
            rows.append((s["table"], s.get("column", "*"), s["kind"],
                         n_rows, n_viol))

        for s in uniques:
            # reuse the same pruned Dataset: the scan re-executes but
            # the distinct count itself is the bucketed combiner
            nn = ds.map_batches(
                lambda df, c=s["column"]: pd.DataFrame(
                    {"n": [np.int64(df[c].notna().sum())]}),
                batch_format="pandas").sum("n") or 0
            nd = _distinct_nonnull_count(ds, s["column"])
            rows.append((s["table"], s["column"], "unique",
                         n_table, int(nn) - nd))

    out = pd.DataFrame(rows, columns=["table_name", "column_name",
                                      "check", "n_rows", "n_violations"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_violations"] = out["n_violations"].astype("int64")
    # int64 0/1, not bool: the driver value-hash and DuckDB agree on
    # integers unambiguously
    out["passed"] = (out["n_violations"] == 0).astype("int64")
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
    raise ValueError(kind)


def suite_oracle_sql(suite: List[dict]) -> str:
    """ANSI-SQL audit equivalent to ``audit_constraints`` for the same
    suite — one SELECT per constraint, UNION ALL, same column names and
    ordering as the engine output."""
    _validate_suite(suite)
    selects = []
    for s in suite:
        t, c, kind = s["table"], s.get("column", "*"), s["kind"]
        head = (f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
                f"'{kind}' AS \"check\", count(*) AS n_rows, ")
        if kind == "foreign_key":
            rt, rc = s["ref_table"], s["ref_column"]
            selects.append(
                head
                + f"CAST(count(*) FILTER (WHERE {s['column']} IS NOT NULL "
                f"AND r.__k IS NULL) AS BIGINT) AS n_violations "
                f"FROM {t} LEFT JOIN (SELECT DISTINCT {rc} AS __k "
                f"FROM {rt}) r ON {t}.{s['column']} = r.__k")
        else:
            selects.append(head
                           + f"CAST({_viol_expr(s)} AS BIGINT) "
                           f"AS n_violations FROM {t}")
    body = "\nUNION ALL\n".join(selects)
    return (f"WITH audit AS (\n{body}\n)\n"
            "SELECT table_name, column_name, \"check\", n_rows, "
            "n_violations, CAST(n_violations = 0 AS BIGINT) AS passed "
            "FROM audit ORDER BY table_name, column_name, \"check\"")


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
]
