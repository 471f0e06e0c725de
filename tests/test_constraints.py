"""Declarative constraint suite (engine/constraints.py): spec
validation, engine-vs-DuckDB parity on planted violations, and the
generated-oracle contract (engine and SQL compiled from one spec list).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from butteraugli_ray.engine.constraints import (DEFAULT_SUITE,
                                                VIOLATION_KEYS,
                                                VIOLATION_SUITE,
                                                audit_constraints,
                                                suite_oracle_sql,
                                                violation_rows,
                                                violations_oracle_sql)


def _tables():
    """Small deterministic tables with planted violations of every kind."""
    rng = np.random.default_rng(7)
    n = 400
    users = pd.DataFrame({
        "uid": np.arange(n, dtype="int64"),
        "name": [f"User#{i}" for i in range(n)],
        "age": rng.integers(10, 90, n).astype("float64"),
        "tier": rng.choice(["gold", "silver", "bronze"], n),
    })
    # plant: 3 nulls in age, 5 out-of-range ages, 4 bad names, 2 bad tiers
    users.loc[[5, 50, 500 % n], "age"] = np.nan
    users.loc[[7, 70, 170, 270, 370], "age"] = 999.0
    users.loc[[11, 111, 211, 311], "name"] = "user-bad"
    users.loc[[13, 113], "tier"] = "plutonium"
    orders = pd.DataFrame({
        "oid": np.arange(600, dtype="int64"),
        "uid": rng.integers(0, n + 20, 600).astype("int64"),  # some dangling
        "amount": rng.uniform(1, 100, 600),
        "ts": pd.Timestamp("2025-06-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 30, 600), unit="s"),
    })
    # plant: duplicate oid values (non-null dupes)
    orders.loc[10, "oid"] = orders.loc[11, "oid"]
    orders.loc[20, "oid"] = orders.loc[21, "oid"]
    return {"users": users, "orders": orders}


SUITE = [
    {"table": "users", "column": "age", "kind": "not_null"},
    {"table": "users", "column": "age", "kind": "range",
     "min": 0.0, "max": 120.0},
    {"table": "users", "column": "name", "kind": "regex",
     "pattern": "^User#[0-9]+$"},
    {"table": "users", "column": "tier", "kind": "in_set",
     "values": ["gold", "silver", "bronze"]},
    {"table": "users", "column": "uid", "kind": "unique"},
    {"table": "users", "kind": "row_count_min", "min_rows": 1000},
    {"table": "users", "column": "age", "kind": "null_ratio_max",
     "max_ratio": 0.001},                     # 3/400 > 0.001 -> fails
    {"table": "users", "column": "tier", "kind": "distinct_count_min",
     "min_distinct": 6},                      # 4 distinct -> shortfall 2
    {"table": "orders", "column": "oid", "kind": "unique"},
    {"table": "orders", "column": "uid", "kind": "foreign_key",
     "ref_table": "users", "ref_column": "uid"},
    {"table": "orders", "column": "amount", "kind": "mean_between",
     "min": 10.0, "max": 90.0},               # mean ~50 -> passes
    {"table": "orders", "column": "amount", "kind": "stddev_between",
     "max": 5.0},                             # sd ~28 -> fails
    {"table": "orders", "column": "amount", "kind": "monotonic",
     "group_by": "uid", "order_by": "oid"},   # random -> violations
    # users ages are iid across tiers -> tiny PSI, passes at 0.25
    {"table": "users", "column": "age", "kind": "psi_max",
     "split_column": "tier", "baseline_values": ["gold"],
     "current_values": ["silver", "bronze"],
     "edges": [25.0, 45.0, 65.0], "max_psi": 0.25},
    # planted 999.0 ages all live in gold/silver? no — threshold at 0
    # forces a failure whenever the two subsets differ at all
    {"table": "orders", "column": "amount", "kind": "psi_max",
     "split_column": "uid", "baseline_values": [0, 1, 2, 3, 4],
     "current_values": [5, 6, 7, 8, 9],
     "edges": [20.0, 50.0, 80.0], "max_psi": 0.0},
    # 600 orders / 400 users = 1.5 -> passes
    {"table": "orders", "kind": "row_count_ratio_between",
     "ref_table": "users", "min": 1.0, "max": 2.0},
    # 400 users / 600 orders = 0.667 -> fails below 0.9
    {"table": "users", "kind": "row_count_ratio_between",
     "ref_table": "orders", "min": 0.9},
    # cross-column satisfies: amounts are 1-100, oids 0-599 — rows
    # with oid < amount violate (the oracle computes the exact count)
    {"table": "orders", "kind": "satisfies", "left": "amount",
     "op": "<=", "right_column": "oid"},
    # right-value satisfies: exactly the five planted 999.0 ages
    # violate (the three NaN ages are out of scope on both sides)
    {"table": "users", "kind": "satisfies", "left": "age",
     "op": "<", "right_value": 500.0},
    # fd uid -> name holds (uid unique); uid -> amount is violated by
    # every uid with >= 2 orders of different amounts
    {"table": "users", "column": "uid",
     "kind": "functional_dependency", "determines": "name"},
    {"table": "orders", "column": "uid",
     "kind": "functional_dependency", "determines": "amount"},
    # ---- continuation kinds ----
    # ages are 10-89 with five planted 999s: a max cap of 120 fails,
    # the min floor passes
    {"table": "users", "column": "age", "kind": "min_between",
     "min": 5.0, "max": 15.0},
    {"table": "users", "column": "age", "kind": "max_between",
     "max": 120.0},
    # order ts span June 2025: fresh within 60 days of Aug 1 (the
    # failing twin lives in DEFAULT_SUITE on orders.o_orderdate)
    {"table": "orders", "column": "ts", "kind": "freshness",
     "as_of": "2025-08-01T00:00:00", "max_lag_seconds": 60 * 86400},
    # iid amount vs oid: |corr| tiny — the ±0.1 window passes, a 0.5
    # floor fails
    {"table": "orders", "column": "amount", "kind": "corr_between",
     "with_column": "oid", "min": -0.1, "max": 0.1},
    {"table": "orders", "column": "amount", "kind": "corr_between",
     "with_column": "uid", "min": 0.5},
    # 4 tiers incl. 2 planted 'plutonium' rows: H ≈ ln 3 ≈ 1.09 nats
    {"table": "users", "column": "tier", "kind": "entropy_between",
     "min": 0.8, "max": 1.3},
    {"table": "users", "column": "tier", "kind": "entropy_between",
     "name": "tier_hi", "min": 2.0},          # fails
    # (oid, uid) collides exactly on the two planted duplicate oids
    # (rows 10/11 and 20/21 got identical oids but different uids —
    # so (oid, uid) stays unique and this passes)
    {"table": "orders", "kind": "unique_together",
     "columns": ["oid", "uid"]},
    # (uid, tier) over 400 users with 420 possible uids must collide
    {"table": "users", "kind": "unique_together",
     "columns": ["name", "tier"]},
    # exact median of uniform(1, 100) ≈ 50
    {"table": "orders", "column": "amount", "kind": "quantile_between",
     "q": 0.5, "min": 30.0, "max": 70.0},
    {"table": "orders", "column": "amount", "kind": "quantile_between",
     "q": 0.9, "max": 20.0},                  # p90 ≈ 90 → fails
    # ages iid across tiers → tiny exact KS; 0.0 threshold fails on
    # any difference at all
    {"table": "users", "column": "age", "kind": "ks_max",
     "split_column": "tier", "baseline_values": ["gold"],
     "current_values": ["silver", "bronze"], "max_ks": 0.5},
    # second split on the same measure needs the 'name' display
    # override to keep cids unique
    {"table": "users", "column": "age", "kind": "ks_max", "name": "age_rev",
     "split_column": "tier", "baseline_values": ["bronze"],
     "current_values": ["gold"], "max_ks": 0.0},
    # mostly: 4 bad names / 400 = 1% ≤ 2% tolerance → passes where
    # the strict regex above fails; 5 bad ages / 400 > 0.1% → fails
    {"table": "users", "column": "name", "kind": "regex",
     "pattern": "^User#[0-9]+$", "mostly": 0.98},
    {"table": "users", "column": "age", "kind": "range",
     "min": 0.0, "max": 120.0, "mostly": 0.999},
]


def test_engine_matches_generated_oracle(ray_session):
    import ray
    tabs = _tables()

    def read(table, columns):
        df = tabs[table]
        return ray.data.from_pandas(
            df[list(columns)] if columns else df).repartition(4)

    got = audit_constraints(read, SUITE)

    con = duckdb.connect()
    for name, df in tabs.items():
        con.register(name, df)
    want = con.execute(suite_oracle_sql(SUITE)).df()

    got = got.reset_index(drop=True)
    want = want.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64", "n_violations": "int64",
                    "passed": "int64"}),
        want.astype({"n_rows": "int64", "n_violations": "int64",
                     "passed": "int64"}))
    # the planted violations are actually detected
    by = got.set_index(["table_name", "column_name", "check"])
    assert by.loc[("users", "age", "not_null"), "n_violations"] == 3
    assert by.loc[("users", "age", "range"), "n_violations"] == 5
    assert by.loc[("users", "name", "regex"), "n_violations"] == 4
    assert by.loc[("users", "tier", "in_set"), "n_violations"] == 2
    assert by.loc[("users", "uid", "unique"), "n_violations"] == 0
    assert by.loc[("users", "*", "row_count_min"), "n_violations"] == 600
    assert by.loc[("orders", "oid", "unique"), "n_violations"] == 2
    assert by.loc[("orders", "uid", "foreign_key"), "n_violations"] > 0
    assert by.loc[("users", "age", "null_ratio_max"), "n_violations"] == 3
    assert by.loc[("users", "tier", "distinct_count_min"),
                  "n_violations"] == 2
    assert by.loc[("orders", "amount", "mean_between"),
                  "n_violations"] == 0
    assert by.loc[("orders", "amount", "stddev_between"),
                  "n_violations"] == 1
    assert by.loc[("orders", "amount", "monotonic"), "n_violations"] > 0
    assert by.loc[("users", "age", "psi_max"), "n_violations"] == 0
    assert by.loc[("orders", "*", "row_count_ratio_between"),
                  "n_violations"] == 0
    assert by.loc[("users", "*", "row_count_ratio_between"),
                  "n_violations"] == 1
    assert by.loc[("users", "age<500.0", "satisfies"),
                  "n_violations"] == 5
    assert by.loc[("orders", "amount<=oid", "satisfies"),
                  "n_violations"] > 0
    assert by.loc[("users", "uid->name", "functional_dependency"),
                  "n_violations"] == 0
    assert by.loc[("orders", "uid->amount", "functional_dependency"),
                  "n_violations"] > 0
    # continuation kinds: gates land on the planted data as designed
    assert by.loc[("users", "age", "min_between"), "n_violations"] == 0
    assert by.loc[("users", "age", "max_between"), "n_violations"] == 1
    assert by.loc[("orders", "ts", "freshness"), "n_violations"] == 0
    assert by.loc[("orders", "amount~oid", "corr_between"),
                  "n_violations"] == 0
    assert by.loc[("orders", "amount~uid", "corr_between"),
                  "n_violations"] == 1
    assert by.loc[("users", "tier", "entropy_between"),
                  "n_violations"] == 0
    assert by.loc[("orders", "oid+uid", "unique_together"),
                  "n_violations"] == 0
    assert by.loc[("users", "name+tier", "unique_together"),
                  "n_violations"] > 0
    assert by.loc[("orders", "amount@0.5", "quantile_between"),
                  "n_violations"] == 0
    assert by.loc[("orders", "amount@0.9", "quantile_between"),
                  "n_violations"] == 1
    assert by.loc[("users", "age", "ks_max"), "n_violations"] == 0
    assert by.loc[("users", "age_rev", "ks_max"), "n_violations"] == 1
    # mostly: 1% bad names pass at 0.98 tolerance; bad ages fail 0.999
    mrow = by.loc[("users", "name~0.98", "regex")]
    assert mrow["n_violations"] == 4 and mrow["passed"] == 1
    arow = by.loc[("users", "age~0.999", "range")]
    assert arow["n_violations"] == 5 and arow["passed"] == 0
    # passed reflects the tolerance, not bare zero-violations, for
    # exactly the mostly rows
    strict = ~got["column_name"].str.contains("~0.9")
    assert (got.loc[strict, "passed"]
            == (got.loc[strict, "n_violations"] == 0)
            .astype("int64")).all()


def test_violation_rows_match_generated_oracle(ray_session):
    import ray
    tabs = _tables()

    def read(table, columns):
        df = tabs[table]
        return ray.data.from_pandas(
            df[list(columns)] if columns else df).repartition(4)

    keys = {"users": "uid", "orders": "oid"}
    got = violation_rows(read, SUITE, keys)

    con = duckdb.connect()
    for name, df in tabs.items():
        con.register(name, df)
    want = con.execute(violations_oracle_sql(SUITE, keys)).df()
    for c in want.columns:
        want[c] = want[c].astype(str)
    want = (want.sort_values(list(want.columns))
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # the planted rows are the ones emitted
    nn = got[(got["check"] == "not_null")]
    assert set(nn["key"]) == {"5", "50", "100"}
    rng_rows = got[(got["check"] == "range")]
    assert set(rng_rows["key"]) == {"7", "70", "170", "270", "370"}
    dup = got[got["check"] == "unique"]
    assert len(dup) == 2  # two duplicated oid values
    assert (got[got["check"] == "monotonic"]["column_name"]
            == "amount").all()


def test_violation_rows_monotonic_tie_break(ray_session):
    """Full (order, value) ties: the flagged ROW must be pinned by the
    key tie-break identically on engine and oracle."""
    import ray
    df = pd.DataFrame({
        "k": np.arange(6, dtype="int64"),
        "g": np.zeros(6, dtype="int64"),
        "o": [0, 1, 1, 1, 2, 3],
        "v": [5.0, 3.0, 3.0, 3.0, 4.0, 1.0],
    })
    suite = [{"table": "t", "column": "v", "kind": "monotonic",
              "group_by": "g", "order_by": "o"}]
    got = violation_rows(
        lambda table, columns: ray.data.from_pandas(
            df[list(columns)]).repartition(3),
        suite, {"t": "k"})
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(violations_oracle_sql(suite, {"t": "k"})).df()
    assert got["key"].tolist() == sorted(want["key"].astype(str))
    # rows 1 (first of the tied trio, after 5.0) and 5 (1.0 after 4.0)
    assert set(got["key"]) == {"1", "5"}


@pytest.mark.parametrize("bad,msg", [
    ({"table": "t", "column": "c", "kind": "frobnicate"}, "unknown"),
    ({"table": "t", "kind": "not_null"}, "needs a column"),
    ({"table": "t", "column": "c", "kind": "range"}, "min and/or max"),
    ({"table": "t", "column": "c", "kind": "in_set"}, "values"),
    ({"table": "t", "column": "c", "kind": "regex"}, "pattern"),
    ({"table": "t", "column": "c", "kind": "foreign_key"}, "ref_table"),
    ({"table": "t", "kind": "row_count_min"}, "min_rows"),
    ({"table": "t", "column": "c", "kind": "monotonic"},
     "group_by/order_by"),
    ({"table": "t", "column": "c", "kind": "null_ratio_max"},
     "max_ratio"),
    ({"table": "t", "column": "c", "kind": "distinct_count_min"},
     "min_distinct"),
    ({"table": "t", "column": "c", "kind": "mean_between"},
     "min and/or max"),
    ({"table": "t", "column": "c", "kind": "stddev_between"},
     "min and/or max"),
    ({"table": "t", "column": "c", "kind": "psi_max",
      "split_column": "s", "baseline_values": ["a"],
      "current_values": ["b"], "max_psi": 0.1}, "edges"),
    ({"table": "t", "column": "c", "kind": "psi_max",
      "split_column": "s", "baseline_values": ["a"],
      "current_values": ["b"], "edges": [3.0, 1.0], "max_psi": 0.1},
     "sorted"),
    ({"table": "t", "kind": "row_count_ratio_between"},
     "ref_table"),
    ({"table": "t", "kind": "satisfies", "left": "a"}, "left/op"),
    ({"table": "t", "kind": "satisfies", "left": "a", "op": "~"},
     "op must be"),
    ({"table": "t", "kind": "satisfies", "left": "a", "op": "<"},
     "exactly one"),
    ({"table": "t", "kind": "satisfies", "left": "a", "op": "<",
      "right_column": "b", "right_value": 1.0}, "exactly one"),
    ({"table": "t", "column": "a", "kind": "functional_dependency"},
     "determines"),
    ({"table": "t", "column": "a", "kind": "min_between"},
     "min and/or max"),
    ({"table": "t", "column": "a", "kind": "freshness"},
     "as_of"),
    ({"table": "t", "column": "a", "kind": "corr_between", "min": 0.0},
     "with_column"),
    ({"table": "t", "kind": "unique_together", "columns": ["a"]},
     ">= 2 columns"),
    ({"table": "t", "column": "a", "kind": "quantile_between",
      "min": 0.0}, "q in"),
    ({"table": "t", "column": "a", "kind": "quantile_between",
      "q": 1.5, "min": 0.0}, "q in"),
    ({"table": "t", "column": "a", "kind": "ks_max",
      "split_column": "s", "baseline_values": ["x"],
      "current_values": ["y"]}, "max_ks"),
    ({"table": "t", "column": "a", "kind": "unique", "mostly": 0.9},
     "mostly only applies"),
    ({"table": "t", "column": "a", "kind": "not_null", "mostly": 0.0},
     "mostly must be"),
    ({"table": "t", "column": "a", "kind": "psi_snapshot",
      "edges": [1.0], "max_psi": 0.1}, "baseline_counts"),
    ({"table": "t", "column": "a", "kind": "psi_snapshot",
      "edges": [1.0, 2.0], "baseline_counts": [1, 2], "max_psi": 0.1},
     "len.edges..1"),
])
def test_suite_validation_rejects(bad, msg):
    with pytest.raises(ValueError, match=msg):
        audit_constraints(lambda *a: None, [bad])


def test_snapshot_drift_round_trip(ray_session):
    """profile_snapshot → drift_suite_from_snapshot → audit: the run
    that produced the snapshot drifts nowhere (PSI ≈ 0 → all pass);
    a location-shifted rerun trips every gate; the generated SQL
    agrees with the engine on both."""
    import ray
    from butteraugli_ray.engine.constraints import (
        drift_suite_from_snapshot, profile_snapshot)

    rng = np.random.default_rng(11)
    base = pd.DataFrame({"x": rng.normal(50, 10, 4000),
                         "y": rng.uniform(0, 1, 4000)})
    shifted = pd.DataFrame({"x": base["x"] + 25.0,
                            "y": base["y"] ** 3})

    def mkread(df):
        return lambda table, columns: ray.data.from_pandas(
            df[list(columns)] if columns else df).repartition(4)

    snap = profile_snapshot(mkread(base), {"t": ["x", "y"]})
    assert snap["t"]["x"]["n"] == 4000
    assert len(snap["t"]["x"]["counts"]) == len(snap["t"]["x"]["edges"]) + 1
    assert sum(snap["t"]["x"]["counts"]) == 4000

    suite = drift_suite_from_snapshot(snap, max_psi=0.05)
    assert [s["column"] for s in suite] == ["x", "y"]

    same = audit_constraints(mkread(base), suite)
    assert (same["n_violations"] == 0).all()
    drift = audit_constraints(mkread(shifted), suite)
    assert (drift["n_violations"] == 1).all()

    con = duckdb.connect()
    con.register("t", shifted)
    want = con.execute(suite_oracle_sql(suite)).df()
    pd.testing.assert_frame_equal(
        drift.reset_index(drop=True),
        want.astype({"n_rows": "int64", "n_violations": "int64",
                     "passed": "int64"}).reset_index(drop=True))


def test_duplicate_constraint_rejected():
    s = {"table": "t", "column": "c", "kind": "not_null"}
    with pytest.raises(ValueError, match="duplicate"):
        audit_constraints(lambda *a: None, [s, dict(s)])


def test_schema_check_statuses():
    import pyarrow as pa
    from butteraugli_ray.engine.constraints import (check_schemas,
                                                    schema_oracle_sql)
    actual = {
        "t": pa.schema([("a", pa.int64()), ("b", pa.string()),
                        ("c", pa.float64()),
                        ("e", pa.list_(pa.float32())),
                        ("f", pa.timestamp("us"))]),
    }
    expected = {"t": [("a", "BIGINT"),        # ok
                      ("c", "DOUBLE"),        # position_mismatch (2 vs 3)
                      ("b", "BIGINT"),        # type_mismatch
                      ("d", "VARCHAR"),       # missing
                      ("e", "FLOAT[]"),       # position_mismatch
                      ("f", "TIMESTAMP")]}    # position_mismatch? 6 vs 5
    got = check_schemas(lambda t: actual[t], expected)
    st = got.set_index("column_name")["status"]
    assert st["a"] == "ok"
    assert st["b"] == "type_mismatch"
    assert st["c"] == "position_mismatch"
    assert st["d"] == "missing"
    assert st["e"] == "position_mismatch"
    assert st["f"] == "position_mismatch"
    # engine matches the generated SQL over an equivalent actual table
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b VARCHAR, c DOUBLE, "
                "e FLOAT[], f TIMESTAMP)")
    want = con.execute(schema_oracle_sql(expected)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"expected_pos": "int64", "actual_pos": "int64"})
        .reset_index(drop=True))


def test_cli_audit_exit_codes(tmp_path):
    """`butteraugli-ray audit` exit contract: 1 when the suite has
    violations (DEFAULT_SUITE plants failures), 0 on an all-green
    suite, 2 on an invalid spec."""
    import json as _json
    import subprocess
    import sys
    base = [sys.executable, "-m", "butteraugli_ray.cli", "audit",
            "--sf-dir", "/root/testdata/sf0.001", "--num-cpus", "4"]
    # default suite has deliberate failures -> exit 1
    r = subprocess.run(base, capture_output=True, text=True)
    assert r.returncode == 1, r.stderr
    assert "n_violations" in r.stdout
    # an all-green suite -> exit 0
    ok = [{"table": "orders", "column": "o_orderkey",
           "kind": "not_null"}]
    p = tmp_path / "ok.json"
    p.write_text(_json.dumps(ok))
    r = subprocess.run(base + ["--suite", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # invalid spec -> exit 2
    bad = [{"table": "orders", "column": "o_orderkey",
            "kind": "frobnicate"}]
    p2 = tmp_path / "bad.json"
    p2.write_text(_json.dumps(bad))
    r = subprocess.run(base + ["--suite", str(p2)],
                       capture_output=True, text=True)
    assert r.returncode == 2
    # a failing WARN-severity check reports but does not gate -> exit 0
    warn = [{"table": "orders", "kind": "row_count_min",
             "min_rows": 10 ** 9, "severity": "warn"}]
    p3 = tmp_path / "warn.json"
    p3.write_text(_json.dumps(warn))
    r = subprocess.run(base + ["--suite", str(p3)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "warn" in r.stdout


def test_default_suite_is_valid_sql():
    # the shipped suite must always compile to parseable SQL
    sql = suite_oracle_sql(DEFAULT_SUITE)
    assert sql.count("UNION ALL") == len(DEFAULT_SUITE) - 1
    assert "ORDER BY" in sql


def test_audit_single_storage_read_per_table(ray_session, tmp_path):
    """The 100-TB scan contract: one storage read per table per audit,
    no matter how many extra-pass kinds (unique / distinct / entropy /
    quantile / ks / monotonic / fd / unique_together) the suite mixes
    in — the pruned projection is materialized once and every helper
    streams object-store blocks.  A counting stage fused onto the
    parquet read increments per plan EXECUTION; re-consuming the lazy
    Dataset would re-run it."""
    import pyarrow as pa
    import pyarrow.parquet as pqt
    import ray

    tabs = _tables()
    for name, df in tabs.items():
        pqt.write_table(pa.Table.from_pandas(df),
                        str(tmp_path / f"{name}.parquet"))

    @ray.remote
    class ScanCounter:
        def __init__(self):
            self.n = {}

        def inc(self, table):
            self.n[table] = self.n.get(table, 0) + 1

        def get(self):
            return dict(self.n)

    counter = ScanCounter.remote()

    def read(table, columns):
        ds = ray.data.read_parquet(
            str(tmp_path / f"{table}.parquet"),
            columns=list(columns) if columns else None,
            override_num_blocks=1)

        def count(t, _t=table):
            ray.get(counter.inc.remote(_t))
            return t

        # batch_size=None → whole blocks → exactly one increment per
        # plan execution of the single-block read
        return ds.map_batches(count, batch_format="pyarrow",
                              batch_size=None)

    suite = [
        {"table": "users", "column": "age", "kind": "range",
         "min": 0.0, "max": 120.0},
        {"table": "users", "column": "uid", "kind": "unique"},
        {"table": "users", "column": "tier", "kind": "entropy_between",
         "min": 0.1},
        {"table": "users", "column": "age", "kind": "quantile_between",
         "q": 0.5, "min": 0.0},
        {"table": "users", "column": "tier", "kind": "distinct_count_max",
         "max_distinct": 10},
        {"table": "users", "kind": "unique_together",
         "columns": ["name", "tier"]},
        {"table": "users", "column": "uid",
         "kind": "functional_dependency", "determines": "name"},
        {"table": "users", "column": "age", "kind": "ks_max",
         "split_column": "tier", "baseline_values": ["gold"],
         "current_values": ["silver"], "max_ks": 0.9},
        {"table": "orders", "column": "amount", "kind": "monotonic",
         "group_by": "uid", "order_by": "ts"},
        {"table": "orders", "column": "oid", "kind": "unique"},
        {"table": "orders", "column": "amount", "kind": "mean_between",
         "min": 0.0},
    ]
    out = audit_constraints(read, suite)
    assert len(out) == len(suite)
    counts = ray.get(counter.get.remote())
    assert counts == {"users": 1, "orders": 1}, counts

    # violation_rows obeys the same rule
    counter2 = ScanCounter.remote()

    def read2(table, columns):
        ds = ray.data.read_parquet(
            str(tmp_path / f"{table}.parquet"),
            columns=list(columns) if columns else None,
            override_num_blocks=1)

        def count(t, _t=table):
            ray.get(counter2.inc.remote(_t))
            return t

        return ds.map_batches(count, batch_format="pyarrow",
                              batch_size=None)

    vsuite = [
        {"table": "users", "column": "age", "kind": "range",
         "min": 0.0, "max": 120.0},
        {"table": "users", "column": "uid", "kind": "unique"},
        {"table": "users", "kind": "unique_together",
         "columns": ["name", "tier"]},
        {"table": "users", "column": "uid",
         "kind": "functional_dependency", "determines": "name"},
        {"table": "orders", "column": "amount", "kind": "monotonic",
         "group_by": "uid", "order_by": "ts"},
        {"table": "orders", "column": "oid", "kind": "unique"},
    ]
    violation_rows(read2, vsuite, keys={"users": "uid", "orders": "oid"})
    counts2 = ray.get(counter2.get.remote())
    assert counts2 == {"users": 1, "orders": 1}, counts2


def test_schema_check_roundtrip_all_arrow_types(tmp_path):
    """check_schemas vs the generated information_schema oracle over a
    table carrying EVERY Arrow type _arrow_to_sql claims to map — the
    engine's footer read and DuckDB's view of the same parquet must
    agree on names, ordinals and type spellings (all rows 'ok')."""
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from butteraugli_ray.engine.constraints import (check_schemas,
                                                    schema_oracle_sql)

    tbl = pa.table({
        "c_i64": pa.array([1], pa.int64()),
        "c_i32": pa.array([1], pa.int32()),
        "c_i16": pa.array([1], pa.int16()),
        "c_i8": pa.array([1], pa.int8()),
        "c_f64": pa.array([1.0], pa.float64()),
        "c_f32": pa.array([1.0], pa.float32()),
        "c_str": pa.array(["x"], pa.string()),
        "c_bool": pa.array([True], pa.bool_()),
        "c_ts": pa.array([pd.Timestamp("2024-01-01")],
                         pa.timestamp("us")),
        "c_date": pa.array([18262], pa.date32()),
        "c_bin": pa.array([b"x"], pa.binary()),
        "c_list_f32": pa.array([[1.0]], pa.list_(pa.float32())),
        "c_list_i64": pa.array([[1]], pa.list_(pa.int64())),
    })
    path = str(tmp_path / "alltypes.parquet")
    pqt.write_table(tbl, path)

    from butteraugli_ray.engine.constraints import _arrow_to_sql
    expected = {"alltypes": [(f.name, _arrow_to_sql(f.type))
                             for f in tbl.schema]}

    got = check_schemas(lambda t: pqt.read_schema(path), expected)
    assert (got["status"] == "ok").all(), got[got["status"] != "ok"]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW alltypes AS SELECT * FROM "
                f"read_parquet('{path}')")
    want = con.execute(schema_oracle_sql(expected)).df()
    assert (want["status"] == "ok").all(), want[want["status"] != "ok"]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"expected_pos": "int64",
                     "actual_pos": "int64"}).reset_index(drop=True))
