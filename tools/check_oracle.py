"""Driver-style correctness check: run every queries() entry at a given
sf and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive value comparison).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import os
    os.environ["GRAFT_ORACLE_SF"] = sf_dir   # dynamic oracles track the sf
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS {name}: {len(got)} rows ({dt:.1f}s)  [no oracle]")
            continue
        exp = con.execute(oracles[name]).df()
        g, e = normalize(got), normalize(exp)
        ok = list(g.columns) == list(e.columns) and len(g) == len(e)
        if ok:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as err:
                ok = False
                msg = str(err).splitlines()[0]
        if ok:
            print(f"PASS {name}: {len(g)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: got {len(g)}x{list(g.columns)} vs "
                  f"exp {len(e)}x{list(e.columns)} ({dt:.1f}s)")
            if len(g) and len(e) and list(g.columns) == list(e.columns):
                diff = (g != e)
                bad = diff.any(axis=1)
                print("  first mismatch rows (got | exp):")
                print(pd.concat([g[bad].head(3), e[bad].head(3)], axis=1))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
