"""Format-pluggable table I/O (Lance ↔ Parquet, identical Arrow schema).

The corpus contract is a Lance table (BASELINE.json:input_hint); this
sandbox has no lance wheel, so the reader dispatches on availability /
extension and everything downstream sees the same Arrow schema
(documented substitution, SURVEY.md §7.4).
"""

from __future__ import annotations

import os


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_table(path: str, columns=None):
    """→ ray.data.Dataset from a .lance dataset or .parquet file/dir."""
    import ray.data as rd
    if path.endswith(".lance") and _have_lance():
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def read_table_filtered(path: str, columns=None, filter_expr=None):
    """Parquet read with row-group predicate pushdown (prune at the read)."""
    import ray.data as rd
    if path.endswith(".lance") and _have_lance():
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns, filter=filter_expr)


def read_arrow(path: str):
    """Small driver-side read → pyarrow.Table (dimension tables only)."""
    if path.endswith(".lance") and _have_lance():
        import lance
        return lance.dataset(path).to_table()
    import pyarrow.parquet as pq
    return pq.read_table(path)
