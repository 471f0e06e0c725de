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


def small_file_num_blocks(path: str, target_bytes: int = 4 << 20,
                          lo: int = 16, hi: int = 64):
    """Block-count override keeping blocks ≥ ~4 MB on local files.

    Ray's default parallelism heuristic splits any file into ~2×CPU
    blocks (a 99 MB file became 310 ~0.3 MB blocks); every downstream
    shuffle then pays per-block scheduling that dwarfs the data — and
    Ray's SORT (behind every groupby) creates one reduce partition per
    input block, so fragment count grows QUADRATICALLY with block
    count (measured: two groupby Sorts totaling 135 s over ~60 MB of
    rows at 1M docs, and 2-3× whole-query slowdowns at sf0.1).  We cap
    blocks at size/4MB in [lo, cpu-scaled hi]: single files up to a
    few GB read in ≤ a-few-hundred 4-16 MB blocks, which keeps every
    downstream sort's partition fan-out proportional to compute, not
    to Ray's splitting heuristic.  (On a multi-node cluster the hi cap
    scales with cluster CPUs; genuinely huge inputs arrive as MANY
    files and parallelize across files regardless.)"""
    try:
        size = os.path.getsize(path)
    except OSError:
        return None
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 16)) \
            if ray.is_initialized() else 16
    except Exception:
        cpus = 16
    hi = max(hi, 4 * cpus)
    n = int(max(lo, min(hi, size // target_bytes)))
    # Per-block BYTES must stay bounded too: with only the count cap, a
    # 100 GB single file on 16 CPUs would become ~1.6 GB blocks and OOM
    # workers.  Enforce blocks ≤128 MB, raising the count past ``hi``
    # when a single file is genuinely huge.
    max_block_bytes = 128 << 20
    return max(n, -(-size // max_block_bytes))


def parquet_schema_no_metadata(path: str, columns=None):
    """Metadata-free (hashable) schema for a parquet file, projected to
    ``columns`` when given — passed as read_parquet(schema=...) so even
    READ-stage block concats hash/dedup schemas (strip_schema_metadata
    alone only fixes stages after the read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def strip_schema_metadata(ds):
    """Fused zero-copy map dropping schema-level metadata.

    pandas-written parquet carries a b'pandas' schema metadata dict that
    makes ``pyarrow.Schema`` unhashable; Ray then logs a 'Failed to hash
    the schemas' warning on every block concat and loses its early-exit
    schema dedup.  Stripping the metadata (cheap, buffers untouched)
    restores both."""
    import pyarrow as pa

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None)

    return ds.map_batches(strip, batch_format="pyarrow")


def read_table(path: str, columns=None):
    """→ ray.data.Dataset from a .lance dataset or .parquet file/dir."""
    import ray.data as rd
    if path.endswith(".lance") and _have_lance():
        return rd.read_lance(path, columns=columns)
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns,
                        schema=parquet_schema_no_metadata(path, columns),
                        override_num_blocks=small_file_num_blocks(path)))


def post_filter(ds, filter_expr):
    """Apply a pyarrow dataset Expression AFTER the read (zero-copy
    Arrow ``Table.filter``) — the correctness fallback when a source
    can't push the predicate down (e.g. resume pruning on Lance)."""
    if filter_expr is None:
        return ds

    def apply(t, _e=filter_expr):
        return t.filter(_e)

    return ds.map_batches(apply, batch_format="pyarrow")


def read_table_filtered(path: str, columns=None, filter_expr=None,
                        lance_filter_sql=None):
    """Filtered read with predicate pushdown (prune at the read).

    Parquet: ``filter_expr`` (pyarrow Expression) prunes row groups at
    the scan.  Lance: pass ``lance_filter_sql`` (Lance's SQL-subset
    filter string) for true pushdown; if only ``filter_expr`` is given
    the predicate is applied post-read (correct — completed partitions
    are still skipped on resume — but every fragment is scanned; a
    warning says so)."""
    import ray.data as rd
    if path.endswith(".lance") and _have_lance():
        if lance_filter_sql is not None:
            return rd.read_lance(path, columns=columns,
                                 filter=lance_filter_sql)
        if filter_expr is not None:
            import warnings
            warnings.warn(
                "lance read: pyarrow filter applied post-read (not pushed "
                "down) — pass lance_filter_sql for fragment pruning",
                stacklevel=2)
        return post_filter(rd.read_lance(path, columns=columns),
                           filter_expr)
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns, filter=filter_expr,
                        schema=parquet_schema_no_metadata(path, columns),
                        override_num_blocks=small_file_num_blocks(path)))


def read_arrow(path: str):
    """Small driver-side read → pyarrow.Table (dimension tables only)."""
    if path.endswith(".lance") and _have_lance():
        import lance
        return lance.dataset(path).to_table()
    import pyarrow.parquet as pq
    return pq.read_table(path)
