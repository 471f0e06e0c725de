"""Curation MATERIALIZATION: classify every document with the curation
cascade (queries.cascade_reason) and write the kept corpus as
partitioned parquet — one atomically-renamed file + JSON manifest per
partition, resumable at partition granularity (the validate.py sink
contract applied to training-data curation).

Scale shape: the duplicate keep-table is found with the hash-bucketed
(count, min) combine (queries._dup_keep_table — only duplicated hashes
reach the driver) and broadcast via ``ray.put``; classification is
one vectorized pass; the write is ``groupby(partition_id).map_groups``
— exactly one Python call and one output file per partition, so a
failed 100 TB run re-does only the partitions whose manifests are
missing, never rescans finished ones.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .checkpoint import (atomic_write_parquet, completed_partitions,
                         load_manifests, write_manifest, write_summary)


def kept_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "kept")


def curate_corpus(sf_dir: str, out_dir: str, n_partitions: int = 16,
                  resume: bool = True) -> dict:
    """Run the cascade over the augmented corpus and materialize kept
    docs under ``out_dir/kept/part-*.parquet``.  Returns the summary
    dict (also written to ``out_dir/summary.json``)."""
    import ray

    from ..functions import text as T
    from .queries import _dup_keep_table, _read, cascade_reason

    done = completed_partitions(out_dir) if resume else set()

    base = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def make_dups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = t.filter(pa.array(ids % 10 == 0))
        return sel.set_column(0, "doc_id", pc.add(sel["doc_id"], 1000000))

    ds = base.union(base.map_batches(make_dups, batch_format="pyarrow"))

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "content_hash": T.fingerprint_md5(df["text"])})

    dup = _dup_keep_table(ds.map_batches(add_hash, batch_format="pandas"))
    keep_map = dict(zip(dup["content_hash"], dup["keep_id"].astype("int64")))
    kref = ray.put(keep_map)

    def tag(df: pd.DataFrame, _ref=kref) -> pd.DataFrame:
        out = df[["doc_id", "source", "text"]].copy()
        out["reason"] = cascade_reason(df, ray.get(_ref))
        out["partition_id"] = (out["doc_id"].to_numpy(dtype=np.int64)
                               % n_partitions).astype("int64")
        if done:
            out = out[~out["partition_id"].isin(done)]
        return out

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["partition_id"].iloc[0])
        kept = (g[g["reason"] == "kept"]
                .sort_values("doc_id")[["doc_id", "source", "text"]])
        atomic_write_parquet(
            os.path.join(kept_dir(out_dir), f"part-{pid:05d}.parquet"),
            pa.Table.from_pandas(kept, preserve_index=False))
        counts = {k: int(v)
                  for k, v in g["reason"].value_counts().items()}
        write_manifest(out_dir, pid, {
            "partition_id": pid, "n_docs": int(len(g)),
            "n_kept": int(len(kept)), "reasons": counts})
        return pd.DataFrame({"partition_id": [pid],
                             "n_docs": [len(g)], "n_kept": [len(kept)]})

    (ds.map_batches(tag, batch_format="pandas")
     .groupby("partition_id")
     .map_groups(write_part, batch_format="pandas").materialize())

    manifests = load_manifests(out_dir)
    reasons: dict = {}
    for m in manifests.values():
        for k, v in m.get("reasons", {}).items():
            reasons[k] = reasons.get(k, 0) + v
    summary = {"n_partitions": len(manifests),
               "n_docs": sum(m["n_docs"] for m in manifests.values()),
               "n_kept": sum(m["n_kept"] for m in manifests.values()),
               "reasons": dict(sorted(reasons.items())),
               "resumed_partitions": sorted(int(p) for p in done)}
    write_summary(out_dir, summary)
    return summary
