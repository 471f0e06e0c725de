"""Per-partition checkpoint manifests (lineage + metrics).

A validation run is resumable at partition granularity: each partition's
violation rows land in one atomically-renamed parquet file and a JSON
manifest records its metrics + input fingerprint.  On resume, completed
partitions are filtered out of the read (predicate pushdown on the
``partition_id`` column) and never rescored — the north rule's
"resumes without rescoring completed partitions".

Atomicity = write-temp-then-rename on the same filesystem.
"""

from __future__ import annotations

import json
import os
import tempfile


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifests")


def violations_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "violations")


def _atomic_write_json(path: str, obj) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def atomic_write_parquet(path: str, table) -> None:
    import pyarrow.parquet as pq
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".parquet.tmp")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def write_manifest(out_dir: str, partition_id: int, metrics: dict) -> str:
    path = os.path.join(manifest_dir(out_dir), f"part-{partition_id:05d}.json")
    _atomic_write_json(path, metrics)
    return path


def completed_partitions(out_dir: str) -> set:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                done.add(int(name[5:-5]))
            except ValueError:
                continue
    return done


def load_manifests(out_dir: str) -> dict:
    d = manifest_dir(out_dir)
    out = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out[int(name[5:-5])] = json.load(f)
    return out


def write_summary(out_dir: str, summary: dict) -> str:
    path = os.path.join(out_dir, "summary.json")
    _atomic_write_json(path, summary)
    return path
