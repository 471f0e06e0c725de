"""Flagship pipeline: corpus-wide schema + constraint validation.

Ray-Data-first dataflow (SURVEY.md §7):

    media table ──map_batches(MediaScorer actor pool)──► {media_ref→score}
                                                         (small; ray.put broadcast)
    documents ──read_parquet(filter: partition_id ∉ completed)───────────┐
       ├─ map_batches(StructuralChecker)      → structural violation rows │ streaming,
       ├─ map_batches(SpanScoreChecker)       → perceptual violation rows │ no full
       ├─ select(doc_id, partition_id) → groupby(doc_id) → duplicate rows │ materialize
       └─ map_batches(partials: count/HLL/histogram per partition)        │
    violations.union() ─ groupby(partition_id).map_groups(atomic writer) ─┘
    driver: merge partials per partition → manifest JSON (atomic) → summary
            (+ KS/PSI drift of the score histogram vs a baseline snapshot)

Scale design: the only all-to-all shuffles are (a) the duplicate check,
run on a 2-column projection, and (b) the per-partition violation
grouping, which only moves violation rows (~violation_rate of the
corpus).  Everything else is map-only; sketches ship bytes, not rows.
"""

from __future__ import annotations

import base64
import json
import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import FixedHistogram, HyperLogLog, ks_statistic, psi
from ..metric.api import ButteraugliParams
from ..sources.tables import read_arrow, read_table_filtered
from ..stages.scorer import MediaScorer, SpanScoreChecker
from ..stages.structural import StructuralChecker, VIOLATION_SCHEMA, check_spans_batch
from . import checkpoint as ckpt

DEFAULT_SCORE_THRESHOLD = 4.0
_HIST_RANGE = (0.0, 32.0)
_HIST_BINS = 64


def _attach_partition(viol: pa.Table, batch: pa.Table) -> pa.Table:
    """Vectorized doc_id → partition_id lookup within the batch."""
    if viol.num_rows == 0:
        return viol.append_column("partition_id", pa.array([], pa.int32()))
    pos = pc.index_in(viol["doc_id"], value_set=batch["doc_id"].combine_chunks()
                      if isinstance(batch["doc_id"], pa.ChunkedArray)
                      else batch["doc_id"])
    pids = pc.take(batch["partition_id"], pos).cast(pa.int32())
    return viol.append_column("partition_id", pids)


class _StructuralWithPartition(StructuralChecker):
    def __call__(self, batch: pa.Table) -> pa.Table:
        return _attach_partition(super().__call__(batch), batch)


class _ScoreCheckWithPartition(SpanScoreChecker):
    def __call__(self, batch: pa.Table) -> pa.Table:
        return _attach_partition(super().__call__(batch), batch)


class _PartitionPartials:
    """Per-batch mergeable metrics row per partition: doc count, HLL
    registers of doc_id, span count — the StripReducer pattern
    (strip.rs:127-209) applied to corpus statistics."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids = batch["partition_id"].to_numpy(zero_copy_only=False)
        n_spans = pc.list_value_length(batch["spans"]).to_numpy(zero_copy_only=False)
        rows = {"partition_id": [], "n_docs": [], "n_spans": [], "hll": []}
        for pid in np.unique(pids):
            mask = pids == pid
            doc_ids = pc.filter(batch["doc_id"], pa.array(mask)).to_pylist()
            hll = HyperLogLog().add(doc_ids)
            rows["partition_id"].append(int(pid))
            rows["n_docs"].append(int(mask.sum()))
            rows["n_spans"].append(int(n_spans[mask].sum()))
            rows["hll"].append(base64.b64encode(hll.to_bytes()).decode())
        return pa.table({
            "partition_id": pa.array(rows["partition_id"], pa.int32()),
            "n_docs": pa.array(rows["n_docs"], pa.int64()),
            "n_spans": pa.array(rows["n_spans"], pa.int64()),
            "hll": pa.array(rows["hll"], pa.string()),
        })


def score_media_table(media_path: str, params: Optional[ButteraugliParams] = None,
                      concurrency: int = 4, batch_size: int = 8):
    """Score every media pair with the actor-pool scorer; returns the
    scores as a pyarrow table (media side is the small side)."""
    import ray.data as rd
    media = rd.read_parquet(media_path) if media_path.endswith(".parquet") else \
        rd.read_lance(media_path)
    scored = media.map_batches(MediaScorer, fn_constructor_kwargs={"params": params},
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=concurrency)
    return pa.concat_tables(
        [b for b in scored.iter_batches(batch_size=4096, batch_format="pyarrow")],
        promote_options="default")


def _violation_writer(out_dir: str):
    """Per-partition atomic violation writer (map_groups) → manifest row."""

    def write(group: pa.Table) -> pa.Table:
        pid = int(group["partition_id"][0].as_py())
        path = os.path.join(ckpt.violations_dir(out_dir), f"part-{pid:05d}.parquet")
        ckpt.atomic_write_parquet(path, group)
        vc = pc.value_counts(group["check"])
        checks = {v["values"]: v["counts"] for v in vc.to_pylist()}
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "n_violations": pa.array([group.num_rows], pa.int64()),
                         "checks_json": pa.array([json.dumps(checks)], pa.string())})

    return write


def validate_corpus(docs_path: str, media_path: str, out_dir: str, *,
                    threshold: float = DEFAULT_SCORE_THRESHOLD,
                    params: Optional[ButteraugliParams] = None,
                    baseline_snapshot: Optional[str] = None,
                    resume: bool = True,
                    scorer_concurrency: int = 4,
                    batch_size: int = 1024) -> dict:
    """Run the full validation; returns the summary dict.

    ``baseline_snapshot``: path to a summary.json of a previous run whose
    score histogram becomes the drift baseline (KS/PSI).
    """
    import ray
    import ray.data as rd

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    done = ckpt.completed_partitions(out_dir) if resume else set()

    # ---- media scoring (small side) + broadcast --------------------------
    scores_tbl = score_media_table(media_path, params, scorer_concurrency)
    score_map = {}
    score_hist = FixedHistogram(*_HIST_RANGE, _HIST_BINS)
    finite_scores = []
    for mr, sc in zip(scores_tbl["media_ref"].to_pylist(),
                      scores_tbl["score"].to_pylist()):
        score_map[mr] = sc if sc is not None else float("nan")
        if sc is not None and np.isfinite(sc):
            finite_scores.append(sc)
    score_hist.add(np.array(finite_scores))
    media_keys = set(score_map)
    keys_ref = ray.put(media_keys)
    scores_ref = ray.put(score_map)

    # ---- documents (filter completed partitions at the read) -------------
    filt = None
    if done:
        import pyarrow.dataset as pads
        filt = ~pads.field("partition_id").isin(sorted(done))
    docs = read_table_filtered(docs_path, filter_expr=filt)

    structural = docs.map_batches(
        _StructuralWithPartition, fn_constructor_kwargs={"media_keys_ref": keys_ref},
        batch_format="pyarrow", batch_size=batch_size, concurrency=scorer_concurrency)
    score_viol = docs.map_batches(
        _ScoreCheckWithPartition,
        fn_constructor_kwargs={"scores_ref": scores_ref, "threshold": threshold},
        batch_format="pyarrow", batch_size=batch_size, concurrency=scorer_concurrency)

    # duplicate doc_id — shuffle on a pruned 2-column projection
    def dup_viol(group: pa.Table) -> pa.Table:
        n = group.num_rows
        # deterministic "first occurrence" across runs/resumes
        extra = group.sort_by("partition_id").slice(1)
        return pa.table({
            "doc_id": extra["doc_id"],
            "span_idx": pa.array([-1] * extra.num_rows, pa.int32()),
            "check": pa.array(["duplicate_doc_id"] * extra.num_rows, pa.string()),
            "detail": pa.array([f"doc_id occurs {n} times"] * extra.num_rows, pa.string()),
            "partition_id": extra["partition_id"].cast(pa.int32()),
        })

    # Global uniqueness is cross-partition: always scan the full 2-column
    # projection (cheap — doc_id + partition_id only), then keep only rows
    # landing in partitions this run still owns.  Completed partitions
    # already recorded their duplicate rows.
    docs_ids_all = read_table_filtered(docs_path, columns=["doc_id", "partition_id"])
    dups = (docs_ids_all.groupby("doc_id")
            .map_groups(dup_viol, batch_format="pyarrow"))
    if done:
        done_list = sorted(done)
        dups = dups.map_batches(
            lambda t, _dl=done_list: t.filter(
                pc.invert(pc.is_in(t["partition_id"],
                                   value_set=pa.array(_dl, pa.int32())))),
            batch_format="pyarrow")

    violations = structural.union(score_viol).union(dups)

    # ---- per-partition atomic violation files + counts -------------------
    viol_counts = (violations.groupby("partition_id")
                   .map_groups(_violation_writer(out_dir), batch_format="pyarrow"))
    viol_rows = viol_counts.to_pandas()

    # ---- per-partition doc metrics partials ------------------------------
    partials = docs.map_batches(_PartitionPartials(), batch_format="pyarrow",
                                batch_size=batch_size)
    ppdf = partials.to_pandas()

    # driver-side merge (one row per batch×partition → P rows)
    merged = {}
    for _, row in ppdf.iterrows():
        pid = int(row["partition_id"])
        cur = merged.setdefault(pid, {"n_docs": 0, "n_spans": 0,
                                      "hll": HyperLogLog()})
        cur["n_docs"] += int(row["n_docs"])
        cur["n_spans"] += int(row["n_spans"])
        cur["hll"] = cur["hll"].merge(
            HyperLogLog.from_bytes(base64.b64decode(row["hll"])))

    vmap = ({int(r["partition_id"]): r for _, r in viol_rows.iterrows()}
            if len(viol_rows) else {})
    for pid, m in sorted(merged.items()):
        vr = vmap.get(pid)
        nviol = int(vr["n_violations"]) if vr is not None else 0
        checks = json.loads(vr["checks_json"]) if vr is not None else {}
        manifest = {
            "partition_id": pid,
            "n_docs": m["n_docs"],
            "n_spans": m["n_spans"],
            "distinct_doc_ids_est": round(m["hll"].estimate(), 1),
            "n_violations": nviol,
            "violations_by_check": checks,
            "passed": nviol == 0,
            "input_fingerprint": {"docs_path": docs_path, "media_path": media_path,
                                  "threshold": threshold},
            "wall_time_s": round(time.time() - t0, 3),
        }
        ckpt.write_manifest(out_dir, pid, manifest)

    # ---- summary + drift -------------------------------------------------
    manifests = ckpt.load_manifests(out_dir)
    total_docs = sum(m["n_docs"] for m in manifests.values())
    total_viol = sum(m["n_violations"] for m in manifests.values())
    by_check = {}
    for m in manifests.values():
        for k, v in m["violations_by_check"].items():
            by_check[k] = by_check.get(k, 0) + v
    summary = {
        "n_partitions": len(manifests),
        "n_docs": total_docs,
        "n_violations": total_viol,
        "violations_by_check": by_check,
        "partitions_passed": sum(1 for m in manifests.values() if m["passed"]),
        "score_histogram": score_hist.to_dict(),
        "media_scores": {k: (None if not np.isfinite(v) else v)
                         for k, v in score_map.items()},
        "threshold": threshold,
        "wall_time_s": round(time.time() - t0, 3),
    }
    if baseline_snapshot and os.path.exists(baseline_snapshot):
        with open(baseline_snapshot) as f:
            base = json.load(f)
        bh = FixedHistogram.from_dict(base["score_histogram"])
        summary["drift"] = {"ks": ks_statistic(bh, score_hist),
                            "psi": psi(bh, score_hist),
                            "baseline": baseline_snapshot}
    ckpt.write_summary(out_dir, summary)
    return summary
