"""Flagship pipeline: corpus-wide schema + constraint validation.

Ray-Data-first dataflow (SURVEY.md §7):

    media table ──map_batches(MediaScorer actor pool)──► {media_ref→score}
                                                         (small; ray.put broadcast)
    documents ──read_parquet(filter: partition_id ∉ completed)
       └─ map_batches(DocChecker actor pool)   ONE heavy scan emitting
            ├─ structural violation rows       tagged rows (row_kind):
            ├─ perceptual violation rows       violations + per-partition
            └─ metrics partials (count/HLL)    metrics partials
    documents[doc_id, partition_id] ── groupby(doc_id) → duplicate rows
            (always global — uniqueness is cross-partition; results
             filtered to partitions this run owns)
    violations ─ groupby(partition_id).map_groups(atomic writer) → files
    driver: merge partials per partition → manifest JSON (atomic) → summary
            (+ KS/PSI drift of the score histogram vs a baseline snapshot)

Scale design: ONE pass reads the document payload; the only all-to-all
shuffles are the duplicate check (2-column projection) and the
per-partition violation grouping (~violation_rate of the corpus).
Sketches ship bytes, not rows.
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

from ..functions.sketches import (FixedHistogram, HyperLogLog, TDigest,
                                  ks_statistic, psi)
from ..functions.pool import actor_pool
from ..metric.api import ButteraugliParams
from ..sources.tables import read_table_filtered
from ..stages.scorer import MediaScorer

from . import checkpoint as ckpt

DEFAULT_SCORE_THRESHOLD = 4.0
_HIST_RANGE = (0.0, 32.0)
_HIST_BINS = 64

_TAGGED_SCHEMA = pa.schema([
    ("row_kind", pa.string()),          # "viol" | "metrics"
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("check", pa.string()),
    ("detail", pa.string()),
    ("partition_id", pa.int32()),
    ("n_docs", pa.int64()),
    ("n_spans", pa.int64()),
    ("hll", pa.string()),
])


def _attach_partition(viol: pa.Table, batch: pa.Table) -> pa.Table:
    """Vectorized doc_id → partition_id lookup within the batch."""
    doc_ids = batch["doc_id"]
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    pos = pc.index_in(viol["doc_id"], value_set=doc_ids)
    pids = pc.take(batch["partition_id"], pos).cast(pa.int32())
    return viol.append_column("partition_id", pids)


class DocChecker:
    """The single heavy per-batch stage: every REGISTERED check
    (engine/checks.py — built-ins: structural + perceptual score; users
    add more with @register_check) + per-partition metrics partials,
    one pass.

    Holds the broadcast media key set and {media_ref → score} map
    (ray.put once; ray.get in __init__ — never re-shipped per batch).
    """

    def __init__(self, media_keys_ref=None, scores_ref=None,
                 threshold: float = DEFAULT_SCORE_THRESHOLD):
        import ray
        keys = (ray.get(media_keys_ref) if media_keys_ref is not None else None)
        scores = ray.get(scores_ref) if scores_ref is not None else {}
        items = sorted(scores.items())
        self.ctx = {
            "media_keys": (pa.array(sorted(keys), pa.string())
                           if keys is not None else None),
            "score_keys": pa.array([k for k, _ in items], pa.string()),
            "score_vals": np.array([v for _, v in items], dtype=np.float64),
            "threshold": float(threshold),
        }

    def _metrics_rows(self, batch: pa.Table) -> dict:
        from ..functions.sketches import polars_ready
        pl = polars_ready()
        pids = batch["partition_id"].to_numpy(zero_copy_only=False)
        n_spans = pc.list_value_length(batch["spans"]).to_numpy(zero_copy_only=False)
        # ONE vectorized polars hash over the whole doc_id column
        # (arrow→polars is zero-copy; bit-identical to HyperLogLog.add's
        # hash64 on the python strings) — no per-partition to_pylist.
        h = (pl.from_arrow(batch["doc_id"]).hash(seed=0)
             .to_numpy().astype(np.uint64))
        rows = {"partition_id": [], "n_docs": [], "n_spans": [], "hll": []}
        for pid in np.unique(pids):
            mask = pids == pid
            hll = HyperLogLog().add_hashes(h[mask])
            rows["partition_id"].append(int(pid))
            rows["n_docs"].append(int(mask.sum()))
            rows["n_spans"].append(int(n_spans[mask].sum()))
            rows["hll"].append(base64.b64encode(hll.to_bytes()).decode())
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..engine.checks import run_checks
        viol = run_checks(batch, self.ctx)
        viol = _attach_partition(viol, batch)
        m = self._metrics_rows(batch)
        nv, nm = viol.num_rows, len(m["partition_id"])
        return pa.table({
            "row_kind": pa.array(["viol"] * nv + ["metrics"] * nm, pa.string()),
            "doc_id": pa.concat_arrays([viol["doc_id"].combine_chunks().cast(pa.string()),
                                        pa.array([""] * nm, pa.string())]),
            "span_idx": pa.concat_arrays([viol["span_idx"].combine_chunks(),
                                          pa.array([0] * nm, pa.int32())]),
            "check": pa.concat_arrays([viol["check"].combine_chunks(),
                                       pa.array([""] * nm, pa.string())]),
            "detail": pa.concat_arrays([viol["detail"].combine_chunks(),
                                        pa.array([""] * nm, pa.string())]),
            "partition_id": pa.concat_arrays([viol["partition_id"].combine_chunks(),
                                              pa.array(m["partition_id"], pa.int32())]),
            "n_docs": pa.concat_arrays([pa.nulls(nv, pa.int64()),
                                        pa.array(m["n_docs"], pa.int64())]),
            "n_spans": pa.concat_arrays([pa.nulls(nv, pa.int64()),
                                         pa.array(m["n_spans"], pa.int64())]),
            "hll": pa.concat_arrays([pa.array([""] * nv, pa.string()),
                                     pa.array(m["hll"], pa.string())]),
        })


VIOLATION_COLS = ["doc_id", "span_idx", "check", "detail", "partition_id"]


def _file_stat(path: str):
    """Input lineage stamp: (size, mtime_ns) of the backing file/dir."""
    try:
        st = os.stat(path)
        return [int(st.st_size), int(st.st_mtime_ns)]
    except OSError:
        return None


def score_media_table(media_path: str, params: Optional[ButteraugliParams] = None,
                      concurrency: int = 4, batch_size: int = 8):
    """Score every media pair with the actor-pool scorer; returns the
    scored DATASET (materialized once, consumed distributed — the
    driver copy happens only in broadcast mode, via collect_scores)."""
    import ray.data as rd
    from ..sources.tables import (parquet_schema_no_metadata,
                                  small_file_num_blocks,
                                  strip_schema_metadata)
    media = (strip_schema_metadata(
        rd.read_parquet(media_path,
                        schema=parquet_schema_no_metadata(media_path),
                        override_num_blocks=small_file_num_blocks(media_path)))
        if media_path.endswith(".parquet") else rd.read_lance(media_path))
    scored = media.map_batches(MediaScorer, fn_constructor_kwargs={"params": params},
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=actor_pool(concurrency))
    return scored.materialize()


def collect_scores(scored_ds) -> pa.Table:
    """Driver-side copy of the scored media table — broadcast mode
    only (the {media_ref → score} map must live on the driver to be
    ray.put).  The shuffle-join path never calls this."""
    return pa.concat_tables(
        [b for b in scored_ds.iter_batches(batch_size=4096,
                                           batch_format="pyarrow")],
        promote_options="default")


def _violation_writer(out_dir: str):
    """Per-partition atomic violation writer (map_groups) → manifest row."""

    def write(group: pa.Table, pid: int) -> pa.Table:
        group = group.select(VIOLATION_COLS)
        path = os.path.join(ckpt.violations_dir(out_dir), f"part-{pid:05d}.parquet")
        ckpt.atomic_write_parquet(path, group)
        vc = pc.value_counts(group["check"])
        checks = {v["values"]: v["counts"] for v in vc.to_pylist()}
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "n_violations": pa.array([group.num_rows], pa.int64()),
                         "checks_json": pa.array([json.dumps(checks)], pa.string())})

    return write


def sample_violations(out_dir: str, per_check: int = 5):
    """Violation sampling per check (SURVEY.md §2.7): up to ``per_check``
    example rows for each check kind from the written partition files.

    Driver memory is bounded by ``per_check × n_checks``, never the
    violation volume: files stream one at a time (in the same sorted
    order the old concat used, so the sampled rows are identical), and
    when the manifests cover every partition file their per-check
    totals tell us the full check set up front — the stream stops
    early once every check has min(per_check, total) samples.  A
    1%-violation run at 10^12 docs reads only as many partition files
    as it takes to fill the heads."""
    import glob
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(ckpt.violations_dir(out_dir),
                                          "part-*.parquet")))
    if not files:
        return {}

    # per-check totals from the manifests (written atomically alongside
    # the violation files) — the early-stop targets.  If any partition
    # file lacks a manifest (mid-crash state), fall back to streaming
    # every file (still bounded memory, no early stop).
    manifests = ckpt.load_manifests(out_dir)
    file_pids = {int(os.path.basename(f)[5:10]) for f in files}
    totals = None
    if file_pids <= set(manifests):
        totals = {}
        for pid in file_pids:
            for check, n in manifests[pid]["violations_by_check"].items():
                totals[check] = totals.get(check, 0) + int(n)

    out: dict = {}

    def filled() -> bool:
        return totals is not None and all(
            len(out.get(c, [])) >= min(per_check, t)
            for c, t in totals.items())

    for f in files:
        if filled():
            break
        tbl = pq.read_table(f)
        for check in pc.unique(tbl["check"]).to_pylist():
            have = out.setdefault(check, [])
            need = per_check - len(have)
            if need <= 0:
                continue
            sel = tbl.filter(pc.equal(tbl["check"], check)).slice(0, need)
            have.extend(sel.to_pylist())
    return out


def validate_corpus(docs_path: str, media_path: str, out_dir: str, *,
                    threshold: float = DEFAULT_SCORE_THRESHOLD,
                    params: Optional[ButteraugliParams] = None,
                    baseline_snapshot: Optional[str] = None,
                    resume: bool = True,
                    scorer_concurrency: int = 4,
                    checker_concurrency: Optional[int] = None,
                    batch_size: int = 1024,
                    broadcast_scores: bool = True,
                    media_scores_cap: int = 1000,
                    dup_broadcast_cap: int = 2_000_000) -> dict:
    """Run the full validation; returns the summary dict.

    ``baseline_snapshot``: path to a summary.json of a previous run whose
    score histogram becomes the drift baseline (KS/PSI).

    ``broadcast_scores``: the {media_ref → score} map rides to every
    checker via ``ray.put`` (right for media tables up to ~10^7 keys).
    ``False`` switches the perceptual constraint to a hash-partitioned
    shuffle join (exploded image spans ⋈ scores on media_ref) for media
    tables too large to broadcast — referential integrity then also
    derives from the join (missing key ⇒ no score row).

    ``dup_broadcast_cap``: the duplicate-doc_id check broadcasts the
    duplicated-key set when it has at most this many keys (the normal
    regime — dup rates are small); above the cap it degrades
    gracefully to a partitioned hash semi-join, so a pathological
    corpus (say 50% duplicates) can never OOM the driver.
    """
    import ray

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    done = ckpt.completed_partitions(out_dir) if resume else set()

    # lineage guard: a resumed run must see the same inputs the completed
    # partitions were produced from (manifest input_fingerprint)
    fingerprint = {"docs_path": docs_path, "media_path": media_path,
                   "threshold": threshold,
                   "docs_stat": _file_stat(docs_path),
                   "media_stat": _file_stat(media_path)}
    if done:
        prev = ckpt.load_manifests(out_dir)
        sample = prev[sorted(prev)[0]]["input_fingerprint"]
        if sample != fingerprint:
            raise ValueError(
                "resume refused: input fingerprint changed since the "
                f"completed partitions were written ({sample} != "
                f"{fingerprint}); pass resume=False to revalidate")

    # ---- media scoring (small side) --------------------------------------
    scored_ds = score_media_table(media_path, params, scorer_concurrency)
    score_map = {}
    score_hist = FixedHistogram(*_HIST_RANGE, _HIST_BINS)
    if broadcast_scores:
        # broadcast mode legitimately needs a driver copy (the map is
        # ray.put to every checker)
        scores_tbl = collect_scores(scored_ds)
        finite_scores = []
        for mr, sc in zip(scores_tbl["media_ref"].to_pylist(),
                          scores_tbl["score"].to_pylist()):
            score_map[mr] = sc if sc is not None else float("nan")
            if sc is not None and np.isfinite(sc):
                finite_scores.append(sc)
        score_hist.add(np.array(finite_scores))
        score_td = TDigest().add(np.array(finite_scores))
        keys_ref = ray.put(set(score_map))
        scores_ref = ray.put(score_map)
        n_media = len(score_map)
        worst = sorted(score_map.items(),
                       key=lambda kv: (0 if not np.isfinite(kv[1]) else 1,
                                       -kv[1] if np.isfinite(kv[1]) else 0)
                       )[:media_scores_cap]
    else:
        # large-media mode: the score/referential constraints move into a
        # hash-partitioned shuffle join below; the checker runs only the
        # broadcast-free checks.  The scored Dataset stays DISTRIBUTED —
        # histogram / count / worst-offender summaries come from bounded
        # per-batch partials (one row per block), never a driver copy.
        keys_ref = None
        scores_ref = None

        def score_partials(t: pa.Table, _cap=media_scores_cap) -> pa.Table:
            sc = t["score"].to_numpy(zero_copy_only=False).astype(np.float64)
            finite = np.isfinite(sc)
            h = FixedHistogram(*_HIST_RANGE, _HIST_BINS).add(sc[finite])
            td = TDigest().add(sc[finite])
            order = np.lexsort((np.where(finite, -sc, 0.0), finite))
            keep = order[:_cap]
            return pa.table({
                "hist_json": pa.array([json.dumps(h.to_dict())], pa.string()),
                "td_json": pa.array([json.dumps(td.to_dict())], pa.string()),
                "n": pa.array([t.num_rows], pa.int64()),
                "top_refs": pa.array(
                    [pc.take(t["media_ref"], pa.array(keep)).to_pylist()],
                    pa.list_(pa.string())),
                "top_scores": pa.array([sc[keep].tolist()],
                                       pa.list_(pa.float64())),
            })

        sp = (scored_ds.map_batches(score_partials, batch_format="pyarrow")
              .to_pandas())
        n_media = int(sp["n"].sum()) if len(sp) else 0
        score_td = TDigest()
        for hj in sp["hist_json"]:
            score_hist = score_hist.merge(FixedHistogram.from_dict(
                json.loads(hj)))
        for tj in sp["td_json"]:
            score_td = score_td.merge(TDigest.from_dict(json.loads(tj)))
        cand = [(r, s) for refs, scs in zip(sp["top_refs"], sp["top_scores"])
                for r, s in zip(refs, scs)]
        worst = sorted(cand,
                       key=lambda kv: (0 if not np.isfinite(kv[1]) else 1,
                                       -kv[1] if np.isfinite(kv[1]) else 0)
                       )[:media_scores_cap]

    # ---- ONE heavy scan over remaining partitions ------------------------
    filt = None
    lance_sql = None
    if done:
        import pyarrow.dataset as pads
        filt = ~pads.field("partition_id").isin(sorted(done))
        lance_sql = ("partition_id NOT IN (%s)"
                     % ", ".join(str(int(p)) for p in sorted(done)))
    docs = read_table_filtered(docs_path, filter_expr=filt,
                               lance_filter_sql=lance_sql)

    checker_kwargs = dict(media_keys_ref=keys_ref, scores_ref=scores_ref,
                          threshold=threshold)
    tagged = docs.map_batches(DocChecker, fn_constructor_kwargs=checker_kwargs,
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=actor_pool(
                                  checker_concurrency or scorer_concurrency))

    # ---- duplicate doc_id — global scan on a pruned 2-column projection --
    # Scale shape (functions/dedup.dup_keep_table): per-batch (count, min
    # partition) partials → int64 hash-bucket shuffle → ONE vectorized
    # combine per BUCKET with the n>1 filter inside.  Ray's native
    # sort-based groupby never runs at unique-key cardinality (~1 group
    # per row — the regime BASELINE.md measured degenerating to 255 s at
    # 1.65 M keys); only rows of the tiny duplicated-key set shuffle
    # again for the violation rows, and that pass is one vectorized
    # in-bucket sort + duplicated() mask — never per-key Python.
    from ..functions.dedup import dup_keep_dataset
    docs_ids_all = read_table_filtered(docs_path,
                                       columns=["doc_id", "partition_id"])
    keep_ds = dup_keep_dataset(docs_ids_all, hash_col="doc_id",
                               id_col="partition_id",
                               n_buckets=64).materialize()
    n_dup_keys = keep_ds.count()
    dups = None
    if n_dup_keys:

        def dup_viol_bucket(g) -> pa.Table:
            g = g.sort_values(["doc_id", "partition_id"], kind="mergesort")
            n = g.groupby("doc_id")["doc_id"].transform("size")
            extra = g[g["doc_id"].duplicated(keep="first")]
            n = n[extra.index]
            k = len(extra)
            detail = ("doc_id occurs " + n.astype("int64").astype(str)
                      + " times")
            return pa.table({
                "row_kind": pa.array(["viol"] * k, pa.string()),
                "doc_id": pa.array(extra["doc_id"], pa.string()),
                "span_idx": pa.array([-1] * k, pa.int32()),
                "check": pa.array(["duplicate_doc_id"] * k, pa.string()),
                "detail": pa.array(detail, pa.string()),
                "partition_id": pa.array(
                    extra["partition_id"].astype("int64"), pa.int32()),
                "n_docs": pa.nulls(k, pa.int64()),
                "n_spans": pa.nulls(k, pa.int64()),
                "hll": pa.array([""] * k, pa.string()),
            })

        if n_dup_keys <= dup_broadcast_cap:
            # normal regime: the duplicated-key SET is tiny — broadcast
            # it and filter the id projection in place
            keep = keep_ds.to_pandas()
            dup_arr = pa.array(sorted(keep["doc_id"]), pa.string())

            def dup_rows_tag(t: pa.Table, _a=dup_arr) -> pa.Table:
                sel = t.filter(pc.is_in(t["doc_id"], value_set=_a))
                import pandas as pd
                b = (pd.util.hash_pandas_object(
                    pd.Series(sel["doc_id"].to_numpy(zero_copy_only=False)),
                    index=False).to_numpy() % 64).astype("int64")
                return sel.append_column("__b", pa.array(b, pa.int64()))

            tagged_dups = (read_table_filtered(
                docs_path, columns=["doc_id", "partition_id"])
                .map_batches(dup_rows_tag, batch_format="pyarrow"))
        else:
            # pathological duplicate population (e.g. a 50%-dup
            # corpus): never copy the key set to the driver — select
            # the dup rows with a partitioned hash semi-join instead
            from ..functions.joins import hash_join
            joined = hash_join(
                read_table_filtered(docs_path,
                                    columns=["doc_id", "partition_id"]),
                keep_ds.select_columns(["doc_id"]),
                key="doc_id", n_buckets=64, how="inner")

            def retag(df) -> pa.Table:
                import pandas as pd
                sel = df[["doc_id", "partition_id"]]
                b = (pd.util.hash_pandas_object(
                    sel["doc_id"], index=False).to_numpy()
                    % 64).astype("int64")
                return pa.table({
                    "doc_id": pa.array(sel["doc_id"].astype(str)),
                    "partition_id": pa.array(
                        sel["partition_id"].astype("int64"), pa.int32()),
                    "__b": pa.array(b, pa.int64())})

            tagged_dups = joined.map_batches(retag, batch_format="pandas")

        dups = tagged_dups.groupby("__b").map_groups(
            dup_viol_bucket, batch_format="pandas")
        if done:
            done_arr = pa.array(sorted(done), pa.int32())
            dups = dups.map_batches(
                lambda t, _d=done_arr: t.filter(
                    pc.invert(pc.is_in(t["partition_id"], value_set=_d))),
                batch_format="pyarrow")

    tagged_all = tagged.union(dups) if dups is not None else tagged

    if not broadcast_scores:
        # perceptual + referential constraints as a shuffle join:
        # exploded image spans ⋈ scores on media_ref (left join — a
        # missing score row IS the referential violation)
        from ..functions.joins import hash_join
        from ..stages.structural import explode_spans

        def explode_image_spans(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"media_ref": pa.array([], pa.string()),
                                 "doc_id": pa.array([], pa.string()),
                                 "span_idx": pa.array([], pa.int32()),
                                 "partition_id": pa.array([], pa.int32())})
            doc_ids, span_idx, kind, _t, media_ref, _o, parents = \
                explode_spans(batch)
            is_img = pc.fill_null(pc.equal(kind, "image"), False).to_numpy(zero_copy_only=False)
            nonempty = pc.fill_null(pc.invert(pc.equal(media_ref, "")), False).to_numpy(zero_copy_only=False)
            m = np.logical_and(is_img, nonempty)
            idx = np.nonzero(m)[0]
            pids = pc.take(batch["partition_id"], pa.array(parents[idx]))
            return pa.table({
                "media_ref": pc.take(media_ref, pa.array(idx)),
                "doc_id": pc.take(doc_ids, pa.array(idx)),
                "span_idx": pa.array(span_idx[idx], pa.int32()),
                "partition_id": pids.cast(pa.int32()),
            })

        spans_img = docs.map_batches(explode_image_spans, batch_format="pyarrow",
                                     batch_size=batch_size)
        # the scored Dataset feeds the join DIRECTLY — distributed end
        # to end, no driver round-trip
        scores_ds = scored_ds.select_columns(["media_ref", "score"])
        joined = hash_join(spans_img, scores_ds, key="media_ref",
                           n_buckets=16, how="left")

        def join_violations(df) -> pa.Table:
            import pandas as pd
            missing = df["score"].isna()
            bad = (~missing) & (df["score"].astype(float) > threshold)
            rows = df[missing | bad]
            if not len(rows):
                return pa.table({f.name: pa.array([], f.type)
                                 for f in _TAGGED_SCHEMA})
            checks = np.where(rows["score"].isna(), "missing_media_ref",
                              "score_exceeds_threshold")
            details = [("media_ref not in media table" if c == "missing_media_ref"
                        else f"butteraugli score {s:.4f} > {threshold}")
                       for c, s in zip(checks, rows["score"])]
            n = len(rows)
            return pa.table({
                "row_kind": pa.array(["viol"] * n, pa.string()),
                "doc_id": pa.array(rows["doc_id"].astype(str), pa.string()),
                "span_idx": pa.array(rows["span_idx"].astype("int64"), pa.int32()),
                "check": pa.array(checks, pa.string()),
                "detail": pa.array(details, pa.string()),
                "partition_id": pa.array(rows["partition_id"].astype("int64"), pa.int32()),
                "n_docs": pa.nulls(n, pa.int64()),
                "n_spans": pa.nulls(n, pa.int64()),
                "hll": pa.array([""] * n, pa.string()),
            })

        jviol = joined.map_batches(join_violations, batch_format="pandas")
        if done:
            done_arr2 = pa.array(sorted(done), pa.int32())
            jviol = jviol.map_batches(
                lambda t, _d=done_arr2: t.filter(
                    pc.invert(pc.is_in(t["partition_id"], value_set=_d))),
                batch_format="pyarrow")
        tagged_all = tagged_all.union(jviol)

    # ---- split tagged stream: violations → per-partition atomic files ---
    def split_and_count(group: pa.Table) -> pa.Table:
        pid = int(group["partition_id"][0].as_py())
        viol = group.filter(pc.equal(group["row_kind"], "viol"))
        metrics = group.filter(pc.equal(group["row_kind"], "metrics"))
        writer = _violation_writer(out_dir)
        counts = writer(viol, pid)
        n_docs = int(pc.sum(metrics["n_docs"]).as_py() or 0)
        n_spans = int(pc.sum(metrics["n_spans"]).as_py() or 0)
        hll = HyperLogLog()
        for b in metrics["hll"].to_pylist():
            if b:
                hll = hll.merge(HyperLogLog.from_bytes(base64.b64decode(b)))
        return pa.table({
            "partition_id": counts["partition_id"],
            "n_violations": counts["n_violations"],
            "checks_json": counts["checks_json"],
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_spans": pa.array([n_spans], pa.int64()),
            "hll": pa.array([base64.b64encode(hll.to_bytes()).decode()],
                            pa.string()),
        })

    rollup = tagged_all.groupby("partition_id").map_groups(
        split_and_count, batch_format="pyarrow")
    per_part = rollup.to_pandas()

    for _, row in per_part.iterrows():
        pid = int(row["partition_id"])
        hll = HyperLogLog.from_bytes(base64.b64decode(row["hll"]))
        manifest = {
            "partition_id": pid,
            "n_docs": int(row["n_docs"]),
            "n_spans": int(row["n_spans"]),
            "distinct_doc_ids_est": round(hll.estimate(), 1),
            "n_violations": int(row["n_violations"]),
            "violations_by_check": json.loads(row["checks_json"]),
            "passed": int(row["n_violations"]) == 0,
            "input_fingerprint": fingerprint,
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
        # bounded regardless of media count: the top-N worst offenders
        # (non-finite first, then score desc) — the full map lives only
        # in the broadcast, never in summary.json (SURVEY §2.7 sampling);
        # in join mode `worst` comes from per-batch partial top-Ns, the
        # full score table never touches the driver
        "media_scores": {k: (None if not np.isfinite(v) else v)
                         for k, v in worst},
        "n_media": n_media,
        # t-digest quantiles of the butteraugli distances (the north
        # rule's per-corpus score-distribution summary; mergeable
        # per-batch partials in join mode, never a second scan)
        "score_quantiles": {
            q: round(score_td.quantile(float(q[1:]) / 100), 4)
            for q in ("p50", "p90", "p99")
        } if len(score_td.means) else None,
        "media_scores_truncated": n_media > media_scores_cap,
        "threshold": threshold,
        "wall_time_s": round(time.time() - t0, 3),
        # per-stage wall/cpu breakdown of the main rollup pipeline
        # (ds.stats() — the feedback loop for stage sizing)
        "pipeline_stats": rollup.stats()[:4000],
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
