"""Perceptual scoring stages (actor pools).

``MediaScorer`` is the engine analog of ``ButteraugliReference``
(/root/reference/butteraugli/src/precompute.rs:127-1020) hosted in a Ray
actor pool: reference-side precompute is built once per distinct
reference image per actor and reused across candidates
(``map_batches(MediaScorer, concurrency=N, batch_size=8..32,
batch_format="pyarrow")``).

Scale notes (SURVEY.md §4): decoded media is large — keep ``batch_size``
small (8-32 rows) so batch × concurrency fits the worker heap; co-locate
rows sharing ``media_ref`` (repartition on the key upstream) so each
actor's precompute cache hits; the cache is LRU-capped by estimated
bytes (precompute.rs:733-834 budgeting analog).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa

from ..metric.api import ButteraugliParams
from ..metric.precompute import ReferencePrecompute

SCORE_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("score", pa.float64()),
    ("pnorm_3", pa.float64()),
    ("scorer_error", pa.string()),
])


class MediaScorer:
    """Score (ref_rgb, dist_rgb) pairs per media row.

    Emits (media_ref, score, pnorm_3, scorer_error); errors become
    violation strings instead of raising (M4/M6 as violation rows).
    """

    def __init__(self, params: ButteraugliParams = None,
                 cache_bytes: int = 256 << 20):
        self.params = params or ButteraugliParams()
        self.cache: OrderedDict[str, ReferencePrecompute] = OrderedDict()
        self.cache_bytes = cache_bytes
        self.cached_bytes = 0

    def _get_ref(self, key: str, ref_rgb: bytes, w: int, h: int) -> ReferencePrecompute:
        hit = self.cache.get(key)
        if hit is not None:
            self.cache.move_to_end(key)
            return hit
        arr = np.frombuffer(ref_rgb, dtype=np.uint8).reshape(h, w, 3)
        pre = ReferencePrecompute(arr, self.params)
        self.cache[key] = pre
        self.cached_bytes += pre.memory_bytes()
        while self.cached_bytes > self.cache_bytes and len(self.cache) > 1:
            _, old = self.cache.popitem(last=False)
            self.cached_bytes -= old.memory_bytes()
        return pre

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        ref_bytes = batch["ref_rgb"].to_pylist()
        dist_bytes = batch["dist_rgb"].to_pylist()
        scores, pnorms, errors = [], [], []
        for mr, w, h, rb, db in zip(refs, widths, heights, ref_bytes, dist_bytes):
            try:
                n = w * h * 3
                if rb is None or db is None or len(rb) != n or len(db) != n:
                    raise ValueError(f"invalid buffer size (expected {n})")
                pre = self._get_ref(mr, rb, w, h)
                res = pre.compare_bytes(db)
                scores.append(res.score)
                pnorms.append(res.pnorm_3)
                errors.append(None)
            except Exception as exc:  # noqa: BLE001 — violation row, not crash
                scores.append(float("nan"))
                pnorms.append(float("nan"))
                errors.append(f"{type(exc).__name__}: {exc}")
        return pa.table({
            "media_ref": batch["media_ref"],
            "score": pa.array(scores, pa.float64()),
            "pnorm_3": pa.array(pnorms, pa.float64()),
            "scorer_error": pa.array(errors, pa.string()),
        })


class SpanScoreChecker:
    """Apply the perceptual-score constraint to documents.

    Holds the broadcast {media_ref → score} lookup (small side of the
    implicit join, shipped once via ray.put) and emits one violation row
    per image span whose media score exceeds ``threshold``.
    """

    def __init__(self, scores_ref, threshold: float):
        import ray
        scores = ray.get(scores_ref) if not isinstance(scores_ref, dict) else scores_ref
        self.threshold = float(threshold)
        # arrays for vectorized lookup
        items = sorted(scores.items())
        self._keys = pa.array([k for k, _ in items], pa.string())
        self._vals = np.array([v for _, v in items], dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .structural import VIOLATION_SCHEMA, explode_spans
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in VIOLATION_SCHEMA})
        doc_ids, span_idx, kind, _text, media_ref, _off, _parents = explode_spans(batch)
        is_image = pc.fill_null(pc.equal(kind, "image"), False).to_numpy(zero_copy_only=False)
        pos = pc.index_in(media_ref, value_set=self._keys).to_numpy(zero_copy_only=False)
        found = np.logical_and(is_image, ~np.isnan(pos.astype(np.float64)))
        pos_i = np.where(found, pos, 0).astype(np.int64)
        score = np.where(found, self._vals[pos_i], np.nan)
        bad = np.logical_and(found, score > self.threshold)
        idx = np.nonzero(bad)[0]
        details = [f"butteraugli score {score[i]:.4f} > {self.threshold}" for i in idx]
        return pa.table({
            "doc_id": pc.take(doc_ids, pa.array(idx)),
            "span_idx": pa.array(span_idx[idx], pa.int32()),
            "check": pa.array(["score_exceeds_threshold"] * len(idx), pa.string()),
            "detail": pa.array(details, pa.string()),
        })
