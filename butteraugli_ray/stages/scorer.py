"""Perceptual scoring stages (actor pools).

``MediaScorer`` is the engine analog of ``ButteraugliReference``
(/root/reference/butteraugli/src/precompute.rs:127-1020) hosted in a Ray
actor pool: reference-side precompute is built once per distinct
reference image per actor and reused across candidates
(``map_batches(MediaScorer, concurrency=N, batch_size=8..32,
batch_format="pyarrow")``).

Scale notes (SURVEY.md §4): decoded media is large — keep ``batch_size``
small (8-32 rows) so batch × concurrency fits the worker heap; the
build-once/probe-many warm cache (precompute.rs:733-834 budgeting
analog) lives with ``ReferencePrecompute`` consumers such as
``pipelines/bench_corpus.CandidateScorer``, co-located by media_ref.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..metric.api import ButteraugliParams

SCORE_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("score", pa.float64()),
    ("pnorm_3", pa.float64()),
    ("scorer_error", pa.string()),
])


class MediaScorer:
    """Score (ref_rgb, dist_rgb) pairs per media row — one stacked
    batched compare per same-size group within each batch.

    Emits (media_ref, score, pnorm_3, scorer_error); errors become
    violation strings instead of raising (M4/M6 as violation rows).
    (The warm build-once/probe-many pattern — many candidates against
    one reference — lives in ``ReferencePrecompute`` /
    ``pipelines/bench_corpus.CandidateScorer``; here every row carries
    its own pair.)
    """

    def __init__(self, params: ButteraugliParams = None,
                 strip_threshold_px: int = 4_000_000,
                 strip_height: int = 256,
                 emit_diffmap_stats: bool = False):
        """Media with more than ``strip_threshold_px`` pixels score via
        the bounded-memory strip walker (strip_height rows + halo —
        strip.rs:583-905 semantics; interior rows bit-identical, score
        within ~1e-2 of full) instead of the stacked batched compare, so
        one oversized pair cannot blow the actor heap.

        ``emit_diffmap_stats=True`` appends diffmap_max / diffmap_mean /
        diffmap_p99 columns (A5 at corpus scale; free — the batched
        compare already materializes the diffmap stack).  Oversized
        strip-path media emit NaN stats: the strip walker never holds a
        whole diffmap, by design."""
        self.params = params or ButteraugliParams()
        self.strip_threshold_px = strip_threshold_px
        self.strip_height = strip_height
        self.emit_diffmap_stats = emit_diffmap_stats

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        # zero-copy views into the Arrow binary buffers (no per-payload
        # Python bytes copies)
        ref_col = batch["ref_rgb"].combine_chunks()
        dist_col = batch["dist_rgb"].combine_chunks()
        ref_bytes = [None if not v.is_valid else v.as_buffer()
                     for v in ref_col]
        dist_bytes = [None if not v.is_valid else v.as_buffer()
                      for v in dist_col]
        n_rows = batch.num_rows
        scores = np.full(n_rows, np.nan)
        pnorms = np.full(n_rows, np.nan)
        errors = [None] * n_rows
        dstats = {k: np.full(n_rows, np.nan)
                  for k in ("diffmap_max", "diffmap_mean", "diffmap_p99")} \
            if self.emit_diffmap_stats else None

        # group same-size valid rows → one stacked batched compare per
        # (w, h); invalid rows become scorer_error violation strings
        groups: dict = {}
        for i, (w, h, rb, db) in enumerate(zip(widths, heights,
                                               ref_bytes, dist_bytes)):
            nbytes = (w or 0) * (h or 0) * 3
            if (rb is None or db is None or nbytes == 0
                    or len(rb) != nbytes or len(db) != nbytes):
                errors[i] = f"ValueError: invalid buffer size (expected {nbytes})"
                continue
            groups.setdefault((w, h), []).append(i)

        from ..metric.api import butteraugli_srgb_batch
        from ..metric.strip import butteraugli_strip
        for (w, h), idxs in groups.items():
            if w * h > self.strip_threshold_px:
                # oversized media: one pair at a time through the
                # bounded-memory strip walker (never stacked)
                for i in idxs:
                    try:
                        a = np.frombuffer(ref_bytes[i], np.uint8).reshape(h, w, 3)
                        b = np.frombuffer(dist_bytes[i], np.uint8).reshape(h, w, 3)
                        r = butteraugli_strip(a, b, self.strip_height,
                                              params=self.params)
                        scores[i], pnorms[i] = r.score, r.pnorm_3
                    except Exception as exc:  # noqa: BLE001
                        errors[i] = f"{type(exc).__name__}: {exc}"
                continue
            try:
                a = np.stack([np.frombuffer(ref_bytes[i], np.uint8)
                              .reshape(h, w, 3) for i in idxs])
                b = np.stack([np.frombuffer(dist_bytes[i], np.uint8)
                              .reshape(h, w, 3) for i in idxs])
                if dstats is not None:
                    sc, pn, st = butteraugli_srgb_batch(
                        a, b, self.params, return_stats=True)
                    for k in dstats:
                        dstats[k][idxs] = st[k]
                else:
                    sc, pn = butteraugli_srgb_batch(a, b, self.params)
                for j, i in enumerate(idxs):
                    scores[i], pnorms[i] = sc[j], pn[j]
            except Exception as exc:  # noqa: BLE001 — violation, not crash
                for i in idxs:
                    errors[i] = f"{type(exc).__name__}: {exc}"
        cols = {
            "media_ref": batch["media_ref"],
            "score": pa.array(scores.tolist(), pa.float64()),
            "pnorm_3": pa.array(pnorms.tolist(), pa.float64()),
            "scorer_error": pa.array(errors, pa.string()),
        }
        if dstats is not None:
            for k, v in dstats.items():
                cols[k] = pa.array(v.tolist(), pa.float64())
        return pa.table(cols)


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
