"""Structural / schema constraint checks over the interleaved-document table.

Stateless ``map_batches`` stages (``batch_format="pyarrow"``), fully
vectorized with pyarrow.compute + numpy — no per-row Python in the hot
path.  Violations are emitted as rows (engine analog of the reference's
``ButteraugliError`` variants, lib.rs:243-315) instead of raising:

    violations(doc_id: string, span_idx: int32, check: string, detail: string)

Checks (north rule: column stats, uniqueness, referential integrity):
  null_kind            span.kind is null
  invalid_kind         kind ∉ {text, image}
  empty_media_ref      kind == image with empty media_ref
  text_with_media      kind == text carrying a media_ref
  missing_media_ref    media_ref not present in the media key set
                       (broadcast semi-join: the key set rides in the
                       actor via ray.put, SURVEY.md §2.5)
  offset_nonmonotonic  offset not strictly increasing within a span list
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VIOLATION_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("check", pa.string()),
    ("detail", pa.string()),
])


def _empty_violations() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in VIOLATION_SCHEMA})


def explode_spans(batch: pa.Table):
    """Flatten the spans list column → (doc_ids, span_idx, kind, text,
    media_ref, offset) aligned flat arrays.

    Note: ``.field()`` on a struct array does NOT inherit struct-level
    nulls (a null span yields kind=""/offset=0 children), so null spans
    are folded into the field null masks here explicitly.
    """
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    # span_idx = position within each list
    offsets_np = np.asarray(spans.offsets)
    starts = offsets_np[parents]
    span_idx = (np.arange(len(parents)) - starts).astype(np.int32)
    doc_ids = pc.take(batch["doc_id"], pa.array(parents))

    struct_null = pc.is_null(flat)

    def field(name):
        child = flat.field(name)
        return pc.if_else(struct_null, pa.nulls(len(flat), child.type), child)

    return doc_ids, span_idx, field("kind"), field("text"), \
        field("media_ref"), field("offset"), parents


def check_spans_batch(batch: pa.Table,
                      media_keys: Optional[pa.Array] = None) -> pa.Table:
    """Run all span-level structural checks on one Arrow batch; returns
    a violations table."""
    if batch.num_rows == 0:
        return _empty_violations()
    doc_ids, span_idx, kind, text, media_ref, offset, parents = explode_spans(batch)

    out_doc, out_idx, out_check, out_detail = [], [], [], []

    def emit(mask: np.ndarray, check: str, detail: str):
        if not mask.any():
            return
        idx = np.nonzero(mask)[0]
        taken = pc.take(doc_ids, pa.array(idx))
        out_doc.append(taken)
        out_idx.append(pa.array(span_idx[idx], pa.int32()))
        out_check.append(pa.array([check] * len(idx), pa.string()))
        out_detail.append(pa.array([detail] * len(idx), pa.string()))

    kind_null = pc.is_null(kind).to_numpy(zero_copy_only=False)
    emit(kind_null, "null_kind", "span.kind is null")

    valid_kind = pc.is_in(kind, value_set=pa.array(["text", "image"]))
    invalid = np.logical_and(~kind_null,
                             ~valid_kind.to_numpy(zero_copy_only=False))
    emit(invalid, "invalid_kind", "kind not in {text, image}")

    is_image = pc.equal(kind, "image").to_numpy(zero_copy_only=False)
    is_image = np.logical_and(is_image, ~kind_null)
    ref_empty = pc.equal(media_ref, "").to_numpy(zero_copy_only=False)
    ref_null = pc.is_null(media_ref).to_numpy(zero_copy_only=False)
    ref_missing_field = np.logical_or(ref_empty, ref_null)
    emit(np.logical_and(is_image, ref_missing_field), "empty_media_ref",
         "image span without media_ref")

    is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
    is_text = np.logical_and(is_text, ~kind_null)
    emit(np.logical_and(is_text, ~ref_missing_field), "text_with_media",
         "text span carrying a media_ref")

    if media_keys is not None:
        known = pc.is_in(media_ref, value_set=media_keys).to_numpy(zero_copy_only=False)
        dangling = np.logical_and(is_image,
                                  np.logical_and(~ref_missing_field, ~known))
        emit(dangling, "missing_media_ref", "media_ref not in media table")

    off_null = pc.is_null(offset).to_numpy(zero_copy_only=False)
    emit(off_null, "null_offset", "span.offset is null")
    off = np.where(off_null, 0,
                   offset.to_numpy(zero_copy_only=False)).astype(np.int64)
    same_doc = np.zeros(len(parents), dtype=bool)
    if len(parents) > 1:
        same_doc[1:] = parents[1:] == parents[:-1]
    nonmono = np.zeros(len(parents), dtype=bool)
    if len(off) > 1:
        nonmono[1:] = off[1:] <= off[:-1]
    ok_pair = ~off_null
    if len(off) > 1:
        ok_pair[1:] &= ~off_null[:-1]
    emit(np.logical_and(np.logical_and(same_doc, nonmono), ok_pair),
         "offset_nonmonotonic",
         "offset not strictly increasing within span list")
    neg = np.logical_and(off < 0, ~off_null)
    emit(neg, "negative_offset", "offset < 0")

    if not out_doc:
        return _empty_violations()
    return pa.table({
        "doc_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_doc]),
        "span_idx": pa.concat_arrays(out_idx),
        "check": pa.concat_arrays(out_check),
        "detail": pa.concat_arrays(out_detail),
    })


class StructuralChecker:
    """Actor-pool stage: holds the broadcast media key set (ray.put once,
    ray.get in __init__ — never re-shipped per batch)."""

    def __init__(self, media_keys_ref=None):
        if media_keys_ref is not None:
            import ray
            keys = ray.get(media_keys_ref)
            self.media_keys = pa.array(sorted(keys), pa.string())
        else:
            self.media_keys = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return check_spans_batch(batch, self.media_keys)


def doc_structural_summary(batch: pa.Table,
                           media_keys: Optional[pa.Array] = None) -> pa.Table:
    """Per-doc summary: doc_id, n_spans, n_struct_violations — used by the
    rollup without a second pass over the span lists."""
    if batch.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "n_spans": pa.array([], pa.int32()),
                         "n_struct_violations": pa.array([], pa.int32())})
    viol = check_spans_batch(batch, media_keys)
    n_spans = pc.list_value_length(batch["spans"]).cast(pa.int32())
    # vectorized per-doc violation counts: value_counts + index_in
    vc = pc.value_counts(viol["doc_id"].combine_chunks())
    pos = pc.index_in(batch["doc_id"], value_set=vc.field("values"))
    nv = pc.fill_null(pc.take(vc.field("counts"), pos), 0).cast(pa.int32())
    return pa.table({"doc_id": batch["doc_id"], "n_spans": n_spans,
                     "n_struct_violations": nv})
