"""User-extension surface: a registry of corpus checks (SURVEY.md §2.12).

A ``Check`` is (name, batch_fn, severity): ``batch_fn(batch, ctx)``
takes one Arrow batch of documents plus a context dict (media key set,
score map, threshold…) and returns violation rows (VIOLATION_SCHEMA).
Users register custom constraints next to the built-ins; the validator's
``DocChecker`` runs every registered check in its single heavy scan.

    from butteraugli_ray.engine.checks import register_check

    @register_check("max_spans", severity="warn")
    def max_spans(batch, ctx):
        ...return violation rows for docs with > ctx["max_spans"] spans

Checks must be vectorized (Arrow/numpy) — they run per batch in the hot
path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.structural import VIOLATION_SCHEMA, check_spans_batch, explode_spans


@dataclass(frozen=True)
class Check:
    name: str
    batch_fn: Callable
    severity: str = "error"


_REGISTRY: Dict[str, Check] = {}


def register_check(name: str, severity: str = "error"):
    def deco(fn):
        _REGISTRY[name] = Check(name, fn, severity)
        return fn
    return deco


def unregister_check(name: str) -> None:
    _REGISTRY.pop(name, None)


def registered_checks() -> Dict[str, Check]:
    return dict(_REGISTRY)


def empty_violations() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in VIOLATION_SCHEMA})


def run_checks(batch: pa.Table, ctx: dict) -> pa.Table:
    """Run every registered check on one batch → concatenated violations."""
    outs = [c.batch_fn(batch, ctx) for c in _REGISTRY.values()]
    outs = [o for o in outs if o is not None and o.num_rows > 0]
    if not outs:
        return empty_violations()
    return pa.concat_tables(outs, promote_options="default")


# ---------------------------------------------------------------------------
# Built-ins
# ---------------------------------------------------------------------------

@register_check("structural")
def _structural(batch: pa.Table, ctx: dict) -> pa.Table:
    """Null/domain/referential/monotonicity span checks
    (stages/structural.py)."""
    return check_spans_batch(batch, ctx.get("media_keys"))


@register_check("perceptual_score")
def _perceptual(batch: pa.Table, ctx: dict) -> pa.Table:
    """butteraugli score constraint on image spans (broadcast score map)."""
    score_keys = ctx.get("score_keys")
    if score_keys is None or len(score_keys) == 0 or batch.num_rows == 0:
        return empty_violations()
    score_vals = ctx["score_vals"]
    threshold = float(ctx.get("threshold", 4.0))
    doc_ids, span_idx, kind, _t, media_ref, _o, _p = explode_spans(batch)
    is_image = pc.fill_null(pc.equal(kind, "image"), False).to_numpy(zero_copy_only=False)
    pos = pc.index_in(media_ref, value_set=score_keys).to_numpy(zero_copy_only=False)
    found = np.logical_and(is_image, ~np.isnan(pos.astype(np.float64)))
    pos_i = np.where(found, pos, 0).astype(np.int64)
    score = np.where(found, score_vals[pos_i], np.nan)
    bad = np.logical_and(found, score > threshold)
    idx = np.nonzero(bad)[0]
    details = [f"butteraugli score {score[i]:.4f} > {threshold}" for i in idx]
    return pa.table({
        "doc_id": pc.take(doc_ids, pa.array(idx)),
        "span_idx": pa.array(span_idx[idx], pa.int32()),
        "check": pa.array(["score_exceeds_threshold"] * len(idx), pa.string()),
        "detail": pa.array(details, pa.string()),
    })
