"""Check-registry extension surface (engine/checks.py)."""

import pyarrow as pa
import pytest

from butteraugli_ray.corpus.synth import build_documents, build_media_table
from butteraugli_ray.engine.checks import (empty_violations, register_check,
                                           registered_checks, run_checks,
                                           unregister_check)


@pytest.fixture()
def batch_and_ctx():
    docs, _ = build_documents(300, seed=3, violation_rate=0.02)
    media = build_media_table()
    ctx = {"media_keys": pa.array(media["media_ref"].to_pylist()),
           "score_keys": pa.array([], pa.string()),
           "score_vals": __import__("numpy").array([], dtype=float),
           "threshold": 4.0}
    return docs, ctx


def test_builtins_registered():
    names = set(registered_checks())
    assert {"structural", "perceptual_score"} <= names


def test_run_checks_matches_structural(batch_and_ctx):
    from butteraugli_ray.stages.structural import check_spans_batch
    docs, ctx = batch_and_ctx
    got = run_checks(docs, ctx)
    want = check_spans_batch(docs, ctx["media_keys"])
    key = lambda t: sorted(zip(t["doc_id"].to_pylist(),
                               t["span_idx"].to_pylist(),
                               t["check"].to_pylist()))
    assert key(got) == key(want)


def test_custom_check_runs_and_unregisters(batch_and_ctx):
    docs, ctx = batch_and_ctx

    @register_check("too_many_spans", severity="warn")
    def too_many(batch: pa.Table, c: dict) -> pa.Table:
        import pyarrow.compute as pc
        n = pc.list_value_length(batch["spans"])
        mask = pc.greater(n, 4)
        sel = batch.filter(mask)
        k = sel.num_rows
        return pa.table({"doc_id": sel["doc_id"],
                         "span_idx": pa.array([-1] * k, pa.int32()),
                         "check": pa.array(["too_many_spans"] * k, pa.string()),
                         "detail": pa.array(["> 4 spans"] * k, pa.string())})

    try:
        got = run_checks(docs, ctx)
        assert "too_many_spans" in set(got["check"].to_pylist())
    finally:
        unregister_check("too_many_spans")
    assert "too_many_spans" not in registered_checks()
    again = run_checks(docs, ctx)
    assert "too_many_spans" not in set(again["check"].to_pylist())


def test_empty_batch(batch_and_ctx):
    _, ctx = batch_and_ctx
    empty = build_documents(1, seed=1, violation_rate=0.0)[0].slice(0, 0)
    out = run_checks(empty, ctx)
    assert out.num_rows == 0
    assert out.schema.names == empty_violations().schema.names
