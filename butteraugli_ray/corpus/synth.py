"""Deterministic synthetic interleaved-document corpus builder.

Produces the exact table shape demanded by ``BASELINE.json:input_hint``:

    documents(doc_id: string,
              spans: list<struct<kind: string, text: string,
                                 media_ref: string, offset: int32>>)

plus the media side-table (FIXTURES.md §1.2) whose sRGB payload pairs
feed the butteraugli predicate:

    media(media_ref, width, height, ref_rgb, dist_rgb, case_name,
          expected_score)

Everything is seeded — no external data.  A configurable ~1% of rows
carry seeded violations with recorded ground truth so violation-row
tests have an oracle (FIXTURES.md §1.3).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from . import generators as G

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]))),
])

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("ref_rgb", pa.binary()),
    ("dist_rgb", pa.binary()),
    ("case_name", pa.string()),
    ("expected_score", pa.float64()),
])

# A small pool of media cases with known perceptual character: the low-shift
# cases score <~2 (pass a threshold of 4), the heavy distortions score high.
_GOOD_CASES = [
    ("uniform_gray_128_shift_1_16x16", 16, 16),    # score ≈ 2.15
    ("gradient_h_shift_2_24x24", 24, 24),          # ≈ 1.62
    ("gradient_v_shift_2_32x32", 32, 32),          # ≈ 1.79
    ("radial_shift_2_32x32", 32, 32),              # ≈ 1.40
    ("random_seed1_noise_20_32x32", 32, 32),       # ≈ 1.82
    ("random_mid_quantize_32_24x24", 24, 24),      # ≈ 0.46
    ("gradient_diag_shift_1_16x16", 16, 16),       # ≈ 0.69
    ("stripes_h_2_shift_2_16x16", 16, 16),         # ≈ 1.06
]
_BAD_CASES = [  # all above the default threshold 4.0
    ("checkerboard_vs_inverse_1px_32x32", 32, 32),  # ≈ 6.19
    ("uniform_gray_128_shift_40_24x24", 24, 24),    # ≈ 81.8
    ("edge_v_vs_blur_32x32", 32, 32),               # ≈ 4.52
    ("sine_2x2_freq_16x16", 16, 16),                # ≈ 5.77
]

_VOCAB = ("the quick brown fox jumps over a lazy dog while ray data streams "
          "arrow blocks through actor pools with backpressure and partial "
          "aggregation merges sketch state across partitions").split()

VIOLATION_KINDS = ("duplicate_doc_id", "missing_media_ref", "offset_nonmonotonic",
                   "null_kind", "empty_media_ref", "score_exceeds_threshold")


def build_media_table() -> pa.Table:
    """The deterministic media pool (generator patterns → sRGB pairs)."""
    rows = {k: [] for k in ("media_ref", "width", "height", "ref_rgb",
                            "dist_rgb", "case_name", "expected_score")}
    for case_name, w, h in _GOOD_CASES + _BAD_CASES:
        pair = G.generate_image_pair(case_name, w, h)
        if pair is None:
            raise ValueError(f"unknown case {case_name}")
        a, b = pair
        rows["media_ref"].append(f"img-{case_name}")
        rows["width"].append(w)
        rows["height"].append(h)
        rows["ref_rgb"].append(a.tobytes())
        rows["dist_rgb"].append(b.tobytes())
        rows["case_name"].append(case_name)
        rows["expected_score"].append(float("nan"))
    return pa.table(rows, schema=MEDIA_SCHEMA)


def good_media_refs():
    return [f"img-{c}" for c, _, _ in _GOOD_CASES]


def bad_media_refs():
    return [f"img-{c}" for c, _, _ in _BAD_CASES]


def build_documents(n_docs: int, seed: int = 42, violation_rate: float = 0.01,
                    n_partitions: int = 8):
    """Build (documents_table, ground_truth) deterministically.

    ground_truth: list of dicts {doc_id, span_idx, check} for every seeded
    violation.  ``partition_id`` (= doc index // ceil(n/n_partitions)) is
    added as a plain column for checkpoint / rollup tests.
    """
    rng = np.random.default_rng(seed)
    good = good_media_refs()
    bad = bad_media_refs()
    truth = []

    doc_ids, spans_col, part_col = [], [], []
    per_part = max(1, -(-n_docs // n_partitions))

    n_violations = int(n_docs * violation_rate)
    # choose violating docs and their kind deterministically
    viol_docs = rng.choice(n_docs, size=min(n_violations, n_docs), replace=False)
    viol_map = {}
    for i, d in enumerate(viol_docs):
        viol_map[int(d)] = VIOLATION_KINDS[i % len(VIOLATION_KINDS)]

    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        vkind = viol_map.get(i)
        n_spans = int(rng.integers(1, 6))
        spans = []
        offset = 0
        img_slots = set(rng.choice(n_spans, size=max(1, n_spans // 3),
                                   replace=False).tolist())
        for s in range(n_spans):
            if s in img_slots:
                ref = good[int(rng.integers(0, len(good)))]
                spans.append({"kind": "image", "text": "",
                              "media_ref": ref, "offset": offset})
                offset += 1
            else:
                nw = int(rng.integers(3, 12))
                words = [_VOCAB[int(rng.integers(0, len(_VOCAB)))] for _ in range(nw)]
                text = " ".join(words)
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
                offset += len(text)

        if vkind == "duplicate_doc_id" and i > 0:
            doc_id = f"doc-{int(rng.integers(0, i)):08d}"
            truth.append({"doc_id": doc_id, "span_idx": -1, "check": "duplicate_doc_id"})
        elif vkind == "missing_media_ref":
            si = next((k for k, sp in enumerate(spans) if sp["kind"] == "image"), 0)
            spans[si] = dict(spans[si], kind="image", media_ref=f"img-missing-{i}")
            truth.append({"doc_id": doc_id, "span_idx": si, "check": "missing_media_ref"})
        elif vkind == "offset_nonmonotonic" and len(spans) > 1:
            spans[-1] = dict(spans[-1], offset=spans[0]["offset"] - 1 if spans[0]["offset"] > 0 else -5)
            truth.append({"doc_id": doc_id, "span_idx": len(spans) - 1,
                          "check": "offset_nonmonotonic"})
        elif vkind == "null_kind":
            spans[0] = dict(spans[0], kind=None)
            truth.append({"doc_id": doc_id, "span_idx": 0, "check": "null_kind"})
        elif vkind == "empty_media_ref":
            si = next((k for k, sp in enumerate(spans) if sp["kind"] == "image"), 0)
            spans[si] = dict(spans[si], kind="image", media_ref="")
            truth.append({"doc_id": doc_id, "span_idx": si, "check": "empty_media_ref"})
        elif vkind == "score_exceeds_threshold":
            si = next((k for k, sp in enumerate(spans) if sp["kind"] == "image"), 0)
            ref = bad[int(rng.integers(0, len(bad)))]
            spans[si] = dict(spans[si], kind="image", media_ref=ref)
            truth.append({"doc_id": doc_id, "span_idx": si,
                          "check": "score_exceeds_threshold"})

        doc_ids.append(doc_id)
        spans_col.append(spans)
        part_col.append(i // per_part)

    table = pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans_col, DOC_SCHEMA.field("spans").type),
        "partition_id": pa.array(part_col, pa.int32()),
    })
    return table, truth


def write_corpus(out_dir: str, n_docs: int, seed: int = 42,
                 violation_rate: float = 0.01, n_partitions: int = 8) -> dict:
    """Write documents.(lance|parquet) + media + ground truth under out_dir.

    Uses Lance when the ``lance`` wheel is importable, else Parquet with an
    identical Arrow schema (documented substitution — this sandbox ships
    pyarrow only).
    """
    os.makedirs(out_dir, exist_ok=True)
    docs, truth = build_documents(n_docs, seed, violation_rate, n_partitions)
    media = build_media_table()
    paths = {}
    try:  # pragma: no cover - lance not present in sandbox
        import lance
        paths["documents"] = os.path.join(out_dir, "documents.lance")
        paths["media"] = os.path.join(out_dir, "media.lance")
        lance.write_dataset(docs, paths["documents"], mode="overwrite")
        lance.write_dataset(media, paths["media"], mode="overwrite")
        paths["format"] = "lance"
    except ImportError:
        import pyarrow.parquet as pq
        paths["documents"] = os.path.join(out_dir, "documents.parquet")
        paths["media"] = os.path.join(out_dir, "media.parquet")
        pq.write_table(docs, paths["documents"])
        pq.write_table(media, paths["media"])
        paths["format"] = "parquet"
    truth_path = os.path.join(out_dir, "ground_truth.json")
    with open(truth_path, "w") as f:
        json.dump(truth, f)
    paths["ground_truth"] = truth_path
    paths["n_docs"] = n_docs
    return paths
