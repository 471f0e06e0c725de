"""Structural check correctness on the synthesized corpus (no Ray —
pure Arrow batch functions) + span-sequence exactness invariants."""

import collections

import pyarrow as pa
import pytest

from butteraugli_ray.corpus.synth import (build_documents, build_media_table)
from butteraugli_ray.stages.structural import check_spans_batch, explode_spans


@pytest.fixture(scope="module")
def corpus():
    docs, truth = build_documents(3000, seed=123, violation_rate=0.02)
    media = build_media_table()
    keys = pa.array(media["media_ref"].to_pylist())
    return docs, truth, keys


def test_seeded_structural_violations_found(corpus):
    docs, truth, keys = corpus
    viol = check_spans_batch(docs, keys)
    found = set(zip(viol["doc_id"].to_pylist(), viol["span_idx"].to_pylist(),
                    viol["check"].to_pylist()))
    structural_kinds = {"missing_media_ref", "offset_nonmonotonic",
                        "null_kind", "empty_media_ref"}
    for t in truth:
        if t["check"] in structural_kinds:
            assert (t["doc_id"], t["span_idx"], t["check"]) in found, t


def test_no_false_positives_on_clean_corpus():
    docs, truth = build_documents(500, seed=9, violation_rate=0.0)
    media = build_media_table()
    keys = pa.array(media["media_ref"].to_pylist())
    viol = check_spans_batch(docs, keys)
    assert viol.num_rows == 0


def test_violation_counts_match_truth(corpus):
    docs, truth, keys = corpus
    viol = check_spans_batch(docs, keys)
    got = collections.Counter(viol["check"].to_pylist())
    want = collections.Counter(t["check"] for t in truth)
    for kind in ("missing_media_ref", "null_kind", "empty_media_ref"):
        assert got[kind] == want[kind]


def test_explode_preserves_span_sequence(corpus):
    # per-row invariant: exact (kind, text, media_ref, offset) order
    docs, _, _ = corpus
    doc_ids, span_idx, kind, text, media_ref, offset, parents = \
        explode_spans(docs)
    spans_py = docs["spans"].to_pylist()
    ids_py = docs["doc_id"].to_pylist()
    # reconstruct from the exploded arrays and compare exactly
    rebuilt = collections.defaultdict(list)
    for i in range(len(parents)):
        rebuilt[parents[i]].append({
            "kind": kind[i].as_py(), "text": text[i].as_py(),
            "media_ref": media_ref[i].as_py(), "offset": offset[i].as_py()})
    for row, spans in enumerate(spans_py):
        assert rebuilt[row] == spans, f"span order broken for {ids_py[row]}"


def test_adversarial_span_shapes():
    """Null span lists, empty lists, null structs, and null fields must
    be flagged (or skipped) — never crash; struct-level nulls fold into
    field null masks (Arrow .field() does not propagate them)."""
    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()),
                                 ("offset", pa.int32())]))
    cases = {
        "null_list": ([None], set()),
        "empty_list": ([[]], set()),
        "null_struct": ([[None]], {"null_kind", "null_offset"}),
        "null_fields": ([[{"kind": None, "text": None, "media_ref": None,
                           "offset": None}]], {"null_kind", "null_offset"}),
        "null_offset_only": ([[{"kind": "text", "text": "a",
                                "media_ref": "", "offset": 0},
                               {"kind": "text", "text": "b",
                                "media_ref": "", "offset": None}]],
                             {"null_offset"}),
    }
    for name, (spans, want) in cases.items():
        t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(spans))]),
                      "spans": pa.array(spans, span_t)})
        v = check_spans_batch(t, pa.array(["m"]))
        assert set(v["check"].to_pylist()) == want, name


def test_batch_split_equals_whole(corpus):
    # checks are per-row: any batch partitioning yields identical violations
    docs, _, keys = corpus
    whole = check_spans_batch(docs, keys)
    parts = [check_spans_batch(docs.slice(0, 1000), keys),
             check_spans_batch(docs.slice(1000, 1000), keys),
             check_spans_batch(docs.slice(2000), keys)]
    combined = pa.concat_tables(parts)
    key = lambda t: sorted(zip(t["doc_id"].to_pylist(),
                               t["span_idx"].to_pylist(),
                               t["check"].to_pylist()))
    assert key(combined) == key(whole)


def test_span_stats_matches_pandas_reconstruction(ray_session):
    """q_span_stats (zero-copy Arrow list flatten) equals an
    independent pandas reconstruction of the interleaved corpus."""
    import pyarrow.parquet as pq
    from butteraugli_ray.pipelines.queries import q_span_stats
    sf = "/root/testdata/sf0.001"
    got = q_span_stats(sf)

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # construction: 2 text spans (halves of text) + 1 image span per doc,
    # plus the deterministic did-modulus violation seeding the builder
    # applies (build_interleaved_corpus) — replicated independently here.
    from butteraugli_ray.corpus.synth import bad_media_refs, good_media_refs
    good, bad = good_media_refs(), bad_media_refs()
    n_text = n_image = n_video = text_chars = 0
    refs = set()
    for did, text in zip(docs["doc_id"], docs["text"]):
        words = text.split()
        half = max(1, len(words) // 2)
        t1, t2 = " ".join(words[:half]), " ".join(words[half:])
        mult = 2 if did % 499 == 7 else 1      # duplicate_doc_id seeding
        r_ = did % 101
        n_text += 2 * mult
        if r_ == 89:                            # invalid_kind → "video"
            n_video += mult
        else:
            n_image += mult
        text_chars += mult * (len(t1) + len(t2))
        if r_ == 33:                            # empty_media_ref
            pass
        elif r_ == 17:                          # dangling media_ref
            refs.add(f"media-dangling-{did:06d}")
        else:
            refs.add(bad[did % len(bad)] if did % 17 == 0
                     else good[did % len(good)])

    r = got.set_index("kind")
    assert int(r.loc["text", "n_spans"]) == n_text
    assert int(r.loc["image", "n_spans"]) == n_image
    assert int(r.loc["video", "n_spans"]) == n_video
    assert int(r.loc["text", "sum_text_chars"]) == text_chars
    assert int(r.loc["image", "sum_text_chars"]) == 0
    assert int(r.loc["image", "n_distinct_refs"]) == len(refs)
    assert int(r.loc["text", "n_distinct_refs"]) == 0
    assert int(r.loc["video", "n_distinct_refs"]) == 0


def test_span_sequence_queries_match_pandas(ray_session):
    """q_span_kind_bigrams / q_span_position_profile (offset-arithmetic
    pair masks over zero-copy list flattens) equal an independent
    pandas explode of the SAME materialized corpus parquet."""
    import hashlib

    import pyarrow.parquet as pq

    from butteraugli_ray.pipelines.queries import (
        build_interleaved_corpus, q_span_kind_bigrams,
        q_span_position_profile)

    sf = "/root/testdata/sf0.001"
    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    paths = build_interleaved_corpus(sf, f"/tmp/butteraugli_ray_corpus_{tag}")
    docs = pq.read_table(paths["documents"],
                         columns=["spans"]).to_pandas()

    import collections
    bigrams = collections.Counter()
    deciles = collections.Counter()
    for spans in docs["spans"]:
        kinds = [s["kind"] for s in spans]
        n = len(kinds)
        for a, b in zip(kinds, kinds[1:]):
            if a is not None and b is not None:
                bigrams[(a, b)] += 1
        for i, k in enumerate(kinds):
            if k is not None:
                deciles[(k, (10 * i) // n)] += 1

    got_b = q_span_kind_bigrams(sf)
    assert {(r.prev_kind, r.kind): r.n_pairs
            for r in got_b.itertuples()} == dict(bigrams)

    got_d = q_span_position_profile(sf)
    assert {(r.kind, r.decile): r.n_spans
            for r in got_d.itertuples()} == dict(deciles)


def test_small_file_num_blocks_caps_block_bytes(tmp_path):
    """Block-count override must bound per-block BYTES too: a huge
    single file raises the count past the CPU-scaled cap so blocks
    stay ≤128 MB (ADVICE r4: a 100 GB file must not become GB blocks)."""
    from unittest import mock

    from butteraugli_ray.sources.tables import small_file_num_blocks

    p = tmp_path / "f.parquet"
    p.write_bytes(b"x")
    with mock.patch("os.path.getsize", return_value=100 << 30):  # 100 GB
        n = small_file_num_blocks(str(p))
    assert (100 << 30) / n <= 128 << 20
    # small files keep the old floor behavior
    with mock.patch("os.path.getsize", return_value=1 << 20):
        assert small_file_num_blocks(str(p)) == 16
