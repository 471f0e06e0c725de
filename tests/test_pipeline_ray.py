"""Ray-backed integration tests: flagship validation, resume, dedup and
ANN operators through the Dataset API (session-scoped Ray fixture)."""

import collections
import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus_paths(ray_session, tmp_path_factory):
    from butteraugli_ray.corpus.synth import write_corpus
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), n_docs=600, seed=42, violation_rate=0.02)


def test_validate_matches_ground_truth(ray_session, corpus_paths, tmp_path):
    from butteraugli_ray.pipelines.validate import validate_corpus
    out = str(tmp_path / "out")
    summary = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                              out, resume=False, scorer_concurrency=2)
    truth = json.load(open(corpus_paths["ground_truth"]))
    want = collections.Counter(t["check"] for t in truth)
    got = summary["violations_by_check"]
    for kind in ("missing_media_ref", "null_kind", "empty_media_ref",
                 "score_exceeds_threshold", "duplicate_doc_id"):
        assert got.get(kind, 0) == want[kind], kind
    assert summary["n_docs"] == 600


def test_validate_dup_check_never_native_groupby_on_doc_id(
        ray_session, corpus_paths, tmp_path, monkeypatch):
    """The uniqueness check must ride the bucketed dup_keep_table shape:
    Ray's native sort-based groupby at unique-key cardinality (~1 group
    per doc_id) is the degenerate regime BASELINE.md measured (255 s /
    1.65 M keys) — assert it never runs on doc_id."""
    import collections as _c
    import ray.data
    from butteraugli_ray.pipelines.validate import validate_corpus
    seen = []
    orig = ray.data.Dataset.groupby

    def spy(self, key, *a, **k):
        seen.append(key)
        return orig(self, key, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "groupby", spy)
    out = str(tmp_path / "out")
    summary = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                              out, resume=False, scorer_concurrency=2)
    truth = json.load(open(corpus_paths["ground_truth"]))
    want = _c.Counter(t["check"] for t in truth)
    assert summary["violations_by_check"].get("duplicate_doc_id", 0) \
        == want["duplicate_doc_id"]
    flat = set()
    for key in seen:
        flat.update(key if isinstance(key, (list, tuple)) else [key])
    assert "doc_id" not in flat, flat


def test_resume_skips_completed_and_matches(ray_session, corpus_paths, tmp_path):
    from butteraugli_ray.pipelines.validate import validate_corpus
    out = str(tmp_path / "out")
    s1 = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                         out, resume=False, scorer_concurrency=2)
    # simulate kill: drop 3 partition manifests
    for pid in (0, 3, 7):
        os.remove(f"{out}/manifests/part-{pid:05d}.json")
    s2 = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                         out, resume=True, scorer_concurrency=2)
    assert s2["n_violations"] == s1["n_violations"]
    assert s2["violations_by_check"] == s1["violations_by_check"]
    assert s2["n_docs"] == s1["n_docs"]


def test_drift_detection(ray_session, corpus_paths, tmp_path):
    from butteraugli_ray.pipelines.validate import validate_corpus
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    validate_corpus(corpus_paths["documents"], corpus_paths["media"], out1,
                    resume=False, scorer_concurrency=2)
    s2 = validate_corpus(corpus_paths["documents"], corpus_paths["media"], out2,
                         resume=False, scorer_concurrency=2,
                         baseline_snapshot=f"{out1}/summary.json")
    assert "drift" in s2
    assert s2["drift"]["ks"] == pytest.approx(0.0, abs=1e-9)  # same corpus
    assert s2["drift"]["psi"] == pytest.approx(0.0, abs=1e-6)


def test_join_mode_matches_broadcast(ray_session, corpus_paths, tmp_path):
    # broadcast_scores=False (large-media shuffle-join path) must find
    # exactly the same violations as the broadcast path
    from butteraugli_ray.pipelines.validate import validate_corpus
    s_b = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                          str(tmp_path / "b"), resume=False,
                          scorer_concurrency=2)
    s_j = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                          str(tmp_path / "j"), resume=False,
                          scorer_concurrency=2, broadcast_scores=False)
    assert s_j["violations_by_check"] == s_b["violations_by_check"]
    assert s_j["n_docs"] == s_b["n_docs"]


def test_join_mode_never_collects_scores_on_driver(
        ray_session, corpus_paths, tmp_path, monkeypatch):
    """broadcast_scores=False must keep the scored media Dataset
    distributed end-to-end: collect_scores (the only driver-side full
    score copy) is broadcast-mode-only.  Summary stats (histogram,
    n_media, worst offenders) must still match the broadcast run."""
    from butteraugli_ray.pipelines import validate as V
    s_b = V.validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                            str(tmp_path / "b"), resume=False,
                            scorer_concurrency=2)

    def boom(_ds):
        raise AssertionError("collect_scores called in join mode")

    monkeypatch.setattr(V, "collect_scores", boom)
    s_j = V.validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                            str(tmp_path / "j"), resume=False,
                            scorer_concurrency=2, broadcast_scores=False)
    assert s_j["violations_by_check"] == s_b["violations_by_check"]
    assert s_j["score_histogram"] == s_b["score_histogram"]
    assert s_j["n_media"] == s_b["n_media"]
    assert s_j["media_scores"] == s_b["media_scores"]


def test_drift_detected_on_changed_media(ray_session, corpus_paths, tmp_path):
    # baseline on the full media pool; rerun against only the high-score
    # media → the score histogram shifts and KS/PSI fire
    import pyarrow.parquet as pq
    from butteraugli_ray.pipelines.validate import validate_corpus
    out1 = str(tmp_path / "base")
    validate_corpus(corpus_paths["documents"], corpus_paths["media"], out1,
                    resume=False, scorer_concurrency=2)
    media = pq.read_table(corpus_paths["media"])
    from butteraugli_ray.corpus.synth import bad_media_refs
    bad = set(bad_media_refs())
    import pyarrow.compute as pc
    import pyarrow as pa
    mask = pa.array([r in bad for r in media["media_ref"].to_pylist()])
    bad_only = media.filter(mask)
    bad_path = str(tmp_path / "media_bad.parquet")
    pq.write_table(bad_only, bad_path)
    out2 = str(tmp_path / "drifted")
    s2 = validate_corpus(corpus_paths["documents"], bad_path, out2,
                         resume=False, scorer_concurrency=2,
                         baseline_snapshot=f"{out1}/summary.json")
    assert s2["drift"]["ks"] > 0.3
    assert s2["drift"]["psi"] > 0.5


def test_span_sequence_through_executor(ray_session, corpus_paths):
    # input_hint invariant: exact (kind, text, media_ref, offset) sequence
    # survives a Ray Data round trip (read → map_batches → collect)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    orig = pq.read_table(corpus_paths["documents"])
    ds = rd.read_parquet(corpus_paths["documents"])
    roundtrip = ds.map_batches(lambda t: t, batch_format="pyarrow")
    got = pa.concat_tables(roundtrip.iter_batches(batch_size=1 << 16,
                                                  batch_format="pyarrow"),
                           promote_options="default")
    o = {d: s for d, s in zip(orig["doc_id"].to_pylist(),
                              orig["spans"].to_pylist())}
    g = {d: s for d, s in zip(got["doc_id"].to_pylist(),
                              got["spans"].to_pylist())}
    assert o == g


def test_minhash_finds_seeded_near_dups(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd
    from butteraugli_ray.functions.dedup import (minhash_candidate_pairs,
                                                 verify_jaccard_pairs, MinHasher)
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(60)]
    # near-dups at jaccard ≈ 0.9: one appended token (at ≈0.75 the
    # 16-band LSH recall is only ~87%/pair — not a plumbing test)
    near = [t + " x" for t in texts[:10]]
    df = pd.DataFrame({"doc_id": np.arange(70, dtype=np.int64),
                       "text": texts + near})
    ds = rd.from_pandas(df)
    pairs = minhash_candidate_pairs(ds, concurrency=1).to_pandas()
    texts_map = dict(zip(df["doc_id"], df["text"]))
    verified = verify_jaccard_pairs(pairs, texts_map, threshold=0.5)
    found = set(zip(verified["id_a"], verified["id_b"]))
    # every seeded near-dup pair (i, 60+i) must be found
    mh = MinHasher()
    for i in range(10):
        assert mh.jaccard(texts_map[i], texts_map[60 + i]) >= 0.5
        assert (i, 60 + i) in found
    # false-positive check: verified pairs really have jaccard ≥ 0.5
    for a, b, j in zip(verified["id_a"], verified["id_b"], verified["jaccard"]):
        assert mh.jaccard(texts_map[a], texts_map[b]) >= 0.5


def test_knn_matches_numpy_oracle(ray_session):
    import pandas as pd
    import ray.data as rd
    from butteraugli_ray.functions.ann import knn_cosine
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": list(emb)})
    queries = emb[:2].astype(np.float64)
    got = knn_cosine(rd.from_pandas(df), queries, k=5, concurrency=1)
    # numpy oracle
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = n @ q.T
    for qi in range(2):
        order = np.lexsort((np.arange(200), -sims[:, qi]))[:5]
        want = [int(v) for v in order]
        have = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert have == want


def test_knn_ivf_recall_vs_bruteforce(ray_session):
    # IVF with nprobe=4/8 clusters must recover most of the exact top-5
    from butteraugli_ray.pipelines.queries import q_ann_topk, q_knn_ivf
    sf = "/root/testdata/sf0.001"
    exact = q_ann_topk(sf)
    approx = q_knn_ivf(sf)
    recall_hits = 0
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall_hits += len(e & a)
    assert recall_hits >= 9  # ≥60% recall across 15 slots


def test_hll_query_close_to_exact(ray_session):
    from butteraugli_ray.pipelines.queries import (q_distinct_users,
                                                   q_hll_distinct_users)
    sf = "/root/testdata/sf0.001"
    exact = q_distinct_users(sf)["n_distinct_users"].iloc[0]
    got = q_hll_distinct_users(sf)
    assert got["n_distinct_users_exact"].iloc[0] == exact
    assert got["est_within_tol"].iloc[0] == 1


def test_tdigest_query_close_to_exact(ray_session):
    import pyarrow.parquet as pq
    from butteraugli_ray.pipelines.queries import q_value_quantiles
    sf = "/root/testdata/sf0.001"
    got = q_value_quantiles(sf)
    vals = pq.read_table(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy()
    # round 5: the query now carries the exact quantile + verdict
    assert got["est_within_tol"].all()
    for _, row in got.iterrows():
        exact = np.quantile(vals, row["quantile"])
        assert abs(row["value_exact"] - exact) <= 1e-3


def test_ngram_jaccard_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd
    from butteraugli_ray.functions.dedup import (ngram_jaccard_pairs,
                                                 shingle_hashes)
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    near = [" ".join(t.split()[:-3]) for t in texts[:8]]   # j ≈ 25/28
    df = pd.DataFrame({"doc_id": np.arange(48, dtype=np.int64),
                       "text": texts + near})
    got = ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.5,
                              concurrency=1).to_pandas()
    got_pairs = {(a, b): j for a, b, j in
                 zip(got["doc_a"], got["doc_b"], got["jaccard"])}
    # brute-force oracle: every pair, exact jaccard over hashed shingles
    sh = [set(shingle_hashes(t, 3).tolist()) for t in df["text"]]
    for i in range(48):
        for j in range(i + 1, 48):
            union = len(sh[i] | sh[j])
            jac = len(sh[i] & sh[j]) / union if union else 1.0
            if jac >= 0.5:
                assert (i, j) in got_pairs, f"missing pair ({i},{j})"
                assert abs(got_pairs[(i, j)] - jac) < 1e-6
            else:
                assert (i, j) not in got_pairs
    # the 8 seeded near-dups must all be found
    for i in range(8):
        assert (i, 40 + i) in got_pairs


def test_ngram_jaccard_prefix_matches_full(ray_session):
    """The PPJoin prefix-filtered path (df-ordered prefixes, length
    filter, packed-set verify) is EXACT: identical pair set and
    jaccards to the full self-join, through BOTH set-attach strategies
    (broadcast fast path and the bucketed big-side merge)."""
    import pandas as pd
    import ray.data as rd
    from butteraugli_ray.functions.dedup import (ngram_jaccard_pairs,
                                                 ngram_jaccard_pairs_prefix,
                                                 NgramShingler)
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    # include a hot stopword shingle in most docs to exercise the
    # df-ordering (hot shingles must fall outside prefixes)
    texts = ["the of and " + " ".join(rng.choice(vocab, 25))
             for _ in range(40)]
    near = [" ".join(t.split()[:-3]) for t in texts[:10]]
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": texts + near})
    ds = rd.from_pandas(df)
    full = (ngram_jaccard_pairs(ds, threshold=0.5, concurrency=1)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
    pre = (ngram_jaccard_pairs(ds, threshold=0.5, concurrency=1,
                               method="prefix")
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(full, pre)
    # force the bucketed (non-broadcast) set-attach fallback
    sh_rows = (ds.map_batches(NgramShingler(3), batch_format="pandas")
               .materialize())
    shuf = (ngram_jaccard_pairs_prefix(sh_rows, 0.5, n_buckets=8,
                                       broadcast_limit=0)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(full, shuf)


def test_embedding_lsh_multitable_recall(ray_session):
    import pandas as pd
    import ray.data as rd
    from butteraugli_ray.functions.dedup import embedding_near_dup_pairs
    rng = np.random.default_rng(21)
    base = rng.standard_normal((60, 32)).astype(np.float64)
    near = base[:15] + 0.02 * rng.standard_normal((15, 32))  # cos ≈ 0.999
    emb = np.vstack([base, near])
    df = pd.DataFrame({"vec_id": np.arange(75, dtype=np.int64),
                       "embedding": list(emb.astype(np.float32))})
    # brute-force ground truth
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = n @ n.T
    iu = np.triu_indices(75, 1)
    truth = {(int(a), int(b)) for a, b in zip(iu[0][sims[iu] >= 0.95],
                                              iu[1][sims[iu] >= 0.95])}
    assert len(truth) >= 15

    def run(tables):
        out = embedding_near_dup_pairs(
            rd.from_pandas(df), dim=32, threshold=0.95, n_planes=8,
            concurrency=1, n_tables=tables).to_pandas()
        return {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}

    one, four = run(1), run(4)
    assert one <= truth and four <= truth      # no false positives
    assert one <= four                         # union only adds recall
    assert len(four) >= len(one)
    assert len(four) / len(truth) >= 0.9       # 4 tables ≈ full recall


class TestFaultTolerance:
    def test_transient_task_failure_retries_to_completion(self, ray_session,
                                                          tmp_path):
        """A map_batches task that dies once (simulated worker fault) is
        retried by Ray and the pipeline still produces the complete,
        correct result — the 100 TB fault-tolerance contract."""
        import numpy as np
        import pandas as pd
        import ray.data as rd
        flag_dir = tmp_path / "faults"
        flag_dir.mkdir()

        def flaky(df):
            # crash the FIRST time any task processes this batch range
            key = int(df["x"].iloc[0])
            marker = flag_dir / f"batch{key}"
            if key == 0 and not marker.exists():
                marker.write_text("crashed once")
                import os
                os._exit(1)          # hard task death, not an exception
            df = df.copy()
            df["y"] = df["x"] * 2
            return df

        ds = rd.from_pandas(pd.DataFrame({"x": np.arange(1000)}))
        out = (ds.repartition(8)
               .map_batches(flaky, batch_format="pandas")
               .to_pandas())
        assert len(out) == 1000
        assert (out.sort_values("x")["y"].to_numpy()
                == np.arange(1000) * 2).all()
        assert (flag_dir / "batch0").exists()   # the crash really happened


def test_post_filter_matches_pushdown_semantics(ray_session):
    """post_filter (the Lance no-pushdown fallback) must drop exactly the
    rows the parquet pushdown would."""
    import pandas as pd
    import ray.data as rd
    import pyarrow.dataset as pads
    from butteraugli_ray.sources.tables import post_filter
    df = pd.DataFrame({"partition_id": np.arange(40) % 4,
                       "x": np.arange(40)})
    expr = ~pads.field("partition_id").isin([1, 3])
    out = (post_filter(rd.from_pandas(df), expr)
           .to_pandas().sort_values("x").reset_index(drop=True))
    exp = (df[~df["partition_id"].isin([1, 3])]
           .sort_values("x").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp)


def test_curate_corpus_resume_identical(ray_session, tmp_path):
    """Curation sink: fresh run == (partial run + resume), resume
    rewrites ONLY the missing partitions, totals identical."""
    import json
    import os
    from butteraugli_ray.pipelines.curate import curate_corpus, kept_dir
    sf = "/root/testdata/sf0.001"
    out_a = str(tmp_path / "a")
    s_a = curate_corpus(sf, out_a, n_partitions=8, resume=False)
    assert s_a["n_partitions"] == 8
    assert s_a["n_docs"] == 550            # 500 docs + 50 planted dups
    assert s_a["reasons"]["exact_dup"] == 50
    assert s_a["n_kept"] == s_a["reasons"]["kept"]

    # simulate a crash: drop 3 partitions' manifests + outputs
    out_b = str(tmp_path / "b")
    curate_corpus(sf, out_b, n_partitions=8, resume=False)
    for pid in (1, 4, 6):
        os.remove(os.path.join(out_b, "manifests", f"part-{pid:05d}.json"))
        os.remove(os.path.join(kept_dir(out_b), f"part-{pid:05d}.parquet"))
    untouched = os.path.join(kept_dir(out_b), "part-00002.parquet")
    mtime_before = os.path.getmtime(untouched)

    s_b = curate_corpus(sf, out_b, n_partitions=8, resume=True)
    assert s_b["n_docs"] == s_a["n_docs"]
    assert s_b["n_kept"] == s_a["n_kept"]
    assert s_b["reasons"] == s_a["reasons"]
    assert s_b["resumed_partitions"] == [0, 2, 3, 5, 7]
    # completed partitions were not rewritten
    assert os.path.getmtime(untouched) == mtime_before

    # the materialized kept files agree with the manifests
    import pyarrow.parquet as pq
    for pid in range(8):
        n = pq.read_metadata(
            os.path.join(kept_dir(out_b), f"part-{pid:05d}.parquet")).num_rows
        with open(os.path.join(out_b, "manifests",
                               f"part-{pid:05d}.json")) as f:
            assert n == json.load(f)["n_kept"]


def test_sample_violations_streams_with_early_stop(tmp_path, monkeypatch):
    """sample_violations must never concat every violation file on the
    driver: it streams file-by-file (bounded by per_check × n_checks)
    and, when the manifests cover all partitions, stops as soon as
    every check has min(per_check, total) samples — here after ONE of
    six files."""
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from butteraugli_ray.pipelines import checkpoint as ckpt
    from butteraugli_ray.pipelines.validate import (VIOLATION_COLS,
                                                    sample_violations)

    out_dir = str(tmp_path / "run")
    vdir = ckpt.violations_dir(out_dir)
    os.makedirs(vdir, exist_ok=True)
    n_per_file = 50
    for pid in range(6):
        tbl = pa.table({
            "doc_id": pa.array([f"d{pid}-{i}" for i in range(n_per_file)],
                               pa.string()),
            "span_idx": pa.array([0] * n_per_file, pa.int32()),
            "check": pa.array((["null_offset", "invalid_kind"]
                               * n_per_file)[:n_per_file], pa.string()),
            "detail": pa.array(["x"] * n_per_file, pa.string()),
            "partition_id": pa.array([pid] * n_per_file, pa.int32()),
        }).select(VIOLATION_COLS)
        pqt.write_table(tbl, os.path.join(vdir, f"part-{pid:05d}.parquet"))
        ckpt.write_manifest(out_dir, pid, {
            "partition_id": pid, "n_violations": n_per_file,
            "violations_by_check": {"null_offset": n_per_file // 2,
                                    "invalid_kind": n_per_file // 2},
        })

    # reference semantics: concat-all then head-N per check
    full = pa.concat_tables(
        [pqt.read_table(os.path.join(vdir, f"part-{p:05d}.parquet"))
         for p in range(6)])
    want = {}
    import pyarrow.compute as pc
    for check in pc.unique(full["check"]).to_pylist():
        want[check] = full.filter(
            pc.equal(full["check"], check)).slice(0, 5).to_pylist()

    reads = {"n": 0}
    real_read = pqt.read_table

    def counting_read(path, *a, **kw):
        reads["n"] += 1
        return real_read(path, *a, **kw)

    monkeypatch.setattr(pqt, "read_table", counting_read)
    got = sample_violations(out_dir, per_check=5)
    assert got == want
    # both checks fill from the first file (25 rows each ≥ 5)
    assert reads["n"] == 1, reads["n"]

    # a check that exists only in a later file is still found when the
    # heads aren't filled early (totals force the stream onward)
    tbl = pa.table({
        "doc_id": pa.array(["late-1"], pa.string()),
        "span_idx": pa.array([0], pa.int32()),
        "check": pa.array(["negative_offset"], pa.string()),
        "detail": pa.array(["x"], pa.string()),
        "partition_id": pa.array([6], pa.int32()),
    }).select(VIOLATION_COLS)
    pqt.write_table(tbl, os.path.join(vdir, "part-00006.parquet"))
    ckpt.write_manifest(out_dir, 6, {
        "partition_id": 6, "n_violations": 1,
        "violations_by_check": {"negative_offset": 1},
    })
    got2 = sample_violations(out_dir, per_check=5)
    assert [r["doc_id"] for r in got2["negative_offset"]] == ["late-1"]


def test_dup_check_join_fallback_matches_broadcast(
        ray_session, tmp_path_factory, tmp_path):
    """A pathological duplicate population (half the corpus) above
    dup_broadcast_cap must degrade to the partitioned hash semi-join
    and produce the identical violation summary — never a driver copy
    of the duplicated-key set."""
    import pyarrow as pa
    import pyarrow.parquet as pqt
    from butteraugli_ray.corpus.synth import write_corpus
    from butteraugli_ray.pipelines.validate import validate_corpus

    d = tmp_path_factory.mktemp("dupcorpus")
    paths = write_corpus(str(d), n_docs=200, seed=9, violation_rate=0.0)
    # duplicate every other doc_id once more (≈50% dup rate)
    docs = pqt.read_table(paths["documents"])
    half = docs.slice(0, 100)
    dup = pa.concat_tables([docs, half])
    pqt.write_table(dup, paths["documents"])

    out_b = str(tmp_path / "broadcast")
    out_j = str(tmp_path / "join")
    s_b = validate_corpus(paths["documents"], paths["media"], out_b,
                          resume=False, scorer_concurrency=2)
    s_j = validate_corpus(paths["documents"], paths["media"], out_j,
                          resume=False, scorer_concurrency=2,
                          dup_broadcast_cap=1)
    assert s_b["violations_by_check"]["duplicate_doc_id"] == 100
    assert s_j["violations_by_check"] == s_b["violations_by_check"]
    assert s_j["n_docs"] == s_b["n_docs"] == 300


def test_summary_score_quantiles_both_modes(ray_session, corpus_paths,
                                            tmp_path):
    """The summary carries t-digest quantiles of the butteraugli
    scores (the north rule's score-distribution summary) in BOTH
    scoring modes, and they agree — broadcast computes them on the
    driver copy, join mode from merged per-batch digest partials."""
    from butteraugli_ray.pipelines.validate import validate_corpus
    s_b = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                          str(tmp_path / "b"), resume=False,
                          scorer_concurrency=2)
    s_j = validate_corpus(corpus_paths["documents"], corpus_paths["media"],
                          str(tmp_path / "j"), resume=False,
                          scorer_concurrency=2, broadcast_scores=False)
    qb, qj = s_b["score_quantiles"], s_j["score_quantiles"]
    assert qb is not None and qj is not None
    assert qb["p50"] <= qb["p90"] <= qb["p99"]
    for k in ("p50", "p90", "p99"):
        # t-digest is approximate; partial-merge order differs between
        # modes, so allow a small relative tolerance
        assert abs(qb[k] - qj[k]) <= 0.05 * max(abs(qb[k]), 1e-9), (k, qb, qj)
