"""Text analysis + dedup operator unit tests (no Ray where possible)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from butteraugli_ray.functions import text as T
from butteraugli_ray.functions.dedup import MinHasher, SimHasher, hamming64


def test_token_counts():
    s = pd.Series(["a b  c", "", "  ", "one", None])
    assert T.token_count_whitespace(s).tolist() == [3, 0, 0, 1, 0]
    s2 = pd.Series(["don't stop!", "a1b2"])
    # don ' t stop !  /  a 1 b 2
    assert T.token_count_bpe(s2).tolist() == [5, 4]


def test_detect_language():
    s = pd.Series(["the cat and the dog in a house that was big",
                   "der hund und die katze ist ein tier",
                   "le chat et la maison est un lieu",
                   "el perro y la casa es un lugar",
                   "这是一个中文句子",
                   "zzz qqq www"])
    assert T.detect_language(s).tolist() == ["en", "de", "fr", "es", "zh",
                                             "unknown"]


def test_quality_features():
    f = T.quality_features(pd.Series(["Hello world this is a clean sentence",
                                      "!!! ??? ### $$$"]))
    assert f["quality"].iloc[0] > f["quality"].iloc[1]
    assert f["alpha_ratio"].iloc[0] > 0.7
    assert f["punct_ratio"].iloc[1] > 0.5


def test_fingerprint_md5_matches_sql_semantics():
    s = pd.Series(["Hello World"])
    assert T.fingerprint_md5(s).iloc[0] == hashlib.md5(b"hello world").hexdigest()


def test_normalize_text_canonicalization():
    s = pd.Series(["  Hello\t\tWORLD \n", "a  b", None,
                   "Café"])           # e + combining acute
    got = T.normalize_text(s)
    assert got.iloc[0] == "hello world"
    assert got.iloc[1] == "a b"
    assert got.iloc[2] == ""
    assert got.iloc[3] == "café"       # NFC composes to é
    # idempotent: normalizing twice changes nothing
    assert (T.normalize_text(got) == got).all()


def test_rolling_fingerprint_shift_resistant():
    # min-window fingerprint survives a prefix shift UNLESS one of the few
    # new windows happens to hash lower — assert the match rate, not every
    # instance, plus determinism and discrimination.
    base = " ".join(f"word{i}" for i in range(120))  # non-repeating content
    prefixes = [f"P{i} " for i in range(20)]
    s = pd.Series([base] + [p + base for p in prefixes]
                  + ["completely different text entirely"])
    fp = T.rolling_fingerprint(s)
    matches = sum(fp[0] == fp[1 + i] for i in range(len(prefixes)))
    assert matches >= 15           # ≥75% shift-survival
    assert fp[0] != fp[len(s) - 1]
    fp2 = T.rolling_fingerprint(pd.Series([base]))
    assert fp2[0] == fp[0]         # deterministic


def test_minhash_jaccard_estimate():
    mh = MinHasher(num_perms=256)
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    b = "the quick brown fox jumps over the lazy dog and runs far away now"
    sig_a, sig_b = mh.signature(a), mh.signature(b)
    est = (sig_a == sig_b).mean()
    true_j = mh.jaccard(a, b)
    assert est == pytest.approx(true_j, abs=0.15)
    # identical texts → identical signatures
    assert np.array_equal(mh.signature(a), mh.signature(a))


def test_simhash_near_for_near_texts():
    sh = SimHasher()
    a = "word " * 50 + "alpha beta gamma delta epsilon zeta eta theta"
    b = "word " * 50 + "alpha beta gamma delta epsilon zeta eta iota"
    c = "totally unrelated content about completely other topics here"
    ha, hb, hc = (np.array([sh.simhash(x)], dtype=np.uint64) for x in (a, b, c))
    assert hamming64(ha, hb)[0] < hamming64(ha, hc)[0]
    assert hamming64(ha, ha)[0] == 0


def test_connected_components_matches_union_find(ray_session):
    """Bucketed label propagation == union-find on a random graph
    (long-diameter components exercise the early-stop loop)."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import connected_components
    rng = np.random.default_rng(3)
    n = 600
    # dense random graph (shallow diameter) + an explicit 12-hop chain so
    # several propagation rounds are genuinely exercised without the
    # diameter-bound round count of a sparse sub-percolation graph
    edges = pd.DataFrame({"id_a": rng.integers(0, n, 900),
                          "id_b": rng.integers(0, n, 900)})
    chain = pd.DataFrame({"id_a": np.arange(700, 712),
                          "id_b": np.arange(701, 713)})
    edges = pd.concat([edges, chain], ignore_index=True)
    edges = edges[edges.id_a != edges.id_b].reset_index(drop=True)

    parent = list(range(713))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges.id_a, edges.id_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import collections
    comp = collections.defaultdict(list)
    for v in set(edges.id_a) | set(edges.id_b):
        comp[find(v)].append(v)
    oracle = {v: min(ms) for ms in comp.values() for v in ms}

    out = connected_components(rd.from_pandas(edges), max_iters=50,
                               n_buckets=8).to_pandas()
    got = dict(zip(out.node, out.label))
    assert got == oracle


def test_connected_components_star_deep_graph(ray_session):
    """Large-star/small-star contraction: O(log^2 n) rounds regardless of
    diameter — verified on a 24-hop path (propagation would need 24
    rounds) plus a random graph, against union-find."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import connected_components_star
    rng = np.random.default_rng(7)
    rand = pd.DataFrame({"id_a": rng.integers(0, 200, 300),
                         "id_b": rng.integers(0, 200, 300)})
    path = pd.DataFrame({"id_a": np.arange(500, 524),
                         "id_b": np.arange(501, 525)})
    edges = pd.concat([rand, path], ignore_index=True)
    edges = edges[edges.id_a != edges.id_b].reset_index(drop=True)

    parent = list(range(525))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges.id_a, edges.id_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import collections
    comp = collections.defaultdict(list)
    for v in set(edges.id_a) | set(edges.id_b):
        comp[find(v)].append(v)
    oracle = {v: min(ms) for ms in comp.values() for v in ms}

    out = connected_components_star(rd.from_pandas(edges),
                                    n_buckets=8).to_pandas()
    assert dict(zip(out.node, out.label)) == oracle


def test_ngram_jaccard_max_df_lower_bound(ray_session):
    """df-capped ngram join: subset of the exact pairs, jaccard never
    overestimates, and true near-dups (sharing rare shingles) survive."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import ngram_jaccard_pairs
    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "alpha beta gamma delta epsilon zeta eta theta iota lambda"]
    filler = [f"common word soup number {i} common word" for i in range(30)]
    df = pd.DataFrame({"doc_id": np.arange(32, dtype=np.int64),
                       "text": base + filler})
    ds = rd.from_pandas(df)
    exact = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    capped = ngram_jaccard_pairs(ds, threshold=0.5, max_df=4).to_pandas()
    ex = {(a, b): j for a, b, j in exact.itertuples(index=False)}
    cp = {(a, b): j for a, b, j in capped.itertuples(index=False)}
    assert set(cp) <= set(ex)
    assert (0, 1) in cp                       # rare-shingle near-dup kept
    for k, j in cp.items():
        assert j <= ex[k] + 1e-9              # lower bound


def test_ngram_frame_edges():
    """_ngram_frame: windows never cross doc boundaries; docs shorter
    than n yield nothing; pos is the 0-based window start."""
    from butteraugli_ray.pipelines.queries import _ngram_frame
    ids = pd.Series([10, 11, 12], dtype="int64")
    toks = pd.Series([["a", "b", "c"], ["x"], []])
    g = _ngram_frame(ids, toks, 2)
    assert list(g["gram"]) == ["a b", "b c"]          # no "c x" crossing
    assert list(g["id"]) == [10, 10]
    assert list(g["pos"]) == [0, 1]
    assert len(_ngram_frame(ids, toks, 4)) == 0       # all docs < n
    empty = _ngram_frame(pd.Series([], dtype="int64"), pd.Series([]), 3)
    assert len(empty) == 0 and set(empty.columns) == {"id", "pos", "gram"}


def test_repetition_filter_known_values(ray_session):
    """Hand-checkable doc: 'a a a b' → top_frac 3/4, dup bigram 'a a'
    twice → dup_frac 1/3; flagged by both thresholds."""
    import duckdb
    import ray.data as rd
    from butteraugli_ray.pipelines.queries import ORACLE_SQL
    df = pd.DataFrame({"doc_id": [0, 1], "lang": ["en", "en"],
                       "text": ["a a a b", "p q r s t"]})
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(ORACLE_SQL["repetition_filter"]).df()
    assert exp.loc[0, "n_flagged"] == 1
    assert abs(exp.loc[0, "avg_top_token_frac"] - (0.75 + 0.2) / 2) < 5e-7
    assert abs(exp.loc[0, "avg_dup_bigram_frac"] - (1 / 3) / 2) < 5e-7


def test_bpe_train_classic_example():
    """Sennrich toy corpus: merges follow max-count with lexicographic
    tie-break — es(9), es+t(9), est+</w>(9), l+o(7), lo+w(7)."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m = T.bpe_train(wf, 5)
    assert [(a, b, g, c) for _, a, b, g, c in m] == [
        ("e", "s", "es", 9), ("es", "t", "est", 9),
        ("est", "</w>", "est</w>", 9), ("l", "o", "lo", 7),
        ("lo", "w", "low", 7)]


def test_bpe_merges_query_deterministic(ray_session):
    from butteraugli_ray.pipelines.queries import q_bpe_merges
    a = q_bpe_merges("/root/testdata/sf0.001")
    b = q_bpe_merges("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 8 and (a["count"].to_numpy() > 0).all()
    # counts never increase (merged pair frequency is monotone under
    # greedy BPE only per symbol pool, but rank-0 must be the max)
    assert a["count"].iloc[0] == a["count"].max()


def test_minhash_eval_recall_precision(ray_session):
    """LSH banding proposes ≥85% of true pairs at τ=0.5 and the exact
    verify step makes precision exactly 1.0 (q_minhash_eval contract)."""
    from butteraugli_ray.pipelines.queries import q_minhash_eval
    out = q_minhash_eval("/root/testdata/sf0.001")
    row = out.iloc[0]
    assert row["precision"] == 1.0
    assert row["recall"] >= 0.85
    assert row["n_common"] <= row["n_exact"]


def test_compression_ratio_orders_text_kinds():
    rng = np.random.default_rng(11)
    gibberish = "".join(chr(rng.integers(33, 127)) for _ in range(2000))
    boiler = "click here to subscribe " * 80
    prose = " ".join(f"word{i} and some varied prose content" for i in range(60))
    r = T.compression_ratio(pd.Series([boiler, prose, gibberish, "", None]))
    assert r[0] < r[1] < r[2]          # boilerplate < prose < gibberish
    assert r[3] == 0 and r[4] == 0     # empty/None


def test_bpe_encode_reproduces_training_segmentation():
    """Replaying merges in rank order reproduces exactly the segmentation
    the training loop reached for every training word."""
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m = T.bpe_train(wf, 5)
    enc = T.bpe_encode(list(wf), m)
    assert enc == [("low", "</w>"), ("low", "e", "r", "</w>"),
                   ("n", "e", "w", "est</w>"), ("w", "i", "d", "est</w>")]
    # zero merges → raw characters + </w>
    assert T.bpe_encode(["abc"], []) == [("a", "b", "c", "</w>")]
    # out-of-vocabulary word still encodes (partial merges apply)
    assert "est</w>" in T.bpe_encode(["tallest"], m)[0]


def test_bpe_encode_query_matches_naive(ray_session):
    """q_bpe_encode (distributed induce→encode) equals a single-process
    naive computation over the same corpus."""
    import pyarrow.parquet as pq
    from butteraugli_ray.pipelines.queries import q_bpe_encode
    sf = "/root/testdata/sf0.001"
    got = q_bpe_encode(sf, n_merges=16)

    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["lang", "text"]).to_pandas()
    toks = d["text"].fillna("").str.lower().str.findall(T.WS_TOKEN_RE)
    ex = pd.DataFrame({"lang": d["lang"], "w": toks}).explode("w").dropna()
    wf = ex["w"].value_counts().to_dict()
    merges = T.bpe_train(wf, 16)
    uniq = list(pd.unique(ex["w"]))
    nsub = {w: len(s) for w, s in zip(uniq, T.bpe_encode(uniq, merges))}
    ex["n"] = ex["w"].map(nsub)
    ref = (ex.groupby("lang")["n"].agg(["size", "sum"])
           .rename(columns={"size": "n_words", "sum": "n_subwords"})
           .sort_index())
    assert got["n_words"].tolist() == ref["n_words"].tolist()
    assert got["n_subwords"].tolist() == ref["n_subwords"].tolist()


def test_md5_bucket_matches_duckdb():
    import duckdb
    toks = pd.Series(["the", "Schnee", "año", "雪", "x9", ""])
    got = T.md5_bucket(toks, 256)
    ref = [r[0] for r in duckdb.sql(
        "SELECT CAST(md5_number_lower(t) % 256 AS BIGINT) FROM "
        "(SELECT unnest(['the','Schnee','año','雪','x9','']) AS t)"
    ).fetchall()]
    assert got.tolist() == ref


def test_dsir_sample_prefers_target_and_matches_naive(ray_session):
    """DSIR top-k at sf0.001: equals the single-process numpy reference
    and is dominated by target-language docs."""
    import pyarrow.parquet as pq
    from butteraugli_ray.pipelines.queries import q_dsir_sample
    sf = "/root/testdata/sf0.001"
    got = q_dsir_sample(sf, k=20)
    assert len(got) == 20
    w = got["logweight"].to_numpy()
    assert (np.diff(w) <= 0).all()

    d = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    # top-k is ENRICHED in the target language vs the corpus base rate
    # (256 hashed buckets blur but must not erase the signal)
    base = (d["lang"] == "en").mean()
    assert (got["lang"] == "en").mean() > base
    toks = d["text"].fillna("").str.lower().str.findall(T.WS_TOKEN_RE)
    ex = pd.DataFrame({"doc_id": d["doc_id"], "lang": d["lang"],
                       "w": toks}).explode("w").dropna(subset=["w"])
    ex["b"] = T.md5_bucket(ex["w"], 256)
    n_raw = np.zeros(256); n_tgt = np.zeros(256)
    vc = ex["b"].value_counts()
    n_raw[vc.index.to_numpy()] = vc.to_numpy()
    vt = ex.loc[ex["lang"] == "en", "b"].value_counts()
    n_tgt[vt.index.to_numpy()] = vt.to_numpy()
    lw = (np.log((n_tgt + 1) / (n_tgt.sum() + 256))
          - np.log((n_raw + 1) / (n_raw.sum() + 256)))
    ex["lw"] = lw[ex["b"].to_numpy()]
    ref = (ex.groupby("doc_id")["lw"].sum().round(6)
           .sort_values(ascending=False))
    ref = ref.reset_index().sort_values(
        ["lw", "doc_id"], ascending=[False, True]).head(20)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    np.testing.assert_allclose(got["logweight"].to_numpy(),
                               ref["lw"].to_numpy(), atol=1e-6)


def test_bigram_frame_exact():
    from butteraugli_ray.pipelines.queries import _bigram_frame
    df = pd.DataFrame({"doc_id": [1, 2, 3], "source": ["a", "b", "c"],
                       "text": ["x y z", "solo", "p q"]})
    bg = _bigram_frame(df)
    assert list(zip(bg["doc_id"], bg["cur"], bg["nxt"])) == [
        (1, "x", "y"), (1, "y", "z"), (3, "p", "q")]
    assert bg["source"].tolist() == ["a", "a", "c"]
    assert len(_bigram_frame(df.iloc[1:2])) == 0


def test_bigram_perplexity_matches_duckdb(ray_session):
    """Full model parity at sf0.001: Ray train+score equals the DuckDB
    oracle (train and score on the same corpus)."""
    import duckdb
    from butteraugli_ray.pipelines.queries import (ORACLE_SQL,
                                                   q_bigram_perplexity)
    sf = "/root/testdata/sf0.001"
    got = q_bigram_perplexity(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ref = con.execute(ORACLE_SQL["bigram_perplexity"]).df()
    assert got["source"].tolist() == ref["source"].tolist()
    assert got["n_docs"].tolist() == ref["n_docs"].astype("int64").tolist()
    assert got["n_high"].tolist() == ref["n_high"].astype("int64").tolist()
    np.testing.assert_allclose(got["avg_ppl"], ref["avg_ppl"], atol=1e-4)


def test_semdedup_matches_naive(ray_session):
    """Distributed SemDeDup == naive single-process implementation on
    synthetic clustered vectors with planted near-duplicates."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import semdedup
    rng = np.random.default_rng(11)
    cent = rng.normal(size=(3, 8))
    base = rng.normal(size=(60, 8)) * 0.05 + cent[rng.integers(0, 3, 60)]
    # plant near-dups: 15 rows are tiny perturbations of earlier rows
    dup = base[:15] + rng.normal(size=(15, 8)) * 1e-3
    x = np.vstack([base, dup])
    ids = np.arange(len(x), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(x)}))
    got = (semdedup(ds, cent, threshold=0.95).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    # naive reference
    d2 = ((x * x).sum(1)[:, None] - 2 * (x @ cent.T)
          + (cent * cent).sum(1)[None, :])
    a = np.argmin(d2, 1)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    kept = np.zeros(len(x), dtype=bool)
    for c in range(3):
        idx = np.where(a == c)[0]
        if not len(idx):
            continue
        cv = cent[c] / np.linalg.norm(cent[c])
        simc = xn[idx] @ cv
        order = idx[np.lexsort((ids[idx], simc))]
        ki: list = []
        for i in order:
            if not ki or (xn[ki] @ xn[i]).max() <= 0.95:
                ki.append(i)
                kept[i] = True
    assert got["kept"].to_numpy().tolist() == kept.tolist()
    assert got["cluster"].to_numpy().tolist() == a.tolist()
    # the planted dups actually got removed
    assert (~kept[60:]).sum() + (~kept[:15]).sum() >= 15


def test_semdedup_hot_cluster_cap(ray_session):
    """max_cluster ENFORCED: one planted mega-cluster (> cap) must be
    sub-split by hyperplane sign buckets — planted exact duplicates
    (same sign bucket by construction) are still removed, and every
    small cluster's output is identical to the uncapped run."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import semdedup
    rng = np.random.default_rng(23)
    cent = rng.normal(size=(2, 8))
    # mega cluster: 300 points near cent[0] (cap 64 → 3 hyperplane bits)
    mega = cent[0] + rng.normal(size=(300, 8)) * 0.05
    mega[150:] = mega[:150]            # 150 planted EXACT duplicates
    small = cent[1] + rng.normal(size=(40, 8)) * 0.05
    x = np.vstack([mega, small])
    ids = np.arange(len(x), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(x)}))
    capped = (semdedup(ds, cent, threshold=0.999, max_cluster=64)
              .to_pandas().sort_values("vec_id").reset_index(drop=True))
    # exact duplicates share the sign bucket → never BOTH kept (a pair
    # may also both drop when near a third kept point at this threshold)
    k = capped["kept"].to_numpy()
    assert not (k[:150] & k[150:300]).any()
    assert k[:300].sum() <= 150
    # small cluster identical to the uncapped run
    ds2 = rd.from_pandas(pd.DataFrame({"vec_id": ids, "embedding": list(x)}))
    uncapped = (semdedup(ds2, cent, threshold=0.999, max_cluster=10**9)
                .to_pandas().sort_values("vec_id").reset_index(drop=True))
    m = capped["cluster"].to_numpy() == 1
    assert (capped.loc[m, "kept"].to_numpy()
            == uncapped.loc[m, "kept"].to_numpy()).all()


def test_cascade_reason_edges():
    """cascade_reason (pure pandas, no Ray): dup beats every other
    reason; empty/short text → too_short; NaN text handled."""
    from butteraugli_ray.pipelines.queries import cascade_reason
    long_good = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda mu nu xi omicron pi rho sigma tau")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["s"] * 5,
        "text": [long_good,            # kept
                 long_good,            # exact dup of doc 1 (higher id)
                 "",                   # too_short
                 None,                 # too_short (NaN)
                 "abcdefgh " * 30],    # repetitive (top_frac = 1.0;
                                       # alpha 8/9 > 0.813 so the
                                       # low_alpha rule doesn't fire
                                       # first)
    })
    import hashlib
    h = hashlib.md5(long_good.lower().encode()).hexdigest()
    reasons = cascade_reason(df, {h: 1})
    assert reasons.tolist() == ["kept", "exact_dup", "too_short",
                                "too_short", "repetitive"]


def test_exact_dedup_library_functions(ray_session):
    """dedup_exact keeps exactly one min-id row per distinct text
    (rows never shuffle — broadcast keep-table filter); exact_dup_groups
    lists every duplicated hash with sorted member ids."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import dedup_exact, exact_dup_groups
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["aa", "bb", "aa", "cc", "bb", "aa"]})
    ds = rd.from_pandas(df).repartition(3)

    kept = dedup_exact(ds).to_pandas().sort_values("doc_id")
    assert kept["doc_id"].tolist() == [1, 2, 4]
    assert sorted(kept["text"]) == ["aa", "bb", "cc"]

    groups = (exact_dup_groups(ds).to_pandas()
              .sort_values("keep_id").reset_index(drop=True))
    assert groups["n_dups"].tolist() == [3, 2]
    assert groups["keep_id"].tolist() == [1, 2]
    assert [sorted(v) for v in groups["dup_ids"]] == [[3, 6], [5]]


def test_rolling_fingerprint_query_matches_naive(ray_session):
    """The bucketed distinct-count shape == naive pandas nunique."""
    import pyarrow.parquet as pq
    from butteraugli_ray.functions import text as T
    from butteraugli_ray.pipelines.queries import q_rolling_fingerprint
    sf = "/root/testdata/sf0.001"
    got = q_rolling_fingerprint(sf)
    df = pq.read_table(f"{sf}/documents.parquet",
                       columns=["source", "text"]).to_pandas()
    df["fp"] = T.rolling_fingerprint(df["text"]).astype("int64")
    want = (df.groupby("source")["fp"].nunique()
            .rename("n_distinct_fp").reset_index()
            .sort_values("source").reset_index(drop=True))
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_distinct_fp"].tolist() == want["n_distinct_fp"].tolist()


def test_actor_pool_spec_autoscales(ray_session):
    """Every stateful stage must request an autoscaling (1, n) pool: a
    fixed pool >= the cluster CPU count starves its own downstream
    shuffle (measured deadlock: minhash verify under num_cpus=4 with a
    fixed 4-actor bander pool)."""
    import ray
    from butteraugli_ray.functions.pool import actor_pool
    cap = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
    assert actor_pool(4) == min(4, cap)
    assert actor_pool(None) == min(4, cap)
    assert actor_pool(1) == 1
    assert actor_pool(64) == cap          # never >= cluster CPUs
    assert actor_pool((2, 8)) == (2, 8)   # explicit floors pass through


def _lev_ref(a: str, b: str) -> int:
    """Textbook O(|a||b|) scalar DP over utf-8 bytes."""
    a, b = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[len(b)]


def test_levenshtein_batch_matches_scalar_dp():
    """Vectorized prefix-min DP == textbook DP on adversarial pairs:
    empties, equal, disjoint, transposes, prefixes, non-ASCII bytes,
    plus a seeded random sweep of length-skewed pairs."""
    from butteraugli_ray.functions.dedup import levenshtein_batch
    cases = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("kitten", "sitting"), ("flaw", "lawn"), ("ab", "ba"),
             ("abcdef", "abc"), ("abc", "abcdef"), ("aaaa", "aabaa"),
             ("résumé", "resume"), ("xyz", "pqr")]
    rng = np.random.default_rng(11)
    alpha = "abcde"
    for _ in range(60):
        la, lb = rng.integers(0, 12, size=2)
        cases.append(("".join(rng.choice(list(alpha), la)),
                      "".join(rng.choice(list(alpha), lb))))
    got = levenshtein_batch([a for a, _ in cases], [b for _, b in cases])
    want = np.array([_lev_ref(a, b) for a, b in cases], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_edit_distance_pairs_matches_bruteforce(ray_session):
    """End-to-end one-shuffle similarity join == all-pairs scalar DP on
    a planted corpus mixing near-dups (1-2 edits), exact dups, short
    strings (the length-band path) and unrelated keys."""
    import itertools
    import ray
    from butteraugli_ray.functions.dedup import edit_distance_pairs
    base = ["the quick brown fox jumps", "pack my box with jugs",
            "sphinx of black quartz", "ab", "a", ""]
    rows = []
    for i, t in enumerate(base):
        rows.append((i * 10, t))
        rows.append((i * 10 + 1, t[:-1] if t else "x"))      # 1 edit
        rows.append((i * 10 + 2, ("z" + t[1:]) if len(t) > 1 else t + "q"))
    df = pd.DataFrame({"doc_id": [r[0] for r in rows],
                       "text": [r[1] for r in rows]})
    got = (edit_distance_pairs(ray.data.from_pandas(df), d_max=2, q=3,
                               n_buckets=4)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = []
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        d = _lev_ref(ta, tb)
        if d <= 2:
            want.append((min(ia, ib), max(ia, ib), d))
    want = (pd.DataFrame(want, columns=["id_a", "id_b", "dist"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_json_scalar_int64_fast_path_and_fallback():
    """Regex fast path and json.loads fallback agree: ints extract,
    floats/strings/bools/missing/malformed all yield <NA>, negative
    and multi-key objects work, and the no-NaN output is Int64."""
    s = pd.Series(['{"k": 69}', '{"k":-3, "z": 1}', '{"z": 1, "k": 7}',
                   '{"z": 1}', "not json", None, '{"k": "12"}',
                   '{"k": 2.5}', '{"k": true}', '{"k": 25e3}', "{}",
                   '{ "k" : 0 }'])
    got = T.json_scalar_int64(s, "k")
    assert got.dtype.name == "Int64"
    assert got.tolist() == [69, -3, 7, pd.NA, pd.NA, pd.NA, pd.NA,
                            pd.NA, pd.NA, pd.NA, pd.NA, 0]


def test_phash_brute_force_parity(ray_session):
    """Distributed pHash pigeonhole pairing == driver brute-force
    all-pairs Hamming at max_hamming=3 (pigeonhole GUARANTEES one of
    four 16-bit chunks collides at <=3 bit flips), and the hash is
    deterministic with hamming(self)=0."""
    import ray.data as rd
    from butteraugli_ray.functions.dedup import (
        fingerprint_candidate_pairs, hamming64)
    from butteraugli_ray.pipelines.queries import _phash_media_source
    from butteraugli_ray.stages.media import PHasher

    src = _phash_media_source()
    ph = PHasher()
    fps = {int(m.as_py()): ph.phash(p.as_py(), "raw", int(w.as_py()),
                                    int(h.as_py()))
           for m, p, w, h in zip(src["media_id"], src["payload"],
                                 src["width"], src["height"])}
    # determinism + self-identity
    m0 = int(src["media_id"][0].as_py())
    p0 = src["payload"][0].as_py()
    w0, h0 = int(src["width"][0].as_py()), int(src["height"][0].as_py())
    assert ph.phash(p0, "raw", w0, h0) == fps[m0]

    ids = sorted(fps)
    want = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = int(hamming64(np.array([fps[a]], dtype=np.uint64),
                              np.array([fps[b]], dtype=np.uint64))[0])
            if d <= 3:
                want.append((a, b, d))
    want = (pd.DataFrame(want, columns=["id_a", "id_b", "hamming"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    hashed = rd.from_arrow(src).map_batches(
        PHasher, batch_format="pyarrow", concurrency=(1, 2))
    got = (fingerprint_candidate_pairs(hashed, max_hamming=3,
                                       id_col="media_id")
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_near_dup_keep_best_join_fallback_parity(ray_session):
    """Above driver_cap the keep-best selection must switch to the
    partitioned-join + label-bucket path and return the identical
    per-family table (the node table never lands on the driver)."""
    import pandas as pd
    from butteraugli_ray.pipelines.queries import q_near_dup_keep_best
    a = q_near_dup_keep_best("/root/testdata/sf0.001")
    b = q_near_dup_keep_best("/root/testdata/sf0.001", driver_cap=0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)
