"""Property-based tests (hypothesis) — the engine's analog of the
reference's proptest fuzz suite (tests/cpp_fuzz.rs, SURVEY.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from butteraugli_ray.corpus.generators import (distort_noise,
                                               gen_random_midrange, lcg_stream)
from butteraugli_ray.functions.sketches import (FixedHistogram, HyperLogLog,
                                                TDigest)
from butteraugli_ray.metric import kernels as K
from butteraugli_ray.metric.api import butteraugli_srgb, reflect_index


class TestLcg:
    @given(st.integers(min_value=0, max_value=2**64 - 1),
           st.integers(min_value=1, max_value=300))
    @settings(max_examples=30, deadline=None)
    def test_stream_prefix_consistent(self, seed, n):
        # streaming in one call == reference scalar recurrence
        full = lcg_stream(seed, n)
        state = seed
        for i in range(n):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            assert full[i] == (state >> 33) & 0xFF


class TestReflectPad:
    @given(st.integers(min_value=1, max_value=40),
           st.integers(min_value=0, max_value=200))
    @settings(max_examples=50, deadline=None)
    def test_reflect_index_in_range_and_identity(self, n, i):
        j = int(reflect_index(np.array([i]), n)[0])
        assert 0 <= j < n
        if i < n:
            assert j == i          # original samples land in place


class TestScoreInvariants:
    @given(st.integers(min_value=8, max_value=24),
           st.integers(min_value=8, max_value=24),
           st.integers(min_value=0, max_value=2**32))
    @settings(max_examples=8, deadline=None)
    def test_identical_zero_and_finite(self, w, h, seed):
        a = gen_random_midrange(w, h, seed)
        assert butteraugli_srgb(a, a.copy()).score == 0.0
        b = distort_noise(a, seed + 1, 10)
        r = butteraugli_srgb(a, b)
        assert np.isfinite(r.score) and r.score >= 0.0
        assert np.isfinite(r.pnorm_3) and r.pnorm_3 <= r.score + 1e-6

    def test_noise_monotonicity(self):
        # conformance-style: more distortion ⇒ higher score
        a = gen_random_midrange(32, 32, 9)
        scores = [butteraugli_srgb(a, distort_noise(a, 10, amp)).score
                  for amp in (4, 16, 48)]
        assert scores[0] < scores[1] < scores[2]

    @given(st.floats(min_value=0.01, max_value=10.0),
           st.floats(min_value=1.5, max_value=6.0))
    @settings(max_examples=20, deadline=None)
    def test_pnorm_uniform_identity(self, v, p):
        dm = np.full((12, 12), v, dtype=np.float32)
        assert K.pnorm_slice(dm, p) == pytest.approx(v, rel=1e-5)


class TestSketchProperties:
    @given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=200))
    @settings(max_examples=25, deadline=None)
    def test_hll_merge_commutes_and_bounds(self, vals):
        half = len(vals) // 2
        a = HyperLogLog().add(vals[:half] or ["x"])
        b = HyperLogLog().add(vals[half:] or ["y"])
        assert np.array_equal(a.merge(b).registers, b.merge(a).registers)
        # estimate of distinct count is sane for small sets
        whole = HyperLogLog().add(vals)
        assert whole.estimate() <= len(vals) * 1.5 + 5

    @given(st.lists(st.floats(min_value=-100, max_value=100,
                              allow_nan=False), min_size=2, max_size=300))
    @settings(max_examples=25, deadline=None)
    def test_tdigest_quantile_within_range(self, vals):
        td = TDigest().add(np.array(vals))
        for q in (0.0, 0.5, 1.0):
            est = td.quantile(q)
            assert min(vals) - 1e-6 <= est <= max(vals) + 1e-6

    @given(st.lists(st.floats(min_value=-50, max_value=50,
                              allow_nan=False), min_size=0, max_size=200),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=25, deadline=None)
    def test_histogram_partition_invariance(self, vals, k):
        arr = np.array(vals, dtype=np.float64)
        whole = FixedHistogram(-10, 10, 16).add(arr)
        parts = FixedHistogram(-10, 10, 16)
        for chunk in np.array_split(arr, k):
            parts = parts.merge(FixedHistogram(-10, 10, 16).add(chunk))
        assert np.array_equal(whole.counts, parts.counts)
        assert whole.n_under == parts.n_under and whole.n_over == parts.n_over


class TestTextCurationProperties:
    @given(st.lists(st.lists(st.sampled_from("abc xy z".split()),
                             min_size=0, max_size=12),
                    min_size=0, max_size=20),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=30, deadline=None)
    def test_ngram_frame_matches_naive(self, docs, n):
        import pandas as pd
        from butteraugli_ray.pipelines.queries import _ngram_frame
        ids = pd.Series(range(len(docs)), dtype="int64")
        got = _ngram_frame(ids, pd.Series(docs, dtype=object), n)
        want = [(i, p, " ".join(d[p:p + n]))
                for i, d in enumerate(docs)
                for p in range(len(d) - n + 1)]
        assert list(zip(got["id"], got["pos"], got["gram"])) == want

    @given(st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=50),
        min_size=1, max_size=12),
        st.integers(min_value=1, max_value=6))
    @settings(max_examples=30, deadline=None)
    def test_bpe_merge_counts_nonincreasing(self, wf, k):
        from butteraugli_ray.functions.text import bpe_train
        m = bpe_train(wf, k)
        counts = [c for _, _, _, _, c in m]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        # every merge count is at most the total symbol mass
        total = sum((len(w) + 1) * n for w, n in wf.items())
        assert all(0 < c <= total for c in counts)


class TestStructuralProperties:
    @given(st.integers(min_value=1, max_value=200),
           st.integers(min_value=0, max_value=10**6))
    @settings(max_examples=15, deadline=None)
    def test_synth_deterministic(self, n_docs, seed):
        from butteraugli_ray.corpus.synth import build_documents
        t1, g1 = build_documents(n_docs, seed=seed, violation_rate=0.05)
        t2, g2 = build_documents(n_docs, seed=seed, violation_rate=0.05)
        assert t1.equals(t2) and g1 == g2


class TestSamplingAndEncodeProperties:
    @given(st.lists(st.text(min_size=0, max_size=8), min_size=1,
                    max_size=40),
           st.integers(min_value=2, max_value=512))
    def test_md5_bucket_range_and_determinism(self, toks, nb):
        import pandas as pd
        from butteraugli_ray.functions.text import md5_bucket
        s = pd.Series(toks)
        a = md5_bucket(s, nb)
        b = md5_bucket(s, nb)
        assert (a == b).all()
        assert ((a >= 0) & (a < nb)).all()
        # equal tokens always land in the same bucket
        if len(toks) >= 2 and toks[0] == toks[1]:
            assert a[0] == a[1]

    @given(st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=1, max_size=50, unique=True),
           st.floats(min_value=1.0, max_value=1e6))
    def test_es_sample_key_deterministic_and_monotone_in_weight(
            self, keys, w):
        import numpy as np
        import pandas as pd
        from butteraugli_ray.functions.sampling import es_sample_key
        s = pd.Series(keys)
        ws = np.full(len(keys), w)
        a = es_sample_key(s, ws)
        assert (a == es_sample_key(s, ws)).all()
        assert (a <= 0).all()            # ln(u)/w with u in (0,1]
        # doubling every weight moves every key toward 0 (higher rank)
        b = es_sample_key(s, ws * 2.0)
        assert (b >= a).all()

    @given(st.dictionaries(st.text(alphabet="abcdef", min_size=1,
                                   max_size=6),
                           st.integers(min_value=1, max_value=9),
                           min_size=1, max_size=12),
           st.integers(min_value=0, max_value=10))
    def test_bpe_encode_invariants(self, wf, k):
        from butteraugli_ray.functions.text import bpe_encode, bpe_train
        merges = bpe_train(wf, k)
        words = sorted(wf)
        enc = bpe_encode(words, merges)
        for w, sym in zip(words, enc):
            # concatenating symbols reproduces word + </w>
            assert "".join(sym) == w + "</w>"
            # never longer than the unmerged form
            assert len(sym) <= len(w) + 1
        # zero merges → raw characters
        assert all(len(s) == len(w) + 1
                   for w, s in zip(words, bpe_encode(words, [])))


class TestPairsWithinGroups:
    @given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                              st.integers(min_value=0, max_value=40)),
                    min_size=0, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_matches_bruteforce(self, rows):
        """Vectorized triu pair emission (the wedge/candidate-pair
        primitive behind minhash, simhash, and triangle counting) ==
        itertools brute force per group, ORDER-INSENSITIVE input."""
        import itertools
        import pandas as pd
        from butteraugli_ray.functions.dedup import pairs_within_groups
        df = pd.DataFrame(rows, columns=["g", "doc_id"])
        got = pairs_within_groups(df, "g")
        got_set = set(zip(got["id_a"], got["id_b"]))
        exp = set()
        for _, grp in df.drop_duplicates().groupby("g"):
            for a, b in itertools.combinations(
                    sorted(grp["doc_id"].unique()), 2):
                exp.add((a, b))
        assert got_set == exp
        assert len(got) == len(exp)          # no duplicate pair rows
        if len(got):
            assert (got["id_a"] < got["id_b"]).all()
