"""Golden-score parity: the numpy metric vs C++ butteraugli_main scores
(the reference's own gate: 0.1% relative, reference_parity.rs:35).

The full 908-case sweep takes ~35 s; the default test covers a stratified
subset across every pattern family and size class.  Set
BUTTERAUGLI_FULL_GOLDEN=1 to run all 908.
"""

import json
import os

import numpy as np
import pytest

from butteraugli_ray.corpus.generators import generate_image_pair
from butteraugli_ray.metric.api import ButteraugliParams, butteraugli_srgb
from butteraugli_ray.metric.precompute import ReferencePrecompute

FIXTURE = os.path.join(os.path.dirname(__file__), "..",
                       "butteraugli_ray", "fixtures", "golden_cases.json")
TOLERANCE = 1e-3


def _cases():
    with open(FIXTURE) as f:
        cases = json.load(f)
    if os.environ.get("BUTTERAUGLI_FULL_GOLDEN"):
        return cases
    # stratified subset: every 11th case (≈83 cases, all families)
    return cases[::11]


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["name"])
def test_golden_score(case):
    pair = generate_image_pair(case["name"], case["width"], case["height"])
    assert pair is not None, f"generator missing for {case['name']}"
    r = butteraugli_srgb(pair[0], pair[1])
    rel = abs(r.score - case["expected_score"]) / max(case["expected_score"], 1e-12)
    assert rel < TOLERANCE, (
        f"{case['name']}: got {r.score}, expected {case['expected_score']} "
        f"(rel {rel:.2e})")


@pytest.mark.parametrize("case", _cases()[::5], ids=lambda c: c["name"])
def test_diffmap_stats_match_reference(case):
    """Diffmap min/max/mean vs the Rust regression fixtures
    (tests/common/reference_data.rs stats).  std is skipped when the
    diffmap is near-constant (std/mean < 1e-3): there it measures pure
    float rounding noise, which legitimately differs between
    implementations."""
    pair = generate_image_pair(case["name"], case["width"], case["height"])
    r = butteraugli_srgb(pair[0], pair[1],
                         ButteraugliParams(compute_diffmap=True))
    dm = r.diffmap
    s = case["stats"]
    for key, got in (("min", float(dm.min())), ("max", float(dm.max())),
                     ("mean", float(dm.mean()))):
        assert got == pytest.approx(s[key], rel=3e-3, abs=1e-6), key
    if s["mean"] > 0 and s["std"] / s["mean"] > 1e-3:
        assert float(dm.std()) == pytest.approx(s["std"], rel=2e-2, abs=1e-6)


def test_identical_pair_scores_zero():
    a, _ = generate_image_pair("checkerboard_vs_inverse_1px_32x32", 32, 32)
    r = butteraugli_srgb(a, a.copy())
    assert r.score < 1e-3 and r.pnorm_3 < 1e-3


def test_symmetry():
    # conformance.rs:214-247: |s(a,b) − s(b,a)| < 0.1·s + 0.01 — holds for
    # noise/shift distortions (blur pairs are asymmetric BY DESIGN via
    # l2_diff_asymmetric, diff.rs:185-225)
    for name in ("random_seed0_noise_20_32x32", "gradient_diag_shift_10_32x32"):
        a, b = generate_image_pair(name, 32, 32)
        s1 = butteraugli_srgb(a, b).score
        s2 = butteraugli_srgb(b, a).score
        assert abs(s1 - s2) < 0.1 * s1 + 0.01, name


def test_warm_precompute_matches_oneshot():
    a, b = generate_image_pair("gradient_diag_shift_10_32x32", 32, 32)
    one = butteraugli_srgb(a, b)
    pre = ReferencePrecompute(a)
    warm = pre.compare_srgb(b)
    assert warm.score == pytest.approx(one.score, rel=1e-6)
    assert warm.pnorm_3 == pytest.approx(one.pnorm_3, rel=1e-6)


def test_param_validation():
    a, b = generate_image_pair("uniform_gray_128_shift_5_8x8", 8, 8)
    for bad in [ButteraugliParams(hf_asymmetry=0.0),
                ButteraugliParams(hf_asymmetry=float("nan")),
                ButteraugliParams(intensity_target=-1.0),
                ButteraugliParams(xmul=-0.1)]:
        with pytest.raises(ValueError):
            butteraugli_srgb(a, b, bad)


def test_pnorm_uniform_diffmap():
    # lib.rs:1344-1392: uniform diffmap of v ⇒ pnorm == v for all p
    from butteraugli_ray.metric.kernels import pnorm_slice
    dm = np.full((16, 16), 0.7, dtype=np.float32)
    for p in (2.0, 3.0, 4.0):
        assert pnorm_slice(dm, p) == pytest.approx(0.7, rel=1e-6)


def test_sub8_padding_and_crop():
    a, b = generate_image_pair("uniform_gray_128_shift_5_8x8", 8, 8)
    r = butteraugli_srgb(a[:3, :5], b[:3, :5],
                         ButteraugliParams(compute_diffmap=True))
    assert r.diffmap.shape == (3, 5)
    assert np.isfinite(r.score)


def test_nonfinite_rejected():
    from butteraugli_ray.metric.api import butteraugli_linear
    rng = np.random.default_rng(0)
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = a.copy()
    b[0, 0, 0] = np.inf
    with pytest.raises(FloatingPointError):
        butteraugli_linear(a, b)


def test_score_partials_merge_associative():
    # strip.rs:127-209: partial states merge to the single-pass result
    from butteraugli_ray.metric import kernels as K
    rng = np.random.default_rng(1)
    dm = (rng.random((40, 40)) * 3).astype(np.float32)
    whole = K.diffmap_partials(dm)
    parts = [K.diffmap_partials(dm[:13]), K.diffmap_partials(dm[13:29]),
             K.diffmap_partials(dm[29:])]
    merged = K.merge_partials(parts)
    assert merged["pixels"] == whole["pixels"]
    assert merged["max"] == whole["max"]
    assert merged["sum_p3"] == pytest.approx(whole["sum_p3"], rel=1e-12)
    s_m, p_m = K.finalize_partials(merged)
    s_w, p_w = K.finalize_partials(whole)
    assert s_m == s_w and p_m == pytest.approx(p_w, rel=1e-12)


class TestBatchedParamsParity:
    """The batched path must honor non-default ButteraugliParams exactly
    like the one-shot path (lib.rs:375-381 params reach every compare)."""

    PARAMS = ButteraugliParams(hf_asymmetry=2.0, xmul=0.5,
                               intensity_target=120.0)

    def _pairs(self, n=3, w=32, h=32):
        from butteraugli_ray.corpus.generators import (distort_noise,
                                                       gen_random_midrange)
        a = np.stack([gen_random_midrange(w, h, 5 + i) for i in range(n)])
        b = np.stack([distort_noise(a[i], 6 + i, 12) for i in range(n)])
        return a, b

    def test_batch_matches_oneshot_nondefault(self):
        from butteraugli_ray.metric.api import butteraugli_srgb_batch
        a, b = self._pairs()
        sc, pn = butteraugli_srgb_batch(a, b, self.PARAMS)
        for i in range(len(a)):
            r = butteraugli_srgb(a[i], b[i], self.PARAMS)
            assert sc[i] == pytest.approx(r.score, rel=1e-6)
            assert pn[i] == pytest.approx(r.pnorm_3, rel=1e-6)
        # and the params actually change the result vs defaults
        sc_def, _ = butteraugli_srgb_batch(a, b)
        assert not np.allclose(sc, sc_def)

    def test_media_scorer_honors_params(self, ray_session):
        import pyarrow as pa
        from butteraugli_ray.stages.scorer import MediaScorer
        a, b = self._pairs(n=2)
        batch = pa.table({
            "media_ref": pa.array([f"m{i}" for i in range(2)]),
            "width": pa.array([32, 32]), "height": pa.array([32, 32]),
            "ref_rgb": pa.array([a[i].tobytes() for i in range(2)], pa.binary()),
            "dist_rgb": pa.array([b[i].tobytes() for i in range(2)], pa.binary()),
        })
        got = MediaScorer(params=self.PARAMS)(batch)
        for i in range(2):
            exp = butteraugli_srgb(a[i], b[i], self.PARAMS).score
            assert got["score"][i].as_py() == pytest.approx(exp, rel=1e-6)
        got_def = MediaScorer()(batch)
        assert got["score"][0].as_py() != pytest.approx(
            got_def["score"][0].as_py(), rel=1e-6)


def test_batched_generic_pnorm_matches_oneshot():
    # A2 on the batched path: pnorm_p != 3 must equal the one-shot
    # generic pnorm over the same diffmap (lib.rs:556-577)
    from butteraugli_ray.metric.api import (ButteraugliParams,
                                            butteraugli_srgb,
                                            butteraugli_srgb_batch)
    from butteraugli_ray.corpus.generators import generate_image_pair
    pairs = [generate_image_pair("gradient_h_shift_15", 32, 32),
             generate_image_pair("checkerboard_shift_25", 32, 32)]
    a = np.stack([p[0] for p in pairs])
    b = np.stack([p[1] for p in pairs])
    for p_val in (2.0, 6.0):
        scores, pnorms = butteraugli_srgb_batch(a, b, pnorm_p=p_val)
        params = ButteraugliParams(compute_diffmap=True)
        for i, (ra, rb) in enumerate(pairs):
            one = butteraugli_srgb(ra, rb, params)
            assert scores[i] == pytest.approx(one.score, rel=1e-6)
            assert pnorms[i] == pytest.approx(one.pnorm(p_val), rel=1e-6)
    # p = 3 still routes through the fused fast path and agrees
    scores3, pnorms3 = butteraugli_srgb_batch(a, b, pnorm_p=3.0)
    for i, (ra, rb) in enumerate(pairs):
        one = butteraugli_srgb(ra, rb)
        assert pnorms3[i] == pytest.approx(one.pnorm_3, rel=1e-6)


def test_media_scorer_diffmap_stats():
    import pyarrow as pa
    from butteraugli_ray.metric.api import ButteraugliParams
    from butteraugli_ray.stages.scorer import MediaScorer
    from butteraugli_ray.corpus.generators import generate_image_pair
    pairs = [generate_image_pair("gradient_h_shift_15", 32, 32),
             generate_image_pair("checkerboard_shift_25", 32, 32)]
    batch = pa.table({
        "media_ref": pa.array(["m0", "m1"]),
        "width": pa.array([32, 32]), "height": pa.array([32, 32]),
        "ref_rgb": pa.array([p[0].tobytes() for p in pairs], pa.binary()),
        "dist_rgb": pa.array([p[1].tobytes() for p in pairs], pa.binary()),
    })
    got = MediaScorer(emit_diffmap_stats=True)(batch)
    assert {"diffmap_max", "diffmap_mean", "diffmap_p99"} <= set(got.column_names)
    for i, (a, b) in enumerate(pairs):
        r = butteraugli_srgb(a, b, ButteraugliParams(compute_diffmap=True))
        dm = r.diffmap.astype(np.float64)
        assert got["diffmap_max"][i].as_py() == pytest.approx(dm.max(), rel=1e-6)
        assert got["diffmap_mean"][i].as_py() == pytest.approx(dm.mean(), rel=1e-6)
        assert got["diffmap_p99"][i].as_py() == pytest.approx(
            np.quantile(dm.ravel(), 0.99), rel=1e-5)
    # default stays stats-free (schema unchanged for existing consumers)
    assert "diffmap_max" not in MediaScorer()(batch).column_names
