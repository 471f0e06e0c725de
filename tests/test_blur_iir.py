"""IIR recursive Gaussian (blur_iir.rs analog) — mirrors the
reference's own blur_iir.rs:552-631 test suite plus an FIR-vs-IIR
score-deviation gate on real-corpus-shaped inputs."""

import numpy as np
import pytest

from butteraugli_ray.metric import kernels as K
from butteraugli_ray.metric.blur_iir import (
    _iir_pass_rows, gaussian_blur_iir, iir_coeffs)

SIGMAS = [1.564, 2.7, 3.225, 7.156]


def test_iir_horizontal_impulse_dc_gain():
    # blur_iir.rs:557-577
    for sigma in SIGMAS:
        radius, mi, mp = iir_coeffs(sigma)
        x = np.zeros((1, 256), np.float32)
        x[0, 128] = 1.0
        out = _iir_pass_rows(np.ascontiguousarray(x.T), radius, mi, mp).T
        s = float(out.sum())
        assert abs(s - 1.0) < 0.01, f"sigma={sigma}: impulse sum {s}"
        assert int(np.argmax(out[0])) == 128


def test_iir_2d_impulse_dc_gain():
    # blur_iir.rs:580-592
    for sigma in SIGMAS:
        img = np.zeros((128, 128), np.float32)
        img[64, 64] = 1.0
        s = float(gaussian_blur_iir(img, sigma).sum())
        assert abs(s - 1.0) < 0.02, f"sigma={sigma}: 2D impulse sum {s}"


def test_iir_deterministic():
    # blur_iir.rs:595-618 (stride repro → determinism contract)
    img = np.zeros((24, 24), np.float32)
    img[12, 12] = 1.0
    b1 = gaussian_blur_iir(img, 2.7)
    b2 = gaussian_blur_iir(img, 2.7)
    np.testing.assert_allclose(b1, b2, atol=1e-6)


def test_iir_dc_constant_center():
    # blur_iir.rs:621-630
    img = np.full((64, 64), 0.5, np.float32)
    c = float(gaussian_blur_iir(img, 2.7)[32, 32])
    assert abs(c - 0.5) < 1e-3


def test_iir_batch_matches_single():
    rng = np.random.default_rng(7)
    planes = rng.random((3, 40, 56), np.float32)
    batched = gaussian_blur_iir(planes, 3.225)
    for i in range(3):
        single = gaussian_blur_iir(planes[i], 3.225)
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_iir_interior_close_to_fir():
    # Interior pixels (≥2N from the border, away from zero-pad effects)
    # should agree with the renormalized FIR to ~1% of dynamic range on
    # a smooth signal.
    rng = np.random.default_rng(11)
    img = rng.random((96, 96)).astype(np.float32)
    img = K.gaussian_blur(img, 2.0)  # pre-smooth
    for sigma in [1.564, 3.225]:
        fir = K.gaussian_blur(img, sigma)
        iir = gaussian_blur_iir(img, sigma)
        n = iir_coeffs(sigma)[0]
        m = 2 * n
        diff = np.abs(fir[m:-m, m:-m] - iir[m:-m, m:-m])
        assert float(diff.max()) < 0.01 * float(img.max()), \
            f"sigma={sigma}: interior max diff {diff.max()}"


def test_iir_mode_score_deviation_small():
    # End-to-end: scores under set_blur_mode("iir") deviate from FIR by
    # only a few percent (the reference documents 0.1-5% on real
    # photos; synthetic small images are the adversarial case, so gate
    # loosely) and the mode always restores.
    from butteraugli_ray.corpus.generators import generate_image_pair
    from butteraugli_ray.metric import butteraugli_srgb
    a, b = generate_image_pair("gradient_h_shift_8", 64, 64)
    fir_score = butteraugli_srgb(a, b).score
    K.set_blur_mode("iir")
    try:
        iir_score = butteraugli_srgb(a, b).score
    finally:
        K.set_blur_mode("fir")
    assert np.isfinite(iir_score) and iir_score > 0
    rel = abs(iir_score - fir_score) / fir_score
    assert rel < 0.25, f"IIR score {iir_score} vs FIR {fir_score} ({rel:.1%})"
    # mode restored: score is the FIR one again
    assert butteraugli_srgb(a, b).score == pytest.approx(fir_score)


def test_set_blur_mode_rejects_unknown():
    with pytest.raises(ValueError):
        K.set_blur_mode("firr")
