"""Numpy kernels for the butteraugli perceptual metric.

A from-scratch vectorized reimplementation of the transform semantics of
imazen/butteraugli v0.9.4 (itself parity-tested against libjxl's C++
butteraugli to <0.001% relative).  Constants and formulas are taken
verbatim from the reference (cited per function as file:line under
/root/reference/butteraugli/src/); the execution strategy is entirely
different: whole-plane float32 numpy array operations instead of
scalar/SIMD row loops, designed to run inside Ray Data ``map_batches``
UDFs where cross-image parallelism is supplied by the Ray streaming
executor rather than rayon fork-join.

All planes are ``float32 [h, w]`` numpy arrays; images are
``float32 [3, h, w]`` (planar RGB / XYB).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

# ---------------------------------------------------------------------------
# Constants (consts.rs:13-151, opsin.rs:20-44)
# ---------------------------------------------------------------------------

W_MF_MALTA = 37.0819870399
NORM1_MF = 130_262_059.556
W_MF_MALTA_X = 8246.75321353
NORM1_MF_X = 1_009_002.70582
W_HF_MALTA = 18.7237414387
NORM1_HF = 4_498_534.45232
W_HF_MALTA_X = 6923.99476109
NORM1_HF_X = 8051.15833247
W_UHF_MALTA = 1.10039032555
NORM1_UHF = 71.7800275169
W_UHF_MALTA_X = 173.5
NORM1_UHF_X = 5.0

WMUL = [400.0, 1.50815703118, 0.0, 2150.0, 10.6195433239, 16.2176043152,
        29.2353797994, 0.844626970982, 0.703646627719]

SIGMA_LF = 7.15593339443
SIGMA_HF = 3.22489901262
SIGMA_UHF = 1.56416327805

REMOVE_MF_RANGE = 0.29
ADD_MF_RANGE = 0.1
REMOVE_HF_RANGE = 1.5
ADD_HF_RANGE = 0.132
REMOVE_UHF_RANGE = 0.04
MAXCLAMP_HF = 28.4691806922
MAXCLAMP_UHF = 5.19175294647
MUL_Y_HF = 2.155
MUL_Y_UHF = 2.69313763794

XMUL_LF_TO_VALS = 33.832837186260
YMUL_LF_TO_VALS = 14.458268100570
BMUL_LF_TO_VALS = 49.87984651440
Y_TO_B_MUL_LF_TO_VALS = -0.362267051518

SUPPRESS_XY = 46.0
SUPPRESS_S = 0.653020556257

# consts.rs:115-121 — INTENSITY_TARGET_NORMALIZATION is the f32 literal
# 0.790_799_17 (≈ ln(80)/ln(255)); GLOBAL_SCALE derives from it in f32.
INTENSITY_TARGET_NORMALIZATION = F32(0.79079917)
GLOBAL_SCALE = F32(1.0) / (F32(17.83) * INTENSITY_TARGET_NORMALIZATION)

MASK_MUL = F32(6.19424080439)
MASK_BIAS = F32(12.61050594197)
MASK_RADIUS = 2.7
MASK_TO_ERROR_MUL = F32(10.0)

MASK_Y_OFFSET = 0.829591754942
MASK_Y_SCALER = 0.451936922203
MASK_Y_MUL = 2.5485944793
MASK_DC_Y_OFFSET = 0.20025578522
MASK_DC_Y_SCALER = 3.87449418804
MASK_DC_Y_MUL = 0.505054525019

COMBINE_CHANNELS_MULS = (F32(2.5), F32(0.4), F32(0.4))

# Opsin absorbance matrix + biases (opsin.rs:20-37)
MIXI = [0.29956550340058319, 0.63373087833825936, 0.077705617820981968,
        1.7557483643287353,
        0.22158691104574774, 0.69391388044116142, 0.0987313588422,
        1.7557483643287353,
        0.02, 0.02, 0.20480129041026129, 12.226454707163354]
MIN_01 = F32(1.7557483643287353)
MIN_2 = F32(12.226454707163354)

MIN_SIZE_FOR_MULTIRESOLUTION = 8
MIN_SIZE_FOR_SUBSAMPLE = 15

# ---------------------------------------------------------------------------
# fast_log2f / gamma (opsin.rs:53-112; libjxl fast_math-inl.h FastLog2f)
# ---------------------------------------------------------------------------

_LOG2E_F32 = F32(1.4426950408889634)
_K_INV_LOG2E = F32(1.0) / _LOG2E_F32
_K_RET_MUL = F32(19.245013259874995) * _K_INV_LOG2E
_K_RET_ADD = F32(-23.16046239805755)
_K_GAMMA_BIAS = F32(9.9710635769299145)

_P0 = F32(-1.8503833400518310e-06)
_P1 = F32(1.4287160470083755)
_P2 = F32(7.4245873327820566e-01)
_Q0 = F32(9.9032814277590719e-01)
_Q1 = F32(1.0096718572241148)
_Q2 = F32(1.7409343003366853e-01)


def fast_log2f(x: np.ndarray) -> np.ndarray:
    """Bit-level (2,2) rational-polynomial log2 approximation (opsin.rs:53-86).

    Operates on the float32 bit pattern exactly as the reference does, so
    the approximation error (L1 ~3.9e-6) is reproduced rather than replaced
    by the exact np.log2.
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    x_bits = x.view(np.int32)
    exp_bits = x_bits - np.int32(0x3F2AAAAB)
    exp_shifted = exp_bits >> 23
    mantissa = (x_bits - (exp_shifted << 23)).view(np.float32)
    exp_val = exp_shifted.astype(np.float32)
    m = mantissa - F32(1.0)
    yp = (_P2 * m + _P1) * m + _P0
    yq = (_Q2 * m + _Q1) * m + _Q0
    return yp / yq + exp_val


def gamma(v: np.ndarray) -> np.ndarray:
    """HVS dynamic-range curve (opsin.rs:102-112)."""
    v = np.maximum(v, F32(0.0))
    return _K_RET_MUL * fast_log2f(v + _K_GAMMA_BIAS) + _K_RET_ADD


# ---------------------------------------------------------------------------
# sRGB decode (opsin.rs:309-332)
# ---------------------------------------------------------------------------

def _build_srgb_lut() -> np.ndarray:
    v = np.arange(256, dtype=np.float32) / F32(255.0)
    lo = v / F32(12.92)
    hi = ((v + F32(0.055)) / F32(1.055)) ** F32(2.4)
    return np.where(v <= F32(0.04045), lo, hi).astype(np.float32)


SRGB_TO_LINEAR_LUT = _build_srgb_lut()


def srgb_to_linear_planar(rgb_u8: np.ndarray) -> np.ndarray:
    """u8 [h,w,3] sRGB → f32 [3,h,w] linear (LUT; diff.rs:819-832)."""
    lin = SRGB_TO_LINEAR_LUT[rgb_u8]        # [h,w,3] f32
    return np.ascontiguousarray(np.moveaxis(lin, -1, 0))


# ---------------------------------------------------------------------------
# Blurs (blur.rs)
# ---------------------------------------------------------------------------

def compute_kernel(sigma: float) -> np.ndarray:
    """1-D Gaussian FIR, un-normalized, half-width max(int(2.25σ),1)
    (blur.rs:56-69; note ``as i32`` truncates)."""
    m = 2.25
    scaler = F32(-1.0 / (2.0 * sigma * sigma))
    diff = max(int(m * abs(sigma)), 1)
    i = np.arange(-diff, diff + 1, dtype=np.float32)
    return np.exp(scaler * (i * i)).astype(np.float32)


# Banded convolution matrices, cached per (sigma, length).  out = a @ M
# (or M.T @ a for the vertical pass) computes the truncated-kernel,
# border-renormalized correlation as one BLAS GEMM — far less memory
# traffic than materialized sliding windows, which matters when many
# worker processes share the memory bus.
_BLUR_MATRIX_CACHE: dict = {}
_BLUR_MATRIX_MAX_N = 2048   # dense n×n band matrix cap (16 MiB at f32)


def _blur_matrix(sigma: float, n: int) -> np.ndarray:
    key = (round(float(sigma), 9), n)
    m = _BLUR_MATRIX_CACHE.get(key)
    if m is None:
        kernel = compute_kernel(sigma).astype(np.float64)
        half = len(kernel) // 2
        m64 = np.zeros((n, n), dtype=np.float64)
        for j in range(n):
            lo = max(0, j - half)
            hi = min(n, j + half + 1)
            taps = kernel[lo - j + half:hi - j + half]
            m64[lo:hi, j] = taps / np.float32(taps.astype(np.float32).sum())
        m = m64.astype(np.float32)
        _BLUR_MATRIX_CACHE[key] = m
    return m


def _blur_den(kernel: np.ndarray, n: int) -> np.ndarray:
    """Per-position sum of in-bounds taps (the border renormalizer)."""
    half = len(kernel) // 2
    ones = np.ones(n, dtype=np.float32)
    return np.convolve(ones, kernel, mode="full")[half:half + n].astype(np.float32)


def _blur_shifted(a: np.ndarray, sigma: float, axis: int) -> np.ndarray:
    """Blur along ``axis`` (-1 or -2) via kernel-tap shifted adds over a
    zero-padded copy, then divide by the in-bounds tap sum — O(n·k)
    instead of the dense band GEMM's O(n²); wins for large axes."""
    kernel = compute_kernel(sigma)
    half = len(kernel) // 2
    n = a.shape[axis]
    pad = [(0, 0)] * a.ndim
    pad[axis] = (half, half)
    ap = np.pad(a, pad, mode="constant")
    out = np.zeros_like(a)
    for ki, kv in enumerate(kernel):
        if axis == a.ndim - 1 or axis == -1:
            out += kv * ap[..., ki:ki + n]
        else:
            out += kv * ap[..., ki:ki + n, :]
    den = _blur_den(kernel, n)
    shape = [1] * a.ndim
    shape[axis] = n
    out /= den.reshape(shape)
    return out


# dense band GEMM only for tiny axes; above this the cached blocked
# band GEMM wins (measured: blocked ≤ dense from n≈256, 3x faster at 768)
_BLUR_GEMM_MAX_N = 192


_BLOCKED_CACHE: dict = {}


def _blur_blocks(sigma: float, n: int, block: int = 192):
    """Cached per-block band-matrix slices [(i0, i1, j0, j1, M), ...] —
    O(block·(block+kernel)) memory per block, same border semantics as
    the dense matrix (each M is a column slice of it)."""
    key = (round(float(sigma), 9), n, block)
    blocks = _BLOCKED_CACHE.get(key)
    if blocks is None:
        kernel = compute_kernel(sigma).astype(np.float64)
        half = len(kernel) // 2
        blocks = []
        for j0 in range(0, n, block):
            j1 = min(n, j0 + block)
            i0 = max(0, j0 - half)
            i1 = min(n, j1 - 1 + half + 1)
            m = np.zeros((i1 - i0, j1 - j0), dtype=np.float64)
            for j in range(j0, j1):
                lo = max(0, j - half)
                hi = min(n, j + half + 1)
                taps = kernel[lo - j + half:hi - j + half]
                m[lo - i0:hi - i0, j - j0] = taps / np.float32(
                    taps.astype(np.float32).sum())
            blocks.append((i0, i1, j0, j1, m.astype(np.float32)))
        _BLOCKED_CACHE[key] = blocks
    return blocks


def _blur_h_blocked(a: np.ndarray, sigma: float, block: int = 192) -> np.ndarray:
    """Horizontal blur for wide axes via cached blocked band GEMMs."""
    out = np.empty_like(a)
    for i0, i1, j0, j1, m in _blur_blocks(sigma, a.shape[-1], block):
        out[..., j0:j1] = a[..., i0:i1] @ m
    return out


def _blur_v_blocked(a: np.ndarray, sigma: float, block: int = 192) -> np.ndarray:
    """Vertical blur for tall axes: out[j0:j1] = Mᵀ @ a[i0:i1] — no
    transposes, C-contiguous GEMMs."""
    out = np.empty_like(a)
    for i0, i1, j0, j1, m in _blur_blocks(sigma, a.shape[-2], block):
        out[..., j0:j1, :] = np.matmul(m.T, a[..., i0:i1, :])
    return out


_BLUR_MODE = "fir"   # "fir" (default, golden-parity) | "iir" (Charalampidis)


def set_blur_mode(mode: str) -> None:
    """Select the Gaussian implementation process-wide — the analog of
    the reference's compile-time ``iir-blur`` cargo feature
    (blur.rs:870-877).  "iir" trades golden bit-parity for O(N)
    sigma-independent cost (documented 0.1-5% score deviation)."""
    global _BLUR_MODE
    if mode not in ("fir", "iir"):
        raise ValueError(f"blur mode must be 'fir' or 'iir', got {mode!r}")
    _BLUR_MODE = mode


def gaussian_blur(plane: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian with truncated-renormalized borders
    (blur.rs:866-933: H pass then V pass).

    Batch-aware: ``plane`` may carry leading batch dims ([..., h, w]).
    Axes ≤ _BLUR_MATRIX_MAX_N use a cached dense band matrix (one GEMM);
    larger axes use blocked band GEMMs with bounded memory.
    """
    if sigma <= 0.0:
        return plane.copy()
    if _BLUR_MODE == "iir":
        from .blur_iir import gaussian_blur_iir
        return gaussian_blur_iir(plane, sigma)
    h, w = plane.shape[-2:]
    if w <= _BLUR_GEMM_MAX_N:
        out = plane @ _blur_matrix(sigma, w)           # horizontal pass
    else:
        out = _blur_h_blocked(plane, sigma)
    if h <= _BLUR_GEMM_MAX_N:
        return np.matmul(_blur_matrix(sigma, h).T, out)  # vertical pass
    return _blur_v_blocked(out, sigma)


def compute_separable5_weights(sigma: float) -> tuple:
    """[w0 center, w1 ±1, w2 ±2] normalized (blur.rs:26-39)."""
    k = compute_kernel(sigma)
    assert len(k) == 5
    s = F32(1.0) / F32(k.sum(dtype=np.float32))
    return (k[2] * s, k[1] * s, k[0] * s)


def blur_mirrored_5x5(plane: np.ndarray, weights: tuple) -> np.ndarray:
    """Separable5 σ=1.2 blur with mirrored boundaries (blur.rs:1922-1971).

    Used only by the opsin dynamics stage.  Implemented as symmetric
    padding + contiguous slice adds (no fancy-index gathers).
    """
    w0, w1, w2 = weights
    h, w = plane.shape[-2:]
    pad = [(0, 0)] * (plane.ndim - 2) + [(2, 2), (2, 2)]
    ap = np.pad(plane, pad, mode="symmetric")
    t = (ap[..., :, 2:-2] * w0 + (ap[..., :, 1:-3] + ap[..., :, 3:-1]) * w1
         + (ap[..., :, :-4] + ap[..., :, 4:]) * w2)
    out = (t[..., 2:-2, :] * w0 + (t[..., 1:-3, :] + t[..., 3:-1, :]) * w1
           + (t[..., :-4, :] + t[..., 4:, :]) * w2)
    return out.astype(np.float32, copy=False)


# ---------------------------------------------------------------------------
# Opsin dynamics — linear RGB → XYB (opsin.rs:154-251)
# ---------------------------------------------------------------------------

_SEP5_WEIGHTS = compute_separable5_weights(1.2)


def opsin_dynamics_image(rgb: np.ndarray, intensity_target: float) -> list:
    """Linear RGB [..., 3, h, w] array → XYB channel list."""
    return opsin_dynamics_image_planes([rgb[..., c, :, :] for c in range(3)],
                                       intensity_target)


def opsin_dynamics_image_planes(chans: list, intensity_target: float) -> list:
    """Linear RGB channel-plane list → butteraugli XYB channel list
    (opsin.rs:154-251).  Batch-aware: leading dims carry the batch.

    Blur σ=1.2 (mirrored 5×5), sensitivity = gamma(pre)/pre on the blurred
    mix, applied to the sharp mix; X=c0−c1, Y=c0+c1, B=c2.
    """
    it = F32(intensity_target)
    mixi = [F32(v) for v in MIXI]
    min_val = F32(1e-4)

    blurred = [blur_mirrored_5x5(chans[c], _SEP5_WEIGHTS) for c in range(3)]
    r, g, b = chans[0] * it, chans[1] * it, chans[2] * it
    br, bg, bb = blurred[0] * it, blurred[1] * it, blurred[2] * it

    pre0 = np.maximum(np.maximum(mixi[0] * br + mixi[1] * bg + mixi[2] * bb + mixi[3], MIN_01), min_val)
    pre1 = np.maximum(np.maximum(mixi[4] * br + mixi[5] * bg + mixi[6] * bb + mixi[7], MIN_01), min_val)
    pre2 = np.maximum(np.maximum(mixi[8] * br + mixi[9] * bg + mixi[10] * bb + mixi[11], MIN_2), min_val)

    s0 = np.maximum(gamma(pre0) / pre0, min_val)
    s1 = np.maximum(gamma(pre1) / pre1, min_val)
    s2 = np.maximum(gamma(pre2) / pre2, min_val)

    cur0 = np.maximum((mixi[0] * r + mixi[1] * g + mixi[2] * b + mixi[3]) * s0, MIN_01)
    cur1 = np.maximum((mixi[4] * r + mixi[5] * g + mixi[6] * b + mixi[7]) * s1, MIN_01)
    cur2 = np.maximum((mixi[8] * r + mixi[9] * g + mixi[10] * b + mixi[11]) * s2, MIN_2)

    return [(cur0 - cur1).astype(np.float32, copy=False),
            (cur0 + cur1).astype(np.float32, copy=False),
            cur2.astype(np.float32, copy=False)]


# ---------------------------------------------------------------------------
# Frequency separation (psycho.rs:351-536)
# ---------------------------------------------------------------------------

def _remove_range(v: np.ndarray, rng: float) -> np.ndarray:
    """copysign(max(|v|−r,0), v) (psycho.rs:213-225)."""
    rng = F32(rng)
    return np.copysign(np.maximum(np.abs(v) - rng, F32(0.0)), v).astype(np.float32, copy=False)


def _amplify_range(v: np.ndarray, rng: float) -> np.ndarray:
    """v + copysign(min(|v|,r), v) (psycho.rs:231-242)."""
    rng = F32(rng)
    return (v + np.copysign(np.minimum(np.abs(v), rng), v)).astype(np.float32, copy=False)


_MAXCLAMP_MUL = F32(0.724216146)


def _maximum_clamp(v: np.ndarray, max_val: float) -> np.ndarray:
    """Branch-free soft clamp (psycho.rs:325-331)."""
    mv = F32(max_val)
    clamped = np.clip(v, -mv, mv)
    return ((v - clamped) * _MAXCLAMP_MUL + clamped).astype(np.float32, copy=False)


class PsychoImage:
    """Frequency pyramid: channel-plane lists uhf[2] (X,Y), hf[2] (X,Y),
    mf[3], lf[3]; each plane is [..., h, w] (batch-aware)."""

    __slots__ = ("uhf", "hf", "mf", "lf")

    def __init__(self, uhf, hf, mf, lf):
        self.uhf, self.hf, self.mf, self.lf = uhf, hf, mf, lf


def separate_frequencies(xyb: list) -> PsychoImage:
    """Full pyramid decomposition (psycho.rs:520-536 sequential path);
    ``xyb`` is a 3-channel plane list, batch dims allowed."""
    # LF / MF split (psycho.rs:351-393)
    lf = [None, None, None]
    mf = [None, None, None]
    for c in range(3):
        lf[c] = gaussian_blur(xyb[c], SIGMA_LF)
        mf[c] = xyb[c] - lf[c]
    # LF → vals space (psycho.rs:165-186)
    y_to_b, bmul = F32(Y_TO_B_MUL_LF_TO_VALS), F32(BMUL_LF_TO_VALS)
    xmul_, ymul_ = F32(XMUL_LF_TO_VALS), F32(YMUL_LF_TO_VALS)
    lf[2] = (y_to_b * lf[1] + lf[2]) * bmul
    lf[0] = lf[0] * xmul_
    lf[1] = lf[1] * ymul_

    # MF / HF split (psycho.rs:424-475)
    hf = [None, None]
    for i in range(2):
        blurred = gaussian_blur(mf[i], SIGMA_HF)
        hf[i] = mf[i] - blurred
        if i == 0:
            mf[i] = _remove_range(blurred, REMOVE_MF_RANGE)
        else:
            mf[i] = _amplify_range(blurred, ADD_MF_RANGE)
    mf[2] = gaussian_blur(mf[2], SIGMA_HF)
    # suppress X by Y (psycho.rs:192-207)
    s, yw = F32(SUPPRESS_S), F32(SUPPRESS_XY)
    one_minus_s = F32(1.0) - s
    scaler = (yw / (hf[1] * hf[1] + yw)) * one_minus_s + s
    hf[0] = (hf[0] * scaler).astype(np.float32, copy=False)

    # HF / UHF split (psycho.rs:478-514)
    uhf = [None, None]
    # X channel (psycho.rs:267-294)
    blurred = gaussian_blur(hf[0], SIGMA_UHF)
    uhf[0] = _remove_range(hf[0] - blurred, REMOVE_UHF_RANGE)
    hf[0] = _remove_range(blurred, REMOVE_HF_RANGE)
    # Y channel (psycho.rs:307-344)
    blurred = gaussian_blur(hf[1], SIGMA_UHF)
    hf_clamped = _maximum_clamp(blurred, MAXCLAMP_HF)
    uhf[1] = (_maximum_clamp(hf[1] - hf_clamped, MAXCLAMP_UHF) * F32(MUL_Y_UHF)).astype(np.float32, copy=False)
    hf[1] = _amplify_range(hf_clamped * F32(MUL_Y_HF), ADD_HF_RANGE)

    return PsychoImage(uhf, hf, mf, lf)


# ---------------------------------------------------------------------------
# Malta filter (malta.rs)
# ---------------------------------------------------------------------------

# 16 orientation patterns, 9-sample lines (malta.rs:93-311), as (dx, dy).
_MALTA_PATTERNS = [
    [(-4, 0), (-3, 0), (-2, 0), (-1, 0), (0, 0), (1, 0), (2, 0), (3, 0), (4, 0)],
    [(0, -4), (0, -3), (0, -2), (0, -1), (0, 0), (0, 1), (0, 2), (0, 3), (0, 4)],
    [(-3, -3), (-2, -2), (-1, -1), (0, 0), (1, 1), (2, 2), (3, 3)],
    [(3, -3), (2, -2), (1, -1), (0, 0), (-1, 1), (-2, 2), (-3, 3)],
    [(1, -4), (1, -3), (1, -2), (0, -1), (0, 0), (0, 1), (-1, 2), (-1, 3), (-1, 4)],
    [(-1, -4), (-1, -3), (-1, -2), (0, -1), (0, 0), (0, 1), (1, 2), (1, 3), (1, 4)],
    [(-4, -1), (-3, -1), (-2, -1), (-1, 0), (0, 0), (1, 0), (2, 1), (3, 1), (4, 1)],
    [(-4, 1), (-3, 1), (-2, 1), (-1, 0), (0, 0), (1, 0), (2, -1), (3, -1), (4, -1)],
    [(-2, -3), (-1, -2), (-1, -1), (0, 0), (1, 1), (1, 2), (2, 3)],
    [(2, -3), (1, -2), (1, -1), (0, 0), (-1, 1), (-1, 2), (-2, 3)],
    [(-3, -2), (-2, -1), (-1, -1), (0, 0), (1, 1), (2, 1), (3, 2)],
    [(3, -2), (2, -1), (1, -1), (0, 0), (-1, 1), (-2, 1), (-3, 2)],
    # patterns 13-16 intentionally duplicate 8, 7, 6, 5 (malta.rs:252-308)
    [(-4, 1), (-3, 1), (-2, 1), (-1, 0), (0, 0), (1, 0), (2, -1), (3, -1), (4, -1)],
    [(-4, -1), (-3, -1), (-2, -1), (-1, 0), (0, 0), (1, 0), (2, 1), (3, 1), (4, 1)],
    [(-1, -4), (-1, -3), (-1, -2), (0, -1), (0, 0), (0, 1), (1, 2), (1, 3), (1, 4)],
    [(1, -4), (1, -3), (1, -2), (0, -1), (0, 0), (0, 1), (-1, 2), (-1, 3), (-1, 4)],
]

# LF variant, 5-sample lines (malta.rs:318-482)
_MALTA_PATTERNS_LF = [
    [(-4, 0), (-2, 0), (0, 0), (2, 0), (4, 0)],
    [(0, -4), (0, -2), (0, 0), (0, 2), (0, 4)],
    [(-3, -3), (-2, -2), (0, 0), (2, 2), (3, 3)],
    [(3, -3), (2, -2), (0, 0), (-2, 2), (-3, 3)],
    [(1, -4), (1, -2), (0, 0), (-1, 2), (-1, 4)],
    [(-1, -4), (-1, -2), (0, 0), (1, 2), (1, 4)],
    [(-4, -1), (-2, -1), (0, 0), (2, 1), (4, 1)],
    [(-4, 1), (-2, 1), (0, 0), (2, -1), (4, -1)],
    [(-2, -3), (-1, -2), (0, 0), (1, 2), (2, 3)],
    [(2, -3), (1, -2), (0, 0), (-1, 2), (-2, 3)],
    [(-3, -2), (-2, -1), (0, 0), (2, 1), (3, 2)],
    [(3, -2), (2, -1), (0, 0), (-2, 1), (-3, 2)],
    [(-4, 2), (-2, 1), (0, 0), (2, -1), (4, -2)],
    [(-4, -2), (-2, -1), (0, 0), (2, 1), (4, 2)],
    [(-2, -4), (-1, -2), (0, 0), (1, 2), (2, 4)],
    [(2, -4), (1, -2), (0, 0), (-1, 2), (-2, 4)],
]


def malta_diff_map(lum0: np.ndarray, lum1: np.ndarray, w_0gt1: float,
                   w_0lt1: float, norm1: float, use_lf: bool) -> np.ndarray:
    """Edge-aware Malta diff map (malta.rs:1276-1422).

    Pass 1: branch-free asymmetric scaled diffs (malta.rs:1295-1328,
    0.55/1.05 thresholds).  Pass 2: 16 orientation line kernels over a
    4-px zero-padded diff image; each pattern's line sum squared and
    accumulated.
    """
    k_weight0, k_weight1, length = 0.5, 0.33, 3.75
    mulli = 0.611612573796 if use_lf else 0.39905817637
    w_pre0gt1 = mulli * (k_weight0 * w_0gt1) ** 0.5 / (length * 2.0 + 1.0)
    w_pre0lt1 = mulli * (k_weight1 * w_0lt1) ** 0.5 / (length * 2.0 + 1.0)
    norm2_0gt1 = F32(w_pre0gt1 * norm1)
    norm2_0lt1 = F32(w_pre0lt1 * norm1)
    norm1_f = F32(norm1)

    absval = F32(0.5) * (np.abs(lum0) + np.abs(lum1))
    inv_norm = F32(1.0) / (norm1_f + absval)
    diff = lum0 - lum1
    scaled_diff = norm2_0gt1 * inv_norm * diff
    fabs0 = np.abs(lum0)
    too_small = F32(0.55) * fabs0
    too_big = F32(1.05) * fabs0
    sign = np.copysign(F32(1.0), lum0)
    sv1 = lum1 * sign
    below = np.maximum(too_small - sv1, F32(0.0))
    above = np.maximum(sv1 - too_big, F32(0.0))
    impact = norm2_0lt1 * inv_norm * (below - above)
    diffs = (scaled_diff + sign * impact).astype(np.float32, copy=False)

    h, w = diffs.shape[-2:]
    pad = 4
    padded = np.zeros(diffs.shape[:-2] + (h + 2 * pad, w + 2 * pad),
                      dtype=np.float32)
    padded[..., pad:pad + h, pad:pad + w] = diffs

    if use_lf:
        return _malta_pass2_lf(padded, h, w, pad)
    return _malta_pass2_hf(padded, h, w, pad)


def _sh(padded, pad, h, w, dx, dy):
    """View of the padded diff image shifted by (dx, dy)."""
    return padded[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]


def _malta_pass2_hf(padded, h, w, pad):
    """16-orientation filter, 9-sample lines (malta.rs:93-311), computed
    via shared 3-tap partial sums: every line is three 3-sums, and
    patterns 13-16 duplicate 8/7/6/5 so their squares count twice.
    ~2.8× less memory traffic than direct per-pattern shifted adds."""
    P = lambda dx, dy: _sh(padded, pad, h, w, dx, dy)
    # 3-tap partial sums over the padded frame (shrunk by 1 on the sum axis)
    ph, pw = padded.shape[-2:]
    H3 = padded[..., :, :pw - 2] + padded[..., :, 1:pw - 1] + padded[..., :, 2:]
    V3 = padded[..., :ph - 2, :] + padded[..., 1:ph - 1, :] + padded[..., 2:, :]
    D3 = (padded[..., :ph - 2, :pw - 2] + padded[..., 1:ph - 1, 1:pw - 1]
          + padded[..., 2:, 2:])
    E3 = (padded[..., :ph - 2, 2:] + padded[..., 1:ph - 1, 1:pw - 1]
          + padded[..., 2:, :pw - 2])

    def h3(dx, dy):  # H3 centered at (x+dx, y+dy)
        return H3[..., pad + dy:pad + dy + h, pad + dx - 1:pad + dx - 1 + w]

    def v3(dx, dy):
        return V3[..., pad + dy - 1:pad + dy - 1 + h, pad + dx:pad + dx + w]

    def d3(dx, dy):  # main-diagonal 3-sum centered at (x+dx, y+dy)
        return D3[..., pad + dy - 1:pad + dy - 1 + h, pad + dx - 1:pad + dx - 1 + w]

    def e3(dx, dy):  # anti-diagonal 3-sum (x-1,y+1),(x,y),(x+1,y-1)
        return E3[..., pad + dy - 1:pad + dy - 1 + h, pad + dx - 1:pad + dx - 1 + w]

    c = P(0, 0)
    shape = padded.shape[:-2] + (h, w)
    out = np.zeros(shape, dtype=np.float32)
    s = np.empty(shape, dtype=np.float32)      # reused line-sum buffer
    sq = np.empty(shape, dtype=np.float32)     # reused square buffer

    def acc(terms, weight=None):
        np.add(terms[0], terms[1], out=s)
        for t in terms[2:]:
            np.add(s, t, out=s)
        np.multiply(s, s, out=sq)
        if weight is not None:
            np.multiply(sq, weight, out=sq)
        np.add(out, sq, out=out)

    two = np.float32(2.0)
    acc((h3(-3, 0), h3(0, 0), h3(3, 0)))                 # p1 horizontal
    acc((v3(0, -3), v3(0, 0), v3(0, 3)))                 # p2 vertical
    acc((d3(-2, -2), c, d3(2, 2)))                       # p3 diag \
    acc((e3(2, -2), c, e3(-2, 2)))                       # p4 diag /
    acc((v3(1, -3), v3(0, 0), v3(-1, 3)), two)           # p5 (= p16)
    acc((v3(-1, -3), v3(0, 0), v3(1, 3)), two)           # p6 (= p15)
    acc((h3(-3, -1), h3(0, 0), h3(3, 1)), two)           # p7 (= p14)
    acc((h3(-3, 1), h3(0, 0), h3(3, -1)), two)           # p8 (= p13)
    # p9-p12: steep/shallow 7-tap diagonals, direct
    for pat in (_MALTA_PATTERNS[8], _MALTA_PATTERNS[9],
                _MALTA_PATTERNS[10], _MALTA_PATTERNS[11]):
        acc(tuple(P(dx, dy) for dx, dy in pat))
    return out


def _malta_pass2_lf(padded, h, w, pad):
    """16-orientation filter, 5-sample sparse lines (malta.rs:318-482),
    via shared 2-tap pair sums."""
    P = lambda dx, dy: _sh(padded, pad, h, w, dx, dy)
    ph, pw = padded.shape[-2:]
    # pair sums; index convention: result centered on its first element
    H2 = padded[..., :, :pw - 2] + padded[..., :, 2:]    # (x-1)+(x+1) center x
    V2 = padded[..., :ph - 2, :] + padded[..., 2:, :]
    D2 = padded[..., :ph - 1, :pw - 1] + padded[..., 1:, 1:]
    A2 = padded[..., :ph - 1, 1:] + padded[..., 1:, :pw - 1]
    # slanted pair sums for p13-16
    K2 = padded[..., 1:, :pw - 2] + padded[..., :ph - 1, 2:]
    M2 = padded[..., :ph - 2, :pw - 1] + padded[..., 2:, 1:]
    N2 = padded[..., :ph - 2, 1:] + padded[..., 2:, :pw - 1]
    L2 = padded[..., :ph - 1, :pw - 2] + padded[..., 1:, 2:]

    def h2(dx, dy):
        return H2[..., pad + dy:pad + dy + h, pad + dx - 1:pad + dx - 1 + w]

    def v2(dx, dy):
        return V2[..., pad + dy - 1:pad + dy - 1 + h, pad + dx:pad + dx + w]

    def d2(dx, dy):   # P(dx,dy) + P(dx+1,dy+1)
        return D2[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]

    def a2(dx, dy):   # P(dx,dy) + P(dx-1,dy+1)
        return A2[..., pad + dy:pad + dy + h, pad + dx - 1:pad + dx - 1 + w]

    def l2(dx, dy):   # P(dx,dy) + P(dx+2,dy+1)
        return L2[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]

    def k2(dx, dy):   # P(dx,dy) + P(dx+2,dy-1)
        return K2[..., pad + dy - 1:pad + dy - 1 + h, pad + dx:pad + dx + w]

    def m2(dx, dy):   # P(dx,dy) + P(dx+1,dy+2)
        return M2[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]

    def n2(dx, dy):   # P(dx,dy) + P(dx-1,dy+2)
        return N2[..., pad + dy:pad + dy + h, pad + dx - 1:pad + dx - 1 + w]

    c = P(0, 0)
    shape = padded.shape[:-2] + (h, w)
    out = np.zeros(shape, dtype=np.float32)
    s = np.empty(shape, dtype=np.float32)
    sq = np.empty(shape, dtype=np.float32)

    def acc(t0, t1, t2):
        np.add(t0, t1, out=s)
        np.add(s, t2, out=s)
        np.multiply(s, s, out=sq)
        np.add(out, sq, out=out)

    acc(h2(-3, 0), c, h2(3, 0))             # p1: (-4,0),(-2,0),0,(2,0),(4,0)
    acc(v2(0, -3), c, v2(0, 3))             # p2
    acc(d2(-3, -3), c, d2(2, 2))            # p3: (-3,-3),(-2,-2),0,(2,2),(3,3)
    acc(a2(3, -3), c, a2(-2, 2))            # p4: (3,-3),(2,-2),0,(-2,2),(-3,3)
    acc(v2(1, -3), c, v2(-1, 3))            # p5: (1,-4),(1,-2),0,(-1,2),(-1,4)
    acc(v2(-1, -3), c, v2(1, 3))            # p6
    acc(h2(-3, -1), c, h2(3, 1))            # p7: (-4,-1),(-2,-1),0,(2,1),(4,1)
    acc(h2(-3, 1), c, h2(3, -1))            # p8
    acc(d2(-2, -3), c, d2(1, 2))            # p9: (-2,-3),(-1,-2),0,(1,2),(2,3)
    acc(a2(2, -3), c, a2(-1, 2))            # p10
    acc(d2(-3, -2), c, d2(2, 1))            # p11: (-3,-2),(-2,-1),0,(2,1),(3,2)
    acc(a2(3, -2), c, a2(-2, 1))            # p12
    acc(k2(-4, 2), c, k2(2, -1))            # p13: (-4,2),(-2,1),0,(2,-1),(4,-2)
    acc(l2(-4, -2), c, l2(2, 1))            # p14: (-4,-2),(-2,-1),0,(2,1),(4,2)
    acc(m2(-2, -4), c, m2(1, 2))            # p15: (-2,-4),(-1,-2),0,(1,2),(2,4)
    acc(n2(2, -4), c, n2(-1, 2))            # p16: (2,-4),(1,-2),0,(-1,2),(-2,4)
    return out


# ---------------------------------------------------------------------------
# L2 diffs (diff.rs:128-225)
# ---------------------------------------------------------------------------

def l2_diff(i0, i1, w, acc):
    d = i0 - i1
    acc += d * d * F32(w)


def l2_diff_asymmetric(i0, i1, w_0gt1, w_0lt1, acc):
    """Artifact-vs-blur asymmetric penalty (diff.rs:185-225)."""
    if w_0gt1 == 0.0 and w_0lt1 == 0.0:
        return
    vw_0gt1 = F32(w_0gt1) * F32(0.8)
    vw_0lt1 = F32(w_0lt1) * F32(0.8)
    d = i0 - i1
    acc += d * d * vw_0gt1
    fabs0 = np.abs(i0)
    too_small = F32(0.4) * fabs0
    sign = np.copysign(F32(1.0), i0)
    sv1 = i1 * sign
    v = np.maximum(too_small - sv1, F32(0.0)) + np.maximum(sv1 - fabs0, F32(0.0))
    acc += v * v * vw_0lt1


def compute_psycho_diff_malta(ps0: PsychoImage, ps1: PsychoImage,
                              hf_asymmetry: float) -> np.ndarray:
    """6 Malta maps + asymmetric/L2 accumulation → block_diff_ac [3,h,w]
    (diff.rs:238-384)."""
    ha = float(hf_asymmetry)
    sqrt_ha = ha ** 0.5

    plane_y = malta_diff_map(ps0.uhf[1], ps1.uhf[1], W_UHF_MALTA * ha,
                             W_UHF_MALTA / ha, NORM1_UHF, False)
    plane_x = malta_diff_map(ps0.uhf[0], ps1.uhf[0], W_UHF_MALTA_X * ha,
                             W_UHF_MALTA_X / ha, NORM1_UHF_X, False)
    hf_y = malta_diff_map(ps0.hf[1], ps1.hf[1], W_HF_MALTA * sqrt_ha,
                          W_HF_MALTA / sqrt_ha, NORM1_HF, True)
    hf_x = malta_diff_map(ps0.hf[0], ps1.hf[0], W_HF_MALTA_X * sqrt_ha,
                          W_HF_MALTA_X / sqrt_ha, NORM1_HF_X, True)
    mf_y = malta_diff_map(ps0.mf[1], ps1.mf[1], W_MF_MALTA, W_MF_MALTA,
                          NORM1_MF, True)
    mf_x = malta_diff_map(ps0.mf[0], ps1.mf[0], W_MF_MALTA_X, W_MF_MALTA_X,
                          NORM1_MF_X, True)

    plane_y += hf_y + mf_y
    plane_x += hf_x + mf_x

    ha32 = F32(ha)
    l2_diff_asymmetric(ps0.hf[0], ps1.hf[0], F32(WMUL[0]) * ha32,
                       F32(WMUL[0]) / ha32, plane_x)
    l2_diff_asymmetric(ps0.hf[1], ps1.hf[1], F32(WMUL[1]) * ha32,
                       F32(WMUL[1]) / ha32, plane_y)
    l2_diff(ps0.mf[0], ps1.mf[0], F32(WMUL[3]), plane_x)
    l2_diff(ps0.mf[1], ps1.mf[1], F32(WMUL[4]), plane_y)
    d = ps0.mf[2] - ps1.mf[2]
    plane_b = d * d * F32(WMUL[5])

    return [plane_x, plane_y, plane_b]


# ---------------------------------------------------------------------------
# Mask (mask.rs)
# ---------------------------------------------------------------------------

def combine_and_precompute(hf, uhf) -> np.ndarray:
    """Fused CombineChannelsForMasking + DiffPrecompute (mask.rs:313-342)."""
    bias = MASK_MUL * MASK_BIAS
    sqrt_bias = F32(np.sqrt(bias))
    xdiff = (uhf[0] + hf[0]) * COMBINE_CHANNELS_MULS[0]
    ydiff = uhf[1] * COMBINE_CHANNELS_MULS[1] + hf[1] * COMBINE_CHANNELS_MULS[2]
    combined = np.sqrt(xdiff * xdiff + ydiff * ydiff)
    return (np.sqrt(MASK_MUL * combined + bias) - sqrt_bias).astype(np.float32, copy=False)


def _shifted(a: np.ndarray, dy: int, dx: int, fill: float) -> np.ndarray:
    """out[..., y, x] = a[..., y+dy, x+dx] where in-bounds, else ``fill``."""
    h, w = a.shape[-2:]
    out = np.full(a.shape, fill, dtype=a.dtype)
    y0, y1 = max(0, -dy), min(h, h - dy)
    x0, x1 = max(0, -dx), min(w, w - dx)
    if y1 > y0 and x1 > x0:
        out[..., y0:y1, x0:x1] = a[..., y0 + dy:y1 + dy, x0 + dx:x1 + dx]
    return out


def _update_min3(v, m0, m1, m2):
    """Branch-free sorted-3 insert (mask.rs:155-162)."""
    new0 = np.minimum(m0, v)
    pushed = np.maximum(m0, v)
    new1 = np.minimum(m1, pushed)
    pushed2 = np.maximum(m1, pushed)
    new2 = np.minimum(m2, pushed2)
    return new0, new1, new2


def fuzzy_erosion(a: np.ndarray) -> np.ndarray:
    """3-smallest-of-9 stencil at offset K=3, weights .45/.3/.25
    (mask.rs:110-286).  Out-of-bounds neighbors are excluded (not
    clamped), which the masked shifts reproduce with +inf fill."""
    k = 3
    inf = np.float32(np.inf)
    m0 = a.copy()
    m1 = F32(2.0) * a
    m2 = m1.copy()
    for dy, dx in ((0, -k), (-k, -k), (k, -k), (0, k), (-k, k), (k, k),
                   (-k, 0), (k, 0)):
        m0, m1, m2 = _update_min3(_shifted(a, dy, dx, inf), m0, m1, m2)
    return (F32(0.45) * m0 + F32(0.3) * m1 + F32(0.25) * m2).astype(np.float32, copy=False)


def compute_mask_from_hf_uhf(hf0, uhf0, hf1, uhf1, diff_ac=None):
    """Mask pipeline (mask.rs:348-385): combine+precompute per image,
    blur σ=2.7, fuzzy-erode image0's blur → mask; accumulate
    10·(b0−b1)² into ``diff_ac``."""
    diff0 = combine_and_precompute(hf0, uhf0)
    diff1 = combine_and_precompute(hf1, uhf1)
    blurred0 = gaussian_blur(diff0, MASK_RADIUS)
    blurred1 = gaussian_blur(diff1, MASK_RADIUS)
    mask = fuzzy_erosion(blurred0)
    if diff_ac is not None:
        d = blurred0 - blurred1
        diff_ac += d * d * MASK_TO_ERROR_MUL
    return mask


# ---------------------------------------------------------------------------
# Final combine + score (diff.rs:405-548)
# ---------------------------------------------------------------------------

def combine_channels_to_diffmap_fused(mask, lf1, lf2, block_diff_ac, xmul):
    """Per-pixel mask application + inline LF(DC) diff + sqrt
    (diff.rs:405-472)."""
    gs = GLOBAL_SCALE
    my_mul, my_scaler, my_offset = F32(MASK_Y_MUL), F32(MASK_Y_SCALER), F32(MASK_Y_OFFSET)
    mdc_mul, mdc_scaler, mdc_offset = F32(MASK_DC_Y_MUL), F32(MASK_DC_Y_SCALER), F32(MASK_DC_Y_OFFSET)
    dc_w0, dc_w1, dc_w2 = F32(WMUL[6]), F32(WMUL[7]), F32(WMUL[8])
    xmul = F32(xmul)

    c_y = my_mul / (my_scaler * mask + my_offset)
    r_y = gs * c_y + gs
    maskval = r_y * r_y
    c_dc = mdc_mul / (mdc_scaler * mask + mdc_offset)
    r_dc = gs * c_dc + gs
    dc_maskval = r_dc * r_dc

    d0 = lf1[0] - lf2[0]
    d1 = lf1[1] - lf2[1]
    d2 = lf1[2] - lf2[2]
    dc_masked = (d0 * d0 * dc_w0 * xmul) * dc_maskval + \
                ((d1 * d1 * dc_w1) * dc_maskval + (d2 * d2 * dc_w2) * dc_maskval)
    ac_masked = (block_diff_ac[0] * xmul) * maskval + \
                (block_diff_ac[1] * maskval + block_diff_ac[2] * maskval)
    return np.sqrt(dc_masked + ac_masked).astype(np.float32, copy=False)


def score_from_diffmap(diffmap: np.ndarray) -> tuple:
    """(max-norm score, libjxl 3-norm) fused reduction (diff.rs:485-548)."""
    n = diffmap.size
    if n == 0:
        return 0.0, 0.0
    max_val = float(diffmap.max())
    d = diffmap.astype(np.float64, copy=False)
    d3 = d * d * d
    d6 = d3 * d3
    s3 = float(d3.sum())
    s6 = float(d6.sum())
    s12 = float((d6 * d6).sum())
    inv = 1.0 / n
    pnorm3 = ((inv * s3) ** (1.0 / 3.0) + (inv * s6) ** (1.0 / 6.0) +
              (inv * s12) ** (1.0 / 12.0)) / 3.0
    return max_val, pnorm3


def score_from_diffmap_batch(diffmap: np.ndarray) -> tuple:
    """Batched score reduction over [..., h, w] → (max[...], pnorm3[...])."""
    h, w = diffmap.shape[-2:]
    n = h * w
    max_val = diffmap.max(axis=(-2, -1)).astype(np.float64)
    d = diffmap.astype(np.float64, copy=False)
    d3 = d * d * d
    d6 = d3 * d3
    s3 = d3.sum(axis=(-2, -1))
    s6 = d6.sum(axis=(-2, -1))
    s12 = (d6 * d6).sum(axis=(-2, -1))
    inv = 1.0 / n
    pnorm3 = ((inv * s3) ** (1.0 / 3.0) + (inv * s6) ** (1.0 / 6.0) +
              (inv * s12) ** (1.0 / 12.0)) / 3.0
    return max_val, pnorm3


def diffmap_partials(diffmap: np.ndarray) -> dict:
    """StripReducer-shaped mergeable partial state (strip.rs:127-209):
    {max, sum_p3, sum_p6, sum_p12, pixels}."""
    d = diffmap.astype(np.float64, copy=False)
    d3 = d * d * d
    d6 = d3 * d3
    return {"max": float(diffmap.max()) if diffmap.size else 0.0,
            "sum_p3": float(d3.sum()), "sum_p6": float(d6.sum()),
            "sum_p12": float((d6 * d6).sum()), "pixels": int(diffmap.size)}


def merge_partials(parts) -> dict:
    out = {"max": 0.0, "sum_p3": 0.0, "sum_p6": 0.0, "sum_p12": 0.0, "pixels": 0}
    for p in parts:
        out["max"] = max(out["max"], p["max"])
        for k in ("sum_p3", "sum_p6", "sum_p12"):
            out[k] += p[k]
        out["pixels"] += p["pixels"]
    return out


def finalize_partials(p: dict) -> tuple:
    if p["pixels"] == 0:
        return 0.0, 0.0
    inv = 1.0 / p["pixels"]
    pnorm3 = ((inv * p["sum_p3"]) ** (1.0 / 3.0) +
              (inv * p["sum_p6"]) ** (1.0 / 6.0) +
              (inv * p["sum_p12"]) ** (1.0 / 12.0)) / 3.0
    return p["max"], pnorm3


def pnorm_slice_batch(diffmaps: np.ndarray, p: float) -> np.ndarray:
    """Batched generic libjxl p-norm (lib.rs:556-577): [N, h, w] →
    per-image average of p-norms at p, 2p, 4p."""
    n = diffmaps.shape[0]
    d = diffmaps.reshape(n, -1).astype(np.float64, copy=False)
    acc = d ** p
    s0 = acc.sum(axis=1)
    acc = acc * acc
    s1 = acc.sum(axis=1)
    acc = acc * acc
    s2 = acc.sum(axis=1)
    inv = 1.0 / d.shape[1]
    return ((inv * s0) ** (1.0 / p) + (inv * s1) ** (1.0 / (2 * p)) +
            (inv * s2) ** (1.0 / (4 * p))) / 3.0


def pnorm_slice(diffmap: np.ndarray, p: float) -> float:
    """Generic libjxl p-norm: average of p-norms at p, 2p, 4p
    (lib.rs:556-577)."""
    if diffmap.size == 0:
        return float("nan")
    d = diffmap.astype(np.float64, copy=False).ravel()
    acc = d ** p
    s0 = acc.sum()
    acc = acc * acc
    s1 = acc.sum()
    acc = acc * acc
    s2 = acc.sum()
    inv = 1.0 / d.size
    return ((inv * s0) ** (1.0 / p) + (inv * s1) ** (1.0 / (2 * p)) +
            (inv * s2) ** (1.0 / (4 * p))) / 3.0


# ---------------------------------------------------------------------------
# Multi-resolution orchestration (diff.rs:551-695)
# ---------------------------------------------------------------------------

def subsample_2x(plane: np.ndarray) -> np.ndarray:
    """2× box downsample, odd-edge aware, linear space (diff.rs:551-624).
    Batch-aware over [..., h, w]."""
    h, w = plane.shape[-2:]
    oh, ow = (h + 1) // 2, (w + 1) // 2
    ih, iw = h // 2, w // 2
    out = np.empty(plane.shape[:-2] + (oh, ow), dtype=np.float32)
    if ih and iw:
        a = plane[..., 0:2 * ih:2, 0:2 * iw:2]
        b = plane[..., 0:2 * ih:2, 1:2 * iw:2]
        c = plane[..., 1:2 * ih:2, 0:2 * iw:2]
        d = plane[..., 1:2 * ih:2, 1:2 * iw:2]
        out[..., :ih, :iw] = ((a + b) + c + d) * F32(0.25)
    if ow > iw and ih:
        out[..., :ih, iw] = (plane[..., 0:2 * ih:2, w - 1]
                             + plane[..., 1:2 * ih:2, w - 1]) * F32(0.5)
    if oh > ih and iw:
        out[..., ih, :iw] = (plane[..., h - 1, 0:2 * iw:2]
                             + plane[..., h - 1, 1:2 * iw:2]) * F32(0.5)
    if oh > ih and ow > iw:
        out[..., ih, iw] = plane[..., h - 1, w - 1]
    return out


def add_supersampled_2x(src: np.ndarray, weight: float, dest: np.ndarray) -> np.ndarray:
    """dest = dest·(1−0.3·w) + w·upsample2x(src) (diff.rs:82-112)."""
    h, w = dest.shape[-2:]
    blend = F32(1.0) - F32(0.3) * F32(weight)
    up = np.repeat(np.repeat(src, 2, axis=-2), 2, axis=-1)[..., :h, :w]
    return (dest * blend + F32(weight) * up).astype(np.float32, copy=False)


def compute_diffmap_single_resolution(rgb1: list, rgb2: list,
                                      hf_asymmetry: float, xmul: float,
                                      intensity_target: float) -> np.ndarray:
    """One scale: XYB → psycho → malta/mask → combined diffmap
    (diff.rs:627-658).  ``rgb1``/``rgb2``: 3-channel plane lists,
    batch dims allowed (reference side may broadcast against a batch)."""
    ps1 = separate_frequencies(opsin_dynamics_image_planes(rgb1, intensity_target))
    ps2 = separate_frequencies(opsin_dynamics_image_planes(rgb2, intensity_target))
    block_diff_ac = compute_psycho_diff_malta(ps1, ps2, hf_asymmetry)
    mask = compute_mask_from_hf_uhf(ps1.hf, ps1.uhf, ps2.hf, ps2.uhf,
                                    diff_ac=block_diff_ac[1])
    return combine_channels_to_diffmap_fused(mask, ps1.lf, ps2.lf,
                                             block_diff_ac, xmul)


class ButteraugliCancelled(Exception):
    """Cooperative cancellation signalled by a ``stop_check`` polled at
    scale boundaries inside a compare (diff.rs:761-763 semantics)."""


def _poll_stop(stop_check, where: str) -> None:
    if stop_check is not None and stop_check():
        raise ButteraugliCancelled(f"cancelled at {where}")


def compute_diffmap(rgb1: np.ndarray, rgb2: np.ndarray, hf_asymmetry: float = 1.0,
                    xmul: float = 1.0, intensity_target: float = 80.0,
                    single_resolution: bool = False, stop_check=None) -> np.ndarray:
    """Full-res + one half-res sub-level blended at weight 0.5
    (diff.rs:666-695); linear planar RGB [..., 3, h, w] inputs."""
    h, w = rgb1.shape[-2], rgb1.shape[-1]
    c1 = [rgb1[..., c, :, :] for c in range(3)]
    c2 = [rgb2[..., c, :, :] for c in range(3)]
    return compute_diffmap_planes(c1, c2, hf_asymmetry, xmul,
                                  intensity_target, single_resolution,
                                  stop_check)


def compute_diffmap_planes(c1: list, c2: list, hf_asymmetry: float = 1.0,
                           xmul: float = 1.0, intensity_target: float = 80.0,
                           single_resolution: bool = False,
                           stop_check=None) -> np.ndarray:
    """Channel-plane-list variant of :func:`compute_diffmap`.

    ``stop_check``: optional callable polled at each SCALE boundary
    (before the full-res pass and before the half-res pass — never
    inside the per-pixel kernels, diff.rs:761-763); truthy return
    raises :class:`ButteraugliCancelled`."""
    h, w = c1[0].shape[-2:]
    small = w < MIN_SIZE_FOR_MULTIRESOLUTION or h < MIN_SIZE_FOR_MULTIRESOLUTION
    need_sub = (not single_resolution and not small
                and w >= MIN_SIZE_FOR_SUBSAMPLE and h >= MIN_SIZE_FOR_SUBSAMPLE)
    _poll_stop(stop_check, "full-resolution scale boundary")
    diffmap = compute_diffmap_single_resolution(c1, c2, hf_asymmetry,
                                                xmul, intensity_target)
    if need_sub:
        _poll_stop(stop_check, "half-resolution scale boundary")
        sub1 = [subsample_2x(p) for p in c1]
        sub2 = [subsample_2x(p) for p in c2]
        sub = compute_diffmap_single_resolution(sub1, sub2, hf_asymmetry,
                                                xmul, intensity_target)
        diffmap = add_supersampled_2x(sub, 0.5, diffmap)
    return diffmap
