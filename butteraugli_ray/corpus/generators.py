"""Deterministic synthetic image generators — bit-exact numpy port of the
reference test fixtures (/root/reference/butteraugli/tests/common/generators.rs).

Every generator returns interleaved sRGB u8 bytes of shape [h, w, 3]
(as a numpy uint8 array).  The LCG stream matches the reference exactly
(generators.rs:37-60), so the same case names yield byte-identical
images and the C++ golden scores apply.
"""

from __future__ import annotations

import numpy as np

_LCG_MUL = np.uint64(6364136223846793005)
_LCG_ADD = np.uint64(1442695040888963407)


_LCG_BLOCK = 1 << 16
_LCG_TABLES = None


def _lcg_tables():
    """Seed-independent jump tables MUL^i / prefix-ADD terms, built once
    per process (they make every lcg_stream call pure numpy)."""
    global _LCG_TABLES
    if _LCG_TABLES is None:
        muls = np.empty(_LCG_BLOCK, dtype=np.uint64)
        adds = np.empty(_LCG_BLOCK, dtype=np.uint64)
        m = np.uint64(1)
        a = np.uint64(0)
        with np.errstate(over="ignore"):
            for i in range(_LCG_BLOCK):
                m = m * _LCG_MUL
                a = a * _LCG_MUL + _LCG_ADD
                muls[i] = m
                adds[i] = a
        _LCG_TABLES = (muls, adds)
    return _LCG_TABLES


def lcg_stream(seed: int, n: int) -> np.ndarray:
    """n u8 draws of the reference LCG (generators.rs:46-52), vectorized.

    state_{k} = seed * MUL^k + ADD * (MUL^{k-1} + ... + 1)  (mod 2^64)
    computed blockwise with cached jump tables — exact wrap-around
    arithmetic via uint64.
    """
    muls, adds = _lcg_tables()
    out = np.empty(n, dtype=np.uint8)
    state = np.uint64(seed)
    with np.errstate(over="ignore"):
        pos = 0
        while pos < n:
            k = min(_LCG_BLOCK, n - pos)
            states = muls[:k] * state + adds[:k]
            out[pos:pos + k] = ((states >> np.uint64(33)) & np.uint64(0xFF)).astype(np.uint8)
            state = states[k - 1]
            pos += k
    return out


def lcg_u8_range(seed: int, n: int, lo: int, hi: int) -> np.ndarray:
    """next_u8_range (generators.rs:54-58)."""
    v = lcg_stream(seed, n).astype(np.uint64)
    rng = np.uint64(hi - lo + 1)
    return (np.uint64(lo) + v * rng // np.uint64(256)).astype(np.uint8)


# ---------------------------------------------------------------------------
# Base patterns (generators.rs:66-311)
# ---------------------------------------------------------------------------

def gen_uniform(w, h, r, g, b):
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = r, g, b
    return img


def gen_gradient_h(w, h):
    x = np.arange(w)
    val = (x * 255 // (w - 1)).astype(np.uint8) if w > 1 else np.full(w, 128, np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[None, :, :], h, axis=0)


def gen_gradient_v(w, h):
    y = np.arange(h)
    val = (y * 255 // (h - 1)).astype(np.uint8) if h > 1 else np.full(h, 128, np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[:, None, :], w, axis=1)


def gen_gradient_diag(w, h):
    md = w + h - 2
    y, x = np.mgrid[0:h, 0:w]
    val = ((x + y) * 255 // md).astype(np.uint8) if md > 0 else np.full((h, w), 128, np.uint8)
    return np.stack([val] * 3, axis=-1)


def gen_color_gradient(w, h):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // (w - 1)).astype(np.uint8) if w > 1 else np.full((h, w), 128, np.uint8)
    g = (y * 255 // (h - 1)).astype(np.uint8) if h > 1 else np.full((h, w), 128, np.uint8)
    b = np.full((h, w), 128, np.uint8)
    return np.stack([r, g, b], axis=-1)


def gen_checkerboard(w, h, block, lo, hi, inverse=False):
    y, x = np.mgrid[0:h, 0:w]
    rem = 1 if inverse else 0
    checker = ((x // block + y // block) % 2) == rem
    val = np.where(checker, np.uint8(hi), np.uint8(lo)).astype(np.uint8)
    return np.stack([val] * 3, axis=-1)


def gen_stripes_h(w, h, stripe, lo, hi):
    y = np.arange(h)
    val = np.where((y // stripe) % 2 == 0, np.uint8(hi), np.uint8(lo)).astype(np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[:, None, :], w, axis=1)


def gen_stripes_v(w, h, stripe, lo, hi):
    x = np.arange(w)
    val = np.where((x // stripe) % 2 == 0, np.uint8(hi), np.uint8(lo)).astype(np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[None, :, :], h, axis=0)


def gen_random(w, h, seed):
    return lcg_stream(seed, w * h * 3).reshape(h, w, 3)


def gen_random_midrange(w, h, seed):
    return lcg_u8_range(seed, w * h * 3, 32, 224).reshape(h, w, 3)


def gen_sine_wave(w, h, fx, fy):
    tau = np.float32(2 * np.pi)
    x = np.arange(w, dtype=np.float32)
    y = np.arange(h, dtype=np.float32)
    sx = np.sin(x * np.float32(fx) * tau / np.float32(w))
    sy = np.sin(y * np.float32(fy) * tau / np.float32(h))
    val = ((sx[None, :] + sy[:, None] + np.float32(2.0)) / np.float32(4.0)
           * np.float32(255.0)).astype(np.uint8)
    return np.stack([val] * 3, axis=-1)


def gen_radial(w, h):
    cx, cy = np.float32(w / 2.0), np.float32(h / 2.0)
    max_dist = np.float32(np.sqrt(np.float32(cx * cx + cy * cy)))
    y, x = np.mgrid[0:h, 0:w]
    dx = x.astype(np.float32) - cx
    dy = y.astype(np.float32) - cy
    dist = np.sqrt(dx * dx + dy * dy).astype(np.float32)
    val = np.clip((np.float32(1.0) - dist / max_dist) * np.float32(255.0),
                  0.0, 255.0).astype(np.uint8)
    return np.stack([val] * 3, axis=-1)


def gen_edge_v(w, h, lo, hi):
    x = np.arange(w)
    val = np.where(x < w // 2, np.uint8(lo), np.uint8(hi)).astype(np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[None, :, :], h, axis=0)


def gen_edge_h(w, h, lo, hi):
    y = np.arange(h)
    val = np.where(y < h // 2, np.uint8(lo), np.uint8(hi)).astype(np.uint8)
    return np.repeat(np.stack([val] * 3, axis=-1)[:, None, :], w, axis=1)


# ---------------------------------------------------------------------------
# Distortions (generators.rs:318-414)
# ---------------------------------------------------------------------------

def distort_brightness(img, delta):
    return np.clip(img.astype(np.int16) + np.int16(delta), 0, 255).astype(np.uint8)


def distort_noise(img, seed, amplitude):
    noise = lcg_stream(seed, img.size).astype(np.int16).reshape(img.shape) - 128
    prod = noise * np.int16(amplitude)
    # Rust integer division truncates toward zero (numpy // floors)
    scaled = np.sign(prod) * (np.abs(prod) // np.int16(128))
    return np.clip(img.astype(np.int16) + scaled, 0, 255).astype(np.uint8)


def distort_contrast(img, factor):
    centered = img.astype(np.float32) - np.float32(128.0)
    adjusted = centered * np.float32(factor) + np.float32(128.0)
    return np.clip(adjusted, 0.0, 255.0).astype(np.uint8)


def distort_gamma(img, g):
    normalized = img.astype(np.float32) / np.float32(255.0)
    adjusted = normalized ** np.float32(g)
    return np.clip(adjusted * np.float32(255.0), 0.0, 255.0).astype(np.uint8)


def distort_blur(img):
    """3×3 box blur with in-bounds averaging (generators.rs:359-383)."""
    h, w = img.shape[0], img.shape[1]
    acc = np.zeros((h, w, 3), dtype=np.uint32)
    count = np.zeros((h, w, 1), dtype=np.uint32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys0, ys1 = max(0, -dy), min(h, h - dy)
            xs0, xs1 = max(0, -dx), min(w, w - dx)
            acc[ys0:ys1, xs0:xs1] += img[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
            count[ys0:ys1, xs0:xs1] += 1
    return (acc // count).astype(np.uint8)


def distort_channel_swap_rb(img):
    return img[..., [2, 1, 0]].copy()


def distort_hue_shift(img):
    return img[..., [1, 2, 0]].copy()


def distort_quantize(img, levels):
    step = np.uint16(256 // levels)
    bucket = img.astype(np.uint16) // step
    return np.minimum(bucket * step + step // np.uint16(2), 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Name-driven pair generation (generators.rs:423-722)
# ---------------------------------------------------------------------------

_SEEDS = [0x12345678_9ABCDEF0, 0xDEADBEEF_CAFEBABE, 0x0BADC0DE_FEEDFACE,
          0x13371337_42424242, 0xAAAAAAAA_55555555]
_MID_SEED = 0xFEDCBA98_76543210
_RANDOM_COLOR_SEED = 0x1234567890ABCDEF


def parse_dimensions(name: str):
    last = name.rsplit("_", 1)[-1]
    if "x" not in last:
        return None
    ws, hs = last.split("x", 1)
    try:
        return int(ws), int(hs)
    except ValueError:
        return None


def _shift_of(parts):
    for i, p in enumerate(parts):
        if p == "shift" and i + 1 < len(parts):
            try:
                return int(parts[i + 1])
            except ValueError:
                return None
    return None


def generate_image_pair(name: str, width: int, height: int):
    """Returns (img_a, img_b) uint8 [h,w,3] or None (generators.rs:423+)."""
    parts = name.split("_")
    w, h = width, height

    if name.startswith("uniform_gray_128_shift_"):
        s = _shift_of(parts)
        v = (128 + s) & 0xFF
        return gen_uniform(w, h, 128, 128, 128), gen_uniform(w, h, v, v, v)
    if name.startswith("uniform_red_shift_"):
        s = _shift_of(parts)
        return gen_uniform(w, h, 128, 64, 64), gen_uniform(w, h, (128 + s) & 0xFF, 64, 64)
    if name.startswith("uniform_green_shift_"):
        s = _shift_of(parts)
        return gen_uniform(w, h, 64, 128, 64), gen_uniform(w, h, 64, (128 + s) & 0xFF, 64)
    if name.startswith("uniform_blue_shift_"):
        s = _shift_of(parts)
        return gen_uniform(w, h, 64, 64, 128), gen_uniform(w, h, 64, 64, (128 + s) & 0xFF)

    if name.startswith("gradient_h_shift_"):
        a = gen_gradient_h(w, h)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("gradient_v_shift_"):
        a = gen_gradient_v(w, h)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("gradient_diag_shift_"):
        a = gen_gradient_diag(w, h)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("color_gradient_shift_"):
        a = gen_color_gradient(w, h)
        return a, distort_brightness(a, _shift_of(parts))

    if name.startswith("checkerboard_vs_inverse_"):
        block = 1
        for p in parts:
            if p.endswith("px"):
                try:
                    block = int(p[:-2])
                except ValueError:
                    pass
        return (gen_checkerboard(w, h, block, 50, 200),
                gen_checkerboard(w, h, block, 50, 200, inverse=True))
    if name.startswith("checkerboard_shift_"):
        a = gen_checkerboard(w, h, 2, 50, 200)
        return a, distort_brightness(a, _shift_of(parts))

    if name.startswith("stripes_h_"):
        a = gen_stripes_h(w, h, 2, 50, 200)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("stripes_v_"):
        a = gen_stripes_v(w, h, 2, 50, 200)
        return a, distort_brightness(a, _shift_of(parts))

    if name.startswith("sine_"):
        if "1x1" in name:
            freq = 1.0
        elif "2x2" in name:
            freq = 2.0
        elif "4x4" in name:
            freq = 4.0
        else:
            return None
        a = gen_sine_wave(w, h, freq, freq)
        return a, distort_brightness(a, 10)

    if name.startswith("radial_shift_"):
        a = gen_radial(w, h)
        return a, distort_brightness(a, _shift_of(parts))

    if name.startswith("edge_v_shift_"):
        a = gen_edge_v(w, h, 50, 200)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("edge_h_shift_"):
        a = gen_edge_h(w, h, 50, 200)
        return a, distort_brightness(a, _shift_of(parts))
    if name.startswith("edge_v_vs_blur_"):
        a = gen_edge_v(w, h, 50, 200)
        return a, distort_blur(a)

    if name.startswith("random_seed") and "_shift_" in name:
        idx = int(next(p for p in parts if p.startswith("seed"))[4:])
        a = gen_random(w, h, _SEEDS[idx])
        return a, distort_brightness(a, 10)
    if name.startswith("random_seed") and "_noise_" in name:
        idx = int(next(p for p in parts if p.startswith("seed"))[4:])
        seed = _SEEDS[idx]
        a = gen_random(w, h, seed)
        return a, distort_noise(a, (seed + 1) & 0xFFFFFFFFFFFFFFFF, 20)

    if name.startswith("random_mid_contrast_"):
        a = gen_random_midrange(w, h, _MID_SEED)
        return a, distort_contrast(a, 1.2)
    if name.startswith("random_mid_gamma_"):
        a = gen_random_midrange(w, h, _MID_SEED)
        return a, distort_gamma(a, 0.9)
    if name.startswith("random_mid_blur_"):
        a = gen_random_midrange(w, h, _MID_SEED)
        return a, distort_blur(a)
    if name.startswith("random_mid_quantize_"):
        a = gen_random_midrange(w, h, _MID_SEED)
        return a, distort_quantize(a, 32)

    if name.startswith("color_grad_channel_swap_"):
        a = gen_color_gradient(w, h)
        return a, distort_channel_swap_rb(a)
    if name.startswith("color_grad_hue_shift_"):
        a = gen_color_gradient(w, h)
        return a, distort_hue_shift(a)
    if name.startswith("random_color_channel_swap_"):
        a = gen_random(w, h, _RANDOM_COLOR_SEED)
        return a, distort_channel_swap_rb(a)
    if name.startswith("random_color_hue_shift_"):
        a = gen_random(w, h, _RANDOM_COLOR_SEED)
        return a, distort_hue_shift(a)

    return None
