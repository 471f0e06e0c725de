"""Public scoring API: validated, padded, short-circuited butteraugli.

Mirrors the entry-point semantics of the reference
(/root/reference/butteraugli/src/lib.rs:668-759) — parameter validation,
dimension checks, reflect-101 padding of sub-8×8 inputs, identical-image
short-circuit, non-finite detection — but returns violation information
instead of raising where the engine wants violation rows.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import numpy as np

from . import kernels as K

BUTTERAUGLI_GOOD = 1.0
BUTTERAUGLI_BAD = 2.0


@dataclass(frozen=True)
class ButteraugliParams:
    """lib.rs:375-381 defaults; validate() per lib.rs:495-518."""

    hf_asymmetry: float = 1.0
    xmul: float = 1.0
    intensity_target: float = 80.0
    compute_diffmap: bool = False
    single_resolution: bool = False

    def validate(self) -> None:
        if not np.isfinite(self.hf_asymmetry) or self.hf_asymmetry <= 0.0:
            raise ValueError("hf_asymmetry must be finite and positive")
        if not np.isfinite(self.intensity_target) or self.intensity_target <= 0.0:
            raise ValueError("intensity_target must be finite and positive")
        if not np.isfinite(self.xmul) or self.xmul < 0.0:
            raise ValueError("xmul must be finite and non-negative")


@dataclass
class ButteraugliResult:
    score: float
    pnorm_3: float
    diffmap: Optional[np.ndarray] = None

    def pnorm(self, p: float) -> float:
        if abs(p - 3.0) < 1e-12:
            return self.pnorm_3
        if self.diffmap is None:
            raise ValueError("pnorm(p != 3) requires compute_diffmap=True")
        return K.pnorm_slice(self.diffmap, p)


def reflect_index(i: np.ndarray, n: int) -> np.ndarray:
    """Reflect-101 index fold (lib.rs:190-200)."""
    if n <= 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    k = i % period
    return np.where(k >= n, period - k, k)


def reflect_pad_to_min(img: np.ndarray, min_size: int = 8) -> np.ndarray:
    """Mirror-pad [h,w,...] up to min_size per axis (lib.rs:209-227);
    original pixels occupy the top-left region."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = max(h, min_size), max(w, min_size)
    if ph == h and pw == w:
        return img
    yi = reflect_index(np.arange(ph), h)
    xi = reflect_index(np.arange(pw), w)
    return img[np.ix_(yi, xi)]


def butteraugli_srgb(rgb1_u8: np.ndarray, rgb2_u8: np.ndarray,
                     params: ButteraugliParams = ButteraugliParams(),
                     stop_check=None) -> ButteraugliResult:
    """Score two sRGB u8 images of shape [h, w, 3] (lib.rs:699-759).

    ``stop_check``: polled at scale boundaries inside the compare
    (diff.rs:761-763); truthy → :class:`kernels.ButteraugliCancelled`."""
    params.validate()
    if rgb1_u8.shape != rgb2_u8.shape:
        raise ValueError(f"dimension mismatch: {rgb1_u8.shape} vs {rgb2_u8.shape}")
    h, w = rgb1_u8.shape[0], rgb1_u8.shape[1]
    if h == 0 or w == 0:
        raise ValueError("image too small")

    if np.array_equal(rgb1_u8, rgb2_u8):
        dm = np.zeros((h, w), dtype=np.float32) if params.compute_diffmap else None
        return ButteraugliResult(0.0, 0.0, dm)

    p1 = reflect_pad_to_min(rgb1_u8, 8)
    p2 = reflect_pad_to_min(rgb2_u8, 8)
    lin1 = K.srgb_to_linear_planar(p1)
    lin2 = K.srgb_to_linear_planar(p2)
    diffmap = K.compute_diffmap(lin1, lin2, params.hf_asymmetry, params.xmul,
                                params.intensity_target, params.single_resolution,
                                stop_check)
    score, pnorm3 = K.score_from_diffmap(diffmap)
    if not np.isfinite(score):
        raise FloatingPointError("non-finite butteraugli score")
    dm = diffmap[:h, :w] if params.compute_diffmap else None
    return ButteraugliResult(float(score), float(pnorm3), dm)


def butteraugli_linear(rgb1: np.ndarray, rgb2: np.ndarray,
                       params: ButteraugliParams = ButteraugliParams(),
                       stop_check=None) -> ButteraugliResult:
    """Score two linear RGB f32 images of shape [h, w, 3] (lib.rs:761+)."""
    params.validate()
    if rgb1.shape != rgb2.shape:
        raise ValueError(f"dimension mismatch: {rgb1.shape} vs {rgb2.shape}")
    h, w = rgb1.shape[0], rgb1.shape[1]
    if h == 0 or w == 0:
        raise ValueError("image too small")
    if not (np.isfinite(rgb1).all() and np.isfinite(rgb2).all()):
        raise FloatingPointError("non-finite input pixels")
    if np.array_equal(rgb1, rgb2):
        dm = np.zeros((h, w), dtype=np.float32) if params.compute_diffmap else None
        return ButteraugliResult(0.0, 0.0, dm)
    p1 = reflect_pad_to_min(rgb1, 8)
    p2 = reflect_pad_to_min(rgb2, 8)
    lin1 = np.ascontiguousarray(np.moveaxis(p1, -1, 0)).astype(np.float32)
    lin2 = np.ascontiguousarray(np.moveaxis(p2, -1, 0)).astype(np.float32)
    diffmap = K.compute_diffmap(lin1, lin2, params.hf_asymmetry, params.xmul,
                                params.intensity_target, params.single_resolution,
                                stop_check)
    score, pnorm3 = K.score_from_diffmap(diffmap)
    if not np.isfinite(score):
        raise FloatingPointError("non-finite butteraugli score")
    dm = diffmap[:h, :w] if params.compute_diffmap else None
    return ButteraugliResult(float(score), float(pnorm3), dm)


def _diffmap_stats(diffmaps: np.ndarray) -> dict:
    """Per-image diffmap summary stats (A5 at corpus scale):
    [N, h, w] → {max, mean, p99} float64[N]."""
    n = diffmaps.shape[0]
    flat = diffmaps.reshape(n, -1).astype(np.float64, copy=False)
    return {"diffmap_max": flat.max(axis=1),
            "diffmap_mean": flat.mean(axis=1),
            "diffmap_p99": np.quantile(flat, 0.99, axis=1)}


def butteraugli_srgb_batch(rgb1_u8: np.ndarray, rgb2_u8: np.ndarray,
                           params: ButteraugliParams = ButteraugliParams(),
                           stop_check=None, pnorm_p: float = 3.0,
                           return_stats: bool = False):
    """Score N same-size pairs in one stacked pass: [N, h, w, 3] u8 on
    both sides → (scores[N], pnorms[N]).  The kernels are batch-aware,
    so both pyramids compute stacked; per-pair identical-image
    short-circuits apply.  Requires h, w ≥ 8 (no per-image padding in
    the batched path).  ``params`` (lib.rs:375-381) is honored exactly
    as in the one-shot path.  ``pnorm_p`` selects the generic libjxl
    p-norm (lib.rs:556-577); 3.0 uses the fused-reduction fast path.
    ``return_stats=True`` appends a third return: per-pair diffmap
    {max, mean, p99} from the already-computed stack (no extra
    pyramid work)."""
    params.validate()
    generic_p = abs(pnorm_p - 3.0) > 1e-12
    if rgb1_u8.shape != rgb2_u8.shape:
        raise ValueError(f"dimension mismatch: {rgb1_u8.shape} vs {rgb2_u8.shape}")
    n, h, w = rgb1_u8.shape[0], rgb1_u8.shape[1], rgb1_u8.shape[2]
    if h < 8 or w < 8:
        scores = np.empty(n)
        pnorms = np.empty(n)
        sub_params = (replace(params, compute_diffmap=True)
                      if generic_p or return_stats else params)
        dms = []
        for i in range(n):
            r = butteraugli_srgb(rgb1_u8[i], rgb2_u8[i], sub_params, stop_check)
            scores[i] = r.score
            pnorms[i] = r.pnorm(pnorm_p) if generic_p else r.pnorm_3
            if return_stats:
                dms.append(r.diffmap)
        if return_stats:
            return scores, pnorms, _diffmap_stats(np.stack(dms))
        return scores, pnorms
    lut = K.SRGB_TO_LINEAR_LUT
    lin1 = np.ascontiguousarray(np.moveaxis(lut[rgb1_u8], -1, -3))
    lin2 = np.ascontiguousarray(np.moveaxis(lut[rgb2_u8], -1, -3))
    diffmap = K.compute_diffmap(lin1, lin2, params.hf_asymmetry, params.xmul,
                                params.intensity_target, params.single_resolution,
                                stop_check)
    if generic_p:
        scores, _ = K.score_from_diffmap_batch(diffmap)
        pnorms = K.pnorm_slice_batch(diffmap[..., :h, :w], pnorm_p)
    else:
        scores, pnorms = K.score_from_diffmap_batch(diffmap)
    same = np.all(rgb1_u8.reshape(n, -1) == rgb2_u8.reshape(n, -1), axis=1)
    if same.any():
        scores = np.where(same, 0.0, scores)
        pnorms = np.where(same, 0.0, pnorms)
    if not np.isfinite(scores).all():
        raise FloatingPointError("non-finite butteraugli score in batch")
    scores = np.asarray(scores, dtype=np.float64)
    pnorms = np.asarray(pnorms, dtype=np.float64)
    if return_stats:
        stats = _diffmap_stats(diffmap[..., :h, :w])
        if same.any():
            for v in stats.values():
                v[same] = 0.0
        return scores, pnorms, stats
    return scores, pnorms


def score_pair(ref_bytes: bytes, dist_bytes: bytes, width: int, height: int,
               params: ButteraugliParams = ButteraugliParams()) -> ButteraugliResult:
    """Score two raw sRGB byte buffers (w*h*3, row-major) — the engine's
    media-column entry point."""
    n = width * height * 3
    if len(ref_bytes) != n or len(dist_bytes) != n:
        raise ValueError(f"buffer size mismatch: expected {n}")
    a = np.frombuffer(ref_bytes, dtype=np.uint8).reshape(height, width, 3)
    b = np.frombuffer(dist_bytes, dtype=np.uint8).reshape(height, width, 3)
    return butteraugli_srgb(a, b, params)
