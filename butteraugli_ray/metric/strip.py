"""Strip-mode scoring — bounded-memory tiling walk within one image
(/root/reference/butteraugli/src/strip.rs).

The walker processes the image in strips of ``strip_height`` interior
rows plus up to ``halo`` context rows on each side (HALO_ROWS_DEFAULT=64
covers the full-res + half-res FIR dependency chain, strip.rs:13-36),
recomputes each strip's diffmap through the full pipeline, and reduces
interior rows with the mergeable ``StripReducer`` state
(strip.rs:127-209) — the commutative-monoid shape every distributed
aggregate in this engine follows.

Engine role: oversized media are scored strip-wise INSIDE one actor call
(peak memory O(strip_height × width), ~3× lower than full-image,
benchmarks/strip_vs_full_mem_2026-06-23.tsv), while corpus-level
parallelism stays at the document level.  Interior diffmap rows are
bit-identical to the full computation; scores agree within ~1e-2
(README.md:277-285).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .api import ButteraugliParams, ButteraugliResult

HALO_ROWS_DEFAULT = 64
STRIP_ALIGNMENT = 2
MIN_STRIP_HEIGHT = 8


def _next_multiple(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


class StripCancelled(K.ButteraugliCancelled):
    """Raised when ``stop_check`` signals cancellation between strips
    (the engine analog of ``ButteraugliError::Cancelled``); a subclass
    of :class:`kernels.ButteraugliCancelled` so one except-clause covers
    both strip-boundary and in-compare scale-boundary cancellation."""


def butteraugli_strip(rgb1_u8: np.ndarray, rgb2_u8: np.ndarray,
                      strip_height: int = 256,
                      halo: int = HALO_ROWS_DEFAULT,
                      params: ButteraugliParams = ButteraugliParams(),
                      stop_check=None) -> ButteraugliResult:
    """Strip-walk score of two sRGB u8 [h, w, 3] images
    (strip.rs:491-581 semantics).

    Unlike the one-shot path, images below 8×8 are rejected
    (strip.rs:428-434) rather than padded.
    """
    params.validate()
    if rgb1_u8.shape != rgb2_u8.shape:
        raise ValueError(f"dimension mismatch: {rgb1_u8.shape} vs {rgb2_u8.shape}")
    h, w = rgb1_u8.shape[0], rgb1_u8.shape[1]
    if h < 8 or w < 8:
        raise ValueError("image too small for strip mode (min 8x8)")
    if strip_height < MIN_STRIP_HEIGHT:
        raise ValueError(f"strip_height must be >= {MIN_STRIP_HEIGHT}")

    if np.array_equal(rgb1_u8, rgb2_u8):
        dm = np.zeros((h, w), dtype=np.float32) if params.compute_diffmap else None
        return ButteraugliResult(0.0, 0.0, dm)

    lin1 = K.srgb_to_linear_planar(rgb1_u8)
    lin2 = K.srgb_to_linear_planar(rgb2_u8)
    return butteraugli_strip_linear_planar(lin1, lin2, strip_height, halo,
                                           params, stop_check)


def butteraugli_strip_linear_planar(lin1: np.ndarray, lin2: np.ndarray,
                                    strip_height: int = 256,
                                    halo: int = HALO_ROWS_DEFAULT,
                                    params: ButteraugliParams = ButteraugliParams(),
                                    stop_check=None) -> ButteraugliResult:
    """Strip walk over linear planar [3, h, w] images.

    ``stop_check``: optional callable polled at each strip boundary
    (never inside the per-pixel kernels — strip.rs:511-513 semantics);
    return truthy to cancel → raises :class:`StripCancelled`.
    """
    h, w = lin1.shape[1], lin1.shape[2]
    partials = []
    full_diffmap = (np.zeros((h, w), dtype=np.float32)
                    if params.compute_diffmap else None)

    y = 0
    while y < h:
        if stop_check is not None and stop_check():
            raise StripCancelled(f"cancelled at strip row {y}/{h}")
        next_y = _next_multiple(y + strip_height, STRIP_ALIGNMENT)
        if next_y >= h or h - next_y < STRIP_ALIGNMENT:
            next_y = h
        halo_above = min(halo, y)
        halo_below = min(halo, h - next_y)
        y0, y1 = y - halo_above, next_y + halo_below

        c1 = [lin1[c, y0:y1, :] for c in range(3)]
        c2 = [lin2[c, y0:y1, :] for c in range(3)]
        diffmap = K.compute_diffmap_planes(
            c1, c2, params.hf_asymmetry, params.xmul,
            params.intensity_target, params.single_resolution)

        i0, i1 = y - y0, next_y - y0
        partials.append(K.diffmap_partials(diffmap[i0:i1, :]))
        if full_diffmap is not None:
            full_diffmap[y:next_y, :] = diffmap[i0:i1, :]
        y = next_y

    merged = K.merge_partials(partials)
    merged["pixels"] = h * w          # finalise over total pixels (strip.rs:570)
    score, pnorm3 = K.finalize_partials(merged)
    if not np.isfinite(score):
        raise FloatingPointError("non-finite strip score")
    return ButteraugliResult(float(score), float(pnorm3), full_diffmap)


def estimated_strip_peak_bytes(width: int, strip_height: int,
                               halo: int = HALO_ROWS_DEFAULT) -> int:
    """A-priori peak-memory estimate for actor budgeting (the
    precompute.rs:789 ``estimated_reference_bytes`` analog): ~40 planes
    of (strip+2·halo)×width f32 across both images and scales."""
    rows = strip_height + 2 * halo
    return 40 * rows * width * 4
