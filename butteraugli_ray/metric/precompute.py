"""Warm-reference precompute — the engine analog of
``ButteraugliReference`` (/root/reference/butteraugli/src/precompute.rs:127-1020).

A ``ReferencePrecompute`` holds the reference image's psycho pyramids and
mask-pipeline intermediates at full and half scale, so repeated compares
against the same reference only pay the candidate-side work (~40-50%
speedup in the reference; similar here).  This is exactly the state a Ray
actor-pool scorer keeps per worker.

``compare_srgb_batch`` scores N candidates in one fully-stacked numpy
pass (the kernels are batch-aware): the reference planes broadcast
against the candidate batch, cutting per-compare Python dispatch ~N×.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .api import ButteraugliParams, ButteraugliResult, reflect_pad_to_min


class _ScaleData:
    """Per-scale precomputed reference state (precompute.rs:45-58):
    psycho pyramid + combine/blur intermediates for the mask."""

    __slots__ = ("psycho", "blurred_mask", "mask", "chans")

    def __init__(self, chans: list, intensity_target: float):
        self.chans = chans
        xyb = K.opsin_dynamics_image_planes(chans, intensity_target)
        self.psycho = K.separate_frequencies(xyb)
        diff0 = K.combine_and_precompute(self.psycho.hf, self.psycho.uhf)
        self.blurred_mask = K.gaussian_blur(diff0, K.MASK_RADIUS)
        self.mask = K.fuzzy_erosion(self.blurred_mask)


class ReferencePrecompute:
    """Build once per reference image; ``compare`` per candidate.

    Produces scores identical to the one-shot path: the pair mask is
    derived from the reference side's blur (fuzzy-eroded) plus the
    10·(b0−b1)² correction accumulated from the candidate side
    (mask.rs:433-482), exactly as ``compare_linear_impl``
    (precompute.rs:957-1020) does.
    """

    def __init__(self, rgb_u8: np.ndarray,
                 params: ButteraugliParams = ButteraugliParams(),
                 strip_only: bool = False):
        """``strip_only=True`` retains ONLY the linear reference planes
        (no psycho pyramids / mask intermediates) — the bounded-memory
        mode for oversized references whose compares go through
        :meth:`compare_strip` (strip.rs:583-905: the strip walker never
        uses the per-resolution cache; the retained linear source is the
        warm part)."""
        params.validate()
        self.params = params
        h, w = rgb_u8.shape[0], rgb_u8.shape[1]
        if h == 0 or w == 0:
            raise ValueError("image too small")
        self.height, self.width = h, w
        self.src_u8 = rgb_u8
        padded = reflect_pad_to_min(rgb_u8, 8)
        lin = K.srgb_to_linear_planar(padded)          # [3, ph, pw]
        self.lin = lin
        self.full = None
        self.half = None
        self._strip_cache: tuple | None = None   # ((strip_h, halo), entries)
        if strip_only:
            return
        ph, pw = lin.shape[1], lin.shape[2]
        chans = [lin[0], lin[1], lin[2]]
        self.full = _ScaleData(chans, params.intensity_target)
        small = pw < K.MIN_SIZE_FOR_MULTIRESOLUTION or ph < K.MIN_SIZE_FOR_MULTIRESOLUTION
        if (not params.single_resolution and not small
                and pw >= K.MIN_SIZE_FOR_SUBSAMPLE and ph >= K.MIN_SIZE_FOR_SUBSAMPLE):
            sub = [K.subsample_2x(c) for c in chans]
            self.half = _ScaleData(sub, params.intensity_target)

    @staticmethod
    def _scale_data_bytes(sd: "_ScaleData") -> int:
        total = sum(c.nbytes for c in sd.chans)
        total += sd.blurred_mask.nbytes + sd.mask.nbytes
        ps = sd.psycho
        total += sum(p.nbytes for p in ps.uhf) + sum(p.nbytes for p in ps.hf)
        total += sum(p.nbytes for p in ps.mf) + sum(p.nbytes for p in ps.lf)
        return total

    def memory_bytes(self) -> int:
        """Rough actor-budget accounting (precompute.rs:733-834 analog);
        includes the per-strip warm cache when built."""
        total = self.lin.nbytes
        for sd in (self.full, self.half):
            if sd is not None:
                total += self._scale_data_bytes(sd)
        if self._strip_cache is not None:
            for entry in self._strip_cache[1]:
                for sd in entry[4:6]:
                    if sd is not None:
                        total += self._scale_data_bytes(sd)
        return total

    def _compare_scale(self, sd: _ScaleData, cand_chans: list) -> np.ndarray:
        """cand_chans: candidate channel planes, possibly batched
        ([N, h, w]); the reference-side planes broadcast."""
        params = self.params
        ps1 = sd.psycho
        ps2 = K.separate_frequencies(
            K.opsin_dynamics_image_planes(cand_chans, params.intensity_target))
        block_diff_ac = K.compute_psycho_diff_malta(ps1, ps2, params.hf_asymmetry)
        # candidate-side mask correction against the precomputed blur
        diff1 = K.combine_and_precompute(ps2.hf, ps2.uhf)
        blurred1 = K.gaussian_blur(diff1, K.MASK_RADIUS)
        d = sd.blurred_mask - blurred1
        block_diff_ac[1] = block_diff_ac[1] + d * d * K.MASK_TO_ERROR_MUL
        return K.combine_channels_to_diffmap_fused(sd.mask, ps1.lf, ps2.lf,
                                                   block_diff_ac, params.xmul)

    def _diffmap_for(self, lin2: np.ndarray, stop_check=None) -> np.ndarray:
        """lin2: [..., 3, h, w] linear candidate planes.  ``stop_check``
        is polled at each scale boundary (diff.rs:761-763)."""
        if self.full is None:
            raise ValueError("strip_only reference: use compare_strip / "
                             "compare_strip_bytes (no precomputed pyramids)")
        cand = [lin2[..., 0, :, :], lin2[..., 1, :, :], lin2[..., 2, :, :]]
        K._poll_stop(stop_check, "full-resolution scale boundary")
        diffmap = self._compare_scale(self.full, cand)
        if self.half is not None:
            K._poll_stop(stop_check, "half-resolution scale boundary")
            sub2 = [K.subsample_2x(c) for c in cand]
            sub = self._compare_scale(self.half, sub2)
            diffmap = K.add_supersampled_2x(sub, 0.5, diffmap)
        return diffmap

    def compare_srgb(self, cand_u8: np.ndarray,
                     stop_check=None) -> ButteraugliResult:
        if cand_u8.shape != self.src_u8.shape:
            raise ValueError(f"dimension mismatch: {cand_u8.shape} vs {self.src_u8.shape}")
        if np.array_equal(cand_u8, self.src_u8):
            return ButteraugliResult(0.0, 0.0, None)
        lin2 = K.srgb_to_linear_planar(reflect_pad_to_min(cand_u8, 8))
        diffmap = self._diffmap_for(lin2, stop_check)
        score, pnorm3 = K.score_from_diffmap(diffmap)
        dm = diffmap[:self.height, :self.width] if self.params.compute_diffmap else None
        return ButteraugliResult(float(score), float(pnorm3), dm)

    def compare_srgb_batch(self, cands_u8: np.ndarray, stop_check=None):
        """Score N candidates at once: [N, h, w, 3] u8 →
        (scores[N], pnorm3[N]) float64 arrays."""
        n, h, w = cands_u8.shape[0], cands_u8.shape[1], cands_u8.shape[2]
        if (h, w) != (self.height, self.width):
            raise ValueError(f"dimension mismatch: {(h, w)} vs "
                             f"{(self.height, self.width)}")
        if h < 8 or w < 8:
            # reflect-padding path is per-image; fall back
            scores = np.empty(n)
            pnorms = np.empty(n)
            for i in range(n):
                r = self.compare_srgb(cands_u8[i])
                scores[i], pnorms[i] = r.score, r.pnorm_3
            return scores, pnorms
        lut = K.SRGB_TO_LINEAR_LUT
        lin2 = np.ascontiguousarray(
            np.moveaxis(lut[cands_u8], -1, -3))        # [N, 3, h, w]
        diffmap = self._diffmap_for(lin2, stop_check)
        scores, pnorms = K.score_from_diffmap_batch(diffmap)
        # identical-candidate short-circuit (diff.rs:766-772)
        same = np.all(cands_u8.reshape(n, -1) == self.src_u8.reshape(1, -1),
                      axis=1)
        if same.any():
            scores = np.where(same, 0.0, scores)
            pnorms = np.where(same, 0.0, pnorms)
        return np.asarray(scores, dtype=np.float64), np.asarray(pnorms, dtype=np.float64)

    def compare_bytes(self, cand_bytes: bytes) -> ButteraugliResult:
        cand = np.frombuffer(cand_bytes, dtype=np.uint8).reshape(
            self.height, self.width, 3)
        return self.compare_srgb(cand)

    # ---- warm strip compares (strip.rs:583-905) --------------------------

    def prepare_strip_cache(self, strip_height: int = 256,
                            halo: int | None = None) -> int:
        """Build (or rebuild) the PER-STRIP reference-side cache:
        psycho pyramids + mask-blur intermediates of every strip slab,
        so repeated ``compare_strip(cache_reference=True)`` calls pay
        only candidate-side work — the strip analog of the one-shot
        warm precompute (precompute.rs:127-152), extending the warm
        part past the linear planes where it previously stopped.

        Memory trade: the cache totals ≈ full-image pyramids (plus halo
        overlap), so it's OPT-IN — a strip_only reference keeps its
        bounded-memory contract unless the caller asks for the cache.
        Returns the cache size in bytes (ST3 budgeting input)."""
        from .strip import HALO_ROWS_DEFAULT, STRIP_ALIGNMENT, _next_multiple
        halo = HALO_ROWS_DEFAULT if halo is None else halo
        key = (strip_height, halo)
        if self._strip_cache is not None and self._strip_cache[0] == key:
            pass
        else:
            h, w = self.lin.shape[1], self.lin.shape[2]
            it = self.params.intensity_target
            entries = []
            y = 0
            while y < h:
                next_y = _next_multiple(y + strip_height, STRIP_ALIGNMENT)
                if next_y >= h or h - next_y < STRIP_ALIGNMENT:
                    next_y = h
                y0 = y - min(halo, y)
                y1 = next_y + min(halo, h - next_y)
                chans = [self.lin[c, y0:y1, :] for c in range(3)]
                sd_full = _ScaleData(chans, it)
                sh = y1 - y0
                small = (w < K.MIN_SIZE_FOR_MULTIRESOLUTION
                         or sh < K.MIN_SIZE_FOR_MULTIRESOLUTION)
                sd_half = None
                if (not self.params.single_resolution and not small
                        and w >= K.MIN_SIZE_FOR_SUBSAMPLE
                        and sh >= K.MIN_SIZE_FOR_SUBSAMPLE):
                    sd_half = _ScaleData([K.subsample_2x(c) for c in chans],
                                         it)
                entries.append((y, next_y, y0, y1, sd_full, sd_half))
                y = next_y
            self._strip_cache = (key, entries)
        return sum(self._scale_data_bytes(sd)
                   for e in self._strip_cache[1]
                   for sd in e[4:6] if sd is not None)

    def _compare_strip_warm(self, lin2: np.ndarray, strip_height: int,
                            halo: int, stop_check=None) -> ButteraugliResult:
        """Warm strip walk: reference-side slab pyramids come from the
        cache (built on demand); candidate-side work per strip mirrors
        ``_compare_scale``.  Scores match the uncached strip walk to
        float-order noise (same ~1e-6 class as warm-vs-oneshot)."""
        self.prepare_strip_cache(strip_height, halo)
        h, w = self.lin.shape[1], self.lin.shape[2]
        partials = []
        full_diffmap = (np.zeros((h, w), dtype=np.float32)
                        if self.params.compute_diffmap else None)
        for (y, next_y, y0, y1, sd_full, sd_half) in self._strip_cache[1]:
            K._poll_stop(stop_check, f"strip boundary row {y}/{h}")
            cand = [lin2[c, y0:y1, :] for c in range(3)]
            diffmap = self._compare_scale(sd_full, cand)
            if sd_half is not None:
                sub2 = [K.subsample_2x(c) for c in cand]
                sub = self._compare_scale(sd_half, sub2)
                diffmap = K.add_supersampled_2x(sub, 0.5, diffmap)
            i0, i1 = y - y0, next_y - y0
            partials.append(K.diffmap_partials(diffmap[i0:i1, :]))
            if full_diffmap is not None:
                full_diffmap[y:next_y, :] = diffmap[i0:i1, :]
        merged = K.merge_partials(partials)
        merged["pixels"] = h * w
        score, pnorm3 = K.finalize_partials(merged)
        if not np.isfinite(score):
            raise FloatingPointError("non-finite strip score")
        return ButteraugliResult(float(score), float(pnorm3), full_diffmap)

    def compare_strip(self, cand_u8: np.ndarray, strip_height: int = 256,
                      halo: int | None = None,
                      stop_check=None,
                      cache_reference: bool = False) -> ButteraugliResult:
        """Strip-bounded compare against the retained reference.

        Mirrors ``ButteraugliReference::compare_strip``
        (strip.rs:583-619): the per-resolution cache is NOT used — the
        strip walker recomputes reference-side blurs per strip so both
        sides share FIR boundary handling; the retained LINEAR reference
        planes are the warm part (the sRGB→linear LUT pass is skipped).
        Peak memory is O((strip_height + 2·halo) × width), so a
        ``strip_only=True`` reference never materialises full-image
        pyramids at all.  ``stop_check`` is polled once per strip
        (strip.rs:608-613).
        """
        from .strip import HALO_ROWS_DEFAULT, butteraugli_strip_linear_planar
        if cand_u8.shape != self.src_u8.shape:
            raise ValueError(f"dimension mismatch: {cand_u8.shape} vs "
                             f"{self.src_u8.shape}")
        if np.array_equal(cand_u8, self.src_u8):
            dm = (np.zeros((self.height, self.width), np.float32)
                  if self.params.compute_diffmap else None)
            return ButteraugliResult(0.0, 0.0, dm)
        lin2 = K.srgb_to_linear_planar(reflect_pad_to_min(cand_u8, 8))
        if cache_reference:
            return self._compare_strip_warm(
                lin2, strip_height,
                HALO_ROWS_DEFAULT if halo is None else halo, stop_check)
        return butteraugli_strip_linear_planar(
            self.lin, lin2, strip_height,
            HALO_ROWS_DEFAULT if halo is None else halo,
            self.params, stop_check)

    def compare_strip_bytes(self, cand_bytes: bytes, strip_height: int = 256,
                            halo: int | None = None,
                            stop_check=None) -> ButteraugliResult:
        cand = np.frombuffer(cand_bytes, dtype=np.uint8).reshape(
            self.height, self.width, 3)
        return self.compare_strip(cand, strip_height, halo, stop_check)
