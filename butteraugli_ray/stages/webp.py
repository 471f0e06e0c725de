"""Pure-Python WebP *lossless* (VP8L) codec.

The reference CLI's batch mode accepts webp
(/root/reference/butteraugli-cli/src/main.rs:92-98).  Lossy WebP (VP8)
needs a full video-intra decoder and stays behind the import-try stub,
but the LOSSLESS variant is a self-contained entropy format —
implemented here from the public "WebP Lossless Bitstream
Specification": LSB-first bit reader, canonical prefix codes
(simple + complex with RFC1951-style code-length coding), optional
meta-prefix groups, color cache, LZ77 backward references with the
2-D distance mapping, and the four inverse transforms (predictor /
color / subtract-green / color-indexing incl. sub-byte bundling).

``encode_webp_lossless`` is a minimal spec-conformant encoder
(literal-only, single prefix group, optional subtract-green) used by
the tests' round trips; hand-assembled bit-level vectors cover the
simple-code and cache paths independently.

Perf note (round 5): the decoder is vectorized end to end — buffered
LSB-first bit reader, 12-bit-window LUT prefix decode (inlined for
the single-group case), slice-copy LZ77, a d = 2y + x wavefront for
the inverse predictor transform (TR lands on diagonal d-1, so every
dependency is an earlier diagonal), and whole-plane numpy for the
color / subtract-green / palette transforms (~12x overall; the
spec-literal scalar predictor stays as the differential oracle).
"""

from __future__ import annotations

import struct

import numpy as np

# code-length-code order (spec 5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]

# 2-D distance mapping: the first 120 distance codes address nearby
# pixels as (xoffset, yoffset) neighbors (spec 4.2.2)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7)]


class _Bits:
    """LSB-first bit reader (DEFLATE convention, per spec 3).

    Round 5: buffered accumulator (bit 0 of ``acc`` = next stream bit)
    refilled a byte at a time instead of the old per-bit indexing; the
    ``_Huff`` LUT decoder reaches into the same fields directly."""

    __slots__ = ("data", "n", "pos", "acc", "nb")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0          # next byte index
        self.acc = 0
        self.nb = 0

    def read(self, n: int) -> int:
        acc, nb, pos = self.acc, self.nb, self.pos
        data, nd = self.data, self.n
        while nb < n:
            if pos >= nd:
                raise ValueError("VP8L bitstream exhausted")
            acc |= data[pos] << nb
            pos += 1
            nb += 8
        self.acc = acc >> n
        self.nb = nb - n
        self.pos = pos
        return acc & ((1 << n) - 1)


_LUTBITS = 12


class _Huff:
    """Canonical prefix code: RFC1951 canonical assignment over
    (length, symbol) order, codes transmitted MSB-first inside the
    LSB-first stream.

    Round 5: a 2^12-entry LUT keyed by the next 12 STREAM bits decodes
    any code of length <= 12 (symbol and length) in one list lookup;
    the rare 13-15-bit codes fall back to the bit-by-bit dict walk."""

    __slots__ = ("table", "single", "lut")

    def __init__(self, lengths):
        self.table = {}
        self.single = None
        self.lut = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) <= 1:
            # 0-bit code (single symbol); empty lengths are only legal
            # for the caller that injects .single afterwards
            self.single = nz[0][1] if nz else None
            return
        code = 0
        last_len = 0
        lut = np.full(1 << _LUTBITS, -1, np.int64)
        for length, sym in sorted(nz):
            code <<= (length - last_len)
            self.table[(length, code)] = sym
            if length <= _LUTBITS:
                rev = 0
                c = code
                for _ in range(length):
                    rev = (rev << 1) | (c & 1)
                    c >>= 1
                lut[rev::1 << length] = (sym << 4) | length
            code += 1
            last_len = length
        # completeness check (spec requires complete codes)
        kraft = sum(2.0 ** -l for l, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("incomplete VP8L prefix code")
        self.lut = lut.tolist()

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        if self.lut is None:
            raise ValueError("empty VP8L prefix code used")
        acc, nb, pos = br.acc, br.nb, br.pos
        data, nd = br.data, br.n
        while nb < 15 and pos < nd:
            acc |= data[pos] << nb
            pos += 1
            nb += 8
        e = self.lut[acc & 4095]
        if e >= 0:
            ln = e & 15
            if ln > nb:
                raise ValueError("VP8L bitstream exhausted")
            br.acc = acc >> ln
            br.nb = nb - ln
            br.pos = pos
            return e >> 4
        code = 0
        table_get = self.table.get
        for length in range(1, 16):
            if length > nb:
                raise ValueError("VP8L bitstream exhausted")
            code = (code << 1) | ((acc >> (length - 1)) & 1)
            sym = table_get((length, code))
            if sym is not None:
                br.acc = acc >> length
                br.nb = nb - length
                br.pos = pos
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_code_lengths(br: _Bits, alphabet: int) -> list:
    """Complex prefix-code reader (spec 5.2.2)."""
    lengths = [0] * alphabet
    n_clc = 4 + br.read(4)
    clc = [0] * 19
    for i in range(n_clc):
        clc[_CLC_ORDER[i]] = br.read(3)
    clh = _Huff(clc)
    max_symbol = alphabet
    if br.read(1):                            # use length / max_symbol
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    i = 0
    prev = 8
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clh.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:                                 # 18
            i += 11 + br.read(7)
    return lengths


def _read_prefix_code(br: _Bits, alphabet: int) -> _Huff:
    if br.read(1):                            # simple code (spec 5.2.1)
        n_sym = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet
        if n_sym == 1:
            lengths[sym0] = 1                 # becomes the 0-bit single
            h = _Huff([0] * alphabet)
            h.single = sym0
            return h
        sym1 = br.read(8)
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Huff(lengths)
    return _Huff(_read_code_lengths(br, alphabet))


def _prefix_value(br: _Bits, p: int) -> int:
    """length/distance prefix → value (spec 4.2.2)."""
    if p < 4:
        return p + 1
    xb = (p - 2) >> 1
    base = (2 + (p & 1)) << xb
    return base + br.read(xb) + 1


def _decode_entropy_image(br: _Bits, w: int, h: int,
                          allow_meta: bool) -> np.ndarray:
    """Spatially-coded ARGB image (spec 5): returns uint32 [h, w]."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color-cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        mimg = _decode_entropy_image(br, mw, mh, False)
        meta = ((mimg >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((_read_prefix_code(br, green_alpha),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))

    # hot loop in plain Python ints: list-backed pixel buffer, one LUT
    # lookup per prefix code, slice copies for long backward refs
    out = [0] * (w * h)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    meta_rows = meta.tolist() if meta is not None else None
    npix = w * h
    pos = 0
    g = groups[0]
    gg, gr, gb, ga, gd = g
    if meta_rows is None:
        # single-group specialization: the four per-pixel prefix
        # decodes are inlined (no method-call overhead); rare >12-bit
        # codes and the LZ77/cache tails reuse the general machinery
        gsi, glut = gg.single, gg.lut
        rsi, rlut = gr.single, gr.lut
        bsi, blut = gb.single, gb.lut
        asi, alut = ga.single, ga.lut
        data, nd = br.data, br.n
        acc, nb, pos_b = br.acc, br.nb, br.pos
        while pos < npix:
            if gsi is None:
                while nb < 15 and pos_b < nd:
                    acc |= data[pos_b] << nb
                    pos_b += 1
                    nb += 8
                e = glut[acc & 4095]
                if e >= 0:
                    ln = e & 15
                    if ln > nb:
                        raise ValueError("VP8L bitstream exhausted")
                    s = e >> 4
                    acc >>= ln
                    nb -= ln
                else:
                    br.acc, br.nb, br.pos = acc, nb, pos_b
                    s = gg.decode(br)
                    acc, nb, pos_b = br.acc, br.nb, br.pos
            else:
                s = gsi
            if s < 256:
                if rsi is None:
                    while nb < 15 and pos_b < nd:
                        acc |= data[pos_b] << nb
                        pos_b += 1
                        nb += 8
                    e = rlut[acc & 4095]
                    if e >= 0:
                        ln = e & 15
                        if ln > nb:
                            raise ValueError("VP8L bitstream exhausted")
                        red = e >> 4
                        acc >>= ln
                        nb -= ln
                    else:
                        br.acc, br.nb, br.pos = acc, nb, pos_b
                        red = gr.decode(br)
                        acc, nb, pos_b = br.acc, br.nb, br.pos
                else:
                    red = rsi
                if bsi is None:
                    while nb < 15 and pos_b < nd:
                        acc |= data[pos_b] << nb
                        pos_b += 1
                        nb += 8
                    e = blut[acc & 4095]
                    if e >= 0:
                        ln = e & 15
                        if ln > nb:
                            raise ValueError("VP8L bitstream exhausted")
                        blue = e >> 4
                        acc >>= ln
                        nb -= ln
                    else:
                        br.acc, br.nb, br.pos = acc, nb, pos_b
                        blue = gb.decode(br)
                        acc, nb, pos_b = br.acc, br.nb, br.pos
                else:
                    blue = bsi
                if asi is None:
                    while nb < 15 and pos_b < nd:
                        acc |= data[pos_b] << nb
                        pos_b += 1
                        nb += 8
                    e = alut[acc & 4095]
                    if e >= 0:
                        ln = e & 15
                        if ln > nb:
                            raise ValueError("VP8L bitstream exhausted")
                        alpha = e >> 4
                        acc >>= ln
                        nb -= ln
                    else:
                        br.acc, br.nb, br.pos = acc, nb, pos_b
                        alpha = ga.decode(br)
                        acc, nb, pos_b = br.acc, br.nb, br.pos
                else:
                    alpha = asi
                px = (alpha << 24) | (red << 16) | (s << 8) | blue
                out[pos] = px
                if cache is not None:
                    cache[((px * 0x1E35A7BD) & 0xFFFFFFFF) >> shift] = px
                pos += 1
            elif s < 280:
                br.acc, br.nb, br.pos = acc, nb, pos_b
                length = _prefix_value(br, s - 256)
                dcode = _prefix_value(br, gd.decode(br))
                acc, nb, pos_b = br.acc, br.nb, br.pos
                if dcode > 120:
                    dist = dcode - 120
                else:
                    dx, dy = _DIST_MAP[dcode - 1]
                    dist = dy * w + dx
                    if dist < 1:
                        dist = 1
                if dist > pos:
                    raise ValueError("VP8L backward reference before "
                                     "start")
                end = pos + length
                if end > npix:
                    end = npix
                if cache is None and dist >= 8:
                    while pos < end:
                        n = dist if dist < end - pos else end - pos
                        out[pos:pos + n] = out[pos - dist:pos - dist + n]
                        pos += n
                else:
                    while pos < end:
                        px = out[pos - dist]
                        out[pos] = px
                        if cache is not None:
                            cache[((px * 0x1E35A7BD) & 0xFFFFFFFF)
                                  >> shift] = px
                        pos += 1
            else:
                out[pos] = cache[s - 280]
                pos += 1
        br.acc, br.nb, br.pos = acc, nb, pos_b
        return np.array(out, np.uint32).reshape(h, w)
    while pos < npix:
        if meta_rows is not None:
            g = groups[meta_rows[(pos // w) >> meta_bits]
                       [(pos % w) >> meta_bits]]
            gg, gr, gb, ga, gd = g
        s = gg.decode(br)
        if s < 256:
            red = gr.decode(br)
            blue = gb.decode(br)
            alpha = ga.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[((px * 0x1E35A7BD) & 0xFFFFFFFF) >> shift] = px
            pos += 1
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, gd.decode(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            end = pos + length
            if end > npix:
                end = npix
            if cache is None and dist >= 8:
                while pos < end:
                    n = dist if dist < end - pos else end - pos
                    out[pos:pos + n] = out[pos - dist:pos - dist + n]
                    pos += n
            else:
                while pos < end:
                    px = out[pos - dist]
                    out[pos] = px
                    if cache is not None:
                        cache[((px * 0x1E35A7BD) & 0xFFFFFFFF)
                              >> shift] = px
                    pos += 1
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return np.array(out, np.uint32).reshape(h, w)


def _cdelta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product >> 5 (spec 4.2.1.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _pred_mode(k: int, L, T, TL, TR):
    """Predictor mode k (spec 4.2.1.1) over [n, 4] int64 lanes."""
    if k == 0:
        return np.array([255, 0, 0, 0], np.int64)
    if k == 1:
        return L
    if k == 2:
        return T
    if k == 3:
        return TR
    if k == 4:
        return TL
    if k == 5:
        return ((L + TR) // 2 + T) // 2
    if k == 6:
        return (L + TL) // 2
    if k == 7:
        return (L + T) // 2
    if k == 8:
        return (TL + T) // 2
    if k == 9:
        return (T + TR) // 2
    if k == 10:
        return ((L + TL) // 2 + (T + TR) // 2) // 2
    if k == 11:                               # Select
        p = L + T - TL
        pl = np.abs(p - L).sum(axis=1)
        pt = np.abs(p - T).sum(axis=1)
        return np.where((pl < pt)[:, None], L, T)
    if k == 12:                               # ClampAddSubtractFull
        return np.clip(L + T - TL, 0, 255)
    # ClampAddSubtractHalf — C division truncates toward zero
    avg = (L + T) // 2
    d = avg - TL
    half = np.where(d < 0, -((-d) // 2), d // 2)
    return np.clip(avg + half, 0, 255)


def _inverse_predictor(img: np.ndarray, tiles: np.ndarray,
                       bits: int) -> None:
    """In-place inverse of the predictor transform (spec 4.2.1.1).
    ``img`` is int32 [h, w, 4] (a, r, g, b) of residuals → pixels.

    Round 5: vectorized on a d = 2y + x wavefront.  Every dependency
    lands on an earlier diagonal (L and TR on d-1, T on d-2, TL on
    d-3), so each step is numpy over rolling diagonal buffers; the
    edge rules need no special-casing because row 0 is forced to mode
    1 (LEFT), column 0 to mode 2 (TOP) and (0,0) to mode 0 (BLACK).
    The one x == w-1 pixel per step — whose TR wraps to img[y, 0] on
    the CURRENT row (RFC 9649 4.2.1.1) — is re-predicted scalar after
    the vector step.  Per-diagonal mode masks skip untaken branches;
    the spec-literal scalar path below is the differential oracle."""
    h, w = img.shape[:2]
    if h < 2 or w < 2:
        _inverse_predictor_scalar(img, tiles, bits)
        return
    from numpy.lib.stride_tricks import as_strided
    m = np.ascontiguousarray(
        np.repeat(np.repeat(tiles, 1 << bits, axis=0),
                  1 << bits, axis=1)[:h, :w].astype(np.int64))
    if (m > 13).any() or (m < 0).any():
        raise ValueError(f"bad predictor mode {int(m.max())}")
    m[0, :] = 1
    m[:, 0] = 2
    m[0, 0] = 0
    # per-diagonal OR of mode bits
    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    dflat = (2 * yy + xx).ravel()
    ndiag = 2 * h + w - 2
    order = np.argsort(dflat, kind="stable")
    cnt = np.bincount(dflat, minlength=ndiag)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    dmask = np.bitwise_or.reduceat((1 << m).ravel()[order],
                                   starts).tolist()
    s0, s1, s2 = img.strides
    ms0, ms1 = m.strides
    P1 = P2 = P3 = np.zeros((h + 1, 4), np.int64)
    for d in range(ndiag):
        y0 = 0 if d < w else (d - w + 2) // 2
        y1 = min(h - 1, d // 2) + 1
        n = y1 - y0
        x0 = d - 2 * y0
        X = as_strided(img[y0:, x0:], shape=(n, 4),
                       strides=(s0 - 2 * s1, s2))
        L = P1[y0 + 1:y1 + 1]
        TR = P1[y0:y1]
        T = P2[y0:y1]
        TL = P3[y0:y1]
        mask = dmask[d]
        if mask & (mask - 1) == 0:            # single mode on this diag
            pred = _pred_mode(mask.bit_length() - 1, L, T, TL, TR)
        else:
            mdv = as_strided(m[y0:, x0:], shape=(n,),
                             strides=(ms0 - 2 * ms1,))[:, None]
            conds = []
            choices = []
            k = 0
            mm = mask
            while mm:
                if mm & 1:
                    conds.append(mdv == k)
                    choices.append(_pred_mode(k, L, T, TL, TR))
                mm >>= 1
                k += 1
            pred = np.select(conds, choices)
        # right-edge pixel whose TR wraps to the current row's leftmost
        ye = -1
        if d >= w - 1 and (d - w + 1) % 2 == 0:
            ye = (d - w + 1) // 2
            if not (y0 <= ye < y1) or int(m[ye, w - 1]) not in (3, 5, 9,
                                                               10):
                ye = -1
        if ye >= 0:
            res_edge = X[ye - y0].copy()
        cur = (X + pred) & 0xFF
        C = np.zeros((h + 1, 4), np.int64)
        C[y0 + 1:y1 + 1] = cur
        X[:] = cur
        if ye >= 0:
            mode = int(m[ye, w - 1])
            Ls = img[ye, w - 2].astype(np.int64)
            Ts = img[ye - 1, w - 1].astype(np.int64)
            TRs = img[ye, 0].astype(np.int64)
            if mode == 3:
                ps = TRs
            elif mode == 5:
                ps = ((Ls + TRs) // 2 + Ts) // 2
            elif mode == 9:
                ps = (Ts + TRs) // 2
            else:
                TLs = img[ye - 1, w - 2].astype(np.int64)
                ps = ((Ls + TLs) // 2 + (Ts + TRs) // 2) // 2
            fixed = (res_edge + ps) & 0xFF
            img[ye, w - 1] = fixed
            C[ye + 1] = fixed
        P3 = P2
        P2 = P1
        P1 = C


def _inverse_predictor_scalar(img: np.ndarray, tiles: np.ndarray,
                              bits: int) -> None:
    """Spec-literal per-pixel inverse predictor — differential oracle
    for the wavefront path and the tiny-image (h<2 or w<2) fallback."""
    h, w = img.shape[:2]
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = img[0, x - 1]
            elif x == 0:
                pred = img[y - 1, 0]
            else:
                mode = int(tiles[y >> bits, x >> bits])
                L = img[y, x - 1].astype(np.int64)
                T = img[y - 1, x].astype(np.int64)
                TL = img[y - 1, x - 1].astype(np.int64)
                # RFC 9649 4.2.1.1: at the right edge TR wraps to the
                # LEFTMOST pixel of the CURRENT row (already decoded),
                # not the row above.
                TR = (img[y - 1, x + 1] if x + 1 < w
                      else img[y, 0]).astype(np.int64)
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = ((L + TR) // 2 + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif mode == 11:              # Select
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = L if pl < pt else T
                elif mode == 12:              # ClampAddSubtractFull
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:              # ClampAddSubtractHalf
                    # Spec uses C integer division (truncate toward 0),
                    # not Python floor division, for (avg - TL) / 2.
                    avg = (L + T) // 2
                    d = avg - TL
                    half = np.where(d < 0, -((-d) // 2), d // 2)
                    pred = np.clip(avg + half, 0, 255)
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            img[y, x] = (img[y, x] + pred) & 0xFF


def decode_webp(data: bytes) -> np.ndarray:
    """WebP (lossless/VP8L only) → uint8 [h, w, 3] RGB."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP header missing)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            payload = data[pos + 8:pos + 8 + ln]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP needs an image library; only "
                "lossless (VP8L) decodes natively")
        pos += 8 + ln + (ln & 1)
    if payload is None:
        raise ValueError("WebP has no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []
    xsize = w
    while br.read(1):
        t = br.read(2)
        if t == 0:                            # PREDICTOR
            bits = br.read(3) + 2
            tw, th = -(-xsize // (1 << bits)), -(-h // (1 << bits))
            timg = _decode_entropy_image(br, tw, th, False)
            transforms.append(("pred", bits,
                               ((timg >> 8) & 0xFF).astype(np.int64)))
        elif t == 1:                          # COLOR
            bits = br.read(3) + 2
            tw, th = -(-xsize // (1 << bits)), -(-h // (1 << bits))
            timg = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", bits, timg))
        elif t == 2:                          # SUBTRACT_GREEN
            transforms.append(("subg",))
        else:                                 # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, False)[0]
            # palette entries are delta-coded per channel
            pal = pal.view(np.uint32).astype(np.int64)
            deltas = np.stack([(pal >> 24) & 0xFF, (pal >> 16) & 0xFF,
                               (pal >> 8) & 0xFF, pal & 0xFF], axis=-1)
            entries = (np.cumsum(deltas, axis=0) & 0xFF).astype(np.uint8)
            if n_colors <= 2:
                pbits = 3                     # 8 px / byte-slot
            elif n_colors <= 4:
                pbits = 2
            elif n_colors <= 16:
                pbits = 1
            else:
                pbits = 0
            transforms.append(("palette", entries, pbits))
            xsize = -(-xsize // (1 << pbits)) if pbits else xsize

    argb = _decode_entropy_image(br, xsize, h, True)

    # inverse transforms in reverse reading order
    img = np.stack([(argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                    (argb >> 8) & 0xFF, argb & 0xFF],
                   axis=-1).astype(np.int32)   # (a, r, g, b)
    for tr in reversed(transforms):
        if tr[0] == "palette":
            entries, pbits = tr[1], tr[2]
            idx = img[:, :, 2]                # green carries the index
            if pbits:
                per = 1 << pbits
                bw = 8 >> pbits
                cols = []
                for sub in range(per):
                    cols.append((idx >> (sub * bw)) & ((1 << bw) - 1))
                idx = np.stack(cols, axis=-1).reshape(h, -1)[:, :w]
            if idx.max() >= len(entries):
                raise ValueError("palette index out of range")
            img = entries[idx].astype(np.int32)
        elif tr[0] == "subg":
            img[:, :, 1] = (img[:, :, 1] + img[:, :, 2]) & 0xFF
            img[:, :, 3] = (img[:, :, 3] + img[:, :, 2]) & 0xFF
        elif tr[0] == "color":
            # no sequential dependency: r' feeds b' but both are pure
            # per-pixel functions — fully vectorized (spec 4.2.1.2)
            bits, timg = tr[1], tr[2]
            hh, ww = img.shape[:2]
            cte = np.repeat(np.repeat(timg.astype(np.int64),
                                      1 << bits, axis=0),
                            1 << bits, axis=1)[:hh, :ww]

            def s8(v):
                return np.where(v >= 128, v - 256, v)

            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            g = s8(img[:, :, 2].astype(np.int64))
            r = (img[:, :, 1] + ((g2r * g) >> 5)) & 0xFF
            b = (img[:, :, 3] + ((g2b * g) >> 5)
                 + ((r2b * s8(r)) >> 5)) & 0xFF
            img[:, :, 1] = r
            img[:, :, 3] = b
        elif tr[0] == "pred":
            _inverse_predictor(img, tr[2], tr[1])
    return np.ascontiguousarray(img[:, :, 1:4]).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal encoder (literal-only, single group) for round-trip tests
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """prefix code bits, MSB of the code first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc |= b << (i & 7)
            if (i & 7) == 7:
                out.append(acc)
                acc = 0
        if len(self.bits) & 7:
            out.append(acc)
        return bytes(out)


def _complete_lengths(alphabet: int) -> list:
    """Kraft-complete two-level length assignment: n8 symbols at 8
    bits + rest at 9 with 2·n8 + n9 = 512 (valid for 257 ≤ alphabet
    ≤ 512); for alphabet ≤ 256 use flat 8-bit (complete iff == 256)
    else pad conceptually via lengths on a 256 alphabet."""
    if alphabet == 256:
        return [8] * 256
    if 257 <= alphabet <= 512:
        n8 = 512 - alphabet
        return [8] * n8 + [9] * (alphabet - n8)
    if alphabet == 40:                        # distance alphabet
        return [4] * 8 + [6] * 32             # 8/16 + 32/64 = 1
    raise ValueError(alphabet)


def _canon_codes(lengths):
    codes = {}
    code = 0
    last = 0
    for length, sym in sorted((l, s) for s, l in enumerate(lengths)
                              if l > 0):
        code <<= (length - last)
        codes[sym] = (code, length)
        code += 1
        last = length
    return codes


def _write_complex_code(bw: _BitWriter, lengths: list) -> None:
    """Emit a complex prefix code whose code-length alphabet is the
    distinct nonzero lengths present (each CL symbol gets an equal-
    length CL code)."""
    present = sorted({l for l in lengths if l > 0})
    clbits = max(1, (len(present) - 1).bit_length())
    # CL huffman must be complete: pad the CL alphabet with unused
    # present-values is impossible — instead assign lengths so Kraft
    # sums to 1: give the first (2^clbits - len(present)) symbols
    # shorter codes.  Simplest complete assignment: if len(present) is
    # a power of two, all codes get clbits.
    if len(present) & (len(present) - 1):
        raise ValueError("encoder supports power-of-two distinct lengths")
    cl_lengths = {p: clbits for p in present}
    # num_code_lengths must cover the largest CL symbol's position
    need = max(_CLC_ORDER.index(p) for p in present) + 1
    bw.write(0, 1)                            # complex (not simple)
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(cl_lengths.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)                            # no max_symbol shortcut
    if len(present) == 1:
        # single-symbol CL code is 0-bit: the decoder fills every
        # length without reading — emit nothing
        return
    clcodes = _canon_codes(
        [cl_lengths.get(s, 0) for s in range(19)])
    for l in lengths:
        c, n = clcodes[l]
        bw.write_code(c, n)


def encode_webp_lossless(img: np.ndarray,
                         subtract_green: bool = False) -> bytes:
    """uint8 [h, w, 3] RGB → VP8L WebP (literal-only, one group)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_webp_lossless needs uint8 [h, w, 3]")
    h, w = img.shape[:2]
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                            # no alpha
    bw.write(0, 3)                            # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                        # SUBTRACT_GREEN
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw.write(0, 1)                            # end of transforms
    bw.write(0, 1)                            # no color cache
    bw.write(0, 1)                            # no meta prefix
    glen = _complete_lengths(280)
    clen = _complete_lengths(256)
    dlen = _complete_lengths(40)
    _write_complex_code(bw, glen)             # green+len
    _write_complex_code(bw, clen)             # red
    _write_complex_code(bw, clen)             # blue
    _write_complex_code(bw, clen)             # alpha
    _write_complex_code(bw, dlen)             # distance
    gc = _canon_codes(glen)
    cc = _canon_codes(clen)
    for y in range(h):
        for x in range(w):
            c, n = gc[int(g[y, x])]
            bw.write_code(c, n)
            c, n = cc[int(r[y, x])]
            bw.write_code(c, n)
            c, n = cc[int(b[y, x])]
            bw.write_code(c, n)
            c, n = cc[255]                    # alpha
            bw.write_code(c, n)
    payload = b"\x2f" + bw.bytes()
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)
