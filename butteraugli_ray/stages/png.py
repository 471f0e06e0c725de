"""Pure-stdlib PNG codec: zlib inflate/deflate + per-scanline
(un)filtering, implemented from the public PNG spec (W3C PNG / RFC
2083).

The reference CLI loads PNG (and JPEG/WebP/...) through an image
library (/root/reference/butteraugli-cli/src/main.rs:396-447 loads 5
formats and converts to RGB8).  This sandbox ships no codec wheel, but
PNG needs nothing beyond stdlib ``zlib`` — so PNG decode/encode live
here, closing the most-hit real-user input gap honestly; the remaining
compressed codecs stay import-try stubs in stages/media.py.

Decode supports bit depths 1/2/4/8/16 and color types gray / RGB /
palette / gray+alpha / RGBA, always returning uint8 RGB (16-bit takes
the high byte; alpha is dropped — the scorer consumes opaque sRGB),
plus Adam7 interlacing (round 5: each pass unfilters through the
shared vectorized path and scatters via one strided assignment).
Encode writes 8-bit RGB (or grayscale) with adaptive per-row filters,
one IDAT — the heatmap-sink path.

Perf note (round 5): the unfilter is fully vectorized — None/Sub/Up
rows via whole-row numpy, Average/Paeth via an anti-diagonal wavefront
(O(h+w) numpy steps; ~50-80x over the per-byte loop kept as
``_unfilter_scalar`` for differential tests).  The encoder picks
per-row filters adaptively like real encoders do.  Decode runs inside
actor-pool ``map_batches`` either way, so swapping in a codec wheel on
a production cluster never touches the Ray plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("truncated PNG chunk")
        yield typ, payload
        pos += 12 + ln                      # len + type + payload + CRC
        if typ == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _unfilter_scalar(raw: np.ndarray, h: int, stride: int,
                     bpp: int) -> np.ndarray:
    """Spec-literal per-byte unfilter (RFC 2083 §6) — kept as the
    differential-test / benchmark reference for the vectorized path."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    recon = np.zeros((h, stride), np.uint8)
    zero = np.zeros(stride, np.int64)
    for y in range(h):
        off = y * (stride + 1)
        f = int(raw[off])
        line = raw[off + 1:off + 1 + stride].astype(np.int64)
        prev = recon[y - 1].astype(np.int64) if y else zero
        if f == 0:                           # None
            cur = line
        elif f == 1:                         # Sub: left chain → cumsum
            cur = line.copy()
            for o in range(bpp):
                cur[o::bpp] = np.cumsum(line[o::bpp]) % 256
        elif f == 2:                         # Up
            cur = (line + prev) % 256
        elif f == 3:                         # Average (left-sequential)
            cur = np.empty(stride, np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + ((a + prev[i]) >> 1)) % 256
        elif f == 4:                         # Paeth (left-sequential)
            cur = np.empty(stride, np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        recon[y] = cur.astype(np.uint8)
    return recon


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → [h, stride] uint8 of raw samples.

    Vectorized (round 5): rows using only None/Sub/Up unfilter with
    whole-row numpy (cumsum / adds).  When any row uses Average/Paeth
    (the left-sequential filters nearly every real encoder emits for
    photos), the whole image decodes on an ANTI-DIAGONAL WAVEFRONT:
    pixel (y, x) depends only on (y, x-1), (y-1, x), (y-1, x-1), so
    every pixel on diagonal d = x + y is computable at once from
    diagonals d-1 / d-2 — O(h + w) vectorized steps instead of the
    per-byte Python loop (~50-80x on a 512² photo)."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    rows = raw[:h * (stride + 1)].reshape(h, stride + 1)
    f = rows[:, 0]
    bad = f > 4
    if bad.any():
        raise ValueError(f"unknown PNG filter type {int(f[bad][0])}")
    lines = rows[:, 1:]
    if not (f >= 3).any():
        # fast whole-row path: no left-sequential filters present
        recon = np.zeros((h, stride), np.uint8)
        zero = np.zeros(stride, np.int64)
        for y in range(h):
            line = lines[y].astype(np.int64)
            ft = int(f[y])
            if ft == 0:
                cur = line
            elif ft == 1:
                cur = line.copy()
                for o in range(bpp):
                    cur[o::bpp] = np.cumsum(line[o::bpp]) % 256
            else:
                prev = recon[y - 1].astype(np.int64) if y else zero
                cur = (line + prev) % 256
            recon[y] = cur.astype(np.uint8)
        return recon
    # wavefront path — stride is always a multiple of bpp (bpp>1 only
    # for 8/16-bit multi-channel rows, where stride = w*ch*depth/8).
    # Everything per step is a contiguous slice or a strided VIEW: the
    # residuals of anti-diagonal d are fx.diagonal(npx-1-d), the two
    # previous diagonals live in rolling (h+1)-long buffers (index y+1,
    # leading zero = top/left boundary), and results are written
    # straight into the output through a writable as_strided view.
    from numpy.lib.stride_tricks import as_strided
    npx = stride // bpp
    assert npx * bpp == stride
    x16 = lines.reshape(h, npx, bpp).astype(np.int16)
    fx = x16[:, ::-1]
    out = np.empty((h, npx, bpp), np.uint8)
    s0, s1, s2 = out.strides
    ftypes = f.astype(np.int64)
    c4 = np.concatenate([[0], np.cumsum(ftypes == 4)])
    P1 = P2 = np.zeros((h + 1, bpp), np.int16)
    for d in range(h + npx - 1):
        y0 = 0 if d < npx else d - npx + 1
        y1 = min(h, d + 1)
        n = y1 - y0
        a = P1[y0 + 1:y1 + 1]                # left  (diag d-1, same y)
        b = P1[y0:y1]                        # up    (diag d-1, y-1)
        c = P2[y0:y1]                        # upleft (diag d-2, y-1)
        xd = fx.diagonal(npx - 1 - d, 0, 1).T
        n4 = c4[y1] - c4[y0]
        if n4:
            t1 = b - c
            t2 = a - c
            pa_ = np.abs(t1)
            pb_ = np.abs(t2)
            pc_ = np.abs(t1 + t2)
            paeth = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                             np.where(pb_ <= pc_, b, c))
        if n4 == n:
            pred = paeth
        else:
            ft = ftypes[y0:y1, None]
            pred = np.select(
                [ft == 0, ft == 1, ft == 2, ft == 3],
                [0, a, b, (a + b) >> 1],
                default=paeth if n4 else 0)
        cur = (xd + pred) & 0xFF
        C = np.zeros((h + 1, bpp), np.int16)
        C[y0 + 1:y1 + 1] = cur
        as_strided(out[y0:, d - y0:], shape=(n, bpp),
                   strides=(s0 - s1, s2))[:] = cur
        P2 = P1
        P1 = C
    return out.reshape(h, stride)


def _expand_bits(row: np.ndarray, w: int, depth: int) -> np.ndarray:
    """Unpack sub-byte samples (depth 1/2/4) → w uint8 sample VALUES
    (not scaled)."""
    bits = np.unpackbits(row)
    per = 8 // depth
    vals = bits.reshape(-1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    out = (vals * weights).sum(axis=1).astype(np.uint8)
    del per
    return out[:w]


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _deinterlace_adam7(raw: np.ndarray, w: int, h: int, ch: int,
                       depth: int) -> np.ndarray:
    """Adam7 (round 5): each of the 7 passes is an independently
    filtered sub-image; unfilter each with the shared (vectorized)
    ``_unfilter`` and scatter its samples onto the full grid with one
    strided assignment per pass.  Returns [h, w*ch] sample VALUES
    (sub-byte depths unscaled, 16-bit reduced to the high byte)."""
    bpp = max(1, ch * depth // 8)
    out = np.zeros((h, w, ch), np.uint8)
    pos = 0
    for xs, ys, xst, yst in _ADAM7:
        pw = -(-(w - xs) // xst) if w > xs else 0
        ph = -(-(h - ys) // yst) if h > ys else 0
        if pw <= 0 or ph <= 0:
            continue
        pstride = (pw * ch * depth + 7) // 8
        need = ph * (pstride + 1)
        recon = _unfilter(raw[pos:pos + need], ph, pstride, bpp)
        pos += need
        if depth < 8:
            vals = np.stack([_expand_bits(recon[y], pw * ch, depth)
                             for y in range(ph)])
        elif depth == 16:
            vals = recon.reshape(ph, pw * ch, 2)[:, :, 0]
        else:
            vals = recon[:, :pw * ch]
        out[ys::yst, xs::xst, :] = vals.reshape(ph, pw, ch)
    return out.reshape(h, w * ch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 [h, w, 3] RGB."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    w = h = depth = ctype = None
    interlace = 0
    idat = []
    plte = None
    for typ, payload in _iter_chunks(data):
        if typ == b"IHDR":
            (w, h, depth, ctype, comp, filt,
             interlace) = struct.unpack(">IIBBBBB", payload)
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
        elif typ == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(payload)
    if w is None:
        raise ValueError("PNG missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ctype not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16) or (
            ctype in (2, 4, 6) and depth < 8) or (
            ctype == 3 and depth == 16):
        raise ValueError(f"invalid PNG bit depth {depth} for type {ctype}")
    ch = _CHANNELS[ctype]
    stride = (w * ch * depth + 7) // 8
    bpp = max(1, ch * depth // 8)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace:
        samples = _deinterlace_adam7(raw, w, h, ch, depth)
    else:
        recon = _unfilter(raw, h, stride, bpp)
        if depth < 8:
            samples = np.stack([_expand_bits(recon[y], w * ch, depth)
                                for y in range(h)])
        elif depth == 16:
            # high byte ≈ v >> 8 — the standard 16→8 reduction
            samples = recon.reshape(h, w * ch, 2)[:, :, 0]
        else:
            samples = recon[:, :w * ch]
    px = samples.reshape(h, w, ch)

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if depth < 8:                            # grayscale sub-byte: rescale
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)) \
            .astype(np.uint8)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:                           # gray+alpha: alpha dropped
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:                           # RGBA: alpha dropped
        return np.ascontiguousarray(px[:, :, :3])
    return px                                # ctype 2: RGB


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6,
               adaptive: bool = True) -> bytes:
    """uint8 [h, w, 3] RGB (or [h, w] / [h, w, 1] grayscale) → PNG
    bytes (single IDAT).

    ``adaptive=True`` (default) picks the per-row filter by the
    standard minimum-sum-of-absolute-signed-residuals heuristic, fully
    vectorized (all five candidate filters computed whole-image at
    once) — like every real encoder, so decode round trips exercise
    the Average/Paeth unfilter paths.  ``adaptive=False`` keeps the
    old filter-0 rows."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_png needs uint8 input")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch == 1:
        ctype = 0
    elif ch == 3:
        ctype = 2
    else:
        raise ValueError(f"encode_png supports 1 or 3 channels, got {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    stride = w * ch
    samples = img.reshape(h, stride)
    rows = np.zeros((h, stride + 1), np.uint8)
    if adaptive and h and stride:
        s16 = samples.astype(np.int16)
        left = np.zeros_like(s16)
        left[:, ch:] = s16[:, :-ch]
        up = np.zeros_like(s16)
        up[1:] = s16[:-1]
        ul = np.zeros_like(s16)
        ul[1:, ch:] = s16[:-1, :-ch]
        p = left + up - ul
        pa = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - ul)
        paeth = np.where((pa <= pb) & (pa <= pc), left,
                         np.where(pb <= pc, up, ul))
        cand = np.stack([samples,
                         (s16 - left).astype(np.uint8),
                         (s16 - up).astype(np.uint8),
                         (s16 - ((left + up) >> 1)).astype(np.uint8),
                         (s16 - paeth).astype(np.uint8)])
        score = np.abs(cand.view(np.int8).astype(np.int16)).sum(axis=2)
        ft = score.argmin(axis=0).astype(np.uint8)
        rows[:, 0] = ft
        rows[:, 1:] = cand[ft, np.arange(h)]
    else:
        rows[:, 1:] = samples
    idat = zlib.compress(rows.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))
