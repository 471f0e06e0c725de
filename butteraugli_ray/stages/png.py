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
the high byte; alpha is dropped — the scorer consumes opaque sRGB).
Adam7 interlacing raises ``NotImplementedError`` (streaming corpora
should never store interlaced files).  Encode writes 8-bit RGB (or
grayscale), filter 0, one IDAT — the heatmap-sink path.

Perf note: rows with filter Sub/Up are vectorized (cumsum / whole-row
adds); Average/Paeth fall back to a per-byte Python loop, which is fine
for fixtures and heatmaps — bulk corpus media should be stored raw or
decoded by a real codec wheel on a production cluster (decode runs
inside actor-pool ``map_batches`` either way, so swapping the codec
never touches the Ray plumbing).
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


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → [h, stride] uint8 of raw samples."""
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
    if interlace:
        raise NotImplementedError(
            "Adam7-interlaced PNG unsupported (store non-interlaced)")
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


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 [h, w, 3] RGB (or [h, w] / [h, w, 1] grayscale) → PNG
    bytes (filter 0, single IDAT)."""
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
    rows = np.zeros((h, w * ch + 1), np.uint8)
    rows[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(rows.tobytes(), level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))
