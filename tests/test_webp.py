"""VP8L (WebP lossless) codec (stages/webp.py): hand-assembled
bit-level spec vectors (built by an independent bit writer in this
file, NOT the module's encoder) for the simple-code, LZ77, color-cache
and palette paths; encoder round trips for the complex-code path; and
the loader/media integrations."""

import struct

import numpy as np
import pytest

from butteraugli_ray.stages.webp import decode_webp, encode_webp_lossless


class BitW:
    """Independent LSB-first bit assembler (mirrors spec section 3)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)
        return self

    def code(self, c, n):
        # prefix codes transmit MSB of the code first
        for i in range(n - 1, -1, -1):
            self.bits.append((c >> i) & 1)
        return self

    def wrap(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc |= b << (i & 7)
            if (i & 7) == 7:
                out.append(acc)
                acc = 0
        if len(self.bits) & 7:
            out.append(acc)
        payload = b"\x2f" + bytes(out)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw, w, h):
    bw.w(w - 1, 14).w(h - 1, 14).w(0, 1).w(0, 3)
    bw.w(0, 1)            # no transforms
    bw.w(0, 1)            # no color cache
    bw.w(0, 1)            # no meta prefix


def _simple1(bw, sym):
    """simple prefix code, one symbol (0-bit codes)."""
    bw.w(1, 1).w(0, 1)
    if sym > 1:
        bw.w(1, 1).w(sym, 8)
    else:
        bw.w(0, 1).w(sym, 1)


def test_uniform_image_all_simple_codes():
    """3×2 uniform pixel via five single-symbol codes: zero data bits
    per pixel — every channel value fixed by its code's symbol."""
    bw = BitW()
    _header(bw, 3, 2)
    _simple1(bw, 77)       # green
    _simple1(bw, 200)      # red
    _simple1(bw, 3)        # blue
    _simple1(bw, 255)      # alpha
    _simple1(bw, 0)        # distance (never used)
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(
        img, np.tile(np.array([200, 77, 3], np.uint8), (2, 3, 1)))


def test_two_symbol_simple_code():
    """green alternates via a 2-symbol simple code (1 bit per pixel)."""
    bw = BitW()
    _header(bw, 4, 1)
    bw.w(1, 1).w(1, 1)     # simple, two symbols
    bw.w(1, 1).w(10, 8)    # first symbol, 8-bit
    bw.w(30, 8)            # second symbol
    _simple1(bw, 5)        # red
    _simple1(bw, 6)        # blue
    _simple1(bw, 255)      # alpha
    _simple1(bw, 0)        # distance
    # pixels: symbols 10, 30, 30, 10 → canonical: code0=10, code1=30
    bw.w(0, 1).w(1, 1).w(1, 1).w(0, 1)
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(img[0, :, 1], [10, 30, 30, 10])
    np.testing.assert_array_equal(img[0, :, 0], [5, 5, 5, 5])


def _complex_two_syms(bw, a, b_, alphabet):
    """Complex prefix code with exactly symbols {a, b} at length 1,
    zeros elsewhere — transmitted with CL symbols {1, 17, 18} (length
    2 each plus a filler) so repeats are exercised.  CL alphabet used:
    {0, 1, 17, 18} all at CL length 2 (complete)."""
    assert a < b_ < alphabet
    bw.w(0, 1)             # not simple
    # CLC order: [17,18,0,1,...]; need entries up to symbol 1 (pos 3)
    bw.w(4 - 4, 4)         # num_code_lengths = 4
    for sym in (17, 18, 0, 1):
        bw.w(2, 3)         # each CL symbol gets CL length 2
    bw.w(0, 1)             # no max_symbol
    # canonical CL codes over symbols {0,1,17,18} at length 2 (sorted
    # by (length, symbol)): 0→00, 1→01, 17→10, 18→11
    CL = {0: (0b00, 2), 1: (0b01, 2), 17: (0b10, 2), 18: (0b11, 2)}

    def emit_zeros(n):
        while n > 0:
            if n >= 11:
                k = min(n, 138)
                bw.code(*CL[18])
                bw.w(k - 11, 7)
                n -= k
            elif n >= 3:
                k = min(n, 10)
                bw.code(*CL[17])
                bw.w(k - 3, 3)
                n -= k
            else:
                bw.code(*CL[0])
                n -= 1

    emit_zeros(a)
    bw.code(*CL[1])
    emit_zeros(b_ - a - 1)
    bw.code(*CL[1])
    emit_zeros(alphabet - b_ - 1)


def test_lz77_backward_reference():
    """2×1: literal pixel then a length-1 copy at distance 1 (distance
    code 2 → neighbor map (1,0)).  Green code = {literal 10, length
    code 256} at 1 bit each (complex, exercises 17/18 repeats)."""
    bw = BitW()
    _header(bw, 2, 1)
    _complex_two_syms(bw, 10, 256, 280)   # green: symbol 10 + len-code 0
    _simple1(bw, 5)        # red
    _simple1(bw, 6)        # blue
    _simple1(bw, 255)      # alpha
    _simple1(bw, 1)        # distance: prefix 1 → value 2 → map (1,0)
    # data: green literal (code 0) + channels... then len code (code 1)
    bw.w(0, 1)             # green code for symbol 10 (canonical 0)
    bw.w(1, 1)             # length symbol 256 → length prefix 0 → len 1
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(img[0, 0], [5, 10, 6])
    np.testing.assert_array_equal(img[0, 1], img[0, 0])


def test_color_cache():
    """2×1: literal pixel, then a cache hit reproducing it.  Cache
    index recomputed here from the spec constant 0x1E35A7BD."""
    cache_bits = 1
    argb = (255 << 24) | (5 << 16) | (40 << 8) | 6
    idx = ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 280 + idx
    bw = BitW()
    bw.w(1, 14).w(0, 14).w(0, 1).w(0, 3)  # 2×1
    bw.w(0, 1)             # no transforms
    bw.w(1, 1).w(cache_bits, 4)           # color cache on
    bw.w(0, 1)             # no meta prefix
    _complex_two_syms(bw, 40, cache_sym, 280 + (1 << cache_bits))
    _simple1(bw, 5)        # red
    _simple1(bw, 6)        # blue
    _simple1(bw, 255)      # alpha
    _simple1(bw, 0)        # distance
    bw.w(0, 1)             # green literal 40
    bw.w(1, 1)             # cache symbol
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(img[0, 0], [5, 40, 6])
    np.testing.assert_array_equal(img[0, 1], [5, 40, 6])


def test_palette_no_bundling():
    """Color-indexing transform with 17 delta-coded entries (no pixel
    bundling): the green channel carries indices into the palette.
    Entries: e0 = (a=255, r=1, g=2, b=3); deltas (0, 1, 0, 0) → entry
    k has r = 1 + k."""
    n = 17
    bw = BitW()
    bw.w(3, 14).w(0, 14).w(0, 1).w(0, 3)  # 4×1 image
    bw.w(1, 1).w(3, 2)     # transform: COLOR_INDEXING
    bw.w(n - 1, 8)
    bw.w(0, 1)             # palette sub-image: no color cache
    _complex_two_syms(bw, 0, 2, 280)      # green: {0, 2}
    _complex_two_syms(bw, 0, 1, 256)      # red: {0, 1}
    _complex_two_syms(bw, 0, 3, 256)      # blue: {0, 3}
    _complex_two_syms(bw, 0, 255, 256)    # alpha: {0, 255}
    _simple1(bw, 0)                       # distance
    for i in range(n):                    # canonical: lower symbol = 0
        bw.w(1 if i == 0 else 0, 1)       # green 2 then 0
        bw.w(1, 1)                        # red delta always 1
        bw.w(1 if i == 0 else 0, 1)       # blue 3 then 0
        bw.w(1 if i == 0 else 0, 1)       # alpha 255 then 0
    bw.w(0, 1)             # end of transforms
    bw.w(0, 1)             # main image: no color cache
    bw.w(0, 1)             # no meta prefix
    _complex_two_syms(bw, 3, 16, 280)     # green (indices): {3, 16}
    _simple1(bw, 0)                       # red (ignored)
    _simple1(bw, 0)                       # blue (ignored)
    _simple1(bw, 255)                     # alpha
    _simple1(bw, 0)                       # distance
    for b in (0, 1, 0, 1):                # indices 3, 16, 3, 16
        bw.w(b, 1)
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(img[0, 0], [1 + 3, 2, 3])
    np.testing.assert_array_equal(img[0, 1], [1 + 16, 2, 3])
    np.testing.assert_array_equal(img[0, 2], [1 + 3, 2, 3])
    np.testing.assert_array_equal(img[0, 3], [1 + 16, 2, 3])


def test_round_trips_and_subtract_green():
    rng = np.random.default_rng(3)
    for shape in ((1, 1), (7, 5), (16, 33)):
        img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        np.testing.assert_array_equal(
            decode_webp(encode_webp_lossless(img)), img)
        np.testing.assert_array_equal(
            decode_webp(encode_webp_lossless(img, subtract_green=True)),
            img)


def test_lossy_and_malformed_rejected():
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_webp(b"junkjunkjunkjunk")


def test_loader_and_media_integration(ray_session):
    from butteraugli_ray.stages.imageio import load_image_bytes
    from butteraugli_ray.stages.media import decode_media
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    enc = encode_webp_lossless(img)
    np.testing.assert_array_equal(load_image_bytes(enc), img)
    np.testing.assert_array_equal(decode_media(enc, "webp", 9, 6), img)


def _complex_syms4(bw, syms, alphabet):
    """Complex prefix code: exactly 4 symbols at length 2 (complete),
    canonical codes 00/01/10/11 in ascending symbol order."""
    syms = sorted(syms)
    assert len(syms) == 4 and syms[-1] < alphabet
    bw.w(0, 1)
    bw.w(0, 4)             # num_code_lengths = 4 → CL syms 17,18,0,2?
    # CL alphabet {17, 18, 0, 2}: positions 0,1,2 are 17,18,0; symbol 2
    # sits at position 4 → need 5 entries
    bw2_needed = 5
    # rewrite header with 5 entries
    bw.bits = bw.bits[:-4]
    bw.w(bw2_needed - 4, 4)
    for sym in (17, 18, 0, 1, 2):
        bw.w(2 if sym in (17, 18, 0, 2) else 0, 3)
    bw.w(0, 1)             # no max_symbol
    CL = {0: (0b00, 2), 2: (0b01, 2), 17: (0b10, 2), 18: (0b11, 2)}

    def zeros(n):
        while n > 0:
            if n >= 11:
                k = min(n, 138)
                bw.code(*CL[18])
                bw.w(k - 11, 7)
                n -= k
            elif n >= 3:
                k = min(n, 10)
                bw.code(*CL[17])
                bw.w(k - 3, 3)
                n -= k
            else:
                bw.code(*CL[0])
                n -= 1

    prev = -1
    for s in syms:
        zeros(s - prev - 1)
        bw.code(*CL[2])
        prev = s
    zeros(alphabet - prev - 1)
    return {s: (i, 2) for i, s in enumerate(syms)}


def test_predictor_transform_mode_top():
    """Predictor transform, one 4-px tile, mode 2 (TOP): a column-
    striped 2×3 image has zero residuals everywhere except row 0,
    whose residuals follow the spec's edge rules (first pixel vs
    0xff000000 black, rest of row 0 vs LEFT)."""
    bw = BitW()
    bw.w(1, 14).w(2, 14).w(0, 1).w(0, 3)  # 2×3
    bw.w(1, 1).w(0, 2)     # PREDICTOR transform
    bw.w(0, 3)             # size_bits=2 → 4-px blocks → 1×1 tiles
    bw.w(0, 1)             # tile sub-image: no cache
    _simple1(bw, 2)        # tile green = predictor mode 2 (top)
    _simple1(bw, 0)        # red
    _simple1(bw, 0)        # blue
    _simple1(bw, 0)        # alpha
    _simple1(bw, 0)        # distance
    bw.w(0, 1)             # end of transforms
    bw.w(0, 1)             # main: no cache
    bw.w(0, 1)             # no meta
    # residual greens: (0,0)=100, (0,1)=60, rest 0 (4-symbol code with
    # a dummy symbol 7 for Kraft completeness)
    gcodes = _complex_syms4(bw, [0, 7, 60, 100], 280)
    _simple1(bw, 0)        # red residuals all 0
    _simple1(bw, 0)        # blue
    _simple1(bw, 0)        # alpha residuals all 0
    _simple1(bw, 0)        # distance
    for g in (100, 60, 0, 0, 0, 0):
        bw.code(*gcodes[g])
    img = decode_webp(bw.wrap())
    want = np.zeros((3, 2, 3), np.uint8)
    want[:, 0, 1] = 100    # column A green = 0+... (0,0): 0?? see below
    want[:, 1, 1] = 160    # column B green = 100+60
    np.testing.assert_array_equal(img, want)


def test_color_transform():
    """Color transform, one tile, green_to_red = 16: red' = r_res +
    ((int8)16 * (int8)g >> 5).  Uniform 2×1 residuals g=64, r=5 →
    red = 5 + 32 = 37."""
    bw = BitW()
    bw.w(1, 14).w(0, 14).w(0, 1).w(0, 3)  # 2×1
    bw.w(1, 1).w(1, 2)     # COLOR transform
    bw.w(0, 3)             # 4-px blocks → 1×1 tiles
    bw.w(0, 1)             # tile image: no cache
    _simple1(bw, 0)        # green = green_to_blue = 0
    _simple1(bw, 0)        # red = red_to_blue = 0
    _simple1(bw, 16)       # blue = green_to_red = 16
    _simple1(bw, 0)        # alpha
    _simple1(bw, 0)        # distance
    bw.w(0, 1)             # end of transforms
    bw.w(0, 1).w(0, 1)     # main: no cache, no meta
    _simple1(bw, 64)       # green residual
    _simple1(bw, 5)        # red residual
    _simple1(bw, 9)        # blue residual
    _simple1(bw, 255)      # alpha
    _simple1(bw, 0)        # distance
    img = decode_webp(bw.wrap())
    np.testing.assert_array_equal(
        img, np.tile(np.array([37, 64, 9], np.uint8), (1, 2, 1)))


def test_palette_bundling_2bit():
    """4-color palette → 2-bit pixel bundling: 5 indices pack into 2
    green slots (low bits = leftmost pixel)."""
    bw = BitW()
    bw.w(4, 14).w(0, 14).w(0, 1).w(0, 3)  # 5×1
    bw.w(1, 1).w(3, 2)     # COLOR_INDEXING
    bw.w(3, 8)             # 4 colors
    bw.w(0, 1)             # palette image: no cache
    _complex_two_syms(bw, 0, 8, 280)      # green {0, 8}
    _complex_two_syms(bw, 9, 10, 256)     # red {9, 10}
    _complex_two_syms(bw, 0, 7, 256)      # blue {0, 7}
    _complex_two_syms(bw, 0, 255, 256)    # alpha {0, 255}
    _simple1(bw, 0)
    # entries: e0=(255, 9, 8, 7); deltas (0, 10, 0, 0) → r = 9,19,29,39
    for i in range(4):
        bw.w(1 if i == 0 else 0, 1)       # green 8 then 0
        bw.w(0 if i == 0 else 1, 1)       # red 9 (code 0) then 10
        bw.w(1 if i == 0 else 0, 1)       # blue 7 then 0
        bw.w(1 if i == 0 else 0, 1)       # alpha 255 then 0
    bw.w(0, 1)             # end of transforms
    bw.w(0, 1).w(0, 1)     # main: no cache, no meta (xsize = ceil(5/4)=2)
    # indices [1, 2, 3, 0, 2]: byte0 = 1|2<<2|3<<4 = 57; byte1 = 2
    _complex_two_syms(bw, 2, 57, 280)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 255)
    _simple1(bw, 0)
    bw.w(1, 1)             # 57 (higher symbol → code 1)
    bw.w(0, 1)             # 2
    img = decode_webp(bw.wrap())
    rs = [9 + 10 * k for k in (1, 2, 3, 0, 2)]
    want = np.stack([np.array(rs, np.uint8),
                     np.full(5, 8, np.uint8),
                     np.full(5, 7, np.uint8)], axis=-1)[None]
    np.testing.assert_array_equal(img, want)


def test_predictor_mode3_right_edge_uses_current_row_left():
    """RFC 9649 4.2.1.1: at x == w-1 the TR pixel wraps to the LEFTMOST
    pixel of the CURRENT row (already decoded), not the row above.
    2×2 image, one mode-3 (TR) tile: greens decode to
    (0,0)=10, (0,1)=10 (left rule), (1,0)=15 (top rule),
    (1,1)=0+TR = img[1,0].g = 15 (the old row-above bug gave 10)."""
    bw = BitW()
    bw.w(1, 14).w(1, 14).w(0, 1).w(0, 3)  # 2×2
    bw.w(1, 1).w(0, 2)     # PREDICTOR transform
    bw.w(0, 3)             # size_bits=2 → 4-px tiles → 1×1 tile grid
    bw.w(0, 1)             # tile sub-image: no cache
    _simple1(bw, 3)        # tile green = predictor mode 3 (TR)
    _simple1(bw, 0)        # red
    _simple1(bw, 0)        # blue
    _simple1(bw, 0)        # alpha
    _simple1(bw, 0)        # distance
    bw.w(0, 1)             # end of transforms
    bw.w(0, 1).w(0, 1)     # main: no cache, no meta
    gcodes = _complex_syms4(bw, [0, 5, 7, 10], 280)
    _simple1(bw, 0)        # red residuals
    _simple1(bw, 0)        # blue
    _simple1(bw, 0)        # alpha
    _simple1(bw, 0)        # distance
    for g in (10, 0, 5, 0):
        bw.code(*gcodes[g])
    img = decode_webp(bw.wrap())
    want = np.zeros((2, 2, 3), np.uint8)
    want[0, :, 1] = 10
    want[1, :, 1] = 15
    np.testing.assert_array_equal(img, want)


def test_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf (mode 13) uses C-style integer division:
    (avg - TL) / 2 truncates TOWARD ZERO.  With TL.g=13, L.g=T.g=10:
    avg=10, d=-3 → trunc -1 → pred green 9 (floor division gave 8)."""
    bw = BitW()
    bw.w(1, 14).w(1, 14).w(0, 1).w(0, 3)  # 2×2
    bw.w(1, 1).w(0, 2)     # PREDICTOR transform
    bw.w(0, 3)
    bw.w(0, 1)
    _simple1(bw, 13)       # tile green = predictor mode 13
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    bw.w(0, 1)
    bw.w(0, 1).w(0, 1)
    gcodes = _complex_syms4(bw, [0, 13, 100, 253], 280)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    _simple1(bw, 0)
    # greens raster order: (0,0)=13; (0,1)=10 via left → res 253;
    # (1,0)=10 via top → res 253; (1,1)=pred-only → res 0
    for g in (13, 253, 253, 0):
        bw.code(*gcodes[g])
    img = decode_webp(bw.wrap())
    want = np.zeros((2, 2, 3), np.uint8)
    want[0, 0, 1] = 13
    want[0, 1, 1] = 10
    want[1, 0, 1] = 10
    want[1, 1, 1] = 9
    np.testing.assert_array_equal(img, want)


def test_inverse_predictor_wavefront_matches_scalar():
    """Differential: the d = 2y + x wavefront inverse predictor must
    equal the spec-literal scalar path on random tiles over all 14
    modes, including 1-wide/1-tall shapes (scalar fallback)."""
    from butteraugli_ray.stages.webp import (_inverse_predictor,
                                             _inverse_predictor_scalar)
    for h, w, bits in [(23, 37, 2), (16, 16, 2), (8, 64, 3), (5, 5, 4),
                       (1, 9, 2), (9, 1, 2), (2, 2, 2), (64, 48, 2)]:
        tw, th = -(-w // (1 << bits)), -(-h // (1 << bits))
        for seed in range(3):
            rng = np.random.default_rng(seed * 100 + h * 31 + w)
            tiles = rng.integers(0, 14, (th, tw))
            res = rng.integers(0, 256, (h, w, 4)).astype(np.int32)
            a, b = res.copy(), res.copy()
            _inverse_predictor(a, tiles, bits)
            _inverse_predictor_scalar(b, tiles, bits)
            np.testing.assert_array_equal(
                a, b, err_msg=f"h={h} w={w} bits={bits} seed={seed}")


def test_lossy_vp8_produces_typed_violation_row(ray_session):
    """Scope decision (round 5): lossy VP8 stays a documented
    production-wheel dependency — a lossy payload flowing through the
    media feature stage must yield a TYPED decode_error row (never a
    silent drop or a crash)."""
    import pyarrow as pa
    import ray.data as rd

    from butteraugli_ray.stages.media import MediaFeaturizer

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    good = encode_webp_lossless(np.full((4, 4, 3), 7, np.uint8))
    t = pa.table({
        "media_ref": ["m_lossy", "m_ok"],
        "payload": pa.array([lossy, good], pa.binary()),
        "codec": ["webp", "webp"],
        "width": [4, 4],
        "height": [4, 4],
    })
    out = rd.from_arrow(t).map_batches(
        MediaFeaturizer, batch_format="pyarrow", concurrency=1,
        batch_size=2).to_pandas().set_index("media_ref")
    assert out.loc["m_lossy", "decode_error"].startswith(
        "NotImplementedError")
    assert out.loc["m_lossy", "features"] is None \
        or out.loc["m_lossy", "features"] != out.loc["m_lossy", "features"] \
        or not len(out.loc["m_lossy", "features"])
    assert out.loc["m_ok", "decode_error"] is None
    assert len(out.loc["m_ok", "features"]) > 0
