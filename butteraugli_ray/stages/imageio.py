"""Magic-sniffing image loader for the CLI surfaces and media stages.

The reference CLI's batch mode accepts png,jpg,jpeg,webp,gif,bmp
(/root/reference/butteraugli-cli/src/main.rs:92-98, image::open at
:401-405).  This sandbox has no codec wheel, so the formats are built
here from their public specs with stdlib+numpy alone — PNG
(stages/png.py), baseline JPEG (stages/jpeg.py), lossless WebP/VP8L
(stages/webp.py), binary PPM, uncompressed BMP, GIF (LZW) — all six
of the reference's extensions decode natively; only lossy-WebP (VP8)
and progressive-JPEG payloads fall through to a PIL/cv2 import-try
with a clear error.  All decoders return uint8 [h, w, 3] RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP (BITMAPINFOHEADER family): 24/32-bit true
    color or 8-bit palette, bottom-up or top-down rows."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if compression not in (0, 3):            # BI_RGB / BI_BITFIELDS
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) & ~3
    px = np.frombuffer(data, np.uint8, count=stride * h, offset=pixel_off)
    rows = px.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette: BGRA quads right after the info header
        pal_off = 14 + hdr_size
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        pal = np.frombuffer(data, np.uint8, count=4 * n_colors,
                            offset=pal_off).reshape(-1, 4)
        idx = rows[:, :w]
        return pal[idx][:, :, [2, 1, 0]]      # BGRA → RGB
    ch = bpp // 8
    img = rows[:, :w * ch].reshape(h, w, ch)
    return np.ascontiguousarray(img[:, :, [2, 1, 0]])  # BGR(A) → RGB


def _lzw_decode(codes_data: bytes, min_code_size: int, n_pixels: int
                ) -> np.ndarray:
    """GIF-variant LZW → index array (spec: GIF89a appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = 0
    acc = 0
    pos = 0
    code_size = min_code_size + 1
    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    data = codes_data
    while len(out) < n_pixels:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/GIF89a as RGB (transparency ignored —
    the scorer consumes opaque sRGB)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, count=3 * n,
                            offset=pos).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:                         # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:                       # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB",
                                                 data[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, count=3 * n,
                                   offset=pos).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image with no color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            img = idx.reshape(h, w)
            if iflags & 0x40:                 # de-interlace (4 passes)
                out = np.empty_like(img)
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                out[order] = img
                img = out
            return ct[img]
        elif b == 0x3B:                       # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255)."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported")
    pos += 1
    return np.frombuffer(data, np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3)


def load_image_bytes(data: bytes) -> np.ndarray:
    """Sniff the format by magic and decode → uint8 [h, w, 3] RGB."""
    data = bytes(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png
        return decode_png(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from .webp import decode_webp
        return decode_webp(data)
    try:  # pragma: no cover - codec wheels absent in sandbox
        from PIL import Image
        import io
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError:
        raise ValueError(
            "unrecognized image format (PNG/PPM/BMP/GIF/baseline-JPEG "
            "built in; WebP and progressive JPEG need an image library)")


def load_image_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return load_image_bytes(f.read())
