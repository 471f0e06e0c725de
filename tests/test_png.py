"""Pure-stdlib PNG codec (stages/png.py): hand-built spec vectors for
every filter type and color type (constructed chunk-by-chunk, NOT via
our own encoder, so decode is validated independently), encode→decode
round trips, and the media-stage + heatmap-sink integrations."""

import struct
import zlib

import numpy as np
import pytest

from butteraugli_ray.stages.png import decode_png, encode_png


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _png(w, h, depth, ctype, scanlines: bytes, plte: bytes = b"",
         interlace: int = 0) -> bytes:
    """Assemble a PNG from already-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(scanlines))
    return out + _chunk(b"IEND", b"")


def test_filter_none_and_up():
    # 2x2 RGB: row0 filter 0 (raw), row1 filter 2 (Up: delta from row0)
    row0 = bytes([0]) + bytes([10, 20, 30, 40, 50, 60])
    row1 = bytes([2]) + bytes([5, 5, 5, 205, 205, 205])
    img = decode_png(_png(2, 2, 8, 2, row0 + row1))
    want = np.array([[[10, 20, 30], [40, 50, 60]],
                     [[15, 25, 35], [(40 + 205) % 256,
                                     (50 + 205) % 256,
                                     (60 + 205) % 256]]], np.uint8)
    np.testing.assert_array_equal(img, want)


def test_filter_sub():
    # 1x3 RGB row, filter 1: each pixel delta from the previous pixel
    row = bytes([1]) + bytes([100, 110, 120, 10, 10, 10, 250, 250, 250])
    img = decode_png(_png(3, 1, 8, 2, row))
    want = np.array([[[100, 110, 120], [110, 120, 130],
                      [(110 + 250) % 256, (120 + 250) % 256,
                       (130 + 250) % 256]]], np.uint8)
    np.testing.assert_array_equal(img, want)


def test_filter_average_and_paeth():
    # spec semantics computed by hand on a 2x2 grayscale image
    # row0: filter 3 (Average, prev row = 0): recon = x + floor(left/2)
    row0 = bytes([3]) + bytes([100, 100])      # recon: [100, 150]
    # row1: filter 4 (Paeth): a=left, b=up, c=up-left
    #   px0: a=0, b=100, c=0 → p=100 → pb=0 smallest → pred=b=100
    #   px1: a=recon0, b=150, c=100
    row1 = bytes([4]) + bytes([10, 20])
    img = decode_png(_png(2, 2, 8, 0, row0 + row1))
    r0 = [100, 150]
    p0 = (10 + 100) % 256                      # 110
    a, b, c = p0, 150, 100
    p = a + b - c                              # 160
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
    p1 = (20 + pred) % 256
    want = np.stack([np.repeat(np.array([r0, [p0, p1]], np.uint8)[:, :, None],
                               3, axis=2)])[0]
    np.testing.assert_array_equal(img, want)


def test_palette_and_gray_depths():
    # palette, 8-bit indices
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    sl = bytes([0]) + bytes([0, 2]) + bytes([0]) + bytes([1, 1])
    img = decode_png(_png(2, 2, 8, 3, sl, plte=plte))
    want = np.array([[[255, 0, 0], [0, 0, 255]],
                     [[0, 255, 0], [0, 255, 0]]], np.uint8)
    np.testing.assert_array_equal(img, want)

    # 1-bit grayscale, 10 px wide → 2 bytes per row, rescaled 0/255
    bits = bytes([0b10110001, 0b01000000])
    img = decode_png(_png(10, 1, 1, 0, bytes([0]) + bits))
    want_vals = [1, 0, 1, 1, 0, 0, 0, 1, 0, 1]
    np.testing.assert_array_equal(img[0, :, 0],
                                  np.array(want_vals, np.uint8) * 255)

    # 4-bit grayscale rescales by 255/15
    img = decode_png(_png(2, 1, 4, 0, bytes([0, 0x5A])))
    np.testing.assert_array_equal(img[0, :, 0], [5 * 17, 10 * 17])


def test_alpha_dropped_and_16bit_high_byte():
    # RGBA: alpha ignored
    sl = bytes([0]) + bytes([1, 2, 3, 200, 4, 5, 6, 0])
    img = decode_png(_png(2, 1, 8, 6, sl))
    np.testing.assert_array_equal(
        img, np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8))
    # gray+alpha
    sl = bytes([0]) + bytes([77, 10])
    img = decode_png(_png(1, 1, 8, 4, sl))
    np.testing.assert_array_equal(img, np.full((1, 1, 3), 77, np.uint8))
    # 16-bit RGB: high byte survives
    sl = bytes([0]) + bytes([0xAB, 0xCD, 0x01, 0x02, 0xFF, 0x00])
    img = decode_png(_png(1, 1, 16, 2, sl))
    np.testing.assert_array_equal(
        img, np.array([[[0xAB, 0x01, 0xFF]]], np.uint8))


def test_interlaced_and_malformed_rejected():
    # interlace=1 now DECODES (Adam7, round 5): a 1×1 gray image is a
    # single pass-1 pixel
    out = decode_png(_png(1, 1, 8, 0, bytes([0, 7]), interlace=1))
    np.testing.assert_array_equal(out, np.full((1, 1, 3), 7, np.uint8))
    with pytest.raises(ValueError):
        # unknown interlace method
        decode_png(_png(1, 1, 8, 0, bytes([0, 7]), interlace=2))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        # truncated pixel data: 2 rows declared, 1 provided
        decode_png(_png(1, 2, 8, 0, bytes([0, 7])))


def test_round_trip_rgb_and_gray():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)
    gray = rng.integers(0, 256, (9, 31), dtype=np.uint8)
    out = decode_png(encode_png(gray))
    np.testing.assert_array_equal(out, np.repeat(gray[:, :, None], 3, 2))


def test_media_stage_decodes_png_payloads(ray_session):
    """MediaFeaturizer over codec='png' rows equals the raw-codec run —
    the Ray-side plumbing is codec-agnostic."""
    import pyarrow as pa
    import ray.data as rd
    from butteraugli_ray.stages.media import MediaFeaturizer

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
            for _ in range(6)]

    def table(codec):
        return pa.table({
            "media_ref": pa.array([f"m{i}" for i in range(len(imgs))]),
            "payload": pa.array(
                [encode_png(im) if codec == "png" else im.tobytes()
                 for im in imgs], pa.binary()),
            "codec": pa.array([codec] * len(imgs)),
            "width": pa.array([16] * len(imgs), pa.int32()),
            "height": pa.array([12] * len(imgs), pa.int32()),
        })

    out_png = (rd.from_arrow(table("png"))
               .map_batches(MediaFeaturizer, batch_format="pyarrow",
                            concurrency=2, batch_size=3)
               .to_pandas().sort_values("media_ref").reset_index(drop=True))
    out_raw = (rd.from_arrow(table("raw"))
               .map_batches(MediaFeaturizer, batch_format="pyarrow",
                            concurrency=2, batch_size=3)
               .to_pandas().sort_values("media_ref").reset_index(drop=True))
    assert out_png["decode_error"].isna().all()
    for a, b in zip(out_png["features"], out_raw["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heatmap_png_sink(tmp_path):
    from butteraugli_ray.cli import write_heatmap_ppm
    dm = np.linspace(0, 3, 64).reshape(8, 8)
    p = str(tmp_path / "hm.png")
    write_heatmap_ppm(dm, p)
    img = decode_png(open(p, "rb").read())
    assert img.shape == (8, 8, 3)
    # ramp endpoints: blue lowest, red highest
    np.testing.assert_array_equal(img[0, 0], [0, 0, 255])
    np.testing.assert_array_equal(img[7, 7], [255, 0, 0])


def test_cli_compare_file_pair(tmp_path):
    """The reference CLI's two-file surface (main.rs:396-447): compare
    --ref a.png --dist b.png scores identically to the in-memory
    metric, and PPM inputs work too."""
    import json
    import subprocess
    import sys

    from butteraugli_ray.corpus.generators import generate_image_pair
    from butteraugli_ray.metric.api import butteraugli_srgb

    a, b = generate_image_pair("radial_shift_2_32x32", 32, 32)
    pa_, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    open(pa_, "wb").write(encode_png(a))
    open(pb, "wb").write(encode_png(b))
    r = subprocess.run([sys.executable, "-m", "butteraugli_ray.cli",
                        "compare", "--ref", pa_, "--dist", pb],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout)
    assert out["score"] == pytest.approx(butteraugli_srgb(a, b).score,
                                         rel=1e-9)

    # PPM round trip through the same entry point
    def ppm(path, img):
        h, w = img.shape[:2]
        with open(path, "wb") as f:
            f.write(f"P6\n{w} {h}\n255\n".encode() + img.tobytes())
    qa, qb = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    ppm(qa, a)
    ppm(qb, b)
    r2 = subprocess.run([sys.executable, "-m", "butteraugli_ray.cli",
                         "compare", "--ref", qa, "--dist", qb],
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr
    assert json.loads(r2.stdout)["score"] == out["score"]

    # arg validation: lone --ref and missing modes exit 2
    r3 = subprocess.run([sys.executable, "-m", "butteraugli_ray.cli",
                         "compare", "--ref", pa_],
                        capture_output=True, text=True)
    assert r3.returncode == 2
    r4 = subprocess.run([sys.executable, "-m", "butteraugli_ray.cli",
                         "compare"], capture_output=True, text=True)
    assert r4.returncode == 2


def test_unfilter_wavefront_matches_scalar():
    """Differential: the anti-diagonal wavefront unfilter must equal
    the spec-literal per-byte reference on random filter mixes across
    shapes and bpp (incl. bpp that doesn't divide typical widths)."""
    from butteraugli_ray.stages.png import _unfilter, _unfilter_scalar
    for bpp, w, h in [(3, 37, 23), (1, 64, 5), (3, 2, 2), (1, 1, 7),
                      (4, 16, 16), (2, 31, 9), (3, 129, 61)]:
        stride = w * bpp
        for seed in range(3):
            rng = np.random.default_rng(seed * 997 + h + w)
            raw = rng.integers(0, 256, h * (stride + 1), dtype=np.uint8)
            raw[::stride + 1] = rng.integers(0, 5, h)
            np.testing.assert_array_equal(
                _unfilter(raw, h, stride, bpp),
                _unfilter_scalar(raw, h, stride, bpp),
                err_msg=f"bpp={bpp} w={w} h={h} seed={seed}")


def test_adaptive_encoder_roundtrip_and_uses_paeth():
    """The adaptive encoder must round-trip and actually exercise the
    left-sequential filters on a smooth image."""
    import zlib

    from butteraugli_ray.stages.png import (_iter_chunks, decode_png,
                                            encode_png)
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.clip(np.stack([xx * 2, yy * 3, (xx + yy)], -1),
                  0, 255).astype(np.uint8)
    data = encode_png(img)
    np.testing.assert_array_equal(decode_png(data), img)
    idat = b"".join(p for t, p in _iter_chunks(data) if t == b"IDAT")
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    ftypes = set(raw[::64 * 3 + 1].tolist())
    assert ftypes & {3, 4}, f"no Average/Paeth rows chosen: {ftypes}"
    # filter-0 mode still round-trips
    flat = encode_png(img, adaptive=False)
    np.testing.assert_array_equal(decode_png(flat), img)


def _interlace_adam7_png(img):
    """Independent Adam7 writer for the decode test: per-pass
    sub-images, per-row filters chosen round-robin from {0 (None),
    1 (Sub), 2 (Up)} (applied literally per the spec)."""
    import struct
    import zlib

    from butteraugli_ray.stages.png import _ADAM7, _SIG, _chunk

    h, w, ch = img.shape
    ctype = 2 if ch == 3 else 0
    raw = bytearray()
    for xs, ys, xst, yst in _ADAM7:
        sub = img[ys::yst, xs::xst, :]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        rows = sub.reshape(ph, pw * ch).astype(np.int16)
        for y in range(ph):
            ft = (y + ph) % 3
            line = rows[y]
            if ft == 1:
                left = np.zeros_like(line)
                left[ch:] = line[:-ch]
                out = (line - left) % 256
            elif ft == 2:
                prev = rows[y - 1] if y else np.zeros_like(line)
                out = (line - prev) % 256
            else:
                out = line
            raw.append(ft)
            raw.extend(out.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_adam7_interlaced_decode():
    """Round 5: Adam7 decode — every pass independently filtered,
    scattered back onto the full grid; odd sizes exercise empty and
    single-pixel passes."""
    from butteraugli_ray.stages.png import decode_png
    rng = np.random.default_rng(19)
    for h, w in [(16, 16), (13, 7), (1, 1), (2, 3), (9, 31), (5, 4)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = _interlace_adam7_png(img)
        np.testing.assert_array_equal(decode_png(data), img,
                                      err_msg=f"{h}x{w}")
