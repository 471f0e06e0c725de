"""stages/imageio.py (BMP / GIF / PPM decoders + magic sniffing) and
the compare-dirs batch CLI.  BMP and GIF bytes are hand-assembled from
their public specs (the GIF test carries its own minimal literal-LZW
encoder), so decode is validated independently of any library."""

import json
import struct

import numpy as np
import pytest

from butteraugli_ray.stages.imageio import (decode_bmp, decode_gif,
                                            decode_ppm, load_image_bytes)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def _bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-assembled 24-bit uncompressed BMP (BGR, 4-byte row pad)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    bgr = img[:, :, [2, 1, 0]]
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    if not top_down:
        rows = rows[::-1]
    pix = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h,
                       1, 24, 0, len(pix), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 54)
    return hdr + info + pix


def test_bmp_24bit_bottom_up_and_top_down():
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], np.uint8)
    np.testing.assert_array_equal(decode_bmp(_bmp24(img)), img)
    np.testing.assert_array_equal(decode_bmp(_bmp24(img, top_down=True)),
                                  img)
    # odd width exercises the row padding
    img2 = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    np.testing.assert_array_equal(decode_bmp(_bmp24(img2)), img2)


def test_bmp_8bit_palette():
    # 2x2, palette [red, green, blue, white] as BGRA quads, bottom-up
    pal = bytes([0, 0, 255, 0, 0, 255, 0, 0, 255, 0, 0, 0,
                 255, 255, 255, 0])
    # rows bottom-up, stride 4: bottom row [2, 3], top row [0, 1]
    pix = bytes([2, 3, 0, 0]) + bytes([0, 1, 0, 0])
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pix),
                       2835, 2835, 4, 0)
    data = (b"BM" + struct.pack("<IHHI", 14 + 40 + 16 + len(pix), 0, 0,
                                14 + 40 + 16) + info + pal + pix)
    want = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [255, 255, 255]]], np.uint8)
    np.testing.assert_array_equal(decode_bmp(data), want)


def test_bmp_rejects_compressed():
    bad = bytearray(_bmp24(np.zeros((1, 1, 3), np.uint8)))
    bad[30] = 1                               # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))


# ---------------------------------------------------------------------------
# GIF — minimal literal-LZW encoder (CLEAR before every pixel keeps the
# code width fixed), written here from the spec, independent of the
# decoder under test
# ---------------------------------------------------------------------------

def _pack_codes(codes, code_size: int) -> bytes:
    acc = 0
    bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(indices: np.ndarray, palette: list, interlace: bool = False
         ) -> bytes:
    h, w = indices.shape
    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = []
    for v in indices.ravel():
        codes += [clear, int(v)]
    codes.append(end)
    packed = _pack_codes(codes, min_code + 1)
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)
    for r, g, b in palette:                   # 4-entry global table
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(packed), 255):
        chunk = packed[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00\x3b"


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def test_gif_basic():
    idx = np.array([[0, 1, 2], [3, 0, 1]], np.uint8)
    img = decode_gif(_gif(idx, PAL))
    np.testing.assert_array_equal(img, np.array(PAL, np.uint8)[idx])


def test_gif_interlaced():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, (8, 4)).astype(np.uint8)
    # store rows in interlace pass order: 0, 4 (pass2), 2, 6 (pass3),
    # 1, 3, 5, 7 (pass4) — for h=8: pass1 rows 0; wait, pass1 = every
    # 8th from 0 → [0]; pass2 = every 8th from 4 → [4]; pass3 = every
    # 4th from 2 → [2, 6]; pass4 = odd rows → [1, 3, 5, 7]
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = idx[order]
    img = decode_gif(_gif(stored, PAL, interlace=True))
    np.testing.assert_array_equal(img, np.array(PAL, np.uint8)[idx])


def test_gif_with_extension_block():
    idx = np.array([[1, 2]], np.uint8)
    raw = _gif(idx, PAL)
    # splice a graphic-control extension between LSD+GCT and the image
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    head = 13 + 12                            # LSD + 4-color GCT
    data = raw[:head] + gce + raw[head:]
    np.testing.assert_array_equal(decode_gif(data),
                                  np.array(PAL, np.uint8)[idx])


def test_sniffing_dispatch():
    img = np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)
    from butteraugli_ray.stages.png import encode_png
    np.testing.assert_array_equal(load_image_bytes(encode_png(img)), img)
    np.testing.assert_array_equal(load_image_bytes(_bmp24(img)), img)
    ppm = b"P6\n2 1\n255\n" + img.tobytes()
    np.testing.assert_array_equal(load_image_bytes(ppm), img)
    np.testing.assert_array_equal(decode_ppm(ppm), img)
    with pytest.raises(ValueError):
        load_image_bytes(b"\xff\xd8\xff junk")


def test_media_stage_decodes_bmp_gif(ray_session):
    """decode_media handles the new codecs through the same actor
    plumbing (raw-parity on features)."""
    from butteraugli_ray.stages.media import decode_media, image_features
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    out = decode_media(_bmp24(img), "bmp", 7, 6)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(image_features(out),
                                  image_features(img))
    idx = rng.integers(0, 4, (5, 4)).astype(np.uint8)
    gif_img = np.array(PAL, np.uint8)[idx]
    out = decode_media(_gif(idx, PAL), "gif", 4, 5)
    np.testing.assert_array_equal(out, gif_img)


def test_compare_dirs_cli(ray_session, tmp_path, capsys):
    """Batch directory mode (main.rs:280-393): matched pairs scored,
    JSON summary, exit codes 0 / 1 (threshold) / 2 (errors, empty)."""
    from butteraugli_ray.cli import main
    from butteraugli_ray.corpus.generators import generate_image_pair
    from butteraugli_ray.stages.png import encode_png

    rdir, ddir = tmp_path / "ref", tmp_path / "dist"
    rdir.mkdir()
    ddir.mkdir()
    a1, b1 = generate_image_pair("radial_shift_2_32x32", 32, 32)
    a2, b2 = generate_image_pair("checkerboard_vs_inverse_32x32", 32, 32)
    (rdir / "one.png").write_bytes(encode_png(a1))
    (ddir / "one.png").write_bytes(encode_png(b1))
    (rdir / "two.bmp").write_bytes(_bmp24(a2))
    (ddir / "two.bmp").write_bytes(_bmp24(b2))
    (rdir / "ignored.txt").write_text("not an image")
    (rdir / "unmatched.png").write_bytes(encode_png(a1))

    assert main(["compare-dirs", str(rdir), str(ddir)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_pairs"] == 2
    assert [r["name"] for r in out["results"]] == ["one.png", "two.bmp"]
    assert all(r["score"] > 0 for r in out["results"])

    # threshold: checkerboard-vs-inverse scores far above 1.0 → exit 1
    assert main(["compare-dirs", str(rdir), str(ddir),
                 "--max-score", "1.0"]) == 1
    capsys.readouterr()

    # dimension mismatch: stop at first error without --keep-going
    (ddir / "two.bmp").write_bytes(
        _bmp24(np.zeros((16, 16, 3), np.uint8)))
    assert main(["compare-dirs", str(rdir), str(ddir)]) == 2
    assert main(["compare-dirs", str(rdir), str(ddir),
                 "--keep-going"]) == 2
    out = json.loads(capsys.readouterr().out)
    errs = [r for r in out["results"] if "error" in r]
    assert len(errs) == 1 and "mismatch" in errs[0]["error"]

    # empty / missing dirs
    empty = tmp_path / "empty"
    empty.mkdir()
    assert main(["compare-dirs", str(empty), str(ddir)]) == 2
    assert main(["compare-dirs", str(tmp_path / "nope"), str(ddir)]) == 2
