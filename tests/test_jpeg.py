"""Baseline JPEG codec (stages/jpeg.py): a hand-assembled spec vector
(stream built marker-by-marker with hand-computed expected pixels, NOT
via our encoder), encode→decode round trips across color/subsampling/
restart configurations, and integration with the sniffing loader."""

import struct

import numpy as np
import pytest

from butteraugli_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H",
                                               len(payload) + 2) + payload


def _bits_to_bytes(bits: str) -> bytes:
    bits = bits + "1" * (-len(bits) % 8)      # spec: pad with 1s
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_hand_assembled_dc_only_block():
    """One 8x8 grayscale block, flat quant table 16, DC coefficient 4:
    dequantized DC = 64 → orthonormal IDCT of a DC-only block is
    64/8 = 8 everywhere → every pixel 128 + 8 = 136.

    The stream is assembled here from T.81 directly: Huffman DC table
    with symbols {0..3} at length 2 (canonical codes 00,01,10,11), AC
    table with symbol 0x00 (EOB) at length 1 (code 0).  Entropy:
    DC size=3 (code '11'), magnitude '100' (=4), then EOB '0'."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dc_counts = [0, 4] + [0] * 14
    dht_dc = _seg(0xC4, bytes([0x00] + dc_counts) + bytes([0, 1, 2, 3]))
    ac_counts = [1] + [0] * 15
    dht_ac = _seg(0xC4, bytes([0x10] + ac_counts) + bytes([0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    entropy = _bits_to_bytes("11" + "100" + "0")
    data = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + entropy + b"\xff\xd9")
    img = decode_jpeg(data)
    assert img.shape == (8, 8, 3)
    np.testing.assert_array_equal(img, np.full((8, 8, 3), 136, np.uint8))


def test_hand_assembled_negative_dc_and_ac():
    """Same structure, DC = -4 (size 3, magnitude bits '011') and one
    AC coefficient at zigzag position 1 (raster (0,1)) with run 0,
    size 2, value -2 (bits '01').  Expected pixels computed from the
    textbook orthonormal IDCT formula, written out independently."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dc_counts = [0, 4] + [0] * 14
    dht_dc = _seg(0xC4, bytes([0x00] + dc_counts) + bytes([0, 1, 2, 3]))
    # AC symbols: EOB (0x00) and (run 0, size 2) = 0x02, both length 2
    ac_counts = [0, 2] + [0] * 14
    dht_ac = _seg(0xC4, bytes([0x10] + [0, 2] + [0] * 14)
                  + bytes([0x00, 0x02]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # DC: code '11' (size 3) + '011' (-4); AC: code '01' (0x02) + '01'
    # (-2); EOB: code '00'
    entropy = _bits_to_bytes("11" + "011" + "01" + "01" + "00")
    data = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + entropy + b"\xff\xd9")
    img = decode_jpeg(data).astype(np.float64)[:, :, 0]

    # independent expectation: F[0,0] = -64, F[0,1] = -32 (dequant by
    # 16); f(x,y) = sum_uv a(u)a(v) F(u,v) cos((2x+1)uπ/16)cos((2y+1)vπ/16)
    # with a(0)=sqrt(1/8), a(u>0)=sqrt(2/8)
    y = np.arange(8)
    base = np.full((8, 8), np.sqrt(1 / 8) * np.sqrt(1 / 8) * -64.0)
    ac = (np.sqrt(1 / 8) * np.sqrt(2 / 8) * -32.0
          * np.cos((2 * y + 1) * np.pi / 16))[None, :]
    want = np.clip(base + ac + 128.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(img.astype(np.uint8), want)


def test_round_trips():
    rng = np.random.default_rng(7)
    # smooth-ish image → bounded quantization error at high quality
    gx, gy = np.meshgrid(np.linspace(0, 200, 37), np.linspace(0, 180, 29))
    img = np.stack([gx, gy, (gx + gy) / 2], axis=-1)
    img = np.clip(img + rng.normal(0, 3, img.shape), 0,
                  255).astype(np.uint8)
    for kwargs in ({}, {"subsample": True}, {"restart_interval": 3},
                   {"subsample": True, "restart_interval": 2}):
        dec = decode_jpeg(encode_jpeg(img, quality=95, **kwargs))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 24, (kwargs, err)
    # grayscale
    g = np.clip(gx + rng.normal(0, 2, gx.shape), 0, 255).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=100))
    assert np.abs(dg[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_progressive_roundtrip_matches_baseline():
    """SOF2 decode (round 5): the progressive scan script — DC Al=1,
    spectral bands, EOBRUN, ZRL, and both refinement passes — must
    reconstruct the exact same coefficients as the baseline stream."""
    rng = np.random.default_rng(3)
    for shape, kw in [((24, 33, 3), {}), ((17, 31), {}),
                      ((37, 45, 3), {"subsample": True}),
                      ((8, 8, 3), {})]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=92, **kw))
        prog = decode_jpeg(encode_jpeg(img, quality=92,
                                       progressive=True, **kw))
        np.testing.assert_array_equal(base, prog, err_msg=str(shape))


def test_progressive_malformed_and_sniffing():
    img = np.full((8, 8, 3), 90, np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2    # SOF2 header with a baseline Ss=0/Se=63 scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))

    from butteraugli_ray.stages.imageio import load_image_bytes
    out = load_image_bytes(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - 90).max() <= 3
    prog = load_image_bytes(encode_jpeg(img, quality=100,
                                        progressive=True))
    assert np.abs(prog.astype(int) - 90).max() <= 3


def test_media_stage_and_compare_dirs_jpeg(ray_session, tmp_path, capsys):
    """codec='jpg' media rows decode through the actor plumbing, and
    compare-dirs scores a JPEG pair end-to-end."""
    from butteraugli_ray.cli import main
    from butteraugli_ray.corpus.generators import generate_image_pair
    from butteraugli_ray.stages.media import decode_media

    a, b = generate_image_pair("radial_shift_2_32x32", 32, 32)
    enc = encode_jpeg(a, quality=95)
    out = decode_media(enc, "jpg", 32, 32)
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(int) - a.astype(int)).max() <= 30

    rdir, ddir = tmp_path / "r", tmp_path / "d"
    rdir.mkdir()
    ddir.mkdir()
    (rdir / "p.jpg").write_bytes(encode_jpeg(a, quality=98))
    (ddir / "p.jpg").write_bytes(encode_jpeg(b, quality=98))
    assert main(["compare-dirs", str(rdir), str(ddir)]) == 0
    import json
    res = json.loads(capsys.readouterr().out)
    assert res["n_pairs"] == 1 and res["results"][0]["score"] > 0


def test_fill_bytes_before_marker():
    """T.81 B.1.1.2: any run of 0xFF bytes may pad a marker; only the
    final 0xFF starts it.  Insert a 0xFF fill byte before the DQT
    marker — the header scan must skip it, not parse marker 0xFF with
    a bogus length."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=95))
    # first marker after SOI starts at offset 2 (0xFF xx); pad it
    assert data[2] == 0xFF
    padded = bytes(data[:2]) + b"\xff\xff" + bytes(data[2:])
    np.testing.assert_array_equal(decode_jpeg(padded), decode_jpeg(bytes(data)))


def test_progressive_restart_intervals_match_baseline():
    """Progressive scans split by RSTn markers (DRI) must decode
    identically — exercises the decoder's per-scan restart reset of
    DC predictors, EOB runs and the bit buffer."""
    rng = np.random.default_rng(5)
    for shape, kw in [((24, 33, 3), {}),
                      ((37, 45, 3), {"subsample": True}), ((17, 31), {})]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=92, **kw))
        for interval in (1, 3, 7):
            prog = decode_jpeg(encode_jpeg(
                img, quality=92, progressive=True,
                restart_interval=interval, **kw))
            np.testing.assert_array_equal(base, prog,
                                          err_msg=f"{shape} R={interval}")
