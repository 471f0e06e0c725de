"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT).

The reference CLI accepts jpg/jpeg inputs
(/root/reference/butteraugli-cli/src/main.rs:92-98); this sandbox has
no codec wheel, so baseline JPEG decode is implemented here from the
public spec: marker parse → Huffman entropy decode (tables come from
the stream's DHT segments) → dequantize → dezigzag → vectorized
orthonormal IDCT over all blocks at once (one einsum) → chroma
upsample → JFIF YCbCr→RGB.  Supported: 8-bit baseline (SOF0/SOF1),
1- or 3-component, any h/v sampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), restart intervals.  Progressive (SOF2) and arithmetic coding
raise ``NotImplementedError``.

``encode_jpeg`` is the matching baseline encoder (quality-scaled flat
quant tables, simple canonical Huffman tables emitted via DHT — any
conformant decoder reads tables from the stream, so no Annex-K
constants are required), used by the heatmap/fixture paths and the
round-trip tests.

Perf note (round 5): entropy decode uses a 16-bit-window LUT — one
list lookup decodes a whole (Huffman code + magnitude bits) pair —
plus vectorized destuffing and a single end-of-scan coefficient
scatter (~3x over the old per-bit tree walk; ~4 Mpx/s at q90).  The
symbol loop itself stays sequential Python because JPEG's Huffman
phase (DC vs AC, component interleave, in-block index) depends on
every prior symbol, so windows can't be decoded speculatively without
restart markers.  Bulk corpus media should still be decoded by a real
codec wheel on a production cluster (the Ray plumbing in
stages/media.py is codec-agnostic).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal DCT-II basis: spatial = M.T @ coeffs @ M
_K = np.arange(8, dtype=np.float64)
_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _K[None, :] + 1) * _K[:, None]
                                 * np.pi / 16.0)
_M[0] = np.sqrt(1.0 / 8.0)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """[n, 8, 8] dequantized coefficients → [n, 8, 8] spatial."""
    return np.einsum("ux,nuv,vy->nxy", _M, coef, _M, optimize=True)


def _fdct_blocks(spatial: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _M, spatial, _M, optimize=True)


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: s-bit magnitude → signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def read_bit(self) -> int:
        if not self.bits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _build_huff(counts, symbols) -> dict:
    """DHT (counts per length, symbol list) → {(len, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


_LUT_CACHE: dict = {}


def _huff_lut(table: dict, is_ac: bool) -> list:
    """16-bit-window LUT: ONE list lookup decodes a whole (Huffman code
    + magnitude bits) pair — the round-5 vectorization of the entropy
    decode (the old tree walk burned ~30-60 Python ops per symbol).

    Entry encoding (plain Python ints, built vectorized in numpy):
      e >= 0   full entry: total_bits = e & 31; run = (e >> 5) & 31
               (run sentinel 31 = EOB; ZRL is folded in as run=15 with
               value 0); value = (e >> 10) - 32768
      e == -1  invalid window (no code within 16 bits)
      e < -1   symbol-only entry (codelen + size > 16): p = -e - 2;
               codelen = p & 31; run = (p >> 5) & 31; size = p >> 10 —
               the caller reads the magnitude bits itself.
    """
    key = (is_ac, tuple(sorted(table.items())))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    e = np.full(65536, -1, np.int64)
    for (clen, code), sym in table.items():
        base = code << (16 - clen)
        span = 1 << (16 - clen)
        if is_ac:
            r, s = sym >> 4, sym & 0x0F
            if sym == 0x00:                   # EOB
                e[base:base + span] = clen | (31 << 5) | (32768 << 10)
                continue
            if sym == 0xF0:                   # ZRL → run 15, value 0
                r, s = 15, 0
        else:
            r, s = 0, sym
        if s == 0:
            e[base:base + span] = clen | (r << 5) | (32768 << 10)
        elif clen + s <= 16:
            m = np.arange(1 << s, dtype=np.int64)
            val = np.where(m >= (1 << (s - 1)), m, m - (1 << s) + 1)
            ent = (clen + s) | (r << 5) | ((val + 32768) << 10)
            e[base:base + span] = np.repeat(ent, 1 << (16 - clen - s))
        else:
            e[base:base + span] = -(2 + (clen | (r << 5) | (s << 10)))
    lut = e.tolist()
    if len(_LUT_CACHE) > 16:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


def _destuff(data: bytes):
    """Entropy-coded bytes → list of de-stuffed segments split at
    restart markers (FF00 → FF; FFD0-D7 delimit segments).  Vectorized:
    one pass finds every 0xFF, classifies its successor, truncates at
    the first real marker, deletes the stuffed 0x00s, and splits at the
    restart positions — no per-byte Python loop."""
    a = np.frombuffer(data, np.uint8)
    ff = np.flatnonzero(a == 0xFF)
    if ff.size and ff[-1] == len(a) - 1:      # trailing lone 0xFF: treat
        a = a[:-1]                            # as end-of-data (old code
        ff = ff[:-1]                          # mapped it to EOI)
    nxt = a[ff + 1]
    stuffed = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    real = ~(stuffed | rst)
    if real.any():                            # first real marker ends it
        end = ff[real][0]
        keep = ff < end
        a = a[:end]
        ff, stuffed, rst = ff[keep], stuffed[keep], rst[keep]
    # drop the 0x00 after each stuffed FF, and both bytes of a restart
    drop = np.concatenate([ff[stuffed] + 1, ff[rst], ff[rst] + 1])
    mask = np.ones(len(a), bool)
    mask[drop] = False
    # split positions in the compacted stream: count kept bytes before
    # each restart marker
    kept_before = np.cumsum(mask) - mask      # kept strictly before i
    cuts = kept_before[ff[rst]] if rst.any() else np.array([], np.int64)
    out = a[mask].tobytes()
    segs = []
    prev = 0
    for c in np.sort(cuts).tolist():
        segs.append(out[prev:c])
        prev = c
    segs.append(out[prev:])
    return segs


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 [h, w, 3] RGB."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        if i + 1 >= len(data):
            break
        if data[i + 1] == 0xFF:               # fill byte (T.81 B.1.1.2):
            i += 1                            # any run of 0xFF may pad a
            continue                          # marker; only the last
        marker = data[i + 1]                  # 0xFF starts it
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:                    # EOI
            break
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + ln]
        if marker == 0xDB:                    # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], ">u2"
                                         ).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], np.uint8
                                         ).astype(np.int64)
                    p += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):          # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported")
        elif marker == 0xC4:                  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                syms = list(seg[p + 17:p + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = _build_huff(counts,
                                                               syms)
                p += 17 + nsym
        elif marker == 0xDD:                  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                  # SOS → entropy follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scomp.append((comp, tt >> 4, tt & 0x0F))
            ent_start = i + 2 + ln
            return _decode_scan(data[ent_start:], frame, scomp, qt,
                                huff_dc, huff_ac, restart)
        i += 2 + ln
    raise ValueError("JPEG has no scan data")


def _decode_scan(ent: bytes, frame, scomp, qt, huff_dc, huff_ac,
                 restart: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    # LUT entropy decode: one list lookup per (code + magnitude) pair;
    # decoded coefficients accumulate in flat Python lists and scatter
    # into the numpy grids once at the end (no per-symbol numpy writes).
    comps = []
    for ci, (comp, td, ta) in enumerate(scomp):
        comps.append((comp["id"], _huff_lut(huff_dc[td], False),
                      _huff_lut(huff_ac[ta], True), comp["h"], comp["v"],
                      mx * comp["h"], ci))
    pos_l = {c["id"]: [] for c, _, _ in scomp}
    val_l = {c["id"]: [] for c, _, _ in scomp}
    appends = {cid: (pos_l[cid].append, val_l[cid].append)
               for cid in pos_l}
    segs = _destuff(ent)
    seg_i = 0
    seg = segs[0]
    slen = len(seg)
    # bit-buffer locals: acc holds nb valid low bits; vb counts virtual
    # padding bytes shifted in past the segment end (consuming any of
    # them beyond the refill lookahead = truncated stream)
    acc = nb = pos = vb = 0
    preds = [0] * len(scomp)
    n_mcus = mx * my
    for m in range(n_mcus):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            seg = segs[seg_i]
            slen = len(seg)
            acc = nb = pos = vb = 0
            preds = [0] * len(scomp)
        myi, mxi = divmod(m, mx)
        for cid, dlut, alut, ch_, cv, gw, ci in comps:
            pappend, vappend = appends[cid]
            for by in range(cv):
                row = (myi * cv + by) * gw + mxi * ch_
                for bx in range(ch_):
                    boff = (row + bx) * 64
                    # ---- DC ----
                    while nb < 16:
                        if pos < slen:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                        else:
                            acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                            vb += 1
                        nb += 8
                    e = dlut[(acc >> (nb - 16)) & 0xFFFF]
                    if e >= 0:
                        nb -= e & 31
                        diff = (e >> 10) - 32768
                    else:
                        if e == -1:
                            raise ValueError("invalid JPEG Huffman code")
                        p = -e - 2
                        s = p >> 10
                        nb -= p & 31
                        while nb < s:
                            if pos < slen:
                                acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                                pos += 1
                            else:
                                acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                                vb += 1
                            nb += 8
                        nb -= s
                        v = (acc >> nb) & ((1 << s) - 1)
                        diff = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                    pred = preds[ci] + diff
                    preds[ci] = pred
                    pappend(boff)
                    vappend(pred)
                    # ---- AC ----
                    k = 1
                    while k < 64:
                        while nb < 16:
                            if pos < slen:
                                acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                                pos += 1
                            else:
                                acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                                vb += 1
                            nb += 8
                        e = alut[(acc >> (nb - 16)) & 0xFFFF]
                        if e >= 0:
                            nb -= e & 31
                            run = (e >> 5) & 31
                            if run == 31:     # EOB
                                break
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            val = (e >> 10) - 32768
                            if val:
                                pappend(boff + k)
                                vappend(val)
                            k += 1
                        else:
                            if e == -1:
                                raise ValueError(
                                    "invalid JPEG Huffman code")
                            p = -e - 2
                            run = (p >> 5) & 31
                            s = p >> 10
                            nb -= p & 31
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            while nb < s:
                                if pos < slen:
                                    acc = ((acc << 8) | seg[pos]) \
                                        & 0xFFFFFFFF
                                    pos += 1
                                else:
                                    acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                                    vb += 1
                                nb += 8
                            nb -= s
                            v = (acc >> nb) & ((1 << s) - 1)
                            pappend(boff + k)
                            vappend(
                                v if v >= (1 << (s - 1))
                                else v - (1 << s) + 1)
                            k += 1
                    # consumed = 8*(pos+vb) - nb; past-end iff > 8*slen
                    if vb and vb * 8 > nb:
                        raise ValueError("JPEG entropy data exhausted")

    coefs = {}
    for comp, _, _ in scomp:
        cid = comp["id"]
        flat = np.zeros(my * comp["v"] * mx * comp["h"] * 64, np.int64)
        if pos_l[cid]:
            flat[pos_l[cid]] = val_l[cid]
        coefs[cid] = flat.reshape(my * comp["v"], mx * comp["h"], 64)

    planes = []
    for comp, _, _ in scomp:
        grid = coefs[comp["id"]]
        gy, gx = grid.shape[:2]
        q = qt[comp["tq"]]
        dz = np.zeros((gy * gx, 64), np.float64)
        dz[:, ZIGZAG] = grid.reshape(-1, 64) * q[None, :]
        spatial = _idct_blocks(dz.reshape(-1, 8, 8)) + 128.0
        plane = (spatial.reshape(gy, gx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8))
        # upsample to full resolution (nearest), crop to (h, w)
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5,
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder — baseline, simple canonical tables shipped in the stream
# ---------------------------------------------------------------------------

# DC: symbols 0..11 all at length 4; AC: all 162 (run, size) symbols at
# length 8.  Canonical codes never reach all-ones at their length, so
# the tables are valid per T.81 (decoders read them from DHT).
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]


def _enc_table(counts, symbols) -> dict:
    code = 0
    k = 0
    out = {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _enc_table(_DC_COUNTS, _DC_SYMS)
_AC_ENC = _enc_table(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)     # byte stuffing
                self.acc = 0
                self.bits = 0

    def flush(self) -> bytes:
        if self.bits:
            self.write((1 << (8 - self.bits)) - 1, 8 - self.bits)
        return bytes(self.out)


def _mag(v: int):
    """signed value → (size, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _quant_table(quality: int) -> np.ndarray:
    """Flat quality-scaled table (higher quality → smaller steps)."""
    q = int(np.clip(quality, 1, 100))
    step = max(1, int(round(2.0 + (100 - q) * 0.9)))
    return np.full(64, step, np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 [h, w, 3] RGB (or [h, w] gray) → baseline JPEG bytes.
    ``subsample=True`` uses 4:2:0 (luma 2x2 per MCU)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg needs uint8 input")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2] + 128.0
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2] + 128.0
        if subsample:
            # 2x2 box average on an edge-padded even grid
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean((1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    q = _quant_table(quality)

    # per component: pad plane to its MCU-covered block grid and
    # quantize every block up front (vectorized FDCT)
    blocks = []
    for plane, (hs, vs) in zip(planes, samps):
        ph, pw = my * vs * 8, mx * hs * 8
        pad = np.pad(plane, ((0, ph - plane.shape[0]),
                             (0, pw - plane.shape[1])), mode="edge")
        g = (pad.reshape(ph // 8, 8, pw // 8, 8)
             .transpose(0, 2, 1, 3).reshape(-1, 8, 8)) - 128.0
        coef = _fdct_blocks(g)
        zz = coef.reshape(-1, 64)[:, ZIGZAG]
        blocks.append(np.round(zz / q[None, :]).astype(np.int64)
                      .reshape(ph // 8, pw // 8, 64))

    bw = _BitWriter()
    preds = [0] * len(planes)
    chunks = []
    n_mcus = mx * my
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            chunks.append(bw.flush())
            bw = _BitWriter()
            preds = [0] * len(planes)
        myi, mxi = divmod(m, mx)
        for ci, (hs, vs) in enumerate(samps):
            for by in range(vs):
                for bx in range(hs):
                    blk = blocks[ci][myi * vs + by, mxi * hs + bx]
                    diff = int(blk[0]) - preds[ci]
                    preds[ci] = int(blk[0])
                    s, mag = _mag(diff)
                    ln, code = _DC_ENC[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(mag, s)
                    run = 0
                    last_nz = int(np.nonzero(blk[1:])[0][-1]) + 1 \
                        if np.any(blk[1:]) else 0
                    for k in range(1, last_nz + 1):
                        v = int(blk[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = _AC_ENC[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s, mag = _mag(v)
                        ln, code = _AC_ENC[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(mag, s)
                        run = 0
                    if last_nz < 63:
                        ln, code = _AC_ENC[0x00]
                        bw.write(code, ln)
    chunks.append(bw.flush())
    entropy = bytearray(chunks[0])
    for i, c in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + c

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT carries the table in zigzag order — q already is (the
    # encoder divides zigzag-ordered coefficients by it elementwise,
    # exactly how the decoder multiplies it back)
    out += seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
               + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS)
               + bytes(_AC_SYMS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out + bytes(entropy) + b"\xff\xd9"
