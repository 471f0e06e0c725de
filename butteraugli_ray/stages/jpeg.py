"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT).

The reference CLI accepts jpg/jpeg inputs
(/root/reference/butteraugli-cli/src/main.rs:92-98); this sandbox has
no codec wheel, so baseline JPEG decode is implemented here from the
public spec: marker parse → Huffman entropy decode (tables come from
the stream's DHT segments) → dequantize → dezigzag → vectorized
orthonormal IDCT over all blocks at once (one einsum) → chroma
upsample → JFIF YCbCr→RGB.  Supported: 8-bit baseline (SOF0/SOF1),
1- or 3-component, any h/v sampling factors up to 2 (4:4:4, 4:2:2,
4:2:0), restart intervals, and — round 5 — progressive (SOF2) with
spectral selection + successive approximation (T.81 Annex G: DC/AC
first and refinement scans, EOBRUN, interleaved DC scans,
non-interleaved AC scans over each component's own block grid).
Hierarchical and arithmetic-coded variants raise
``NotImplementedError``.

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
    end = len(data)
    if real.any():                            # first real marker ends it
        end = int(ff[real][0])
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
    return segs, end


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JPEG bytes → uint8
    [h, w, 3] RGB."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    progressive = False
    store: dict = {}
    mx = my = 0
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
        elif marker in (0xC0, 0xC1, 0xC2):    # SOF0/1 baseline, SOF2
            progressive = marker == 0xC2      # progressive (Annex G)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mx = -(-w // (8 * hmax))
                my = -(-h // (8 * vmax))
                store = {c["id"]: [0] * (my * c["v"] * mx * c["h"] * 64)
                         for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are supported")
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
            if not progressive:
                return _decode_scan(data[ent_start:], frame, scomp, qt,
                                    huff_dc, huff_ac, restart)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            consumed = _progressive_scan(
                data[ent_start:], frame, scomp, huff_dc, huff_ac,
                restart, ss, se, ahal >> 4, ahal & 0x0F, store, mx, my)
            i = ent_start + consumed
            continue
        i += 2 + ln
    if progressive and frame is not None and store:
        coefs = {c["id"]: np.array(store[c["id"]], np.int64).reshape(
            my * c["v"], mx * c["h"], 64) for c in frame["comps"]}
        return _finish(frame, qt, coefs)
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
    segs, _ = _destuff(ent)
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

    return _finish(frame, qt, coefs)


def _finish(frame, qt, coefs) -> np.ndarray:
    """Zigzag coefficient grids (cid → int64 [gy, gx, 64]) →
    dequantize + IDCT + upsample + color convert → uint8 RGB."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for comp in comps:
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
# Progressive (SOF2) decode — T.81 Annex G spectral-selection /
# successive-approximation scans over the same Huffman + IDCT machinery
# ---------------------------------------------------------------------------


def _huff_lut_sym(table: dict) -> list:
    """16-bit-window → (symbol << 5 | codelen) LUT (symbol only — the
    progressive scans interleave their own EOBRUN / correction /
    magnitude bit reads, so the baseline combined-magnitude LUT does
    not apply).  -1 = invalid window."""
    key = ("sym", tuple(sorted(table.items())))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    e = np.full(65536, -1, np.int64)
    for (clen, code), sym in table.items():
        base = code << (16 - clen)
        e[base:base + (1 << (16 - clen))] = (sym << 5) | clen
    lut = e.tolist()
    if len(_LUT_CACHE) > 16:
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = lut
    return lut


def _huff_lut_prog_ac(table: dict) -> list:
    """16-bit-window LUT for progressive AC-FIRST scans: one lookup
    decodes (code + magnitude bits) like the baseline LUT, and EOBn
    symbols fold their run-length extension bits in too.

      e >= 0   tot = e & 31; run = (e >> 5) & 31; val = (e >> 10) - 32768
               run 31 = EOBn with val = decoded eobrun (covers current
               block: (1<<r) - 1 + extra); ZRL folds as run 15, val 0
      e == -1  invalid
      e < -1   fallback: p = -e - 2; codelen = p & 31;
               run = (p >> 5) & 31 (31 = EOBn); size/r = p >> 10
    """
    key = ("pac", tuple(sorted(table.items())))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    e = np.full(65536, -1, np.int64)
    for (clen, code), sym in table.items():
        base = code << (16 - clen)
        span = 1 << (16 - clen)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:                       # ZRL
                e[base:base + span] = clen | (15 << 5) | (32768 << 10)
            elif clen + r <= 16:              # EOBn, extension folded
                m = np.arange(1 << r, dtype=np.int64)
                ent = (clen + r) | (31 << 5) \
                    | (((1 << r) - 1 + m + 32768) << 10)
                e[base:base + span] = np.repeat(ent,
                                                1 << (16 - clen - r))
            else:
                e[base:base + span] = -(2 + (clen | (31 << 5)
                                             | (r << 10)))
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


def _ac_first_scan(segs, lut, coef, boffs, ss, se, al, restart):
    """Inlined AC-first scan over every block of the component —
    flat locals, one LUT lookup per symbol (incl. folded EOBn)."""
    seg_i = 0
    seg = segs[0]
    slen = len(seg)
    acc = nb = pos = vb = 0
    eobrun = 0
    for m, boff in enumerate(boffs):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            seg = segs[seg_i]
            slen = len(seg)
            acc = nb = pos = vb = 0
            eobrun = 0
        if eobrun:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            while nb < 16:
                if pos < slen:
                    acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                    pos += 1
                else:
                    acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                    vb += 1
                    if vb > 8:
                        raise ValueError("JPEG entropy data exhausted")
                nb += 8
            e = lut[(acc >> (nb - 16)) & 0xFFFF]
            if e >= 0:
                nb -= e & 31
                run = (e >> 5) & 31
                if run == 31:                 # EOBn (covers this block)
                    eobrun = (e >> 10) - 32768
                    break
                k += run
                val = (e >> 10) - 32768
                if val:
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    coef[boff + k] = val << al
                k += 1
            else:
                if e == -1:
                    raise ValueError("invalid JPEG Huffman code")
                p = -e - 2
                run = (p >> 5) & 31
                s = p >> 10
                nb -= p & 31
                while nb < s:
                    if pos < slen:
                        acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                        pos += 1
                    else:
                        acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                        vb += 1
                        if vb > 8:
                            raise ValueError(
                                "JPEG entropy data exhausted")
                    nb += 8
                nb -= s
                v = (acc >> nb) & ((1 << s) - 1)
                if run == 31:                 # long EOBn
                    eobrun = (1 << s) - 1 + v
                    break
                k += run
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                coef[boff + k] = (v if v >= (1 << (s - 1))
                                  else v - (1 << s) + 1) << al
                k += 1


def _ac_refine_scan(segs, lut, coef, boffs, ss, se, al, restart):
    """Inlined AC-refinement scan (T.81 G.1.2.3) — symbol LUT plus
    inline correction-bit reads."""
    p1 = 1 << al
    m1 = -p1
    seg_i = 0
    seg = segs[0]
    slen = len(seg)
    acc = nb = pos = vb = 0
    eobrun = 0
    for m, boff in enumerate(boffs):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG missing restart segment")
            seg = segs[seg_i]
            slen = len(seg)
            acc = nb = pos = vb = 0
            eobrun = 0
        k = ss
        if eobrun == 0:
            while k <= se:
                while nb < 16:
                    if pos < slen:
                        acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                        pos += 1
                    else:
                        acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                        vb += 1
                        if vb > 8:
                            raise ValueError(
                                "JPEG entropy data exhausted")
                    nb += 8
                e = lut[(acc >> (nb - 16)) & 0xFFFF]
                if e < 0:
                    raise ValueError("invalid JPEG Huffman code")
                nb -= e & 31
                rs = e >> 5
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        while nb < r:
                            if pos < slen:
                                acc = ((acc << 8) | seg[pos]) \
                                    & 0xFFFFFFFF
                                pos += 1
                            else:
                                acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                                vb += 1
                            nb += 8
                        if r:
                            nb -= r
                            eobrun = (1 << r) \
                                + ((acc >> nb) & ((1 << r) - 1))
                        else:
                            eobrun = 1
                        break
                    val = 0                   # ZRL
                else:
                    if nb < 1:
                        if pos < slen:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                        else:
                            acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                            vb += 1
                        nb += 8
                    nb -= 1
                    val = p1 if (acc >> nb) & 1 else m1
                while k <= se:
                    c = coef[boff + k]
                    if c:
                        if nb < 1:
                            if pos < slen:
                                acc = ((acc << 8) | seg[pos]) \
                                    & 0xFFFFFFFF
                                pos += 1
                            else:
                                acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                                vb += 1
                            nb += 8
                        nb -= 1
                        if (acc >> nb) & 1 and (c & p1) == 0:
                            coef[boff + k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[boff + k] = val
                k += 1
        if eobrun:
            while k <= se:
                c = coef[boff + k]
                if c:
                    if nb < 1:
                        if pos < slen:
                            acc = ((acc << 8) | seg[pos]) & 0xFFFFFFFF
                            pos += 1
                        else:
                            acc = ((acc << 8) | 0xFF) & 0xFFFFFFFF
                            vb += 1
                        nb += 8
                    nb -= 1
                    if (acc >> nb) & 1 and (c & p1) == 0:
                        coef[boff + k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        if vb > 8:
            raise ValueError("JPEG entropy data exhausted")


class _PReader:
    """MSB-first segment bit reader for progressive scans: symbol-LUT
    Huffman decode + raw bit reads, virtual-padding-bounded."""

    __slots__ = ("seg", "slen", "acc", "nb", "pos", "vb")

    def __init__(self, seg: bytes):
        self.seg = seg
        self.slen = len(seg)
        self.acc = 0
        self.nb = 0
        self.pos = 0
        self.vb = 0

    def _refill(self, want: int) -> None:
        while self.nb < want:
            if self.pos < self.slen:
                self.acc = ((self.acc << 8) | self.seg[self.pos]) \
                    & 0xFFFFFFFF
                self.pos += 1
            else:
                self.acc = ((self.acc << 8) | 0xFF) & 0xFFFFFFFF
                self.vb += 1
                if self.vb > 8:
                    raise ValueError("JPEG entropy data exhausted")
            self.nb += 8

    def huff(self, lut: list) -> int:
        self._refill(16)
        e = lut[(self.acc >> (self.nb - 16)) & 0xFFFF]
        if e < 0:
            raise ValueError("invalid JPEG Huffman code")
        self.nb -= e & 31
        return e >> 5

    def bits(self, n: int) -> int:
        if not n:
            return 0
        self._refill(n)
        self.nb -= n
        return (self.acc >> self.nb) & ((1 << n) - 1)


def _progressive_scan(ent: bytes, frame, scomp, huff_dc, huff_ac,
                      restart: int, ss: int, se: int, ah: int, al: int,
                      store: dict, mx: int, my: int) -> int:
    """Decode one progressive scan into ``store`` (cid → flat Python
    coefficient list, zigzag order).  Returns bytes consumed."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    segs, end = _destuff(ent)
    seg_i = 0
    rd = _PReader(segs[0])
    eobrun = 0
    preds = {c["id"]: 0 for c, _, _ in scomp}
    dc = ss == 0
    if dc and se != 0:
        raise ValueError("JPEG DC scan with nonzero Se")
    if not dc and len(scomp) != 1:
        raise ValueError("JPEG progressive AC scan must be "
                         "non-interleaved")
    if not dc and (ss > se or se > 63):
        raise ValueError("bad JPEG spectral band")
    p1 = 1 << al
    m1 = -p1

    def dc_first(coef, boff, lut, cid):
        s = rd.huff(lut)
        diff = 0
        if s:
            v = rd.bits(s)
            diff = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        preds[cid] += diff
        coef[boff] = preds[cid] << al

    def dc_refine(coef, boff):
        if rd.bits(1):
            coef[boff] |= p1

    def ac_first(coef, boff, lut):
        nonlocal eobrun
        if eobrun:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rd.huff(lut)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:                   # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1 + (rd.bits(r) if r else 0)
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            v = rd.bits(s)
            coef[boff + k] = (v if v >= (1 << (s - 1))
                              else v - (1 << s) + 1) << al
            k += 1

    def ac_refine(coef, boff, lut):
        # libjpeg-structured T.81 G.1.2.3 correction-bit pass
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = rd.huff(lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + (rd.bits(r) if r else 0)
                        break
                    val = 0                   # ZRL: 16 zero-history taps
                else:
                    val = p1 if rd.bits(1) else m1
                while k <= se:
                    c = coef[boff + k]
                    if c:
                        if rd.bits(1) and (c & p1) == 0:
                            coef[boff + k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    coef[boff + k] = val
                k += 1
        if eobrun:
            while k <= se:
                c = coef[boff + k]
                if c:
                    if rd.bits(1) and (c & p1) == 0:
                        coef[boff + k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1

    def do_block(comp, td, ta, boff):
        coef = store[comp["id"]]
        if dc:
            if ah == 0:
                dc_first(coef, boff, _huff_lut_sym(huff_dc[td]),
                         comp["id"])
            else:
                dc_refine(coef, boff)
        else:
            if ah == 0:
                ac_first(coef, boff, _huff_lut_sym(huff_ac[ta]))
            else:
                ac_refine(coef, boff, _huff_lut_sym(huff_ac[ta]))

    def advance_restart():
        nonlocal seg_i, rd, eobrun, preds
        seg_i += 1
        if seg_i >= len(segs):
            raise ValueError("JPEG missing restart segment")
        rd = _PReader(segs[seg_i])
        eobrun = 0
        preds = {c["id"]: 0 for c, _, _ in scomp}

    if len(scomp) > 1:                        # interleaved (DC only)
        for m in range(mx * my):
            if restart and m and m % restart == 0:
                advance_restart()
            myi, mxi = divmod(m, mx)
            for comp, td, ta in scomp:
                gw = mx * comp["h"]
                for by in range(comp["v"]):
                    row = (myi * comp["v"] + by) * gw + mxi * comp["h"]
                    for bx in range(comp["h"]):
                        do_block(comp, td, ta, (row + bx) * 64)
    else:                                     # single component
        comp, td, ta = scomp[0]
        # the component's OWN block grid (not padded to MCU multiples)
        cw = -(-(frame["w"] * comp["h"]) // hmax)
        ch = -(-(frame["h"] * comp["v"]) // vmax)
        wb = -(-cw // 8)
        hb = -(-ch // 8)
        gw = mx * comp["h"]
        boffs = [((m // wb) * gw + m % wb) * 64 for m in range(wb * hb)]
        if dc:
            for m, boff in enumerate(boffs):
                if restart and m and m % restart == 0:
                    advance_restart()
                do_block(comp, td, ta, boff)
        elif ah == 0:                         # inlined AC-first
            _ac_first_scan(segs, _huff_lut_prog_ac(huff_ac[ta]),
                           store[comp["id"]], boffs, ss, se, al,
                           restart)
        else:                                 # inlined AC-refine
            _ac_refine_scan(segs, _huff_lut_sym(huff_ac[ta]),
                            store[comp["id"]], boffs, ss, se, al,
                            restart)
    return end

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

# progressive AC table: the baseline (run, size) symbols plus the EOBn
# symbols 0x10..0xE0 (T.81 Annex G), all at length 8
_AC_SYMS_PROG = sorted(_AC_SYMS + [r << 4 for r in range(1, 15)])
_AC_COUNTS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS_PROG),
                   0, 0, 0, 0, 0, 0, 0, 0]
_AC_ENC_PROG = _enc_table(_AC_COUNTS_PROG, _AC_SYMS_PROG)


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


def _flush_eob_first(bw: "_BitWriter", eobrun: int) -> int:
    """Emit a pending EOBn symbol for an AC-first scan."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        ln, code = _AC_ENC_PROG[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(eobrun - (1 << nb), nb)
    return 0


def _flush_eob_refine(bw: "_BitWriter", eobrun: int,
                      be_bits: list) -> int:
    """Emit a pending EOBn symbol plus its run's buffered correction
    bits for an AC-refinement scan."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        ln, code = _AC_ENC_PROG[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(eobrun - (1 << nb), nb)
    for b in be_bits:
        bw.write(b, 1)
    be_bits.clear()
    return 0


def _enc_ac_first_block(bw, blk, ss, se, al, eobrun):
    """AC first scan for one block (T.81 G.1.2.2, libjpeg-structured):
    point transform is a sign-magnitude shift by Al."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = (-v if v < 0 else v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            eobrun = _flush_eob_first(bw, eobrun)
            ln, code = _AC_ENC_PROG[0xF0]
            bw.write(code, ln)
            r -= 16
        eobrun = _flush_eob_first(bw, eobrun)
        s_ = t.bit_length()
        ln, code = _AC_ENC_PROG[(r << 4) | s_]
        bw.write(code, ln)
        bw.write(t if v > 0 else (~t) & ((1 << s_) - 1), s_)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _flush_eob_first(bw, eobrun)
    return eobrun


def _enc_ac_refine_block(bw, blk, ss, se, al, eobrun, be_bits):
    """AC refinement scan for one block (T.81 G.1.2.3,
    libjpeg-structured correction-bit buffering)."""
    absv = []
    eob = ss - 1
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = (-v if v < 0 else v) >> al
        absv.append(t)
        if t == 1:
            eob = k
    r = 0
    br: list = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        # ZRLs not foldable into the EOB run — runs at correction
        # positions too (decoder reads their bits after the ZRL)
        while r > 15 and k <= eob:
            eobrun = _flush_eob_refine(bw, eobrun, be_bits)
            ln, code = _AC_ENC_PROG[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:                             # history nonzero →
            br.append(t & 1)                  # correction bit
            continue
        eobrun = _flush_eob_refine(bw, eobrun, be_bits)
        ln, code = _AC_ENC_PROG[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(0 if int(blk[k]) < 0 else 1, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        eobrun += 1
        be_bits.extend(br)
        if eobrun == 0x7FFF:
            eobrun = _flush_eob_refine(bw, eobrun, be_bits)
    return eobrun


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """uint8 [h, w, 3] RGB (or [h, w] gray) → baseline JPEG bytes.
    ``subsample=True`` uses 4:2:0 (luma 2x2 per MCU);
    ``progressive=True`` emits an SOF2 stream with the classic
    spectral-selection + one-level successive-approximation scan
    script (DC Al=1 → per-component AC bands Al=1 → DC/AC
    refinements), exercising every Annex G decode path."""
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

    if progressive:
        return _emit_progressive(blocks, samps, h, w, mx, my, q,
                                 restart_interval)

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


def _emit_progressive(blocks, samps, h, w, mx, my, q,
                      restart: int = 0) -> bytes:
    """Assemble the SOF2 stream: headers + the classic scan script
    (DC first Al=1 interleaved; per-component AC-first bands at Al=1,
    component 0 split 1-5 / 6-63; DC refine; matching AC refines).
    ``restart`` > 0 splits every scan into RSTn-delimited chunks of
    that many MCUs (DC scans) / blocks (AC scans), with the pending
    EOB run flushed before each boundary — exercising the decoder's
    per-scan restart handling."""
    nc = len(samps)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)

    def comp_blocks(ci):
        hs, vs = samps[ci]
        wb = -(-(-(-w * hs // hmax)) // 8)
        hb = -(-(-(-h * vs // vmax)) // 8)
        return wb, hb

    def join_chunks(chunks):
        out = bytearray(chunks[0])
        for i, c in enumerate(chunks[1:]):
            out += bytes([0xFF, 0xD0 + (i % 8)]) + c
        return bytes(out)

    def dc_scan(refine):
        chunks = []
        bw = _BitWriter()
        preds = [0] * nc
        for m in range(mx * my):
            if restart and m and m % restart == 0:
                chunks.append(bw.flush())
                bw = _BitWriter()
                preds = [0] * nc
            myi, mxi = divmod(m, mx)
            for ci, (hs, vs) in enumerate(samps):
                for by in range(vs):
                    for bx in range(hs):
                        dcv = int(blocks[ci][myi * vs + by,
                                             mxi * hs + bx, 0])
                        if refine:
                            bw.write(dcv & 1, 1)
                        else:
                            sh = dcv >> 1
                            diff = sh - preds[ci]
                            preds[ci] = sh
                            s_, magv = _mag(diff)
                            ln, code = _DC_ENC[s_]
                            bw.write(code, ln)
                            if s_:
                                bw.write(magv, s_)
        chunks.append(bw.flush())
        comps = list(range(nc))
        ahal = 0x10 if refine else 0x01
        return comps, 0, 0, ahal, join_chunks(chunks)

    def ac_scan(ci, ss, se, refine):
        chunks = []
        bw = _BitWriter()
        wb, hb = comp_blocks(ci)
        eobrun = 0
        be_bits: list = []
        for m in range(wb * hb):
            if restart and m and m % restart == 0:
                if refine:
                    eobrun = _flush_eob_refine(bw, eobrun, be_bits)
                else:
                    eobrun = _flush_eob_first(bw, eobrun)
                chunks.append(bw.flush())
                bw = _BitWriter()
            by, bx = divmod(m, wb)
            blk = blocks[ci][by, bx]
            if refine:
                eobrun = _enc_ac_refine_block(bw, blk, ss, se, 0,
                                              eobrun, be_bits)
            else:
                eobrun = _enc_ac_first_block(bw, blk, ss, se, 1, eobrun)
        if refine:
            _flush_eob_refine(bw, eobrun, be_bits)
        else:
            _flush_eob_first(bw, eobrun)
        chunks.append(bw.flush())
        ahal = 0x10 if refine else 0x01
        return [ci], ss, se, ahal, join_chunks(chunks)

    scans = [dc_scan(False)]
    bands0 = [(1, 5), (6, 63)]
    for ss, se in bands0:
        scans.append(ac_scan(0, ss, se, False))
    for ci in range(1, nc):
        scans.append(ac_scan(ci, 1, 63, False))
    scans.append(dc_scan(True))
    for ss, se in bands0:
        scans.append(ac_scan(0, ss, se, True))
    for ci in range(1, nc):
        scans.append(ac_scan(ci, 1, 63, True))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS_PROG)
               + bytes(_AC_SYMS_PROG))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    for comps, ss, se, ahal, entropy in scans:
        sos = bytes([len(comps)])
        for ci in comps:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, ahal])
        out += seg(0xDA, sos) + entropy
    return out + b"\xff\xd9"
