"""Baseline JPEG (ITU T.81) codec — pure numpy + stdlib.

Closes the "non-PNG pixel decode" gap for JPEG: this container ships no
PIL/cv2, so both directions are implemented from the public spec the
way the PNG codec in `multimodal.py` is:

  decode  baseline/extended-sequential DCT (SOF0/SOF1) AND progressive
          (SOF2: spectral selection, successive approximation, EOB
          runs, per-scan table redefinition), 8-bit, grayscale or
          YCbCr at any legal sampling (4:4:4, 4:2:0, 4:2:2, ...),
          byte-stuffing, restart markers, multiple DQT/DHT segments.
          Arithmetic coding and lossless/hierarchical modes are
          rejected with None — decode NEVER raises on corrupt bytes
          (same contract as `decode_png_pixels`).
  encode  baseline interleaved single scan, grayscale or RGB→YCbCr,
          4:4:4 or 4:2:0, Annex-K quantization tables scaled by the
          libjpeg quality curve, optional restart markers. Huffman
          tables are generated flat (all DC symbols at 4 bits, all 162
          AC (run,size) symbols at 8 bits): correct-by-construction
          prefix codes written into DHT — any spec decoder reads them;
          the ~2× stream-size cost vs Annex-K typical tables is
          irrelevant here (the encoder exists for round-trip tests and
          resize re-emission, not archival).

Reference analog: per-format media handling,
/root/reference/ec2/parse_arxiv_papers/download_and_extract_paper.py:48-95.

Scale note: JPEG entropy coding is inherently sequential per image, so
this runs inside the Arrow-batched `mapInPandas` media pipeline
(`functions/multimodal.py`) — per-row Python on the explicitly slow
multimodal path, never in the index/query hot path.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Raster index of the k-th zigzag-order coefficient (generated
    from the diagonal-walk definition, not a typed-in table)."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 == 1 else reversed(list(rows))):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()

# Annex K example quantization tables (raster order). Exactness is not
# load-bearing: the encoder writes whatever table it used into DQT and
# the decoder dequantizes with the DQT it read.
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# orthonormal DCT-II basis: forward = A @ b @ A.T, inverse = A.T @ C @ A
_DCT_A = np.array(
    [[math.cos((2 * n + 1) * k * math.pi / 16)
      * (math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8))
      for n in range(8)] for k in range(8)])

# the 162 legal AC symbols: EOB, (run 0-15 × size 1-10), ZRL
_AC_SYMBOLS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]
_DC_SYMBOLS = list(range(12))  # DC size categories 0..11 (8-bit baseline)


def _flat_table(symbols: list[int], nbits: int):
    """Canonical Huffman table with every symbol at the same code
    length. Valid iff len(symbols) < 2**nbits (the all-ones code must
    stay unused per T.81 C.2); codes are simply 0..n-1 at `nbits`."""
    assert len(symbols) < (1 << nbits)
    enc = {sym: (i, nbits) for i, sym in enumerate(symbols)}
    bits = [0] * 16
    bits[nbits - 1] = len(symbols)
    return enc, bits, list(symbols)


_DC_ENC, _DC_BITS, _DC_VALS = _flat_table(_DC_SYMBOLS, 4)
_AC_ENC, _AC_BITS, _AC_VALS = _flat_table(_AC_SYMBOLS, 8)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 = Annex K, 100 = all-ones."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:  # pad to byte boundary with 1-bits
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _encode_coef(bw: _BitWriter, zz: np.ndarray, dc_pred: int) -> int:
    """Huffman-encode one quantized block (zigzag order); returns the
    new DC predictor."""
    dc = int(zz[0])
    diff = dc - dc_pred
    size = abs(diff).bit_length()
    bw.write(*_DC_ENC[size])
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*_AC_ENC[0xF0])  # ZRL
            run -= 16
        size = abs(v).bit_length()
        bw.write(*_AC_ENC[(run << 4) | size])
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        bw.write(*_AC_ENC[0x00])  # EOB
    return dc


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """All 8×8 blocks of a block-aligned plane → quantized zigzag
    coefficients, one matmul batch (by, bx, 64)."""
    h, w = plane.shape
    b = (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
         .astype(np.float64) - 128.0)
    coef = np.einsum("ij,byjk,kl->byil", _DCT_A, b, _DCT_A.T)
    zz = coef.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]
    return np.round(zz / qtbl[ZIGZAG]).astype(np.int32)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """img: uint8 (h,w) / (h,w,1) grayscale or (h,w,3) RGB →
    baseline JFIF bytes. `subsample=True` emits 4:2:0."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
        qtabs = [ql]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 — chroma is the 2×2 mean
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
        qtabs = [ql, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag blocks per component, plane padded to the MCU grid
    qz = []
    for p, (hs, vs), qi in zip(planes, samp, qsel):
        padded = _pad_to(np.clip(p, 0, 255), mcuy * vs * 8, mcux * hs * 8)
        qz.append(_plane_blocks(padded, qtabs[qi].astype(np.float64)))

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since_rst == restart_interval:
                bw.align()
                bw.buf += bytes((0xFF, 0xD0 + (rst & 7)))
                rst += 1
                since_rst = 0
                preds = [0] * len(planes)
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_coef(
                            bw, qz[ci][my * vs + by, mx * hs + bx], preds[ci]
                        )
            since_rst += 1
    bw.align()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    for ti, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + bytes(
            int(qt[i]) for i in ZIGZAG
        )
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, ((hs, vs), qi) in enumerate(zip(samp, qsel)):
        out += bytes((ci + 1, (hs << 4) | vs, qi))
    for tc, (bits, vals) in ((0, (_DC_BITS, _DC_VALS)), (1, (_AC_BITS, _AC_VALS))):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4) + bytes(
            bits
        ) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes((ci + 1, 0x00))  # every component uses DC 0 / AC 0
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al (baseline fixed)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _ScanEnd(Exception):
    pass


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    hitting any real marker raises _ScanEnd."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise _ScanEnd
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise _ScanEnd
            if d[self.pos + 1] != 0x00:
                raise _ScanEnd  # marker (RST handled out-of-band)
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, nb: int) -> int:
        while self.n < nb:
            self._fill()
        self.n -= nb
        v = (self.acc >> self.n) & ((1 << nb) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        if (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _build_huff(bits: bytes, vals: bytes) -> dict:
    """DHT (bits, values) → {(length, code): symbol} canonical map."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg_pixels(raw: bytes) -> tuple[np.ndarray, int] | None:
    """Baseline or PROGRESSIVE JPEG → (uint8 array (h, w, c), c) with
    c ∈ {1, 3}; None for arithmetic-coded/lossless/corrupt streams —
    never raises."""
    try:
        return _decode(raw)
    except Exception:
        return None


def _parse_dqt(body: bytes, qt: dict) -> None:
    """DQT segment (possibly several tables) → qt[id] = 64 ints in
    zigzag order."""
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 15
        n = 128 if pq else 64
        t = body[i + 1 : i + 1 + n]
        qt[tq] = (
            np.frombuffer(t, dtype=">u2").astype(np.int64)
            if pq
            else np.frombuffer(t, dtype=np.uint8).astype(np.int64)
        )
        i += 1 + n


def _parse_dht(body: bytes, huff: dict) -> None:
    """DHT segment (possibly several tables) → huff[(class, id)] =
    canonical {(len, code): symbol} map."""
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 15
        bits = body[i + 1 : i + 17]
        nv = sum(bits)
        huff[(tc, th)] = _build_huff(bits, body[i + 17 : i + 17 + nv])
        i += 17 + nv


def _planes_to_pixels(
    comps, planes, ih: int, iw: int, hmax: int, vmax: int
) -> tuple[np.ndarray, int] | None:
    """Upsample subsampled planes, crop padding, color-convert — the
    shared tail of the baseline and progressive decoders."""
    up = []
    for (cid, hs, vs, _tq), p in zip(comps, planes):
        if hs != hmax:
            p = np.repeat(p, hmax // hs, axis=1)
        if vs != vmax:
            p = np.repeat(p, vmax // vs, axis=0)
        up.append(p[:ih, :iw])
    if len(up) == 1:
        px = np.clip(np.round(up[0]), 0, 255).astype(np.uint8)
        return px[:, :, None], 1
    if len(up) != 3:
        return None  # CMYK etc. — out of scope
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), 3


def _decode(raw: bytes) -> tuple[np.ndarray, int] | None:
    if raw[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    dri = 0
    pos = 2
    scan = None  # (comp→(dc,ac), entropy start)
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            pos += 2
            continue
        if pos + 4 > len(raw):
            return None
        seglen = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        body = raw[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            _parse_dqt(body, qt)
        elif marker == 0xC4:  # DHT — possibly several tables
            _parse_dht(body, huff)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, ih, iw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                return None
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
        elif marker == 0xC2:  # progressive DCT — its own scan machinery
            return _decode_progressive(raw)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless/arithmetic/hierarchical: unsupported
        elif marker == 0xDD:
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = {}
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                sel[cid] = (tabs >> 4, tabs & 15)
            scan = (sel, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if sof is None or scan is None:
        return None
    ih, iw, comps = sof
    if ih == 0 or iw == 0 or not comps:
        return None
    sel, data_start = scan
    if len(comps) == 1:
        # non-interleaved single-component scan: sampling factors do
        # not apply (T.81 A.2.2) — the MCU is one block
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-iw // (8 * hmax))
    mcuy = -(-ih // (8 * vmax))

    planes = []
    dequant = []
    tables = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64))
        q = qt.get(tq)
        if q is None or cid not in sel:
            return None
        dequant.append(q)  # zigzag order, as stored in DQT
        dc_id, ac_id = sel[cid]
        dct = huff.get((0, dc_id))
        act = huff.get((1, ac_id))
        if dct is None or act is None:
            return None
        tables.append((dct, act))

    br = _BitReader(raw, data_start)
    preds = [0] * len(comps)
    zz = np.zeros(64, dtype=np.int64)
    nat = np.zeros(64, dtype=np.float64)
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and since_rst == dri:
                br.sync_restart()
                preds = [0] * len(comps)
                since_rst = 0
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dct, act = tables[ci]
                q = dequant[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz[:] = 0
                        size = br.huff(dct)
                        preds[ci] += _receive_extend(br, size)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = br.huff(act)
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _receive_extend(br, s)
                            k += 1
                        nat[ZIGZAG] = zz * q
                        blk = _DCT_A.T @ nat.reshape(8, 8) @ _DCT_A + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            since_rst += 1

    return _planes_to_pixels(comps, planes, ih, iw, hmax, vmax)


# ---------------------------------------------------------------------------
# progressive decoder (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _decode_progressive(raw: bytes) -> tuple[np.ndarray, int] | None:
    """Progressive JPEG (T.81 G): coefficients accumulate across scans
    (DC/AC × first/refinement, spectral bands, successive
    approximation, EOB runs, restart markers); one vectorized IDCT at
    the end. Tables may be redefined between scans, so scans decode
    inline during the segment walk."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    dri = 0
    sof = None
    coefs: list[np.ndarray] | None = None
    grid = None  # (hmax, vmax, mcux, mcuy, per-comp (hs, vs, bw, bh))
    pos = 2
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(raw):
            return None
        seglen = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        body = raw[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            _parse_dqt(body, qt)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xC2:
            prec, ih, iw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ih == 0 or iw == 0 or nc == 0:
                return None
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (ih, iw, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-iw // (8 * hmax))
            mcuy = -(-ih // (8 * vmax))
            shapes = []
            coefs = []
            for _cid, hs, vs, _tq in comps:
                bw = -(-(-(-iw * hs // hmax)) // 8)  # ceil(ceil(iw*hs/hmax)/8)
                bh = -(-(-(-ih * vs // vmax)) // 8)
                shapes.append((hs, vs, bw, bh))
                coefs.append(np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32))
            grid = (hmax, vmax, mcux, mcuy, shapes)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # a second, non-progressive frame: malformed
        elif marker == 0xDD:
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if sof is None or coefs is None:
                return None
            ns = body[0]
            scomps = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(
                    (i for i, c in enumerate(sof[2]) if c[0] == cid), None
                )
                if idx is None:
                    return None
                scomps.append((idx, tabs >> 4, tabs & 15))
            ss, se, aa = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = aa >> 4, aa & 15
            pos = _decode_prog_scan(
                raw, pos + 2 + seglen, scomps, ss, se, ah, al,
                huff, dri, coefs, sof, grid,
            )
            continue
        pos += 2 + seglen
    if sof is None or coefs is None or grid is None:
        return None
    ih, iw, comps = sof
    hmax, vmax, mcux, mcuy, _shapes = grid
    planes = []
    for (cid, hs, vs, tq), cz in zip(comps, coefs):
        q = qt.get(tq)
        if q is None:
            return None
        nat = np.empty(cz.shape, dtype=np.float64)
        nat[..., ZIGZAG] = cz * q  # dequant, zigzag → natural order
        blocks = nat.reshape(cz.shape[0], cz.shape[1], 8, 8)
        p = np.einsum("ij,byjk,kl->byil", _DCT_A.T, blocks, _DCT_A) + 128.0
        planes.append(
            p.transpose(0, 2, 1, 3).reshape(cz.shape[0] * 8, cz.shape[1] * 8)
        )
    return _planes_to_pixels(comps, planes, ih, iw, hmax, vmax)


def _skip_to_marker(raw: bytes, pos: int) -> int:
    """First byte offset ≥ pos of a REAL marker (not stuffing, not
    RST) — where the next segment after a scan's entropy data starts."""
    n = len(raw)
    while pos + 1 < n:
        if raw[pos] == 0xFF and raw[pos + 1] != 0x00 and not (
            0xD0 <= raw[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _decode_prog_scan(
    raw, start, scomps, ss, se, ah, al, huff, dri, coefs, sof, grid
) -> int:
    """Decode ONE progressive scan's entropy data into the coefficient
    arrays; returns the byte offset of the next marker segment."""
    ih, iw, comps = sof
    hmax, vmax, mcux, mcuy, shapes = grid
    br = _BitReader(raw, start)
    if ss == 0:
        dct = {}
        for idx, td, _ta in scomps:
            t = huff.get((0, td))
            if t is None and ah == 0:
                raise ValueError("missing DC table")
            dct[idx] = t
        preds = {idx: 0 for idx, _td, _ta in scomps}
        if len(scomps) > 1:  # interleaved DC scan, MCU order
            since = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and since == dri:
                        br.sync_restart()
                        preds = dict.fromkeys(preds, 0)
                        since = 0
                    for idx, _td, _ta in scomps:
                        hs, vs, _bw, _bh = shapes[idx]
                        for by in range(vs):
                            for bx in range(hs):
                                coef = coefs[idx][my * vs + by, mx * hs + bx]
                                if ah == 0:
                                    size = br.huff(dct[idx])
                                    preds[idx] += _receive_extend(br, size)
                                    coef[0] = preds[idx] << al
                                elif br.bits(1):
                                    coef[0] |= 1 << al
                    since += 1
        else:  # single-component DC scan: its own block raster
            idx = scomps[0][0]
            _hs, _vs, bw, bh = shapes[idx]
            since = 0
            for bi in range(bw * bh):
                if dri and since == dri:
                    br.sync_restart()
                    preds[idx] = 0
                    since = 0
                coef = coefs[idx][bi // bw, bi % bw]
                if ah == 0:
                    size = br.huff(dct[idx])
                    preds[idx] += _receive_extend(br, size)
                    coef[0] = preds[idx] << al
                elif br.bits(1):
                    coef[0] |= 1 << al
                since += 1
    else:
        if len(scomps) != 1:
            raise ValueError("interleaved AC scan is illegal in progressive")
        idx, _td, ta = scomps[0]
        act = huff.get((1, ta))
        if act is None:
            raise ValueError("missing AC table")
        _hs, _vs, bw, bh = shapes[idx]
        eobrun = 0
        since = 0
        for bi in range(bw * bh):
            if dri and since == dri:
                br.sync_restart()
                eobrun = 0
                since = 0
            coef = coefs[idx][bi // bw, bi % bw]
            if ah == 0:
                eobrun = _ac_first(br, act, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(br, act, coef, ss, se, al, eobrun)
            since += 1
    return _skip_to_marker(raw, br.pos)


def _ac_first(br, act, coef, ss, se, al, eobrun) -> int:
    """Initial AC scan for one block (T.81 G.1.2.2): zero-run coding of
    the band with EOB-run sharing across blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = br.huff(act)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC band overflow")
            coef[k] = _receive_extend(br, s) << al
            k += 1
    return 0


def _ac_refine(br, act, coef, ss, se, al, eobrun) -> int:
    """AC refinement scan for one block (T.81 G.1.2.3): one correction
    bit per already-nonzero coefficient; new ±1·2^al coefficients via
    zero-HISTORY run coding; EOB-run blocks still take correction
    bits."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = br.huff(act)
            r, s = sym >> 4, sym & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions, no placement
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                newval = p1 if br.bits(1) else m1
            while k <= se:
                if coef[k] != 0:
                    if br.bits(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0 and br.bits(1) and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun
