"""Progressive JPEG (SOF2) decoder locks.

The rigorous check is an independent TEST-SIDE progressive encoder:
the same quantized coefficients are emitted once as a baseline stream
(library encoder) and once as a progressive stream (this file's
writer — spectral selection + successive approximation + EOB runs +
restart markers, written against T.81 G.1.2 from the encode
direction). Identical coefficients ⇒ the two decodes must agree to
the last IDCT rounding, so any scan-machinery bug (band bookkeeping,
refinement bits, EOB-run sharing, point transforms, per-component
grids) shows up as a pixel diff.

A real-encoder progressive photo (rust embedded-book asset, present in
this container) is decoded as an environment-gated integration case.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from theoremsearch_spark.functions.jpegcodec import (
    _DCT_A,
    ZIGZAG,
    _pad_to,
    _quality_scale,
    QUANT_CHROMA,
    QUANT_LUMA,
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)

F3 = (
    "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
    "rust/html/embedded-book/assets/f3.jpg"
)


# ---------------------------------------------------------------------------
# test-side progressive writer
# ---------------------------------------------------------------------------

# flat Huffman tables over ALL (run, size) symbols s=0..10 (progressive
# needs the EOBn family (r<<4)|0 for r<15, which baseline tables lack)
_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
_ENC = {sym: (i, 8) for i, sym in enumerate(_SYMS)}
_BITS = [0] * 16
_BITS[7] = len(_SYMS)


class _W:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0
        self.held_eob = 0  # accumulated EOB run
        self.held_bits: list[int] = []  # correction bits owed at flush

    def bits(self, value: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def sym(self, s: int):
        self.bits(*_ENC[s])

    def flush_eob(self):
        if self.held_eob:
            r = self.held_eob.bit_length() - 1
            self.sym(r << 4)
            self.bits(self.held_eob - (1 << r), r)
            self.held_eob = 0
        for b in self.held_bits:
            self.bits(b, 1)
        self.held_bits = []

    def align(self):
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)


def _dc_size(v: int) -> int:
    return abs(v).bit_length()


def _scan_dc_first(w, blocks, al, order, dri=0):
    """blocks: list of per-position zigzag coef arrays in scan order
    (already MCU-interleaved for multi-component — `order` maps scan
    position → component id for predictor selection)."""
    preds: dict[int, int] = {}
    since = 0
    rst = 0
    for comp, zz in zip(order, blocks):
        if dri and since == dri * _per_mcu(order):
            w.align()
            w.buf += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            preds = {}
            since = 0
        dc = int(zz[0]) >> al  # DC point transform: arithmetic shift
        diff = dc - preds.get(comp, 0)
        preds[comp] = dc
        s = _dc_size(diff)
        w.sym(s)
        if s:
            w.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        since += 1


def _per_mcu(order) -> int:
    return len(order) // order.count(order[0]) if order else 1


def _scan_dc_refine(w, blocks, al):
    # DC uses the two's-complement (arithmetic-shift) bit, matching the
    # decoder's `coef[0] |= 1 << al` on arithmetic-shifted history
    for zz in blocks:
        w.bits((int(zz[0]) >> al) & 1, 1)


def _scan_ac_first(w, blocks, ss, se, al):
    """Single-component AC scan with EOB-run accumulation."""
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        red = [int(np.sign(v)) * (abs(v) >> al) for v in band]
        if not any(red):
            w.held_eob += 1
            if w.held_eob == 0x7FFF:
                w.flush_eob()
            continue
        w.flush_eob()
        run = 0
        last_nz = max(i for i, v in enumerate(red) if v)
        for i, v in enumerate(red):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.sym(0xF0)
                run -= 16
            s = abs(v).bit_length()
            w.sym((run << 4) | s)
            w.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < len(red) - 1:
            w.held_eob += 1


def _scan_ac_refine(w, blocks, ss, se, al):
    """Single-component AC refinement — an exact ENCODE-side mirror of
    the decoder's cursor semantics (T.81 G.1.2.3): run symbols count
    ZERO-HISTORY positions, correction bits for nonzero-history
    coefficients interleave exactly where the decoder's advance loop
    reads them (including inside ZRL skips), EOB runs carry the
    deferred correction bits of every covered block."""
    ah = al + 1
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        hist = [(abs(v) >> ah) != 0 for v in band]
        corr = [(abs(v) >> al) & 1 for v in band]
        births = [
            i for i, v in enumerate(band)
            if not hist[i] and (abs(v) >> al) == 1
        ]
        if not births:
            w.held_eob += 1
            w.held_bits.extend(corr[i] for i in range(len(band)) if hist[i])
            if w.held_eob == 0x7FFF:
                w.flush_eob()
            continue
        w.flush_eob()
        k = 0  # the decoder's in-band cursor
        for bpos in births:
            r = sum(1 for i in range(k, bpos) if not hist[i])
            while r > 15:
                w.sym(0xF0)
                skipped = 0  # decoder consumes EXACTLY 16 zero-history slots
                while skipped < 16:
                    if hist[k]:
                        w.bits(corr[k], 1)
                    else:
                        skipped += 1
                    k += 1
                r -= 16
            w.sym((r << 4) | 1)
            w.bits(1 if band[bpos] > 0 else 0, 1)
            while k < bpos:  # corrections read during the decoder's advance
                if hist[k]:
                    w.bits(corr[k], 1)
                k += 1
            k = bpos + 1
        if k < len(band):  # band not exhausted → this block needs an EOB
            w.held_eob += 1
            w.held_bits.extend(corr[i] for i in range(k, len(band)) if hist[i])


def _coef_planes(img: np.ndarray, quality: int, subsample: bool):
    """The library encoder's plane prep, replicated test-side: returns
    (comps, per-comp quantized zigzag blocks, qtabs, dims, grid)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
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
        if subsample:
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
    from theoremsearch_spark.functions.jpegcodec import _plane_blocks

    qz = []
    for p, (hs, vs), qi in zip(planes, samp, qsel):
        padded = _pad_to(np.clip(p, 0, 255), mcuy * vs * 8, mcux * hs * 8)
        qz.append(_plane_blocks(padded, qtabs[qi].astype(np.float64)))
    return samp, qsel, qz, qtabs, (h, w), (hmax, vmax, mcux, mcuy)


def encode_progressive(
    img: np.ndarray, quality: int = 90, subsample: bool = False, dri: int = 0
) -> bytes:
    """Test-side progressive JFIF: interleaved DC-first at Al=1 →
    per-component AC bands (1..5, 6..63) at Al=1 → DC refinement →
    AC refinements — the canonical libjpeg-style scan script."""
    samp, qsel, qz, qtabs, (h, w), (hmax, vmax, mcux, mcuy) = _coef_planes(
        img, quality, subsample
    )
    ncomp = len(samp)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    for ti, qt in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti) + bytes(
            int(qt[i]) for i in ZIGZAG
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, ((hs, vs), qi) in enumerate(zip(samp, qsel)):
        out += bytes((ci + 1, (hs << 4) | vs, qi))
    for tc in (0, 1):  # same flat table as DC and AC class
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(_SYMS), (tc << 4)) + bytes(
            _BITS
        ) + bytes(_SYMS)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    def sos(comps, ss, se, ah, al):
        seg = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        for ci in comps:
            seg += bytes((ci + 1, 0x00))
        return seg + bytes((ss, se, (ah << 4) | al))

    # interleaved MCU-order DC blocks (scan position → comp id)
    dc_blocks = []
    dc_order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hs, vs) in enumerate(samp):
                for by in range(vs):
                    for bx in range(hs):
                        dc_blocks.append(qz[ci][my * vs + by, mx * hs + bx])
                        dc_order.append(ci)

    def comp_blocks(ci):
        """Non-interleaved raster of component ci's TRUE block grid."""
        hs, vs = samp[ci]
        bw = -(-(-(-w * hs // hmax)) // 8)
        bh = -(-(-(-h * vs // vmax)) // 8)
        return [qz[ci][by, bx] for by in range(bh) for bx in range(bw)]

    w1 = _W()
    _scan_dc_first(w1, dc_blocks, 1, dc_order, dri=dri)
    w1.align()
    out += sos(list(range(ncomp)), 0, 0, 0, 1) + w1.buf
    if dri:
        # DRI applies to every later scan; this writer only restarts in
        # the DC-first scan, so redefine the interval to 0 (legal per
        # T.81 — DRI may change between scans)
        out += b"\xff\xdd" + struct.pack(">HH", 4, 0)

    for ss_, se_ in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            wa = _W()
            _scan_ac_first(wa, comp_blocks(ci), ss_, se_, 1)
            wa.flush_eob()
            wa.align()
            out += sos([ci], ss_, se_, 0, 1) + wa.buf

    w2 = _W()
    _scan_dc_refine(w2, dc_blocks, 0)
    w2.align()
    out += sos(list(range(ncomp)), 0, 0, 1, 0) + w2.buf

    for ss_, se_ in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            wr = _W()
            _scan_ac_refine(wr, comp_blocks(ci), ss_, se_, 0)
            wr.flush_eob()
            wr.align()
            out += sos([ci], ss_, se_, 1, 0) + wr.buf

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def _test_image(h, w, color):
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 90 + 60 * np.sin(xx / 3.0) + 40 * np.cos(yy / 5.0)
    base[h // 3 :, w // 3 :] += rng.integers(-40, 40, (h - h // 3, w - w // 3))
    img = np.clip(base, 0, 255).astype(np.uint8)
    if color:
        return np.stack([img, np.roll(img, 3, 0), 255 - img], axis=2)
    return img


@pytest.mark.parametrize(
    "h,w,color,subsample,dri",
    [
        (21, 13, False, False, 0),   # gray, ragged dims
        (21, 13, False, False, 2),   # gray + restart markers in DC scan
        (24, 16, True, False, 0),    # color 4:4:4, interleaved DC
        (22, 14, True, True, 0),     # color 4:2:0: per-comp block grids
    ],
)
def test_progressive_equals_baseline_for_same_coefficients(
    h, w, color, subsample, dri
):
    img = _test_image(h, w, color)
    base = decode_jpeg_pixels(encode_jpeg_baseline(img, quality=90, subsample=subsample))
    prog = decode_jpeg_pixels(encode_progressive(img, quality=90, subsample=subsample, dri=dri))
    assert base is not None and prog is not None
    assert base[1] == prog[1]
    assert base[0].shape == prog[0].shape
    # identical coefficients; only IDCT float-summation order may differ
    diff = np.abs(base[0].astype(np.int32) - prog[0].astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # and the decode is faithful to the source (4:2:0 halves chroma
    # resolution, so the noisy-color fixture carries inherent loss)
    err = np.abs(prog[0].reshape(img.shape).astype(np.int32) - img.astype(np.int32))
    assert err.mean() < (16 if subsample else 10)


def test_progressive_partial_scans_decode_coarse():
    """A stream truncated after the first scans (DC + low AC band) is
    CORRUPT per our contract — but the machinery must not crash."""
    img = _test_image(24, 16, False)
    raw = encode_progressive(img, quality=90)
    assert decode_jpeg_pixels(raw[: len(raw) // 2]) is None  # never raises


def test_progressive_real_photo():
    """Real-encoder progressive photo (mozjpeg-style scan script)."""
    if not os.path.exists(F3):
        pytest.skip("container fixture not present")
    raw = open(F3, "rb").read()
    d = decode_jpeg_pixels(raw)
    assert d is not None
    px, c = d
    assert (px.shape, c) == ((477, 720, 3), 3)
    # plausibility: a photo, not noise or a flat field
    assert 30 < px.mean() < 220
    assert px.std() > 25
    # determinism
    d2 = decode_jpeg_pixels(raw)
    assert np.array_equal(px, d2[0])
