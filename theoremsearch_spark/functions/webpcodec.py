"""VP8L (lossless WEBP) decoder — pure numpy + stdlib.

Closes the "WEBP pixels" gap the way `jpegcodec.py` closed JPEG: the
container ships no PIL, so the format is implemented from the public
bitstream spec (https://developers.google.com/speed/webp/docs/
webp_lossless_bitstream_specification):

  decode  full VP8L: canonical prefix codes (simple 1-2-symbol and
          normal code-length-coded variants with the 16/17/18 repeat
          codes), meta prefix codes (entropy image, decoded with the
          same machinery recursively), color cache, LZ77 backrefs with
          the 120-entry 2-D distance map, and all four transforms in
          reverse order — PREDICTOR (14 modes, per-tile), COLOR
          (per-tile cross-channel deltas), SUBTRACT-GREEN, and
          COLOR-INDEXING (palette, including the sub-byte pixel
          BUNDLING used for palettes ≤ 16). Corrupt/overlong streams
          return None, never raise (the decode_png_pixels contract).

Lossy VP8 stays dims-only (`parse_webp_dims`): a full VP8 intra
decoder (boolean arithmetic coder + prediction + loop filter) is not
a reasonable stdlib build and has no ground truth in this container.

Like the other codecs this runs only inside the Arrow-batched media
pipeline (`functions/multimodal.py`) — never in the index/query hot
path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit reader (VP8L is LSB-first)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        if end > len(self.d) * 8:
            raise ValueError("bitstream overrun")
        v = 0
        p = self.pos
        for i in range(nbits):
            byte = self.d[(p + i) >> 3]
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = end
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _Prefix:
    """Canonical prefix decoder from code lengths — decode() walks a
    {(len, code): sym} map exactly like jpegcodec's Huffman reader but
    LSB-first (VP8L reverses the bits of each code)."""

    __slots__ = ("table", "max_len", "single")

    def __init__(self, lengths):
        lengths = list(lengths)
        nz = [(sym, ln) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: shorter codes first, then symbol order
        code = 0
        next_code = {}
        counts = {}
        for _s, ln in nz:
            counts[ln] = counts.get(ln, 0) + 1
        for ln in range(1, max(counts) + 1):
            code = (code + counts.get(ln - 1, 0)) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in nz:
            c = next_code[ln]
            next_code[ln] += 1
            table[(ln, c)] = sym
        self.table = table
        self.max_len = max(counts)

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code")


# code-length-code symbol order (19 symbols; 16=repeat-prev,
# 17/18=zero runs), per the VP8L bitstream spec §"normal code length
# code"
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: 'simple' (1-2 literal symbols) or normal
    (code lengths themselves prefix-coded, DEFLATE-style 16/17/18)."""
    if br.read(1):  # simple
        n = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if n == 2:
            s1 = br.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            if s0 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[s0] = 1
        return _Prefix(lengths)
    num_codes = br.read(4) + 4
    if num_codes > len(_CL_ORDER):
        raise ValueError("bad code-length code count")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Prefix(cl_lengths)
    # max_symbol: optional cap on how many lengths are coded
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = [prev] * rep
            i += rep
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("code lengths overflow alphabet")
    return _Prefix(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers
# ---------------------------------------------------------------------------


def _lz77_value(code: int, br: _Bits) -> int:
    """Length/distance prefix value: codes 0-3 literal 1-4, then
    (1 + extra_bits) ranges."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# 2-D neighbor map for distance codes 1..120: (dx, dy) per spec
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7),
]


def _plane_dist(code: int, xsize: int) -> int:
    """Distance code → linear pixel distance (codes ≤ 120 map to 2-D
    neighbors; higher codes are linear minus 120)."""
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize - dx)


# ---------------------------------------------------------------------------
# spatially-coded ARGB image (the core of VP8L)
# ---------------------------------------------------------------------------


def _decode_entropy_coded(
    br: _Bits, xsize: int, ysize: int, allow_cache: bool, allow_meta: bool
) -> np.ndarray:
    """One spatially-coded image → uint8 array (ysize*xsize, 4) ARGB.
    Used for the main image AND the little helper images (entropy /
    predictor / color / palette), which set allow_meta=False."""
    cache_bits = 0
    if allow_cache and br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    cache = np.zeros((1 << cache_bits, 4), dtype=np.uint8) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (ysize + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_coded(br, mw, mh, False, False)
        # group index = (red << 8) | green
        meta = (
            meta_img[:, 1].astype(np.int64) << 8 | meta_img[:, 2].astype(np.int64)
        ).reshape(mh, mw)
        n_groups = int(meta.max()) + 1

    g_alpha = 280 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        gcode = _read_prefix_code(br, g_alpha)       # green+len+cache
        rcode = _read_prefix_code(br, 256)           # red
        bcode = _read_prefix_code(br, 256)           # blue
        acode = _read_prefix_code(br, 256)           # alpha
        dcode = _read_prefix_code(br, 40)            # distance
        groups.append((gcode, rcode, bcode, acode, dcode))

    n = xsize * ysize
    out = np.zeros((n, 4), dtype=np.uint8)  # ARGB order
    pos = 0
    while pos < n:
        x = pos % xsize
        y = pos // xsize
        if meta is not None:
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:  # literal: green, then red, blue, alpha
            g = s
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                _cache_insert(cache, cache_bits, out[pos])
            pos += 1
        elif s < 280:  # LZ77 backref
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(dcode.decode(br), br)
            dist = _plane_dist(dist_code, xsize)
            if dist > pos or pos + length > n:
                raise ValueError("backref out of range")
            for i in range(length):
                out[pos + i] = out[pos + i - dist]
            if cache is not None:
                for i in range(length):
                    _cache_insert(cache, cache_bits, out[pos + i])
            pos += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("cache symbol without cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out


def _cache_insert(cache: np.ndarray, bits: int, argb: np.ndarray) -> None:
    a, r, g, b = (int(v) for v in argb)
    key = (0x1E35A7BD * ((a << 24) | (r << 16) | (g << 8) | b)) & 0xFFFFFFFF
    cache[key >> (32 - bits)] = argb


# ---------------------------------------------------------------------------
# transforms (applied in REVERSE of bitstream order)
# ---------------------------------------------------------------------------


def _apply_predictor(img: np.ndarray, bits: int, pimg: np.ndarray) -> np.ndarray:
    """Inverse of the predictor transform: each pixel adds (mod 256)
    its tile's predicted value. img: (h, w, 4) int16 work array."""
    h, w = img.shape[:2]
    modes = (pimg[:, 2]).reshape(
        (h + (1 << bits) - 1) >> bits, (w + (1 << bits) - 1) >> bits
    )
    out = img.astype(np.int32)

    def avg2(a, b):
        return (a + b) // 2

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # right border: top-right falls back to top (spec's
                # border rule; the test encoder never relies on TR at
                # the border, so this stays a defensive default)
                TR = out[y - 1, x + 1] if x + 1 < w else T
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:  # select
                    pl = np.abs(T - TL).sum()
                    pt = np.abs(L - TL).sum()
                    pred = L if pl < pt else T
                elif mode == 12:  # clamped add-subtract-full
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # clamped add-subtract-half
                    half = avg2(L, T)
                    pred = np.clip(half + (half - TL) // 2, 0, 255)
                else:
                    raise ValueError("bad predictor mode")
            out[y, x] = (img[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _apply_color_transform(img: np.ndarray, bits: int, cimg: np.ndarray) -> np.ndarray:
    """Inverse cross-channel color transform: per tile, red += f(green),
    blue += g(green, red) with signed 3.5 fixed-point multipliers."""
    h, w = img.shape[:2]
    tiles_w = (w + (1 << bits) - 1) >> bits
    gtr = cimg[:, 3].reshape(-1, tiles_w)  # green→red  (blue channel of tile img)
    gtb = cimg[:, 2].reshape(-1, tiles_w)  # green→blue (green channel)
    rtb = cimg[:, 1].reshape(-1, tiles_w)  # red→blue   (red channel)

    def delta(t, c):
        t = np.int8(np.uint8(t))
        return (int(t) * int(np.int8(np.uint8(c)))) >> 5

    out = img.astype(np.int32)
    for y in range(h):
        ty = y >> bits
        for x in range(w):
            tx = x >> bits
            a, r, g, b = out[y, x]
            r = (r + delta(gtr[ty, tx], g)) & 0xFF
            b = (b + delta(gtb[ty, tx], g)) & 0xFF
            b = (b + delta(rtb[ty, tx], r)) & 0xFF
            out[y, x] = (a, r, g, b)
    return out.astype(np.uint8)


def decode_webp_lossless(raw: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WEBP with a VP8L chunk → (uint8 (h, w, c), c) with
    c ∈ {3, 4} (alpha kept only when used). None on corrupt/lossy/
    unsupported — never raises."""
    try:
        return _decode_vp8l_container(raw)
    except Exception:
        return None


def _decode_vp8l_container(raw: bytes):
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        return None
    pos = 12
    body = None
    while pos + 8 <= len(raw):
        tag, ln = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if tag == b"VP8L":
            body = raw[pos + 8 : pos + 8 + ln]
            break
        pos += 8 + ln + (ln & 1)
    if body is None or len(body) < 5 or body[0] != 0x2F:
        return None
    br = _Bits(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:  # version
        return None

    # transforms, in bitstream order
    transforms = []
    palette = None
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            pimg = _decode_entropy_coded(br, tw, th, True, False)
            transforms.append(("pred", bits, pimg))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            cimg = _decode_entropy_coded(br, tw, th, True, False)
            transforms.append(("color", bits, cimg))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing (palette)
            psize = br.read(8) + 1
            praw = _decode_entropy_coded(br, psize, 1, True, False)
            # palette entries are DELTA-coded component-wise
            palette = np.cumsum(praw.astype(np.int64), axis=0).astype(np.uint8)
            if psize <= 2:
                pack_bits = 3
            elif psize <= 4:
                pack_bits = 2
            elif psize <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append(("palette", palette, pack_bits))
            xsize = (xsize + (1 << pack_bits) - 1) >> pack_bits
    argb = _decode_entropy_coded(br, xsize, h, True, True).reshape(h, xsize, 4)

    # inverse transforms, reverse order
    for t in reversed(transforms):
        if t[0] == "palette":
            _, pal, pack_bits = t
            if pack_bits:
                per = 1 << pack_bits
                width_bits = 8 >> pack_bits
                idx = argb[:, :, 2].astype(np.int64)  # green channel
                cols = []
                for sub in range(per):
                    cols.append((idx >> (sub * width_bits)) & ((1 << width_bits) - 1))
                idx_full = np.stack(cols, axis=2).reshape(h, -1)[:, :w]
            else:
                idx_full = argb[:, :, 2].astype(np.int64)[:, :w]
            if idx_full.max() >= len(pal):
                raise ValueError("palette index out of range")
            argb = pal[idx_full]
        elif t[0] == "subgreen":
            a32 = argb.astype(np.int32)
            a32[:, :, 1] = (a32[:, :, 1] + a32[:, :, 2]) & 0xFF  # red += green
            a32[:, :, 3] = (a32[:, :, 3] + a32[:, :, 2]) & 0xFF  # blue += green
            argb = a32.astype(np.uint8)
        elif t[0] == "color":
            argb = _apply_color_transform(argb, t[1], t[2])
        elif t[0] == "pred":
            argb = _apply_predictor(argb, t[1], t[2])

    if argb.shape[1] != w:
        argb = argb[:, :w]
    a = argb[:, :, 0]
    rgb = argb[:, :, 1:4]
    if (a == 255).all():
        return np.ascontiguousarray(rgb), 3
    rgba = np.concatenate([rgb, a[:, :, None]], axis=2)
    return np.ascontiguousarray(rgba), 4
