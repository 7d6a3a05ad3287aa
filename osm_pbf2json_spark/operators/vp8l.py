"""VP8L (WebP-lossless) bitstream decoder, written from the public
"WebP Lossless Bitstream Specification" (Google, also RFC 9649 §3-5).
Pure stdlib/NumPy like the sibling JPEG/GIF/PNG/TIFF decoders — no
media libraries exist in this environment, and the graft's multimodal
tier treats every decoder as a from-scratch spec implementation.

Covered (the full still-image coding model):

- LSB-first bit reader over the VP8L chunk payload.
- Canonical prefix codes read MSB-first per code, INCLUDING the
  degenerate single-symbol case (0 bits read) and the two "simple
  code" layouts (1-bit/8-bit first symbol, optional second).
- Code-length codes with 16/17/18 repeat extensions and the optional
  max_symbol cap.
- Spatially-coded images: optional color cache (hash 0x1e35a7bd,
  1..11 bits), optional meta-prefix entropy image selecting one of N
  5-code groups per block, LZ77 backrefs with the 40-entry
  length/distance prefix scheme and the 120-entry 2D near-distance
  map.
- All four transforms, applied inverse in reverse read order:
  predictor (14 modes incl. Select and the ClampAddSubtract pair),
  color transform (signed 3.5 fixed-point channel mixing), subtract
  green, and color indexing with sub-byte pixel bundling (1/2/4-bit
  palettes).

The companion `encode_vp8l` emits a deliberately minimal but fully
conformant subset (no transforms, no cache, one prefix group,
degenerate code-length codes + uniform 8-bit literal codes) so
round-trip tests exercise the decoder on arbitrary images without any
same-path coupling between the two directions.

Reference parity note: the reference repo (osm-pbf2json) has no image
path at all — this module exists for the graft's multimodal columns
(SURVEY §2 graft tier), mirroring how jpeg.py backs decode_media.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_vp8l", "encode_vp8l"]


class _BitReader:
    """LSB-first bit reader (VP8L §2: 'bits are read from the least
    significant bit of the current byte first')."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.d) * 8:
            raise ValueError("VP8L bitstream truncated")
        byte0 = self.pos >> 3
        nbytes = ((end - 1) >> 3) - byte0 + 1
        window = int.from_bytes(self.d[byte0 : byte0 + nbytes], "little")
        val = (window >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return val


class _Prefix:
    """Canonical prefix decoder. Codes are read one bit at a time,
    MSB of the code first (DEFLATE-style canonical assignment over
    (length, symbol) order). A single-symbol alphabet reads 0 bits."""

    __slots__ = ("map", "single", "min_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.map = None
            self.min_len = 0
            return
        self.single = None
        nz.sort()
        # Kraft check: canonical codes must form a complete tree
        code = 0
        prev_len = nz[0][0]
        table = {}
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("VP8L prefix code is not complete")
        self.map = table
        self.min_len = nz[0][0]

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        # seed with min_len bits to shorten the loop
        for _ in range(self.min_len):
            code = (code << 1) | br.read(1)
            ln += 1
        while True:
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("corrupt VP8L prefix stream")
            code = (code << 1) | br.read(1)
            ln += 1


# order in which code-length-code lengths are stored (VP8L §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Prefix:
    if br.read(1):  # simple code
        num = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise ValueError("VP8L simple-code symbol exceeds alphabet")
        if num == 1:
            lengths[sym0] = 1  # degenerate → 0-bit decode
        else:
            sym1 = br.read(8)
            if sym1 >= alphabet:
                raise ValueError("VP8L simple-code symbol exceeds alphabet")
            if sym0 == sym1:
                raise ValueError("VP8L simple code with duplicate symbols")
            lengths[sym0] = 1
            lengths[sym1] = 1
        return _Prefix(lengths)
    # normal: code-length code, then run-length-coded lengths
    n_clc = br.read(4) + 4
    clc_len = [0] * 19
    for i in range(n_clc):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_len)
    if br.read(1):  # use max_symbol
        len_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(len_nbits)
        if max_symbol > alphabet:
            raise ValueError("VP8L max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        c = clc.decode(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        elif c == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[sym] = prev
                sym += 1
        elif c == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise ValueError("VP8L code-length repeat overflow")
    return _Prefix(lengths)


def _lz77_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding (VP8L §4.2.2): codes 0-3 map to
    1-4; beyond that each code pair doubles the range with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# 120-entry near-distance map (VP8L §4.2.2): offsets (dx, dy) with
# dy ∈ [0,7], dx ∈ [-7,8], excluding the non-causal dy==0 ∧ dx<=0 —
# exactly 120 pairs — ordered by squared Euclidean distance, ties by
# larger dy first, then dx DESCENDING. This generating rule reproduces
# the spec's published table, whose entries decode as
# yoffset = code >> 4, xoffset = 8 - (code & 0xf) — i.e. code 2 is
# dx +1 (distance 1) and code 3 is dx +1 dy 1 (distance xsize+1); the
# head is pinned in test_vp8l_roundtrip_and_distance_map and a mapped
# backref stream exercises it end-to-end. Scan distance =
# max(1, dy*xsize + dx).
_DIST_MAP = sorted(
    (
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx <= 0)
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)


def _plane_distance(code_val: int, xsize: int) -> int:
    if code_val > 120:
        return code_val - 120
    dx, dy = _DIST_MAP[code_val - 1]
    return max(1, dy * xsize + dx)


def _decode_spatial(br: _BitReader, xsize: int, ysize: int, level0_meta: bool):
    """One 'spatially-coded image' (VP8L §5): returns uint32 ARGB array
    of shape (ysize, xsize). `level0_meta` allows the meta-prefix
    entropy image (only legal at the top level)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if level0_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        meta_img = _decode_spatial(br, mw, mh, False)
        # meta-prefix index = (red << 8) | green of the entropy image
        meta = (
            (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        ).astype(np.int64)
        n_groups = int(meta.max()) + 1

    groups = []
    green_alpha = 256 + 24 + cache_size
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    out = np.zeros(xsize * ysize, dtype=np.uint32)
    pos = 0
    total = xsize * ysize
    hashmul = 0x1E35A7BD
    shift = 32 - cache_bits if cache_bits else 0
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, xsize)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:
            red = rcode.decode(br)
            blue = bcode.decode(br)
            alpha = acode.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache_bits:
                cache[(hashmul * px & 0xFFFFFFFF) >> shift] = px
        elif s < 280:
            length = _lz77_value(s - 256, br)
            dist_code = dcode.decode(br)
            dist = _plane_distance(_lz77_value(dist_code, br), xsize)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_bits:
                    cache[(hashmul * px & 0xFFFFFFFF) >> shift] = px
        else:
            if not cache_bits:
                raise ValueError("VP8L cache symbol without a cache")
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(ysize, xsize)


# ---- inverse transforms ------------------------------------------------------


def _avg2(a, b):
    return (a + b) // 2


def _inv_predictor(argb: np.ndarray, modes: np.ndarray, bits: int) -> np.ndarray:
    """Predictor transform inverse (VP8L §3.2): residuals in `argb` get
    the per-block prediction added channel-wise mod 256. Sequential by
    construction (each pixel depends on decoded neighbors); numpy-per-
    channel scalars keep it readable — codec decode in this engine is
    test-scale, the Spark plumbing is the scale path."""
    h, w = argb.shape
    ch = np.zeros((h, w, 4), np.int64)  # a, r, g, b planes
    ch[:, :, 0] = (argb >> 24) & 0xFF
    ch[:, :, 1] = (argb >> 16) & 0xFF
    ch[:, :, 2] = (argb >> 8) & 0xFF
    ch[:, :, 3] = argb & 0xFF

    black = np.array([0xFF, 0, 0, 0], np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = ch[0, x - 1]
            elif x == 0:
                pred = ch[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = ch[y, x - 1]
                T = ch[y - 1, x]
                TL = ch[y - 1, x - 1]
                # TR in the contiguous scan-order buffer: index
                # (y-1)*w + x + 1; for the rightmost column that is
                # pixel (y, 0) — already reconstructed (RFC 9649 §3.4)
                TR = ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pa = int(np.abs(T - TL).sum())
                    pb = int(np.abs(L - TL).sum())
                    pred = L if pa < pb else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    # ClampAddSubtractHalf: the delta is divided with C
                    # semantics (truncation toward zero), not floor —
                    # off by one for negative odd deltas otherwise
                    avg = _avg2(L, T)
                    d = avg - TL
                    pred = np.clip(avg + np.sign(d) * (np.abs(d) // 2), 0, 255)
                else:
                    raise ValueError(f"VP8L predictor mode {mode}")
            ch[y, x] = (ch[y, x] + pred) & 0xFF
    return (
        (ch[:, :, 0].astype(np.uint32) << 24)
        | (ch[:, :, 1].astype(np.uint32) << 16)
        | (ch[:, :, 2].astype(np.uint32) << 8)
        | ch[:, :, 3].astype(np.uint32)
    )


def _ct_delta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point channel mix (VP8L §3.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, cte: np.ndarray, bits: int) -> np.ndarray:
    h, w = argb.shape
    out = argb.copy()
    for y in range(h):
        for x in range(w):
            e = int(cte[y >> bits, x >> bits])
            g2r = (e >> 0) & 0xFF  # stored in blue channel
            g2b = (e >> 8) & 0xFF  # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            px = int(out[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inv_color_index(
    argb: np.ndarray, palette: np.ndarray, full_w: int, pack_bits: int
) -> np.ndarray:
    h, w = argb.shape
    idx = (argb >> 8) & 0xFF
    if pack_bits:
        per = 1 << pack_bits  # pixels bundled per green byte
        bitw = 8 >> pack_bits
        cols = []
        for k in range(per):
            cols.append((idx >> (k * bitw)) & ((1 << bitw) - 1))
        idx = np.stack(cols, axis=-1).reshape(h, w * per)[:, :full_w]
    # RFC 9649: an index >= color_table_size yields 0x00000000
    # (transparent black), not a clamp to the last palette entry
    oob = idx >= len(palette)
    out = palette[np.where(oob, 0, idx)]
    if oob.any():
        out = np.where(oob, np.uint32(0), out)
    return out


def decode_vp8l(chunk: bytes, max_pixels: int = 64_000_000):
    """VP8L chunk payload (starting at the 0x2F signature) →
    (width, height, HxWx3 uint8 RGB, alpha_used). Raises ValueError on
    malformed streams (decode_media routes those to format-NULL)."""
    if not chunk or chunk[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(chunk[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    alpha_used = bool(br.read(1))
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if width * height > max_pixels:
        raise ValueError(f"unreasonable dimensions {width}x{height}")

    xsize = width
    transforms = []  # (type, data...) in read order
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read(3) + 2
            bw = -(-xsize // (1 << bits))
            bh = -(-height // (1 << bits))
            modes = (_decode_spatial(br, bw, bh, False) >> 8) & 0xFF
            transforms.append(("pred", modes, bits))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            bw = -(-xsize // (1 << bits))
            bh = -(-height // (1 << bits))
            cte = _decode_spatial(br, bw, bh, False)
            transforms.append(("color", cte, bits))
        elif ttype == 2:  # subtract green
            transforms.append(("subg",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_deltas = _decode_spatial(br, n_colors, 1, False)[0]
            palette = np.cumsum(
                np.stack(
                    [
                        (pal_deltas >> 24) & 0xFF,
                        (pal_deltas >> 16) & 0xFF,
                        (pal_deltas >> 8) & 0xFF,
                        pal_deltas & 0xFF,
                    ],
                    axis=-1,
                ).astype(np.int64),
                axis=0,
            ) & 0xFF
            palette = (
                (palette[:, 0].astype(np.uint32) << 24)
                | (palette[:, 1].astype(np.uint32) << 16)
                | (palette[:, 2].astype(np.uint32) << 8)
                | palette[:, 3].astype(np.uint32)
            )
            if n_colors <= 2:
                pack_bits = 3
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            full_w = xsize
            if pack_bits:
                xsize = -(-xsize // (1 << pack_bits))
            transforms.append(("cidx", palette, full_w, pack_bits))

    argb = _decode_spatial(br, xsize, height, True)

    for t in reversed(transforms):
        if t[0] == "pred":
            argb = _inv_predictor(argb, t[1], t[2])
        elif t[0] == "color":
            argb = _inv_color_transform(argb, t[1], t[2])
        elif t[0] == "subg":
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_color_index(argb, t[1], t[2], t[3])

    rgb = np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
    ).astype(np.uint8)
    return width, height, rgb, alpha_used


# ---- minimal conformant encoder (round-trip testing) -------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, val: int, n: int):
        self.cur |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


def _write_uniform8_code(bw: _BitWriter, alphabet: int):
    """Normal prefix code: symbols 0..255 all length 8 (a complete
    canonical tree where code == symbol), everything above 255 absent —
    emitted via a degenerate code-length code (single symbol '8',
    0 bits each) plus max_symbol = 256."""
    bw.write(0, 1)  # not simple
    # 19 possible CLC entries; order puts 17,18 first then 0..16 — '8'
    # sits at index 10 of _CLC_ORDER
    n = _CLC_ORDER.index(8) + 1
    bw.write(n - 4, 4)
    for i in range(n):
        bw.write(3 if _CLC_ORDER[i] == 8 else 0, 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(256 - 2, 8)  # max_symbol = 256
    # 256 code lengths of '8', 0 bits each — no payload bits at all


def _write_single_symbol_code(bw: _BitWriter, sym: int):
    """Simple code, one symbol → decoder reads 0 bits per decode."""
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # num_symbols - 1 = 0
    if sym < 2:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(sym, 1)
    else:
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(sym, 8)


def _emit_msb(bw: _BitWriter, val: int, n: int):
    """Prefix-code bits are reassembled MSB-first by the decoder, so a
    canonical code must be emitted MSB-first into the LSB-first
    bitstream, one bit at a time."""
    for i in range(n - 1, -1, -1):
        bw.write((val >> i) & 1, 1)


def encode_vp8l(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → VP8L chunk payload. Literal-only conformant
    subset: no transforms, no cache, single prefix group, uniform
    8-bit R/G/B codes (canonical ⇒ code == symbol) and 0-bit
    single-symbol alpha/distance codes (alpha pinned to 255)."""
    h, w, _ = rgb.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("encode_vp8l dimensions out of range")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha unused
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-prefix
    _write_uniform8_code(bw, 256 + 24)  # green
    _write_uniform8_code(bw, 256)  # red
    _write_uniform8_code(bw, 256)  # blue
    _write_single_symbol_code(bw, 255)  # alpha: always 255, 0 bits
    _write_single_symbol_code(bw, 0)  # distance: unused, 0 bits
    for r, g, b in rgb.reshape(-1, 3):
        _emit_msb(bw, int(g), 8)
        _emit_msb(bw, int(r), 8)
        _emit_msb(bw, int(b), 8)
    return b"\x2f" + bw.done()
