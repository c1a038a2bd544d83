"""Dependency-free WebP-VP8L (lossless WebP) codec (VERDICT r8 ask 9).

Decoder for the VP8L bitstream per the public WebP lossless spec
(RFC 9649): RIFF/WEBP container walk (plain ``VP8L`` chunk or a
``VP8X`` extended container carrying one), LSB-first bit reading,
canonical prefix codes (both the 1-2-symbol "simple" form and the
DEFLATE-style code-length-coded form with 16/17/18 repeat codes and
the optional max-symbol field), meta prefix codes via the entropy
image, the ARGB color cache (0x1e35a7bd multiplicative hash), LZ77
backward references with the 120-entry 2D distance neighborhood map,
and all four transforms applied in reverse reading order:

- PREDICTOR (14 spatial modes over tiles, residuals added mod 256),
- COLOR (cross-color: signed 3.5 fixed-point green->red/blue and
  red->blue deltas per tile),
- SUBTRACT_GREEN (green added back into red/blue),
- COLOR_INDEXING (palette lookup, including the packed "pixel
  bundling" widths for palettes of <=16 colors).

The distance neighborhood map is GENERATED from its construction rule
(all offsets dy in 0..8 / dx in -8..8 sorted by squared Euclidean
distance, larger dy first within ties, positive dx before negative;
first 120 kept) rather than transcribed, and the generation is pinned
by unit tests against the spec's published prefix.

Edge conventions documented where the spec leaves room: the
top-right neighbor of a rightmost-column pixel reads the leftmost
pixel of the SAME row (decoded earlier in raster order); fixtures
avoid TR-dependent modes in the last column so round-trips do not
depend on the convention.

Encoder (fixtures + tests): a real VP8L writer — canonical prefix
codes emitted through the code-length-code machinery (with repeat
codes), optional simple codes, optional color cache, optional LZ77
references, and the SUBTRACT_GREEN / PREDICTOR / COLOR_INDEXING
transforms — producing legal streams the decoder (or any spec
decoder) accepts.  Property tests round-trip random images through
every option combination.

The lossy VP8 sibling codec remains out of scope (DCT/loop-filter
territory; see README 'Multimodal codec support').
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import MAX_DECODED_BYTES

# code-length-code read order (spec section "Entropy code")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

_NUM_LENGTH_CODES = 24
_NUM_DIST_CODES = 40
_GREEN_BASE = 256 + _NUM_LENGTH_CODES        # literals + length codes
_CACHE_HASH = 0x1E35A7BD


def _build_distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2D close-neighborhood map, generated from its
    construction rule (module docstring)."""
    cands = []
    for dy in range(9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              0 if p[0] >= 0 else 1))
    return cands[:120]


_DIST_MAP = _build_distance_map()


class _BitReader:
    """LSB-first bit reader over bytes (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # absolute bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        for k in range(n):
            byte = p >> 3
            if byte >= len(data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((data[byte] >> (p & 7)) & 1) << k
            p += 1
        self.pos = p
        return v

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[byte] >> (p & 7)) & 1


class _BitWriter:
    """LSB-first bit writer (encoder side)."""

    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        for k in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (value >> k) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def bytes(self) -> bytes:
        return bytes(self.out)


class _PrefixCode:
    """Canonical prefix code from code lengths; decode walks bits
    MSB-of-code-first (the codes are packed that way into the
    LSB-first stream, DEFLATE-style)."""

    def __init__(self, lengths):
        self.table: dict[tuple[int, int], int] = {}
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln]
        if not nonzero:
            raise ValueError("empty prefix code")
        if len(nonzero) == 1:
            # 0-bit code: the single symbol costs no bits
            self.single = nonzero[0][1]
            self.max_len = 0
            return
        self.single = None
        code = 0
        prev_len = 0
        codes: dict[int, int] = {}
        for ln, sym in sorted(nonzero):
            code <<= (ln - prev_len)
            codes[sym] = code
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln
        if code != (1 << prev_len):
            raise ValueError("prefix code lengths not full (Kraft)")
        self.codes = {sym: (ln, codes[sym])
                      for ln, sym in nonzero}
        self.max_len = prev_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in stream")


def _code_lengths_from_histogram(hist, max_len: int = 15) -> list[int]:
    """Package-merge-free length assignment: build a Huffman tree with
    heapq, then flatten-to-limit (fixtures are tiny, depth rarely
    exceeds the cap; lengths re-checked for Kraft by _PrefixCode)."""
    import heapq
    syms = [s for s, n in enumerate(hist) if n]
    if not syms:
        raise ValueError("empty histogram")
    if len(syms) == 1:
        out = [0] * len(hist)
        out[syms[0]] = 1
        return out
    # (count, tiebreak, [symbols])
    heap = [(int(hist[s]), i, [s]) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    tie = len(syms)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, tie, s1 + s2))
        tie += 1
    if max(depth.values()) > max_len:
        raise ValueError("fixture histogram too deep")
    out = [0] * len(hist)
    for s, d in depth.items():
        out[s] = d
    return out


# ---------------------------------------------------------------------------
# prefix-code (de)serialization
# ---------------------------------------------------------------------------

def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():                         # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():                     # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # code-length-coded
    num_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    max_symbol = alphabet_size
    if br.read_bit():                         # use length / max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max_symbol exceeds alphabet")
    # max_symbol bounds the number of code-length SYMBOLS READ from
    # the stream (RFC 9649 §5.2.2 / libwebp ReadHuffmanCodeLengths),
    # NOT the number of slots filled: a repeat token 16/17/18 is one
    # read but fills many slots.  libwebp emits the field whenever a
    # code has long trailing zeros — i.e. for most real files — with
    # max_symbol counting only the leading tokens, so treating it as
    # a slot bound rejected spec-legal streams (ADVICE r9).
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = clc.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            # a run past the alphabet is a bitstream error, not a
            # truncation (libwebp strictness; ADVICE r9)
            if i + rep > alphabet_size:
                raise ValueError("repeat run overflows alphabet")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:                                 # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("code lengths overflow alphabet")
    return _PrefixCode(lengths)


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit code lengths through the code-length-code machinery
    (always the non-simple form; repeat codes 16/17/18 used)."""
    bw.write(0, 1)                            # not simple
    # RLE-tokenize the lengths
    tokens: list[tuple[int, int]] = []        # (symbol, extra)
    i = 0
    n = len(lengths)
    # no max_symbol field is written, so the reader consumes lengths
    # until the whole alphabet is filled — trailing zeros must be
    # encoded too (they cost a handful of repeat-18 tokens)
    last = n
    prev_len = 8
    while i < last:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run < last and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                r = min(run, 11 + 127)
                tokens.append((18, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 3 + 7)
                tokens.append((17, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0))
        elif ln == prev_len:
            run = 1
            while i + run < last and lengths[i + run] == ln:
                run += 1
            i += run
            while run >= 3:
                r = min(run, 3 + 3)
                tokens.append((16, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((ln, 0))
        else:
            tokens.append((ln, 0))
            prev_len = ln
            i += 1
    # histogram of code-length-code symbols
    hist = [0] * 19
    for sym, _ in tokens:
        hist[sym] += 1
    if sum(1 for h in hist if h) == 1:
        # single distinct clc symbol: give it AND a dummy len-1 pair
        # (a 1-symbol clc would be a 0-bit code, which is legal, but
        # keep the writer simple by always emitting >= 2)
        only = next(s for s, h in enumerate(hist) if h)
        clc_lengths = [0] * 19
        clc_lengths[only] = 1
        dummy = 0 if only != 0 else 1
        clc_lengths[dummy] = 1
    else:
        clc_lengths = _code_lengths_from_histogram(hist, max_len=7)
    # num_codes: enough of _CLC_ORDER to cover every used clc symbol
    used = {s for s, ln in enumerate(clc_lengths) if ln}
    num_codes = max(
        max(i for i, s in enumerate(_CLC_ORDER) if s in used) + 1, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)                            # no max_symbol field
    clc = _PrefixCode(clc_lengths)
    for sym, extra in tokens:
        ln, code = clc.codes[sym]
        for b in range(ln - 1, -1, -1):       # MSB of code first
            bw.write((code >> b) & 1, 1)
        if sym == 16:
            bw.write(extra, 2)
        elif sym == 17:
            bw.write(extra, 3)
        elif sym == 18:
            bw.write(extra, 7)


def _write_symbol(bw: _BitWriter, code: _PrefixCode, sym: int) -> None:
    if code.single is not None:
        if sym != code.single:
            raise ValueError("symbol not in 0-bit code")
        return
    ln, c = code.codes[sym]
    for b in range(ln - 1, -1, -1):
        bw.write((c >> b) & 1, 1)


# ---------------------------------------------------------------------------
# entropy-coded image
# ---------------------------------------------------------------------------

def _prefix_value(sym: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: 24 (or 40) symbols, first 4
    direct, then (2 + odd) << extra_bits ranges."""
    if sym < 4:
        return sym + 1
    extra_bits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _prefix_sym(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (symbol, extra, n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    bits = v.bit_length() - 2          # highest two bits select slot
    sym = 2 * bits + ((v >> bits) & 1) + 2
    offset = (2 + ((v >> bits) & 1)) << bits
    return sym, v - offset, bits


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_CACHE_HASH * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _read_entropy_image(br: _BitReader, w: int, h: int,
                        allow_meta: bool) -> np.ndarray:
    """One entropy-coded ARGB image -> (h, w) uint32 array."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _read_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    alphabets = (_GREEN_BASE + (1 << cache_bits if cache_bits else 0),
                 256, 256, 256, _NUM_DIST_CODES)
    groups = [[_read_prefix_code(br, a) for a in alphabets]
              for _ in range(n_groups)]
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    out = np.zeros(n, np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        sym = g[0].decode(br)
        if sym < 256:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = argb
            if cache is not None:
                cache[_cache_index(argb, cache_bits)] = argb
            pos += 1
        elif sym < _GREEN_BASE:
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(g[4].decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                if cache is not None:
                    cache[_cache_index(argb, cache_bits)] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            argb = cache[sym - _GREEN_BASE]
            out[pos] = argb
            pos += 1
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, left, top, topleft, topright) -> tuple:
    """One predictor mode over 4-channel tuples (a, r, g, b)."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return tuple(_avg2(_avg2(lf, tr), tp) for lf, tr, tp in
                     zip(left, topright, top))
    if mode == 6:
        return tuple(_avg2(lf, tl) for lf, tl in zip(left, topleft))
    if mode == 7:
        return tuple(_avg2(lf, tp) for lf, tp in zip(left, top))
    if mode == 8:
        return tuple(_avg2(tl, tp) for tl, tp in zip(topleft, top))
    if mode == 9:
        return tuple(_avg2(tp, tr) for tp, tr in zip(top, topright))
    if mode == 10:
        return tuple(_avg2(_avg2(lf, tl), _avg2(tp, tr))
                     for lf, tl, tp, tr in
                     zip(left, topleft, top, topright))
    if mode == 11:                     # Select
        p = tuple(lf + tp - tl for lf, tp, tl in
                  zip(left, top, topleft))
        pl = sum(abs(pc - lc) for pc, lc in zip(p, left))
        pt = sum(abs(pc - tc) for pc, tc in zip(p, top))
        return left if pl < pt else top
    if mode == 12:                     # ClampAddSubtractFull
        return tuple(min(255, max(0, lf + tp - tl))
                     for lf, tp, tl in zip(left, top, topleft))
    if mode == 13:                     # ClampAddSubtractHalf
        # (a - tl) / 2 uses C division truncating toward ZERO
        # (libwebp AddSubtractComponentHalf); Python floor division
        # diverges for negative odd deltas (ADVICE r9)
        ave = tuple(_avg2(lf, tp) for lf, tp in zip(left, top))
        return tuple(
            min(255, max(0, a + (d // 2 if d >= 0 else -((-d) // 2))))
            for a, tl in zip(ave, topleft) for d in (a - tl,))
    raise ValueError(f"bad predictor mode {mode}")


def _unpack_argb(v: int) -> tuple:
    return ((v >> 24) & 0xFF, (v >> 16) & 0xFF,
            (v >> 8) & 0xFF, v & 0xFF)


def _pack_argb(t) -> int:
    return ((t[0] & 0xFF) << 24) | ((t[1] & 0xFF) << 16) \
        | ((t[2] & 0xFF) << 8) | (t[3] & 0xFF)


def _inverse_predictor(img: np.ndarray, tiles: np.ndarray,
                       bits: int) -> np.ndarray:
    """Residual image + per-tile modes -> final image.  TR of a
    rightmost-column pixel reads the leftmost pixel of the same row
    (module docstring)."""
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = _unpack_argb(int(out[0, x - 1]))
            elif x == 0:
                pred = _unpack_argb(int(out[y - 1, 0]))
            else:
                mode = (int(tiles[y >> bits, x >> bits]) >> 8) & 0xFF
                left = _unpack_argb(int(out[y, x - 1]))
                top = _unpack_argb(int(out[y - 1, x]))
                topleft = _unpack_argb(int(out[y - 1, x - 1]))
                tr = (_unpack_argb(int(out[y - 1, x + 1]))
                      if x + 1 < w else _unpack_argb(int(out[y, 0])))
                pred = _predict(mode, left, top, topleft, tr)
            res = _unpack_argb(int(img[y, x]))
            out[y, x] = _pack_argb(tuple((r + p) & 0xFF
                                         for r, p in zip(res, pred)))
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 product, arithmetic >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color(img: np.ndarray, tiles: np.ndarray,
                   bits: int) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            cte = int(tiles[y >> bits, x >> bits])
            r2b = (cte >> 16) & 0xFF
            g2b = (cte >> 8) & 0xFF
            g2r = cte & 0xFF
            a, r, g, b = _unpack_argb(int(out[y, x]))
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = _pack_argb((a, r, g, b))
    return out


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r.astype(np.uint32) << 16) \
        | b.astype(np.uint32)


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(img: np.ndarray, palette: np.ndarray,
                            true_w: int) -> np.ndarray:
    """Packed index image + delta-decoded palette -> ARGB image."""
    n_colors = len(palette)
    wb = _palette_width_bits(n_colors)
    h, pw = img.shape
    out = np.zeros((h, true_w), np.uint32)
    per = 1 << wb
    ibits = 8 >> wb
    mask = (1 << ibits) - 1
    for y in range(h):
        for px in range(pw):
            g = (int(img[y, px]) >> 8) & 0xFF
            for k in range(per):
                x = px * per + k
                if x >= true_w:
                    break
                idx = (g >> (k * ibits)) & mask
                if idx >= n_colors:
                    raise ValueError("palette index out of range")
                out[y, x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L payload -> (h, w) uint32 ARGB."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()                          # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h * 4 > MAX_DECODED_BYTES:
        raise ValueError("decoded size over MAX_DECODED_BYTES")
    cur_w = w
    transforms: list[tuple] = []           # (type, payload...)
    seen = set()
    while br.read_bit():
        t = br.read(2)
        if t in seen:
            raise ValueError("duplicate transform")
        seen.add(t)
        if t in (0, 1):                    # predictor / cross-color
            bits = 2 + br.read(3)
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _read_entropy_image(br, tw, th, False)
            transforms.append((t, bits, tiles))
        elif t == 2:                       # subtract green
            transforms.append((2,))
        else:                              # color indexing
            n_colors = br.read(8) + 1
            pal_img = _read_entropy_image(br, n_colors, 1, False)
            pal = np.zeros(n_colors, np.uint32)
            prev = 0
            for i in range(n_colors):
                # palette entries are delta-coded per channel
                d = int(pal_img[0, i])
                p = 0
                for shift in (24, 16, 8, 0):
                    c = (((prev >> shift) & 0xFF)
                         + ((d >> shift) & 0xFF)) & 0xFF
                    p |= c << shift
                pal[i] = p
                prev = p
            true_w = cur_w
            wb = _palette_width_bits(n_colors)
            cur_w = (cur_w + (1 << wb) - 1) >> wb
            transforms.append((3, pal, true_w))
    img = _read_entropy_image(br, cur_w, h, True)
    for tr in reversed(transforms):
        if tr[0] == 0:
            img = _inverse_predictor(img, tr[2], tr[1])
        elif tr[0] == 1:
            img = _inverse_color(img, tr[2], tr[1])
        elif tr[0] == 2:
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_indexing(img, tr[1], tr[2])
    return img


def decode_webp_pixels(content: bytes) -> np.ndarray:
    """RIFF/WEBP container -> H x W x 3 uint8 RGB (lossless VP8L
    only; lossy 'VP8 ' raises so the dispatcher can degrade)."""
    if len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WEBP":
        raise ValueError("not a WEBP container")
    pos = 12
    while pos + 8 <= len(content):
        fourcc = content[pos:pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WEBP chunk")
        if fourcc == b"VP8L":
            argb = decode_vp8l(body)
            r = ((argb >> 16) & 0xFF).astype(np.uint8)
            g = ((argb >> 8) & 0xFF).astype(np.uint8)
            b = (argb & 0xFF).astype(np.uint8)
            return np.stack([r, g, b], axis=-1)
        if fourcc == b"VP8 ":
            raise ValueError("lossy VP8 not supported natively")
        # VP8X and metadata chunks: keep walking to find VP8L
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk")


WEBP_FEATURE_LEN = 6


def decode_webp(content: bytes) -> list[float]:
    from .multimodal import pixel_features
    return pixel_features(decode_webp_pixels(content))


# ---------------------------------------------------------------------------
# encoder (fixtures + tests)
# ---------------------------------------------------------------------------

def _write_simple_code(bw: _BitWriter, syms: list[int]) -> _PrefixCode:
    """The 1-2 symbol 'simple' prefix code form."""
    bw.write(1, 1)
    bw.write(len(syms) - 1, 1)
    if syms[0] > 1:
        bw.write(1, 1)
        bw.write(syms[0], 8)
    else:
        bw.write(0, 1)
        bw.write(syms[0], 1)
    lengths_n = max(syms) + 1
    lengths = [0] * lengths_n
    if len(syms) == 2:
        bw.write(syms[1], 8)
        lengths[syms[0]] = 1
        lengths[syms[1]] = 1
    else:
        lengths[syms[0]] = 1
    return _PrefixCode(lengths)


def _write_entropy_image(bw: _BitWriter, img: np.ndarray,
                         allow_meta: bool, cache_bits: int = 0,
                         lz77: bool = True,
                         simple: bool = False) -> None:
    """Encode one ARGB image as a single-group entropy-coded image."""
    h, w = img.shape
    flat = [int(v) for v in img.reshape(-1)]
    n = len(flat)
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if allow_meta:
        bw.write(0, 1)                     # no meta prefix codes
    cache = [None] * (1 << cache_bits) if cache_bits else None
    # tokenize: ('lit', a, r, g, b) | ('copy', len, dist) |
    # ('cache', idx)
    tokens: list[tuple] = []
    pos = 0
    while pos < n:
        if lz77 and pos > 0 and flat[pos] == flat[pos - 1]:
            run = 1
            while pos + run < n and flat[pos + run] == flat[pos] \
                    and run < 4096:
                run += 1
            if run >= 3:
                if cache is not None:
                    for k in range(run):
                        argb = flat[pos + k]
                        cache[_cache_index(argb, cache_bits)] = argb
                tokens.append(("copy", run, 1))
                pos += run
                continue
        argb = flat[pos]
        if cache is not None:
            ci = _cache_index(argb, cache_bits)
            if cache[ci] == argb:
                tokens.append(("cache", ci))
                pos += 1
                continue
            cache[ci] = argb
        tokens.append(("lit", (argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                       (argb >> 8) & 0xFF, argb & 0xFF))
        pos += 1
    # histograms
    n_green = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    hists = [np.zeros(n_green, np.int64), np.zeros(256, np.int64),
             np.zeros(256, np.int64), np.zeros(256, np.int64),
             np.zeros(_NUM_DIST_CODES, np.int64)]
    for tok in tokens:
        if tok[0] == "lit":
            _, a, r, g, b = tok
            hists[0][g] += 1
            hists[1][r] += 1
            hists[2][b] += 1
            hists[3][a] += 1
        elif tok[0] == "copy":
            lsym, _, _ = _prefix_sym(tok[1])
            hists[0][256 + lsym] += 1
            dsym, _, _ = _prefix_sym(tok[2] + 120)
            hists[4][dsym] += 1
        else:
            hists[0][_GREEN_BASE + tok[1]] += 1
    codes = []
    for hist in hists:
        used = [s for s in range(len(hist)) if hist[s]]
        if not used:
            # unused channel: cheapest legal code (single symbol 0,
            # 0-bit — the decoder never asks it for bits)
            lengths = [0] * len(hist)
            lengths[0] = 1
            _write_prefix_code(bw, lengths)
            codes.append(_PrefixCode(lengths))
            continue
        if simple and len(used) <= 2 and max(used) <= 255:
            codes.append(_write_simple_code(bw, used))
            continue
        lengths = _code_lengths_from_histogram(hist)
        _write_prefix_code(bw, lengths)
        codes.append(_PrefixCode(lengths))
    # emit tokens
    for tok in tokens:
        if tok[0] == "lit":
            _, a, r, g, b = tok
            _write_symbol(bw, codes[0], g)
            _write_symbol(bw, codes[1], r)
            _write_symbol(bw, codes[2], b)
            _write_symbol(bw, codes[3], a)
        elif tok[0] == "copy":
            lsym, lext, lbits = _prefix_sym(tok[1])
            _write_symbol(bw, codes[0], 256 + lsym)
            bw.write(lext, lbits)
            dsym, dext, dbits = _prefix_sym(tok[2] + 120)
            _write_symbol(bw, codes[4], dsym)
            bw.write(dext, dbits)
        else:
            _write_symbol(bw, codes[0], _GREEN_BASE + tok[1])


# forward transforms (encoder)

def _forward_predictor(img: np.ndarray, bits: int,
                       mode: int) -> tuple[np.ndarray, np.ndarray]:
    """Residual image + tile image for a single fixed mode."""
    h, w = img.shape
    res = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = _unpack_argb(int(img[0, x - 1]))
            elif x == 0:
                pred = _unpack_argb(int(img[y - 1, 0]))
            else:
                left = _unpack_argb(int(img[y, x - 1]))
                top = _unpack_argb(int(img[y - 1, x]))
                topleft = _unpack_argb(int(img[y - 1, x - 1]))
                tr = (_unpack_argb(int(img[y - 1, x + 1]))
                      if x + 1 < w else _unpack_argb(int(img[y, 0])))
                pred = _predict(mode, left, top, topleft, tr)
            pix = _unpack_argb(int(img[y, x]))
            res[y, x] = _pack_argb(tuple((p - q) & 0xFF
                                         for p, q in zip(pix, pred)))
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    tiles = np.full((th, tw), (0xFF << 24) | (mode << 8), np.uint32)
    return res, tiles


def _forward_color(img: np.ndarray, bits: int, g2r: int, g2b: int,
                   r2b: int) -> tuple[np.ndarray, np.ndarray]:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            a, r, g, b = _unpack_argb(int(out[y, x]))
            b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            r = (r - _ct_delta(g2r, g)) & 0xFF
            out[y, x] = _pack_argb((a, r, g, b))
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    cte = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) \
        | (g2r & 0xFF)
    tiles = np.full((th, tw), cte, np.uint32)
    return out, tiles


def _forward_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) - g) & 0xFF
    b = ((img & 0xFF) - g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r.astype(np.uint32) << 16) \
        | b.astype(np.uint32)


def _forward_color_indexing(img: np.ndarray) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """Image -> (packed index image, palette ARGB array)."""
    h, w = img.shape
    pal, inv = np.unique(img.reshape(-1), return_inverse=True)
    if len(pal) > 256:
        raise ValueError("too many colors for palette")
    idx = inv.reshape(h, w).astype(np.int64)
    wb = _palette_width_bits(len(pal))
    per = 1 << wb
    ibits = 8 >> wb
    pw = (w + per - 1) // per
    packed = np.zeros((h, pw), np.uint32)
    for y in range(h):
        for px in range(pw):
            v = 0
            for k in range(per):
                x = px * per + k
                if x < w:
                    v |= int(idx[y, x]) << (k * ibits)
            packed[y, px] = (0xFF << 24) | (v << 8)
    return packed, pal.astype(np.uint32)


def encode_vp8l(rgb: np.ndarray, *, subtract_green: bool = False,
                predictor: int = None, color: tuple = None,
                palette: bool = False, cache_bits: int = 0,
                lz77: bool = True, simple: bool = False) -> bytes:
    """H x W x 3 uint8 RGB -> VP8L payload.  Options pick the
    transform/entropy features the stream exercises; every output is
    a legal spec stream the decoder round-trips exactly."""
    h, w, _ = rgb.shape
    img = ((np.uint32(0xFF) << 24)
           | (rgb[..., 0].astype(np.uint32) << 16)
           | (rgb[..., 1].astype(np.uint32) << 8)
           | rgb[..., 2].astype(np.uint32))
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                         # no alpha hint
    bw.write(0, 3)                         # version
    # transform stream order: PREDICTOR, COLOR, SUBTRACT_GREEN,
    # COLOR_INDEXING; forward application in the same order (the
    # decoder inverts in reverse)
    if predictor is not None:
        bits = 4
        img, tiles = _forward_predictor(img, bits, predictor)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        _write_entropy_image(bw, tiles, False, lz77=True)
    if color is not None:
        bits = 4
        img, tiles = _forward_color(img, bits, *color)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        _write_entropy_image(bw, tiles, False, lz77=True)
    if subtract_green:
        img = _forward_subtract_green(img)
        bw.write(1, 1)
        bw.write(2, 2)
    if palette:
        img, pal = _forward_color_indexing(img)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(pal) - 1, 8)
        # delta-code the palette per channel
        dpal = np.zeros((1, len(pal)), np.uint32)
        prev = 0
        for i, p in enumerate(int(x) for x in pal):
            d = 0
            for shift in (24, 16, 8, 0):
                c = (((p >> shift) & 0xFF)
                     - ((prev >> shift) & 0xFF)) & 0xFF
                d |= c << shift
            dpal[0, i] = d
            prev = p
        _write_entropy_image(bw, dpal, False, lz77=False)
    bw.write(0, 1)                         # no more transforms
    _write_entropy_image(bw, img, True, cache_bits=cache_bits,
                         lz77=lz77, simple=simple)
    return b"\x2f" + bw.bytes()


def encode_webp(rgb: np.ndarray, **opts) -> bytes:
    """RIFF/WEBP container around a VP8L payload."""
    payload = encode_vp8l(rgb, **opts)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def synth_webp(seed: int) -> bytes:
    """Same closed-form gradient fixture as synth_bmp (lossless, so
    the shared oracle carries over); the encoder option set rotates
    with the seed so the corpus exercises plain literals,
    subtract-green, the predictor transform, the packed palette, and
    the color cache + LZ77 paths."""
    w = 4 + seed % 8
    h = 2 + seed % 5
    r0, g0, b0 = seed % 200, (seed * 3) % 200, (seed * 7) % 200
    px = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        px[y, :, 0] = r0 + y
        px[y, :, 1] = g0 + y
        px[y, :, 2] = b0 + y
    variant = seed % 5
    if variant == 1:
        return encode_webp(px, subtract_green=True)
    if variant == 2:
        return encode_webp(px, predictor=2, subtract_green=True)
    if variant == 3:
        return encode_webp(px, palette=True)
    if variant == 4:
        return encode_webp(px, cache_bits=4, lz77=True)
    return encode_webp(px)
