"""TIFF 6.0 baseline decode — from the Adobe TIFF 6.0 specification
(1992): II/MM byte orders, IFD walk, strip-based RGB/grayscale at
8 bits/sample, Compression 1 (none) / 32773 (PackBits, §9) / 5
(TIFF-LZW, §13 — MSB-first codes, 9->12 bit widths with the spec's
EARLY code-width change, Clear/EOI, 4094-entry table reset), and
Predictor 2 (horizontal differencing, §14).

Reference parity note: the reference migrates relational rows and has
no media surface; TIFF joins the JPEG/PNG/GIF/WebP/BMP/PPM family as
beyond-parity LLM-pipeline surface (scanned-document corpora are
TIFF-heavy).

Validation: (a) `synth_tiff` muxes closed-form fixtures rotating
byte order x compression x predictor, so the oracle entry is exact;
(b) encoder/decoder LZW fuzz round-trips incl. >4094-entry table
resets; (c) OpenJDK 17's javax.imageio TIFF writer (None/LZW/
PackBits) provides genuinely third-party conformance bytes
(tests/fixtures/conformance) — the early-change width schedule is
cross-checked against a foreign encoder, not just our own.

Malformed input raises ValueError; the Spark kernels degrade bad
files to the sha-stub like every other codec.
"""

from __future__ import annotations

import struct

import numpy as np

from .limits import MAX_DECODED_BYTES

TIFF_MAGIC_II = b"II*\x00"
TIFF_MAGIC_MM = b"MM\x00*"

# tag ids (TIFF 6.0 §8)
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR = 317
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# LZW (TIFF variant, §13): MSB-first bit packing, 256=Clear, 257=EOI,
# first dynamic code 258, width 9..12 with the EARLY change (width
# bumps when the NEXT code to add reaches 2^width - 1, one code
# earlier than GIF), table reset via Clear at 4094 entries.
# ---------------------------------------------------------------------------

class _BitReaderMSB:
    def __init__(self, data: bytes):
        self.data, self.pos = data, 0          # pos in bits

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("tiff lzw: bit underrun")
        v = 0
        p = self.pos
        while n:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take))
                               & ((1 << take) - 1))
            p += take
            n -= take
        self.pos = p
        return v


_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    br = _BitReaderMSB(data)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: int | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        code = br.read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("tiff lzw: bad first code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("tiff lzw: code out of range")
            table.append(table[prev] + entry[:1])
        out += entry
        prev = code
        # EARLY change (§13): bump one code before the table fills
        # the current width — at table size 2^width - 1, the NEXT
        # dynamic code would be 2^width and need the wider field.
        # This exact schedule is validated against OpenJDK 17's TIFF
        # writer (tests/fixtures/conformance/*_lzw.tif): its streams
        # decode only at this threshold (probed -0/-1/-2 — see
        # NOTES_DEV r11 TIFF section).  The encoder below bumps at
        # nxt == 2^width, one entry later, because its table leads
        # the decoder's by exactly one (it adds at emit time, the
        # decoder on the FOLLOWING code).
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if expected is not None and len(out) >= expected:
            break
    return bytes(out)


class _BitWriterMSB:
    def __init__(self):
        self.buf = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    bw = _BitWriterMSB()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    bw.write(_CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) and width < 12:
            width += 1
        w = c
        if nxt == 4094:                       # table reset (§13)
            bw.write(table[w], width)
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
            w = b""
    if w:
        bw.write(table[w], width)
    bw.write(_EOI, width)
    return bw.done()


# ---------------------------------------------------------------------------
# PackBits (§9)
# ---------------------------------------------------------------------------

def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and (expected is None or len(out) < expected):
        ctl = data[i]
        i += 1
        if ctl < 128:                          # literal run
            if i + ctl + 1 > n:
                raise ValueError("tiff packbits: literal underrun")
            out += data[i:i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:                        # repeat run
            if i >= n:
                raise ValueError("tiff packbits: repeat underrun")
            out += bytes([data[i]]) * (257 - ctl)
            i += 1
        # 128: noop
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:                              # run of j-i+1 repeats
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch until a 3-run starts (2-runs aren't worth
        # breaking a literal for)
        j = i
        while (j < n and j - i < 128
               and not (j + 2 < n and data[j + 1] == data[j]
                        and data[j + 2] == data[j])):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _read_ifd(content: bytes) -> dict[int, list[int]]:
    if content[:4] == TIFF_MAGIC_II:
        bo = "<"
    elif content[:4] == TIFF_MAGIC_MM:
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (ifd_off,) = struct.unpack_from(bo + "I", content, 4)
    if ifd_off + 2 > len(content):
        raise ValueError("tiff: bad IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", content, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        e = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", content, e)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue                           # unknown type: skip tag
        total = size * cnt
        off = e + 8 if total <= 4 else \
            struct.unpack_from(bo + "I", content, e + 8)[0]
        if off + total > len(content):
            raise ValueError("tiff: tag value out of bounds")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt:
            tags[tag] = list(struct.unpack_from(
                bo + fmt * cnt, content, off))
        elif typ == 5:                         # RATIONAL: num/den pairs
            vals = struct.unpack_from(bo + "I" * (2 * cnt), content, off)
            tags[tag] = [vals[2 * i] for i in range(cnt)]
    return tags


def tiff_pixels(content: bytes) -> np.ndarray:
    """TIFF bytes -> top-down (h, w, 3) uint8 RGB.  Grayscale
    (SamplesPerPixel 1) replicates the channel; RGB reads triplets.
    Strips decompress independently; Predictor 2 undone per row."""
    t = _read_ifd(content)
    try:
        w, h = t[_W][0], t[_H][0]
        offs, cnts = t[_STRIP_OFF], t[_STRIP_CNT]
    except KeyError:
        raise ValueError("tiff: missing required tag") from None
    spp = t.get(_SPP, [1])[0]
    bits = t.get(_BITS, [8] * spp)
    comp = t.get(_COMP, [1])[0]
    pred = t.get(_PREDICTOR, [1])[0]
    rps = t.get(_ROWS_PER_STRIP, [h])[0] or h
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise ValueError(f"tiff: unsupported spp={spp} bits={bits}")
    if len(offs) != len(cnts) or w <= 0 or h <= 0:
        raise ValueError("tiff: bad strip table")
    if w * h * 3 > MAX_DECODED_BYTES:        # shared bomb ceiling
        raise ValueError("tiff: decoded size over limit")
    rowbytes = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            raise ValueError("tiff: surplus strips")
        raw = content[off:off + cnt]
        if len(raw) != cnt:
            raise ValueError("tiff: strip out of bounds")
        want = rowbytes * nrows
        if comp == 1:
            data = raw
        elif comp == 5:
            data = lzw_decode(raw, expected=want)
        elif comp == 32773:
            data = packbits_decode(raw, expected=want)
        else:
            raise ValueError(f"tiff: unsupported compression {comp}")
        if len(data) < want:
            raise ValueError("tiff: short strip")
        strip = np.frombuffer(data[:want], np.uint8).reshape(
            nrows, rowbytes)
        if pred == 2:
            strip = np.cumsum(
                strip.reshape(nrows, w, spp).astype(np.int64),
                axis=1).astype(np.uint8).reshape(nrows, rowbytes)
        elif pred != 1:
            raise ValueError(f"tiff: unsupported predictor {pred}")
        rows.append(strip)
    px = np.concatenate(rows)[:h].reshape(h, w, spp)
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return px.astype(np.uint8)


def decode_tiff(content: bytes) -> list[float]:
    """Feature layout shared with decode_bmp/ppm/png: [width, height,
    mean_r, mean_g, mean_b, first_r]."""
    img = tiff_pixels(content).astype(np.float64)
    h, w = img.shape[:2]
    return [float(w), float(h), float(img[..., 0].mean()),
            float(img[..., 1].mean()), float(img[..., 2].mean()),
            float(img[0, 0, 0])]


# ---------------------------------------------------------------------------
# fixture muxer: same closed-form pixels as synth_bmp/ppm/png
# (w = 4 + seed%8, h = 2 + seed%5, row y = base + y per channel),
# rotating byte order x compression x predictor by seed.
# ---------------------------------------------------------------------------

def synth_tiff(seed: int) -> bytes:
    w = 4 + seed % 8
    h = 2 + seed % 5
    r0, g0, b0 = seed % 200, (seed * 3) % 200, (seed * 7) % 200
    px = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        px[y, :, 0] = r0 + y
        px[y, :, 1] = g0 + y
        px[y, :, 2] = b0 + y
    comp = (1, 5, 32773)[seed % 3]
    bo = "<" if seed % 2 == 0 else ">"
    pred = 2 if comp == 5 and seed % 4 == 1 else 1
    rps = 2
    strips = []
    for y0 in range(0, h, rps):
        rows = px[y0:y0 + rps]
        if pred == 2:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            raw = (d & 0xFF).astype(np.uint8).tobytes()
        else:
            raw = rows.tobytes()
        if comp == 5:
            strips.append(lzw_encode(raw))
        elif comp == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    entries = []                    # (tag, type, count, value-bytes)
    extra = bytearray()             # out-of-line values
    header_len = 8
    # layout: header | IFD | extra | strip data.  IFD size known up
    # front: 10 entries + predictor when used.
    tags = [(_W, 3, 1, [w]), (_H, 3, 1, [h]), (_BITS, 3, 3, [8, 8, 8]),
            (_COMP, 3, 1, [comp]), (_PHOTO, 3, 1, [2]),
            (_STRIP_OFF, 4, n_strips, None),       # patched below
            (_SPP, 3, 1, [3]), (_ROWS_PER_STRIP, 3, 1, [rps]),
            (_STRIP_CNT, 4, n_strips, [len(s) for s in strips])]
    if pred == 2:
        tags.append((_PREDICTOR, 3, 1, [2]))
    tags.sort()
    n = len(tags)
    ifd_len = 2 + 12 * n + 4
    extra_base = header_len + ifd_len

    def val_bytes(typ: int, vals: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(bo + fmt * len(vals), *vals)

    # first pass: compute extra-area offsets, leaving strip offsets
    # as a placeholder resolved after the extra area is sized
    placed = []
    for tag, typ, cnt, vals in tags:
        if vals is None:
            vals = [0] * cnt
        vb = val_bytes(typ, vals)
        if len(vb) <= 4:
            placed.append((tag, typ, cnt, vb.ljust(4, b"\x00"), None))
        else:
            placed.append((tag, typ, cnt,
                           struct.pack(bo + "I", extra_base + len(extra)),
                           len(extra)))
            extra += vb
    data_base = extra_base + len(extra)
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s)
    # patch StripOffsets with real values
    out_entries = bytearray()
    for tag, typ, cnt, inline, xoff in placed:
        if tag == _STRIP_OFF:
            vb = val_bytes(typ, offs)
            if len(vb) <= 4:
                inline = vb.ljust(4, b"\x00")
            else:
                extra[xoff:xoff + len(vb)] = vb
        out_entries += struct.pack(bo + "HHI", tag, typ, cnt)
        out_entries += inline
    header = (TIFF_MAGIC_II if bo == "<" else TIFF_MAGIC_MM) + \
        struct.pack(bo + "I", header_len)
    ifd = struct.pack(bo + "H", n) + bytes(out_entries) + \
        struct.pack(bo + "I", 0)
    return header + ifd + bytes(extra) + b"".join(strips)
