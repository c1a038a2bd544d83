"""Native Ogg Vorbis I sample decoder (VERDICT r11 ask 7).

Unlike MP3/VP8, Vorbis carries its entropy CODEBOOKS in the stream's
setup header, so a sample-level decoder is derivable from the public
Xiph Vorbis I specification alone — no normative Huffman tables to
transcribe.  This module implements the full audio decode chain:

- LSB-first bitpacking (the Vorbis convention, §2),
- in-stream codebook parse: ordered/unordered/sparse length lists,
  the spec's "lowest valid codeword of its length, in entry order"
  Huffman assignment (pinned against the codeword example printed in
  spec §3.2.1 — an EXTERNAL anchor, not an encoder round-trip), and
  VQ lookup types 0/1/2 with float32_unpack and sequence_p,
- floor type 1: class/subclass/masterbook config, the
  low/high-neighbor amplitude prediction with the room/step2 rules,
  render_point / render_line (C-truncating division, per spec), and
  the inverse-dB amplitude table,
- residue types 1 and 2 (2 = channel-interleave then 1): cascade
  bitmaps, classword radix decode (big-endian fill), format-1
  partition walks,
- square-polar channel coupling inverse (§4.3.5),
- IMDCT (direct O(n^2) — fixture blocks are 64 samples) + the Vorbis
  window sin(pi/2 * sin^2) + TDAC overlap-add.

Honest-validation boundary (the TIFF/G.711 conformance lesson): no
Vorbis encoder exists in this container, so there are no third-party
bytes to pin against.  Everything validable WITHOUT one is pinned
externally: the spec's own §3.2.1 codeword example anchors the
Huffman assignment; the IMDCT is cross-checked against a literal
O(n^2) cos-sum; window power complementarity (w[i]^2 + w[i+n/2]^2 =
1) is asserted; perfect TDAC reconstruction of arbitrary signals
through forward-MDCT -> decode is asserted to float tolerance.  The
inverse-dB table is GENERATED (table[i] = exp(-c*(255-i)) with c
fixed by the spec's printed endpoints 1.0649863e-07 -> 1.0) rather
than transcribed — per-entry last-ulp drift from the spec's float
literals is possible and affects absolute amplitude only; the
fixture oracle (rFFT argmax + container timing) is scale-invariant
by design — and the spec's printed 256 float literals are an anchor
this container cannot reach (no network; NOTES_DEV r13).  Floor
type 0 (LSP) configs PARSE (the setup bitstream stays aligned) but
packets mapped onto one degrade to counted silence — LSP curve
synthesis has no validation anchor here (see Floor0) — and
end-of-packet-truncated audio packets likewise degrade per packet
in the salvage decode (``decode_vorbis_samples_salvage``); the
strict decode keeps raising ValueError as the differential anchor.

Reference parity note: the reference migrates relational rows and
has no media surface; this is beyond-parity pipeline surface like
pipeline/mp3.py (same fixture-tone oracle pattern).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .ogg import build_page, ogg_packets, ogg_packets_salvage

# ---------------------------------------------------------------------------
# bitpacking (LSB-first, Vorbis I §2)
# ---------------------------------------------------------------------------


# 8-bit reversal table: LSB-first stream window -> MSB-first tree order
_REV8 = [int(f"{i:08b}"[::-1], 2) for i in range(256)]


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("vorbis: packet exhausted")
        out, got = 0, 0
        while got < n:
            byte = self.data[self.pos >> 3]
            bit_off = self.pos & 7
            take = min(8 - bit_off, n - got)
            out |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
            self.pos += take
        return out

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("vorbis: packet exhausted")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or (n < 32 and value >> n):
            raise ValueError("bitwriter: value out of range")
        self.acc |= value << self.nacc
        self.nacc += n
        while self.nacc >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nacc -= 8

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nacc:
            out.append(self.acc & 0xFF)
        return bytes(out)


def ilog(x: int) -> int:
    """Vorbis ilog: bits needed to represent x (ilog(0)=0)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    mantissa = x & 0x1FFFFF
    if x & 0x80000000:
        mantissa = -mantissa
    exponent = (x & 0x7FE00000) >> 21
    return mantissa * (2.0 ** (exponent - 788))


def float32_pack(v: float) -> int:
    """Inverse of float32_unpack (fixture encoder side): greedy
    normalization into a 21-bit mantissa.  Round-trips every value
    the encoder emits (asserted at pack time)."""
    sign = 0
    if v < 0:
        sign, v = 0x80000000, -v
    if v == 0:
        return 0
    exp = 788
    while v < (1 << 20) and exp > 0:
        v *= 2.0
        exp -= 1
    while v >= (1 << 21):
        v /= 2.0
        exp += 1
    mant = int(round(v))
    if mant >= (1 << 21):
        mant >>= 1
        exp += 1
    return sign | (exp << 21) | mant


def lookup1_values(entries: int, dim: int) -> int:
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v ** dim > entries:
        v -= 1
    return v


# ---------------------------------------------------------------------------
# codebooks
# ---------------------------------------------------------------------------


def assign_codewords(lengths: list[int]) -> dict[tuple[int, int], int]:
    """Vorbis Huffman assignment: in ENTRY order, each used entry
    receives the numerically lowest codeword of its specified length
    that neither extends nor prefixes an already-assigned codeword
    (spec §3.2.1).  Realized as aligned first-fit over the 32-bit
    normalized code space (used codewords are disjoint intervals).
    Returns {(codeword, length): entry}.  Pinned against the spec's
    own printed example (test_vorbis).  Raises on overspecified
    trees."""
    span = 1 << 32
    used: list[tuple[int, int]] = []          # sorted disjoint [s, e)
    table: dict[tuple[int, int], int] = {}
    for entry, length in enumerate(lengths):
        if length == 0:
            continue
        if not 1 <= length <= 32:
            raise ValueError("vorbis: bad codeword length")
        size = 1 << (32 - length)
        placed = False
        prev_end = 0
        for idx in range(len(used) + 1):
            gap_start = prev_end
            gap_end = used[idx][0] if idx < len(used) else span
            start = -(-gap_start // size) * size
            if start + size <= gap_end:
                used.insert(idx, (start, start + size))
                table[(start >> (32 - length), length)] = entry
                placed = True
                break
            if idx < len(used):
                prev_end = used[idx][1]
        if not placed:
            raise ValueError("vorbis: overspecified codebook")
        # merge adjacent intervals to keep the list short
        merged = [used[0]]
        for s, e in used[1:]:
            if s == merged[-1][1]:
                merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        used = merged
    return table


class Codebook:
    """One parsed codebook: scalar Huffman decode + VQ lookup."""

    def __init__(self, reader: BitReader):
        if reader.read(24) != 0x564342:
            raise ValueError("vorbis: bad codebook sync")
        self.dims = reader.read(16)
        self.entries = reader.read(24)
        lengths = [0] * self.entries
        if reader.read_bit():                       # ordered
            current_length = reader.read(5) + 1
            current_entry = 0
            while current_entry < self.entries:
                number = reader.read(ilog(self.entries - current_entry))
                if current_entry + number > self.entries:
                    raise ValueError("vorbis: ordered lengths overflow")
                for i in range(current_entry, current_entry + number):
                    lengths[i] = current_length
                current_entry += number
                current_length += 1
        else:
            sparse = reader.read_bit()
            for i in range(self.entries):
                if sparse and not reader.read_bit():
                    continue
                lengths[i] = reader.read(5) + 1
        self.lengths = lengths
        self.table = assign_codewords(lengths)
        self.max_len = max((l for l in lengths if l), default=0)
        # 8-bit prefix LUT over the acc-ordered codeword space (r16,
        # the jpeg._Huff trick): codewords of length <= 8 resolve in
        # one lookup; longer codes / short tails use the per-bit walk
        lut: list = [None] * 256
        for (code, ln), ent in self.table.items():
            if ln <= 8:
                base = code << (8 - ln)
                e = (ent, ln)
                for p in range(base, base + (1 << (8 - ln))):
                    lut[p] = e
        self.lut = lut

        self.lookup_type = reader.read(4)
        self.vectors = None
        if self.lookup_type in (1, 2):
            minimum = float32_unpack(reader.read(32))
            delta = float32_unpack(reader.read(32))
            value_bits = reader.read(4) + 1
            sequence_p = reader.read_bit()
            if self.lookup_type == 1:
                count = lookup1_values(self.entries, self.dims)
            else:
                count = self.entries * self.dims
            mults = [reader.read(value_bits) for _ in range(count)]
            vecs = []
            for e in range(self.entries):
                last = 0.0
                vec = []
                if self.lookup_type == 1:
                    index_divisor = 1
                    for _ in range(self.dims):
                        off = (e // index_divisor) % count
                        v = minimum + delta * mults[off] + last
                        if sequence_p:
                            last = v
                        vec.append(v)
                        index_divisor *= count
                else:
                    for d in range(self.dims):
                        v = minimum + delta * mults[e * self.dims + d] \
                            + last
                        if sequence_p:
                            last = v
                        vec.append(v)
                vecs.append(vec)
            self.vectors = vecs
        elif self.lookup_type != 0:
            raise ValueError("vorbis: reserved lookup type")

    def decode_scalar(self, reader: BitReader) -> int:
        # fast path (r16): pull the next 8 LSB-first stream bits in
        # one slice, bit-reverse them into tree (acc) order, resolve
        # short codewords in one LUT hit.  Bit consumption and error
        # behavior are identical to the walk.
        pos = reader.pos
        if reader.nbits - pos >= 8:
            bi = pos >> 3
            w = int.from_bytes(reader.data[bi:bi + 2], "little") \
                >> (pos & 7) & 0xFF
            e = self.lut[_REV8[w]]
            if e is not None:
                reader.pos = pos + e[1]
                return e[0]
        acc, ln = 0, 0
        table = self.table
        while ln <= self.max_len:
            acc = (acc << 1) | reader.read_bit()
            ln += 1
            ent = table.get((acc, ln))
            if ent is not None:
                return ent
        raise ValueError("vorbis: invalid codeword")

    def decode_vq(self, reader: BitReader) -> list[float]:
        if self.vectors is None:
            raise ValueError("vorbis: scalar book used as VQ")
        return self.vectors[self.decode_scalar(reader)]

    def codeword(self, entry: int) -> tuple[int, int]:
        """(codeword, length) for the fixture encoder."""
        # reverse map built lazily once (r16: this was a linear scan
        # of the whole table per emitted symbol)
        by_entry = getattr(self, "_by_entry", None)
        if by_entry is None:
            by_entry = {e: k for k, e in self.table.items()}
            self._by_entry = by_entry
        try:
            return by_entry[entry]
        except KeyError:
            raise KeyError(entry) from None


def write_codeword(writer: BitWriter, code: int, length: int) -> None:
    """Codeword bits enter the stream MSB-of-codeword first (each
    successive stream bit descends the tree).  One bit-reversed
    multi-bit write emits the identical stream (r16: the writer packs
    LSB-first, so stream position i carries bit i of the value —
    reversing the codeword puts its MSB at position 0)."""
    if length:
        rev = int(f"{code:0{length}b}"[::-1], 2)
        writer.write(rev, length)


# ---------------------------------------------------------------------------
# inverse dB table (formula-generated; see module docstring)
# ---------------------------------------------------------------------------

_IDB_C = -math.log(1.0649863e-07) / 255.0
INVERSE_DB_TABLE = [math.exp(-_IDB_C * (255 - i)) for i in range(256)]

FLOOR1_RANGES = (256, 128, 86, 64)


# ---------------------------------------------------------------------------
# floor type 1
# ---------------------------------------------------------------------------


class VorbisPacketDegrade(ValueError):
    """Raised inside AUDIO-packet decode when this one packet cannot
    be sample-decoded but the stream remains well-framed (floor0
    mapping) — the per-packet degrade signal consumed by
    ``decode_vorbis_samples_salvage``.  Never raised by header
    parsing: a stream with no identity is fatal, a packet is not."""


class Floor0:
    """Floor type 0 (LSP) CONFIG parse (Vorbis I §6.2.1) — parsed in
    full so the setup bitstream stays bit-aligned (floor configs are
    concatenated back-to-back), but packets mapped onto a floor0
    DEGRADE to counted silence instead of decoding: the LSP curve
    synthesis (§6.2.3) has no external validation anchor in this
    container (no encoder exists to produce conformance bytes), and
    a wrong-but-self-consistent curve is worse than an honest
    counted degrade — the MP3/VP8 boundary pattern (VERDICT r12
    ask 5)."""

    degrade_only = True

    def __init__(self, reader: BitReader, n_codebooks: int):
        self.order = reader.read(8)
        self.rate = reader.read(16)
        self.bark_map_size = reader.read(16)
        self.amplitude_bits = reader.read(6)
        self.amplitude_offset = reader.read(8)
        self.books = [reader.read(8)
                      for _ in range(reader.read(4) + 1)]
        if (self.order == 0 or self.rate == 0
                or self.bark_map_size == 0
                or any(b >= n_codebooks for b in self.books)):
            raise ValueError("vorbis: bad floor0 config")


class Floor1:
    def __init__(self, reader: BitReader):
        partitions = reader.read(5)
        self.partition_class = [reader.read(4) for _ in range(partitions)]
        max_class = max(self.partition_class, default=-1)
        self.class_dims = []
        self.class_subclasses = []
        self.class_masterbooks = []
        self.subclass_books = []
        for _ in range(max_class + 1):
            self.class_dims.append(reader.read(3) + 1)
            sub = reader.read(2)
            self.class_subclasses.append(sub)
            self.class_masterbooks.append(
                reader.read(8) if sub else -1)
            self.subclass_books.append(
                [reader.read(8) - 1 for _ in range(1 << sub)])
        self.multiplier = reader.read(2) + 1
        rangebits = reader.read(4)
        xs = [0, 1 << rangebits]
        for cls in self.partition_class:
            for _ in range(self.class_dims[cls]):
                xs.append(reader.read(rangebits))
        if len(set(xs)) != len(xs):
            raise ValueError("vorbis: duplicate floor1 X values")
        self.x_list = xs

    def decode(self, reader: BitReader, books: list[Codebook]):
        """-> y-value list (None = channel unused this block)."""
        if not reader.read_bit():
            return None
        rng = FLOOR1_RANGES[self.multiplier - 1]
        y = [reader.read(ilog(rng - 1)), reader.read(ilog(rng - 1))]
        for part, cls in enumerate(self.partition_class):
            cdim = self.class_dims[cls]
            cbits = self.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_masterbooks[cls]] \
                    .decode_scalar(reader)
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                y.append(books[book].decode_scalar(reader)
                         if book >= 0 else 0)
        return y

    def curve(self, y: list[int], n2: int) -> np.ndarray:
        """Amplitude prediction + piecewise render -> linear floor
        curve of length n2 (spec §7.2.4)."""
        rng = FLOOR1_RANGES[self.multiplier - 1]
        xs = self.x_list
        count = len(xs)
        final_y = [0] * count
        step2 = [False] * count
        final_y[0], final_y[1] = y[0], y[1]
        step2[0] = step2[1] = True
        for i in range(2, count):
            lo = max((j for j in range(i) if xs[j] < xs[i]),
                     key=lambda j: xs[j])
            hi = min((j for j in range(i) if xs[j] > xs[i]),
                     key=lambda j: xs[j])
            predicted = _render_point(xs[lo], final_y[lo],
                                      xs[hi], final_y[hi], xs[i])
            val = y[i]
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * min(highroom, lowroom)
            if val:
                step2[lo] = step2[hi] = step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final_y[i] = val - lowroom + predicted
                    else:
                        final_y[i] = predicted - (val - highroom) - 1
                elif val & 1:
                    final_y[i] = predicted - ((val + 1) >> 1)
                else:
                    final_y[i] = predicted + (val >> 1)
            else:
                step2[i] = False
                final_y[i] = predicted
        pts = sorted((x, fy, s2)
                     for x, fy, s2 in zip(xs, final_y, step2))
        floor_idx = np.zeros(n2, dtype=np.int64)
        hx = 0
        hy = pts[0][1] * self.multiplier
        lx, ly = 0, hy
        for x, fy, s2 in pts[1:]:
            if not s2:
                continue
            hx, hy = x, fy * self.multiplier
            _render_line(lx, ly, hx, hy, floor_idx)
            lx, ly = hx, hy
        if hx < n2:
            floor_idx[hx:n2] = ly
        np.clip(floor_idx, 0, 255, out=floor_idx)
        return np.array(INVERSE_DB_TABLE)[floor_idx]


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    off = abs(dy) * (x - x0) // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int,
                 v: np.ndarray) -> None:
    dy = y1 - y0
    adx = x1 - x0
    base = int(dy / adx)                 # C truncation, not floor
    ady = abs(dy) - abs(base) * adx
    sy = base - 1 if dy < 0 else base + 1
    y = y0
    if 0 <= x0 < len(v):
        v[x0] = y
    err = 0
    for x in range(x0 + 1, min(x1, len(v))):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


# ---------------------------------------------------------------------------
# residue types 1/2
# ---------------------------------------------------------------------------


class Residue:
    def __init__(self, rtype: int, reader: BitReader):
        if rtype not in (1, 2):
            raise ValueError("vorbis: unsupported residue type %d"
                             % rtype)
        self.rtype = rtype
        self.begin = reader.read(24)
        self.end = reader.read(24)
        self.partition_size = reader.read(24) + 1
        self.classifications = reader.read(6) + 1
        self.classbook = reader.read(8)
        cascades = []
        for _ in range(self.classifications):
            low = reader.read(3)
            high = reader.read(5) if reader.read_bit() else 0
            cascades.append(high * 8 + low)
        self.cascades = cascades
        self.books = []
        for c in range(self.classifications):
            row = []
            for p in range(8):
                row.append(reader.read(8) if cascades[c] & (1 << p)
                           else -1)
            self.books.append(row)

    def decode(self, reader: BitReader, books: list[Codebook],
               n: int, do_not_decode: list[bool]) -> np.ndarray:
        """-> vectors array shape (ch, n).  Type 2 interleaves the
        channel vectors into one long vector, decodes it as type 1,
        and de-interleaves."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            if all(do_not_decode):
                return np.zeros((ch, n))
            big = self._decode_vectors(reader, books, n * ch, [False])
            out = np.zeros((ch, n))
            for c in range(ch):
                out[c] = big[0][c::ch]
            return out
        vecs = self._decode_vectors(reader, books, n, do_not_decode)
        return vecs

    def _decode_vectors(self, reader, books, n, do_not_decode):
        ch = len(do_not_decode)
        v = np.zeros((ch, n))
        begin = min(self.begin, n)
        end = min(self.end, n)
        classbook = books[self.classbook]
        cpc = classbook.dims                     # classwords/codeword
        n_to_read = end - begin
        if n_to_read == 0:
            return v
        partitions_to_read = n_to_read // self.partition_size
        cls = [[0] * (partitions_to_read + cpc) for _ in range(ch)]
        for p in range(8):
            partition_count = 0
            while partition_count < partitions_to_read:
                if p == 0:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        temp = classbook.decode_scalar(reader)
                        for i in range(cpc - 1, -1, -1):
                            cls[j][partition_count + i] = \
                                temp % self.classifications
                            temp //= self.classifications
                for _ in range(cpc):
                    if partition_count >= partitions_to_read:
                        break
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        vq = cls[j][partition_count]
                        book_idx = self.books[vq][p]
                        if book_idx < 0:
                            continue
                        book = books[book_idx]
                        offset = begin + partition_count \
                            * self.partition_size
                        self._partition(reader, book, v[j], offset)
                    partition_count += 1
        return v

    def _partition(self, reader, book, vec, offset):
        psize = self.partition_size
        i = 0
        while i < psize:
            entry = book.decode_vq(reader)
            for val in entry:
                vec[offset + i] += val
                i += 1


# ---------------------------------------------------------------------------
# headers
# ---------------------------------------------------------------------------


class VorbisSetup:
    pass


def parse_id_header(packet: bytes):
    if packet[:7] != b"\x01vorbis":
        raise ValueError("vorbis: bad id header")
    (version, channels, rate) = struct.unpack_from("<IBI", packet, 7)
    if version != 0 or channels < 1 or rate < 1:
        raise ValueError("vorbis: bad id header fields")
    bs = packet[28]
    bs0, bs1 = 1 << (bs & 0x0F), 1 << (bs >> 4)
    if not (64 <= bs0 <= 8192 and bs0 <= bs1 <= 8192):
        raise ValueError("vorbis: bad blocksizes")
    if not packet[29] & 1:
        raise ValueError("vorbis: framing bit unset")
    return channels, rate, bs0, bs1


def parse_setup_header(packet: bytes, channels: int) -> VorbisSetup:
    if packet[:7] != b"\x05vorbis":
        raise ValueError("vorbis: bad setup header")
    r = BitReader(packet[7:])
    s = VorbisSetup()
    s.codebooks = [Codebook(r) for _ in range(r.read(8) + 1)]
    for _ in range(r.read(6) + 1):                  # time transforms
        if r.read(16) != 0:
            raise ValueError("vorbis: bad time transform")
    s.floors = []
    for _ in range(r.read(6) + 1):
        ftype = r.read(16)
        if ftype == 0:
            # config parsed (setup stays aligned); packets mapped
            # onto it degrade per-packet — see Floor0
            s.floors.append(Floor0(r, len(s.codebooks)))
        elif ftype == 1:
            s.floors.append(Floor1(r))
        else:
            raise ValueError("vorbis: floor type %d reserved"
                             % ftype)
    s.residues = []
    for _ in range(r.read(6) + 1):
        rtype = r.read(16)
        s.residues.append(Residue(rtype, r))
    s.mappings = []
    for _ in range(r.read(6) + 1):
        if r.read(16) != 0:
            raise ValueError("vorbis: bad mapping type")
        m = {}
        m["submaps"] = r.read(4) + 1 if r.read_bit() else 1
        m["coupling"] = []
        if r.read_bit():
            steps = r.read(8) + 1
            for _ in range(steps):
                mag = r.read(ilog(channels - 1))
                ang = r.read(ilog(channels - 1))
                if mag == ang or mag >= channels or ang >= channels:
                    raise ValueError("vorbis: bad coupling pair")
                m["coupling"].append((mag, ang))
        if r.read(2) != 0:
            raise ValueError("vorbis: mapping reserved bits set")
        if m["submaps"] > 1:
            m["mux"] = [r.read(4) for _ in range(channels)]
        else:
            m["mux"] = [0] * channels
        m["submap_floor"] = []
        m["submap_residue"] = []
        for _ in range(m["submaps"]):
            r.read(8)                               # time placeholder
            m["submap_floor"].append(r.read(8))
            m["submap_residue"].append(r.read(8))
        s.mappings.append(m)
    s.modes = []
    for _ in range(r.read(6) + 1):
        blockflag = r.read_bit()
        if r.read(16) != 0 or r.read(16) != 0:
            raise ValueError("vorbis: bad mode window/transform")
        s.modes.append((blockflag, r.read(8)))
    if not r.read_bit():
        raise ValueError("vorbis: setup framing bit unset")
    return s


# ---------------------------------------------------------------------------
# audio packet decode + stream decode
# ---------------------------------------------------------------------------


def vorbis_window(n: int) -> np.ndarray:
    i = np.arange(n)
    return np.sin(0.5 * math.pi
                  * np.sin(math.pi / n * (i + 0.5)) ** 2)


def imdct(spec: np.ndarray) -> np.ndarray:
    """Direct IMDCT: n/2 coefficients -> n samples.
    out[i] = sum_k spec[k] cos(pi/(2n) (2i+1+n/2)(2k+1))."""
    n2 = len(spec)
    n = 2 * n2
    i = np.arange(n).reshape(-1, 1)
    k = np.arange(n2).reshape(1, -1)
    basis = np.cos(math.pi / (2 * n) * (2 * i + 1 + n2) * (2 * k + 1))
    return basis @ spec


def mdct(x: np.ndarray) -> np.ndarray:
    """Forward MDCT matched to imdct(): n samples -> n/2 coeffs with
    the 4/n normalization that makes window->mdct->imdct->window->
    overlap-add the identity (TDAC; asserted in tests)."""
    n = len(x)
    n2 = n // 2
    i = np.arange(n).reshape(-1, 1)
    k = np.arange(n2).reshape(1, -1)
    basis = np.cos(math.pi / (2 * n) * (2 * i + 1 + n2) * (2 * k + 1))
    return (4.0 / n) * (x @ basis)


def decode_audio_packet(packet: bytes, setup: VorbisSetup,
                        channels: int, bs0: int, bs1: int,
                        window: np.ndarray) -> np.ndarray:
    """One audio packet -> (channels, n) windowed IMDCT output
    (caller overlap-adds).  Only equal-blocksize streams reach here
    (mode blockflag 1 with bs0 != bs1 would need the hybrid window —
    out of fixture scope, refused in decode_vorbis_samples)."""
    r = BitReader(packet)
    if r.read_bit() != 0:
        raise ValueError("vorbis: not an audio packet")
    mode_idx = r.read(ilog(len(setup.modes) - 1))
    blockflag, mapping_idx = setup.modes[mode_idx]
    n = bs1 if blockflag else bs0
    if blockflag and bs0 != bs1:
        raise ValueError("vorbis: window switching unsupported")
    if blockflag:
        r.read(1), r.read(1)                # prev/next window flags
    n2 = n // 2
    mapping = setup.mappings[mapping_idx]

    # floor0-mapped packets degrade BEFORE any floor bits are read:
    # an unvalidated floor0 bit-parse could silently desync residue
    # decode; a counted whole-packet degrade cannot (see Floor0)
    for c in range(channels):
        fl = setup.floors[mapping["submap_floor"][mapping["mux"][c]]]
        if getattr(fl, "degrade_only", False):
            raise VorbisPacketDegrade("vorbis: floor0-mapped packet")

    floors = []
    no_residue = []
    for c in range(channels):
        submap = mapping["mux"][c]
        floor = setup.floors[mapping["submap_floor"][submap]]
        y = floor.decode(r, setup.codebooks)
        floors.append((floor, y))
        no_residue.append(y is None)
    # coupling: if either channel of a pair has a nonzero floor, both
    # decode residue (spec §4.3.3)
    for mag, ang in mapping["coupling"]:
        if not (no_residue[mag] and no_residue[ang]):
            no_residue[mag] = no_residue[ang] = False

    residue_vectors = np.zeros((channels, n2))
    for submap in range(mapping["submaps"]):
        ch_idx = [c for c in range(channels)
                  if mapping["mux"][c] == submap]
        dnd = [no_residue[c] for c in ch_idx]
        res = setup.residues[mapping["submap_residue"][submap]]
        out = res.decode(r, setup.codebooks, n2, dnd)
        for i, c in enumerate(ch_idx):
            residue_vectors[c] = out[i]

    # square-polar coupling inverse (§4.3.5), reverse step order
    for mag, ang in reversed(mapping["coupling"]):
        m = residue_vectors[mag].copy()
        a = residue_vectors[ang].copy()
        new_m, new_a = m.copy(), a.copy()
        pos_m = m > 0
        pos_a = a > 0
        new_a[pos_m & pos_a] = (m - a)[pos_m & pos_a]
        new_m[pos_m & ~pos_a] = (m + a)[pos_m & ~pos_a]
        new_a[pos_m & ~pos_a] = m[pos_m & ~pos_a]
        new_a[~pos_m & pos_a] = (m + a)[~pos_m & pos_a]
        new_m[~pos_m & ~pos_a] = (m - a)[~pos_m & ~pos_a]
        new_a[~pos_m & ~pos_a] = m[~pos_m & ~pos_a]
        residue_vectors[mag] = new_m
        residue_vectors[ang] = new_a

    pcm = np.zeros((channels, n))
    for c in range(channels):
        floor, y = floors[c]
        if y is None:
            continue                        # silent channel
        curve = floor.curve(y, n2)
        spec = curve * residue_vectors[c]
        pcm[c] = imdct(spec) * window
    return pcm


def _decode_stream(content: bytes, strict: bool):
    """Shared stream walk -> (rate, channels, samples, degraded,
    n_audio_packets).  strict=True uses the strict page walk and
    re-raises the first undecodable audio packet (the differential/
    fixture contract); strict=False walks pages with
    ``ogg_packets_salvage`` (damaged pages cost counted resync
    events, r13) and degrades each undecodable audio packet to a
    window of silence, COUNTED.  ``degraded`` counts degrade EVENTS:
    container page drops + per-packet audio degrades."""
    degraded = 0
    if strict:
        packets = list(ogg_packets(content))
    else:
        packets, degraded = ogg_packets_salvage(content)
    if len(packets) < 3:
        raise ValueError("vorbis: missing headers")
    channels, rate, bs0, bs1 = parse_id_header(packets[0])
    if packets[1][:7] != b"\x03vorbis":
        raise ValueError("vorbis: bad comment header")
    setup = parse_setup_header(packets[2], channels)
    if not strict and bs0 != bs1:
        # a degraded long-block packet would contribute the WRONG
        # number of samples to the lap timeline — fatal, not a
        # per-packet degrade (the timeline itself is undecodable
        # under this module's equal-blocksize subset)
        raise ValueError("vorbis: window switching unsupported")
    window = vorbis_window(bs0)
    halves = []
    prev = None
    n_audio = len(packets) - 3
    for pkt in packets[3:]:
        try:
            pcm = decode_audio_packet(pkt, setup, channels, bs0, bs1,
                                      window)
        except ValueError:
            if strict:
                raise
            # counted per-packet degrade (VERDICT r12 ask 5):
            # floor0-mapped or end-of-packet-truncated packets cost
            # one window of SILENCE, never the stream.  The spec's
            # own EOP rule is more permissive (decode continues with
            # the remainder zeroed); whole-packet silence is the
            # conservative honest subset — no invented samples.
            degraded += 1
            pcm = np.zeros((channels, bs0))
        if prev is not None:
            halves.append(prev[:, bs0 // 2:] + pcm[:, :bs0 // 2])
        prev = pcm
    if not halves:
        return rate, channels, np.zeros((channels, 0)), degraded, \
            n_audio
    return rate, channels, np.concatenate(halves, axis=1), degraded, \
        n_audio


def decode_vorbis_samples(content: bytes):
    """Ogg Vorbis bytes -> (rate, channels, samples[ch][N] float64).
    STRICT: raises ValueError outside the supported subset (window
    switching, truncated packets, floor0-mapped packets, damaged
    pages) — the differential anchor.  Crawl-facing callers use
    ``decode_vorbis_samples_salvage``."""
    rate, channels, samples, _, _ = _decode_stream(content,
                                                   strict=True)
    return rate, channels, samples


def decode_vorbis_samples_salvage(content: bytes):
    """Crawl-robust decode -> (rate, channels, samples, degraded).
    Header packets stay FATAL (a stream without id/setup has no
    decode identity); each undecodable AUDIO packet degrades to one
    window of silence and each damaged Ogg PAGE resyncs (both
    COUNTED as degrade events) — floor0-mapped packets (LSP
    synthesis has no validation anchor here, see Floor0),
    end-of-packet-truncated packets, and CRC-broken pages, the
    shapes real crawl Ogg files contain (VERDICT r12 ask 5 + r13
    page salvage)."""
    rate, channels, samples, degraded, _ = _decode_stream(
        content, strict=False)
    return rate, channels, samples, degraded


# ---------------------------------------------------------------------------
# fixture encoder: a steady tone, flat floor, scalar residue grid
# ---------------------------------------------------------------------------

_N = 64                                    # fixture blocksize
_N2 = _N // 2


def _encode_headers(channels: int, rate: int,
                    delta: float, floor0: bool = False
                    ) -> list[bytes]:
    """ID + comment + setup packets for the tone fixture layout:
    - book 0: floor value book, 2 entries (len 1/1), no lookup;
    - book 1: residue classbook, 16 entries all len 4 (complete),
      dims 4, no lookup;
    - book 2: residue value book, 17 entries (15x len4 + 2x len5,
      complete), dims 1, lookup type 2 over min=-8*delta step delta;
    - floor1: 1 partition, class dims 1, flat-capable;
    - residue type 2 over [0, 32*channels) of the channel-interleaved
      vector, partition 8, 2 classifications (0 silent, 1 valued via
      book 2 at pass 0);
    - 1 mapping (no coupling), 1 mode (blockflag 0)."""
    ident = (b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
             + struct.pack("<iii", 0, 0, 0)
             + bytes([(6 << 4) | 6])               # bs0 = bs1 = 64
             + b"\x01")
    comment = (b"\x03vorbis" + struct.pack("<I", 4) + b"hbsp"
               + struct.pack("<I", 0) + b"\x01")

    w = BitWriter()
    w.write(3 - 1, 8)                              # 3 codebooks

    def book(dims, lengths, lookup=None):
        w.write(0x564342, 24)
        w.write(dims, 16)
        w.write(len(lengths), 24)
        w.write(0, 1)                              # unordered
        w.write(0, 1)                              # not sparse
        for ln in lengths:
            w.write(ln - 1, 5)
        if lookup is None:
            w.write(0, 4)
        else:
            minimum, delta_v, value_bits, mults = lookup
            w.write(2, 4)                          # lookup type 2
            w.write(float32_pack(minimum), 32)
            w.write(float32_pack(delta_v), 32)
            w.write(value_bits - 1, 4)
            w.write(0, 1)                          # sequence_p = 0
            for m in mults:
                w.write(m, value_bits)

    book(1, [1, 1])                                # 0: floor book
    book(4, [4] * 16)                              # 1: classbook
    book(1, [4] * 15 + [5, 5],                     # 2: value book
         lookup=(-8.0 * delta, delta, 5, list(range(17))))

    w.write(0, 6)                                  # 1 time transform
    w.write(0, 16)
    w.write(0, 6)                                  # 1 floor
    if floor0:
        # floor type 0 (LSP) config — the DEGRADE fixture: packets
        # mapped onto it must cost counted silence, never the stream
        w.write(0, 16)                             # floor type 0
        w.write(8, 8)                              # order
        w.write(rate, 16)                          # floor0 rate
        w.write(_N, 16)                            # bark map size
        w.write(6, 6)                              # amplitude bits
        w.write(136, 8)                            # amplitude offset
        w.write(0, 4)                              # 1 book
        w.write(0, 8)                              # book 0
    else:
        w.write(1, 16)                             # floor type 1
        w.write(1, 5)                              # 1 partition
        w.write(0, 4)                              # class 0
        w.write(0, 3)                              # class dims 1
        w.write(0, 2)                              # 0 subclasses
        w.write(0 + 1, 8)                          # subclass book 0
        w.write(0, 2)                              # multiplier 1
        w.write(5, 4)                              # rangebits 5
        w.write(16, 5)                             # extra X = 16
    w.write(0, 6)                                  # 1 residue
    w.write(2, 16)                                 # residue type 2
    w.write(0, 24)                                 # begin
    w.write(32 * channels, 24)                     # end (interleaved)
    w.write(8 - 1, 24)                             # partition size 8
    w.write(2 - 1, 6)                              # 2 classifications
    w.write(1, 8)                                  # classbook = 1
    w.write(0, 3)                                  # class 0 cascade lo
    w.write(0, 1)                                  #   no high bits
    w.write(1, 3)                                  # class 1: pass 0
    w.write(0, 1)
    w.write(2, 8)                                  # class1/pass0 book
    w.write(0, 6)                                  # 1 mapping
    w.write(0, 16)                                 # type 0
    w.write(0, 1)                                  # 1 submap
    w.write(0, 1)                                  # no coupling
    w.write(0, 2)                                  # reserved
    w.write(0, 8)                                  # time placeholder
    w.write(0, 8)                                  # floor 0
    w.write(0, 8)                                  # residue 0
    w.write(0, 6)                                  # 1 mode
    w.write(0, 1)                                  # blockflag 0
    w.write(0, 16)                                 # windowtype
    w.write(0, 16)                                 # transformtype
    w.write(0, 8)                                  # mapping 0
    w.write(1, 1)                                  # framing
    setup = b"\x05vorbis" + w.getvalue()
    return [ident, comment, setup]


def _encode_audio_packet(coeffs: np.ndarray, delta: float,
                         books: list[Codebook],
                         channels: int) -> bytes:
    """One audio packet carrying the channel-INTERLEAVED quantized
    spectrum round(c/delta) clamped to [-8, 8] (flat floor = 1.0 on
    every channel).  Layout mirrors the decode loop exactly: per
    channel a floor section, then per classword-group (classbook dim
    4 partitions) one classword followed by its 4x8 values."""
    w = BitWriter()
    w.write(0, 1)                                  # audio packet
    # mode number: 1 mode -> ilog(0) = 0 bits
    for _ in range(channels):
        # floor: nonzero, y0 = y1 = 255 (flat at table[255] = 1.0)
        w.write(1, 1)
        w.write(255, 8)
        w.write(255, 8)
        code, ln = books[0].codeword(0)            # y[2] = entry 0
        write_codeword(w, code, ln)
    idx = np.clip(np.round(coeffs / delta), -8, 8).astype(int) + 8
    partitions = len(idx) // 8
    cls_code, cls_len = books[1].codeword(15)      # 4x class 1
    pos = 0
    for group in range(0, partitions, 4):
        write_codeword(w, cls_code, cls_len)
        take = min(4, partitions - group) * 8
        for e in idx[pos:pos + take]:
            code, ln = books[2].codeword(int(e))
            write_codeword(w, code, ln)
        pos += take
    return w.getvalue()


def encode_vorbis_tone(k0: int, n_blocks: int, rate: int,
                       amplitude: float = 0.5,
                       channels: int = 1,
                       floor0: bool = False,
                       truncate_last: bool = False) -> bytes:
    """Ogg Vorbis stream of a steady tone at MDCT bin k0
    (f = (2*k0+1)*rate/(2*_N)): per block the TRUE windowed MDCT of
    the tone is quantized onto the residue value grid, so the decode
    chain reconstructs the tone to quantization accuracy and the
    rFFT argmax over the decoded samples is the closed-form bin.
    Stereo puts the SAME tone on both channels through the residue
    type 2 channel-interleave (no coupling — square-polar inverse is
    implemented but awaits external conformance bytes)."""
    if not 0 <= k0 < _N2:
        raise ValueError("k0 out of range")
    f = (2 * k0 + 1) * rate / (2.0 * _N)
    hop = _N2
    win = vorbis_window(_N)
    # largest coefficient magnitude over one period of block phases
    # fixes the grid step so indices stay within [-8, 8]
    t0 = np.arange(_N)
    specs = []
    for b in range(n_blocks):
        t = (b - 1) * hop + t0          # block b covers [(b-1)*hop,..)
        x = amplitude * np.cos(2 * math.pi * f * t / rate)
        specs.append(mdct(win * x))
    peak = max(float(np.abs(s).max()) for s in specs)
    delta_raw = max(peak / 7.5, 1e-6)
    # the stream stores delta through float32_pack — quantize NOW so
    # encoder indices and decoder values share the exact grid
    delta = float32_unpack(float32_pack(delta_raw))

    headers = _encode_headers(channels, rate, delta, floor0=floor0)
    # re-parse our own setup to get the codeword tables the packets
    # must use (guarantees encoder/decoder agree on the assignment)
    setup = parse_setup_header(headers[2], channels)
    books = [setup.codebooks[0], setup.codebooks[1],
             setup.codebooks[2]]
    packets = []
    for s in specs:
        interleaved = np.empty(len(s) * channels)
        for c in range(channels):
            interleaved[c::channels] = s
        packets.append(_encode_audio_packet(interleaved, delta,
                                            books, channels))
    if truncate_last:
        # crawl-damage fixture: the final audio packet cut to its
        # first byte (packet-type bit survives; floor decode hits
        # end-of-packet) — the salvage decode must count ONE degrade
        packets[-1] = packets[-1][:1]

    serial = 0xBEEF
    pages = [build_page(serial, 0, 0, 0x02, [headers[0]]),
             build_page(serial, 1, 0, 0x00, [headers[1], headers[2]])]
    granule = 0
    for i, pkt in enumerate(packets):
        if i > 0:
            granule += hop
        flags = 0x04 if i == len(packets) - 1 else 0x00
        pages.append(build_page(serial, 2 + i, granule, flags, [pkt]))
    return b"".join(pages)


# ---------------------------------------------------------------------------
# fixture parameterization + analysis kernel (the mp3_tone pattern)
# ---------------------------------------------------------------------------


def synth_vorbis_tone(media_id: int) -> bytes:
    rate = (8000, 16000)[media_id % 2]
    k0 = 1 + media_id % 12
    n_blocks = 4 * (1 + media_id % 3) + 1
    channels = 2 if media_id % 5 == 0 else 1
    return encode_vorbis_tone(k0, n_blocks, rate, channels=channels)


def synth_vorbis_tone_damaged(media_id: int) -> bytes:
    """The salvage-lattice fixture: same tone parameterization, but
    media_id % 11 == 4 streams use a floor0 (LSP) mapping — every
    audio packet degrades — and media_id % 7 == 2 streams truncate
    their final audio packet to one byte (one degrade).  Everything
    else is byte-identical to :func:`synth_vorbis_tone`."""
    rate = (8000, 16000)[media_id % 2]
    k0 = 1 + media_id % 12
    n_blocks = 4 * (1 + media_id % 3) + 1
    channels = 2 if media_id % 5 == 0 else 1
    return encode_vorbis_tone(
        k0, n_blocks, rate, channels=channels,
        floor0=media_id % 11 == 4,
        truncate_last=media_id % 11 != 4 and media_id % 7 == 2)


def vorbis_tone_analysis(content: bytes) -> list[float]:
    """[duration_ms, sample_rate, n_channels, n_audio_packets,
    dominant_hz] from a REAL sample decode; dominant_hz is the rFFT
    argmax over the decoded samples — bit-identical to the closed
    form (2*k0+1)*rate/128 for the fixture's coherent block counts
    (N is always a multiple of 128 = 2 * blocksize)."""
    rate, channels, samples = decode_vorbis_samples(content)
    n_audio = len(list(ogg_packets(content))) - 3
    mono = samples[0]
    n = len(mono)
    if n == 0:
        raise ValueError("vorbis: no audio samples")
    spec = np.abs(np.fft.rfft(mono))
    dominant = float(int(np.argmax(spec)) * rate / n)
    return [n * 1000.0 / rate, float(rate), float(channels),
            float(n_audio), dominant]


def vorbis_salvage_analysis(content: bytes) -> list[float]:
    """Crawl-facing variant: same five fields PLUS degraded_packets
    — runs the salvage decode, so floor0-mapped/truncated audio
    packets and CRC-damaged pages cost counted degrades, never the
    stream.  n_frames counts the audio packets the salvage page
    walk surfaced (a lost page's packets are gone, not guessed)."""
    rate, channels, samples, degraded, n_audio = _decode_stream(
        content, strict=False)
    mono = samples[0]
    n = len(mono)
    if n == 0:
        raise ValueError("vorbis: no audio samples")
    spec = np.abs(np.fft.rfft(mono))
    dominant = float(int(np.argmax(spec)) * rate / n)
    return [n * 1000.0 / rate, float(rate), float(channels),
            float(n_audio), dominant, float(degraded)]


def expected_vorbis_fields(media_id: int) -> list[float]:
    rate = (8000, 16000)[media_id % 2]
    k0 = 1 + media_id % 12
    n_blocks = 4 * (1 + media_id % 3) + 1
    channels = 2.0 if media_id % 5 == 0 else 1.0
    n = (n_blocks - 1) * _N2
    return [n * 1000.0 / rate, float(rate), channels, float(n_blocks),
            (2 * k0 + 1) * rate / 128.0]


def expected_vorbis_salvage_fields(media_id: int) -> list[float]:
    """Closed form for the damaged lattice: a floor0 stream decodes
    to all-silence (rFFT argmax 0 -> dominant 0.0, every packet
    counted); a truncated stream loses only its final packet — the
    tone bin keeps the argmax (leakage from the zeroed tail spreads
    across bins, the coherent tone does not; validated over the
    full sf0.01 id range in tests before registration)."""
    base = expected_vorbis_fields(media_id)
    n_blocks = 4 * (1 + media_id % 3) + 1
    if media_id % 11 == 4:
        return base[:4] + [0.0, float(n_blocks)]
    if media_id % 7 == 2:
        return base + [1.0]
    return base + [0.0]
