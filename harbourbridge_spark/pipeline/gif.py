"""Dependency-free GIF codec (decoder + fixture encoder).

Completes the native image-container matrix (BMP/PPM/PNG/JPEG/GIF):
GIF87a/89a decode with a from-scratch LZW expander, so the dispatcher
no longer needs Pillow for the third-most-common scraped image format.

decoder (`decode_gif` / `decode_gif_pixels`):
- header + logical screen descriptor + global color table,
- extension blocks skipped via the sub-block walk (GCE/comment/
  application — animation control is irrelevant to features),
- first image descriptor: local color table override, interlace
  de-weaving (the 8/8/4/2 pass structure), LZW minimum code size,
- LZW: LSB-first bit packing (the opposite of JPEG), CLEAR/EOI codes,
  dictionary rebuild on CLEAR, the KwKwK self-reference case, and the
  giflib code-width schedule (width++ when the per-code counter
  passes 1 << width, counted per code READ, reset on CLEAR — this is
  what real encoders interoperate with),
- the shared MAX_DECODED_BYTES bomb ceiling, enforced from the
  descriptor before any LZW work.

Returned pixels are the FIRST frame's RGB at the frame's own dims
(fixtures and the overwhelming majority of scraped GIFs are
single-frame full-screen; animation compositing — disposal methods,
partial-frame offsets — is out of scope and documented as such).

fixture encoder (`encode_gif`): real LZW compression with the same
width schedule (`grow=True`), or a CLEAR-before-width-overflow mode
(`grow=False`) that keeps the code width constant — a legal stream
any decoder accepts, used to cross-check the two schedules against
each other in tests. Optional interlaced row order.

`synth_gif` mirrors synth_bmp's per-row gradient EXACTLY (GIF is
lossless), so `multimodal_decode_gif` shares the same closed-form
oracle as the BMP/PPM/PNG fixtures — four containers, one oracle.
"""

from __future__ import annotations

import struct

import numpy as np

# the shared decompression-bomb ceiling (see jpeg.py: a re-declared
# copy drifted before review; always import it)
from .limits import MAX_DECODED_BYTES

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

class _LSBReader:
    """LSB-first bit reader (GIF packs the low bit of each code into
    the low bit of the current byte)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: returns exactly ``n_pixels`` color indices."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    br = _LSBReader(data)
    out = bytearray()
    width = mcs + 1
    table: list[bytes] = []
    counter = 0
    prev: bytes | None = None

    def reset():
        nonlocal width, table, counter, prev
        width = mcs + 1
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        counter = eoi + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = br.read(width)
        # giflib schedule: the width counter runs per code READ and
        # resets on CLEAR (dgif_lib.c DGifDecompressInput)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:          # deferred-clear: table full
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]        # KwKwK
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if counter < 4096:
            counter += 1
            if counter > (1 << width) and width < 12:
                width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    del out[n_pixels:]
    return out


def lzw_encode(indices: bytes, mcs: int, grow: bool = True) -> bytes:
    """GIF-variant LZW compressor. ``grow=True`` uses the same width
    schedule as the decoder; ``grow=False`` emits CLEAR right before
    the width would grow, keeping every code at mcs+1 bits (legal,
    less compression — the cross-check mode)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[bytes, int] = {}
    counter = 0

    def reset():
        nonlocal width, table, counter
        width = mcs + 1
        table = {bytes([i]): i for i in range(clear)}
        counter = eoi + 1

    def bump():
        """Per-code width schedule, mirroring the decoder."""
        nonlocal counter, width
        if counter < 4096:
            counter += 1
            if counter > (1 << width) and width < 12:
                width += 1

    reset()
    emit(clear, width)
    cur = b""
    for b in bytes(indices):
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        bump()
        if len(table) + 2 >= 4096 or \
                (not grow and len(table) + 2 >= (1 << width) - 1):
            emit(clear, width)
            bump()
            reset()
        else:
            table[nxt] = len(table) + 2    # +2: clear/eoi slots
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
        bump()
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _skip_subblocks(content: bytes, i: int) -> int:
    while True:
        if i >= len(content):
            raise ValueError("truncated sub-blocks")
        n = content[i]
        i += 1
        if n == 0:
            return i
        i += n


def _read_subblocks(content: bytes, i: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if i >= len(content):
            raise ValueError("truncated sub-blocks")
        n = content[i]
        i += 1
        if n == 0:
            return b"".join(parts), i
        parts.append(content[i:i + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated sub-block")
        i += n


def decode_gif_pixels(content: bytes) -> np.ndarray:
    """First frame of a GIF -> H x W x 3 uint8 RGB."""
    if content[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(content, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    while i < len(content):
        b = content[i]
        i += 1
        if b == 0x21:                      # extension
            i += 1                         # label
            i = _skip_subblocks(content, i)
        elif b == 0x2C:                    # image descriptor
            _lx, _ty, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                         content, i)
            i += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                ct = np.frombuffer(content, np.uint8,
                                   3 * n, i).reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("no color table")
            if w == 0 or h == 0:
                raise ValueError("zero dimension")
            if w * h * 3 > MAX_DECODED_BYTES:
                raise ValueError("decoded size over MAX_DECODED_BYTES")
            mcs = content[i]
            i += 1
            data, i = _read_subblocks(content, i)
            idx = np.frombuffer(lzw_decode(data, mcs, w * h),
                                np.uint8).reshape(h, w)
            if int(idx.max()) >= len(ct):
                raise ValueError("palette index out of range")
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            return ct[idx]
        elif b == 0x3B:                    # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("no image descriptor")


GIF_FEATURE_LEN = 6


def decode_gif(content: bytes) -> list[float]:
    """Feature layout shared with the other image decoders:
    [width, height, mean_r, mean_g, mean_b, first_r]."""
    from .multimodal import pixel_features
    return pixel_features(decode_gif_pixels(content))


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, grow: bool = True) -> bytes:
    """Single-frame GIF89a from an HxW uint8 index grid and an (N,3)
    uint8 palette (N padded to a power of two >= 4)."""
    h, w = indices.shape
    n = max(4, 1 << int(np.ceil(np.log2(len(palette)))))
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    mcs = max(2, int(np.log2(n)))
    rows = indices
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        rows = indices[order]
    data = lzw_encode(rows.tobytes(), mcs, grow=grow)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0))
    out.extend(pal.tobytes())
    out.extend(b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0))
    out.append(mcs)
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)                          # block terminator
    out.append(0x3B)                       # trailer
    return bytes(out)


def synth_gif(seed: int, interlace: bool = False) -> bytes:
    """Same pixel pattern as synth_bmp (row y is the constant color
    (seed%200 + y, (seed*3)%200 + y, (seed*7)%200 + y)), so the
    closed-form feature oracle is shared across BMP/PPM/PNG/GIF."""
    w = 4 + seed % 8
    h = 2 + seed % 5
    r0, g0, b0 = seed % 200, (seed * 3) % 200, (seed * 7) % 200
    palette = np.array([[r0 + y, g0 + y, b0 + y] for y in range(h)],
                       np.uint8)
    idx = np.repeat(np.arange(h, dtype=np.uint8)[:, None], w, axis=1)
    return encode_gif(idx, palette, interlace=interlace)


# ---------------------------------------------------------------------------
# animation: multi-frame compositing (VERDICT r8 ask 8)
# ---------------------------------------------------------------------------

def decode_gif_frames(content: bytes) -> list[np.ndarray]:
    """Full GIF89a animation walk: every frame composited onto the
    logical-screen canvas per its Graphic Control Extension —
    partial-frame offsets, transparency masking, and disposal methods
    1 (leave), 2 (restore region to the logical background color),
    and 3 (restore to the pre-frame canvas).  Returns one
    sw x sh x 3 uint8 RGB canvas snapshot per frame.

    Convention: disposal 2 restores to the header's background color
    from the global color table (the GIF89a letter; browsers restore
    to transparent, which an RGB canvas cannot represent) — fixtures
    and oracle share the choice.  The bomb ceiling bounds the
    CUMULATIVE composited bytes (frames x canvas), so a
    thousand-frame 1-px-delta animation cannot inflate past
    MAX_DECODED_BYTES."""
    if content[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, bg_idx, _ar = struct.unpack_from("<HHBBB",
                                                     content, 6)
    if sw == 0 or sh == 0:
        raise ValueError("zero logical screen dimension")
    if sw * sh * 3 > MAX_DECODED_BYTES:
        raise ValueError("decoded size over MAX_DECODED_BYTES")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(content, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) \
        else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    transparent = None         # GCE state for the NEXT image
    disposal = 0
    while i < len(content):
        b = content[i]
        i += 1
        if b == 0x21:                      # extension
            label = content[i]
            i += 1
            if label == 0xF9:              # Graphic Control Extension
                body, i = _read_subblocks(content, i)
                if len(body) < 4:
                    raise ValueError("short GCE body")
                gpacked = body[0]
                disposal = (gpacked >> 2) & 7
                transparent = body[3] if gpacked & 1 else None
            else:
                i = _skip_subblocks(content, i)
        elif b == 0x2C:                    # image descriptor
            lx, ty, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                       content, i)
            i += 9
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                ct = np.frombuffer(content, np.uint8,
                                   3 * n, i).reshape(n, 3)
                i += 3 * n
            if ct is None:
                raise ValueError("no color table")
            if w == 0 or h == 0:
                raise ValueError("zero frame dimension")
            if lx + w > sw or ty + h > sh:
                raise ValueError("frame outside logical screen")
            if (len(frames) + 1) * sw * sh * 3 > MAX_DECODED_BYTES:
                raise ValueError(
                    "animation exceeds cumulative decode cap")
            mcs = content[i]
            i += 1
            data, i = _read_subblocks(content, i)
            idx = np.frombuffer(lzw_decode(data, mcs, w * h),
                                np.uint8).reshape(h, w)
            if int(idx.max()) >= len(ct):
                raise ValueError("palette index out of range")
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[ty:ty + h, lx:lx + w]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = ct[idx][mask]
            else:
                region[:] = ct[idx]
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[ty:ty + h, lx:lx + w] = bg
            elif disposal == 3:
                canvas = prev
            transparent = None
            disposal = 0
        elif b == 0x3B:                    # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no image descriptor")
    return frames


def encode_gif_animated(sw: int, sh: int, palette: np.ndarray,
                        frames: list[dict], bg_index: int = 0) -> bytes:
    """Multi-frame GIF89a fixture encoder.  Each frame dict:
    ``indices`` (HxW uint8), ``lx``/``ty`` offsets, ``disposal``
    (0-3), optional ``transparent`` palette index.  Same real LZW and
    code-width schedule as the single-frame encoder."""
    n = max(4, 1 << int(np.ceil(np.log2(len(palette)))))
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    mcs = max(2, int(np.log2(n)))
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", sw, sh, 0x80 | size_bits,
                           bg_index, 0))
    out.extend(pal.tobytes())
    for fr in frames:
        idxs = fr["indices"]
        h, w = idxs.shape
        t = fr.get("transparent")
        gpacked = ((fr.get("disposal", 0) & 7) << 2) \
            | (1 if t is not None else 0)
        out.extend(b"\x21\xf9\x04")
        out.extend(bytes([gpacked, 0, 0, t if t is not None else 0]))
        out.append(0)                      # GCE terminator
        out.extend(b"\x2c" + struct.pack(
            "<HHHHB", fr.get("lx", 0), fr.get("ty", 0), w, h, 0))
        out.append(mcs)
        data = lzw_encode(idxs.tobytes(), mcs)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
    out.append(0x3B)
    return bytes(out)


GIF_ANIM_BG = (200, 150, 100)


def synth_gif_animated(seed: int) -> bytes:
    """Closed-form 4-frame animation over the synth_bmp-style canvas
    (w = 4 + seed%8, h = 2 + seed%5, row gradient from
    (seed%200, 3seed%200, 7seed%200)):

      F0  full-canvas gradient, disposal 1 (leave)
      F1  top-row overlay K1, disposal 3 (restore to previous)
      F2  bottom-row overlay: left w//2 px TRANSPARENT, rest K2,
          disposal 2 (restore region to background)
      F3  single pixel K3 at (0,0), disposal 0

    so the composited canvases are: gradient; gradient with K1 top
    row; gradient with the bottom row's right ceil(w/2) px K2;
    gradient with bottom row = background color and pixel (0,0) K3 —
    each channel mean an exact rational of seed, the shared
    closed-form-oracle convention."""
    w = 4 + seed % 8
    h = 2 + seed % 5
    r0, g0, b0 = seed % 200, (seed * 3) % 200, (seed * 7) % 200
    k1 = (100 + seed % 100, 90 + seed % 100, 80 + seed % 100)
    k2 = (10 + seed % 150, 20 + seed % 150, 30 + seed % 150)
    k3 = (5 + seed % 77, 15 + seed % 77, 25 + seed % 77)
    rows = [(r0 + y, g0 + y, b0 + y) for y in range(h)]
    # palette: h gradient rows, K1, K2, K3, BG, transparent slot
    palette = np.array(rows + [k1, k2, k3, GIF_ANIM_BG, (0, 0, 0)],
                       np.uint8)
    i_k1, i_k2, i_k3 = h, h + 1, h + 2
    i_bg, i_t = h + 3, h + 4
    grad = np.repeat(np.arange(h, dtype=np.uint8)[:, None], w, axis=1)
    f1 = np.full((1, w), i_k1, np.uint8)
    f2 = np.full((1, w), i_k2, np.uint8)
    f2[0, :w // 2] = i_t
    f3 = np.full((1, 1), i_k3, np.uint8)
    return encode_gif_animated(w, h, palette, [
        {"indices": grad, "disposal": 1},
        {"indices": f1, "ty": 0, "disposal": 3},
        {"indices": f2, "ty": h - 1, "disposal": 2,
         "transparent": i_t},
        {"indices": f3, "disposal": 0},
    ], bg_index=i_bg)
