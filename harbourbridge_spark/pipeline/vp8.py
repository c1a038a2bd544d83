"""Lossy-WebP (VP8) frame-HEADER codec: bool coder + keyframe header.

The repo decodes lossless WebP (VP8L) to pixels; the lossy 'VP8 '
sibling's FULL sample decode needs RFC 6386's empirical token/update
probability tables ([4][8][3][11] constants that cannot be derived
and — with no third-party encoder or decoder in this sandbox — could
not be validated; fabricating them would make "interoperable" an
unverifiable claim, see README).  What IS spec-derivable, and what a
corpus pipeline actually filters lossy WebP on, is the frame header:

- the boolean arithmetic coder (RFC 6386 §7) — range/value/renorm
  state machine; header fields are prob-128 literals;
- the uncompressed frame tag (keyframe bit, version, show_frame,
  first-partition size), keyframe start code, 14-bit width/height
  with 2-bit upscale codes (§9.1);
- the first-partition header through the quantizer/refresh section
  (§9.2-9.11): color space, clamping, the full segmentation block
  (feature mode, 4x quantizer + 4x loop-filter deltas, 3 tree
  probs), filter type/level/sharpness, loop-filter adjustments,
  DCT partition count AND the 3-byte partition-size table, base
  y_ac_qi + the five quantizer deltas, refresh_entropy_probs.

The walk STOPS exactly where the empirical tables begin (the token
probability update flags) — everything before that point is literal
bits and structurally-read probabilities.

`decode_vp8_header` parses a RIFF/WEBP container holding a 'VP8 '
chunk (VP8X-wrapped included).  `synth_webp_vp8(seed)` writes a
legal keyframe header through the same spec-symmetric BOOL ENCODER
(carry-propagating, fuzz round-tripped against the decoder), with
dummy-padded coefficient partitions — honest by construction: this
module never claims to decode macroblocks.

Reference parity note: the reference (a migration tool) has no media
support at all; this is beyond-parity LLM-pipeline surface.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# boolean coder (RFC 6386 §7; encoder symmetric to the decoder)
# ---------------------------------------------------------------------------


class BoolDecoder:
    def __init__(self, data: bytes):
        if len(data) < 2:
            raise ValueError("VP8 bool partition too short")
        self.data = data
        self.value = (data[0] << 8) | data[1]
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def flag_signed(self, n: int) -> int:
        """update-flag -> signed n-bit value, else 0 (§9.3 pattern)."""
        return self.signed_literal(n) if self.bool(128) else 0


class BoolEncoder:
    """Big-integer low/range encoder: renormalization shifts `low`
    left; carries propagate inside the Python int, and the final
    flush emits any value inside [low, low+range) — the decoder
    accepts every such stream (fuzz-pinned)."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def bool(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.range <<= 1
            self.nbits += 1

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bool((v >> i) & 1, 128)

    def signed_literal(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.bool(1 if v < 0 else 0, 128)

    def flag_signed(self, v: int, n: int) -> None:
        if v:
            self.bool(1, 128)
            self.signed_literal(v, n)
        else:
            self.bool(0, 128)

    def flush(self) -> bytes:
        total = self.nbits + 8          # initial 8-bit range scale
        pad = (-total) % 8
        v = self.low << pad             # low is inside the interval
        out = v.to_bytes((total + pad) // 8, "big")
        return out + b"\x00\x00"        # decoder 2-byte lookahead


# ---------------------------------------------------------------------------
# keyframe header parse (§9.1-9.11)
# ---------------------------------------------------------------------------

VP8_FIELDS = (
    "width", "height", "hscale", "vscale", "version", "show_frame",
    "color_space", "clamping", "segmentation", "filter_type",
    "filter_level", "sharpness", "n_partitions", "y_ac_qi",
    "y_dc_delta", "y2_dc_delta", "y2_ac_delta", "uv_dc_delta",
    "uv_ac_delta", "refresh_entropy", "first_part_size",
)


def parse_vp8_frame(payload: bytes) -> dict:
    """'VP8 ' chunk payload -> header field dict (keyframes only —
    interframes carry no dimensions and predict from prior frames)."""
    if len(payload) < 10:
        raise ValueError("VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if not key_frame:
        raise ValueError("not a VP8 keyframe")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w16, h16 = struct.unpack("<HH", payload[6:10])
    width, hscale = w16 & 0x3FFF, w16 >> 14
    height, vscale = h16 & 0x3FFF, h16 >> 14
    if first_part_size < 1 or 10 + first_part_size > len(payload):
        raise ValueError("VP8 first partition out of range")

    d = BoolDecoder(payload[10:10 + first_part_size])
    color_space = d.bool(128)
    clamping = d.bool(128)
    segmentation = d.bool(128)
    if segmentation:
        update_map = d.bool(128)
        update_data = d.bool(128)
        if update_data:
            d.bool(128)                       # segment_feature_mode
            for _ in range(4):                # quantizer deltas
                d.flag_signed(7)
            for _ in range(4):                # loop-filter deltas
                d.flag_signed(6)
        if update_map:
            for _ in range(3):                # tree probs
                if d.bool(128):
                    d.literal(8)
    filter_type = d.bool(128)
    filter_level = d.literal(6)
    sharpness = d.literal(3)
    if d.bool(128):                           # lf adjustments enabled
        if d.bool(128):                       # delta update
            for _ in range(4):
                d.flag_signed(6)              # ref frame deltas
            for _ in range(4):
                d.flag_signed(6)              # mode deltas
    log2_parts = d.literal(2)
    n_partitions = 1 << log2_parts
    y_ac_qi = d.literal(7)
    y_dc_delta = d.flag_signed(4)
    y2_dc_delta = d.flag_signed(4)
    y2_ac_delta = d.flag_signed(4)
    uv_dc_delta = d.flag_signed(4)
    uv_ac_delta = d.flag_signed(4)
    refresh_entropy = d.bool(128)
    # token probability updates follow — empirical-table territory;
    # the walk stops here by design (module docstring)

    # partition size table (§9.5): n-1 3-byte LE sizes after the
    # first partition; validate they tile the remaining payload
    off = 10 + first_part_size
    sizes = []
    if n_partitions > 1:
        need = 3 * (n_partitions - 1)
        if off + need > len(payload):
            raise ValueError("VP8 partition size table truncated")
        for i in range(n_partitions - 1):
            p = off + 3 * i
            sizes.append(payload[p] | (payload[p + 1] << 8)
                         | (payload[p + 2] << 16))
        off += need
    covered = off + sum(sizes)
    if covered > len(payload):
        raise ValueError("VP8 partitions overrun payload")
    sizes.append(len(payload) - covered)      # last partition

    return {
        "width": width, "height": height,
        "hscale": hscale, "vscale": vscale,
        "version": version, "show_frame": show_frame,
        "color_space": color_space, "clamping": clamping,
        "segmentation": segmentation, "filter_type": filter_type,
        "filter_level": filter_level, "sharpness": sharpness,
        "n_partitions": n_partitions, "y_ac_qi": y_ac_qi,
        "y_dc_delta": y_dc_delta, "y2_dc_delta": y2_dc_delta,
        "y2_ac_delta": y2_ac_delta, "uv_dc_delta": uv_dc_delta,
        "uv_ac_delta": uv_ac_delta,
        "refresh_entropy": refresh_entropy,
        "first_part_size": first_part_size,
        "partition_sizes": sizes,
    }


def decode_vp8_header(content: bytes) -> list[float]:
    """RIFF/WEBP with a 'VP8 ' chunk -> VP8_FIELDS feature vector
    (floats, the codec-family convention)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    i = 12
    n = len(content)
    while i + 8 <= n:
        fourcc = content[i:i + 4]
        (size,) = struct.unpack("<I", content[i + 4:i + 8])
        body = content[i + 8:i + 8 + size]
        if fourcc == b"VP8 ":
            h = parse_vp8_frame(body)
            return [float(h[k]) for k in VP8_FIELDS]
        i += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


# ---------------------------------------------------------------------------
# fixture muxer (closed-form header, dummy coefficient partitions)
# ---------------------------------------------------------------------------

def vp8_fixture_params(seed: int) -> dict:
    return {
        "width": 16 * (1 + seed % 5), "height": 16 * (1 + seed % 3),
        "hscale": seed % 4, "vscale": (seed // 4) % 4,
        "segmentation": seed % 2,
        "filter_type": (seed // 2) % 2,
        "filter_level": seed % 64, "sharpness": seed % 8,
        "log2_parts": seed % 4,
        "y_ac_qi": 20 + seed % 100,
        "y_dc_delta": (seed % 31) - 15,
        "uv_ac_delta": ((seed * 3) % 31) - 15,
        "refresh_entropy": (seed // 3) % 2,
    }


def synth_webp_vp8(seed: int) -> bytes:
    """Legal VP8 keyframe HEADER (spec-symmetric bool encoder) inside
    RIFF/WEBP; coefficient partitions are zero padding (declared via
    the real partition-size table) — a fixture for the header walker,
    not a decodable image."""
    p = vp8_fixture_params(seed)
    e = BoolEncoder()
    e.bool(0, 128)                            # color_space
    e.bool(0, 128)                            # clamping
    e.bool(p["segmentation"], 128)
    if p["segmentation"]:
        e.bool(0, 128)                        # update_map
        e.bool(1, 128)                        # update_data
        e.bool(0, 128)                        # feature mode
        for i in range(4):                    # quantizer deltas
            e.flag_signed((seed + i) % 16 - 8 if i < 2 else 0, 7)
        for _ in range(4):                    # loop-filter deltas
            e.flag_signed(0, 6)
    e.bool(p["filter_type"], 128)
    e.literal(p["filter_level"], 6)
    e.literal(p["sharpness"], 3)
    e.bool(0, 128)                            # lf adjustments off
    e.literal(p["log2_parts"], 2)
    e.literal(p["y_ac_qi"], 7)
    e.flag_signed(p["y_dc_delta"], 4)
    e.flag_signed(0, 4)                       # y2_dc
    e.flag_signed(0, 4)                       # y2_ac
    e.flag_signed(0, 4)                       # uv_dc
    e.flag_signed(p["uv_ac_delta"], 4)
    e.bool(p["refresh_entropy"], 128)
    part1 = e.flush()

    n_parts = 1 << p["log2_parts"]
    coef_sizes = [5 + (seed + i) % 7 for i in range(n_parts)]
    size_table = b"".join(
        struct.pack("<I", s)[:3] for s in coef_sizes[:-1])
    coef = b"".join(bytes(s) for s in coef_sizes)

    tag = (0 | (0 << 1) | (1 << 4) | (len(part1) << 5))
    w16 = p["width"] | (p["hscale"] << 14)
    h16 = p["height"] | (p["vscale"] << 14)
    payload = (bytes([tag & 0xFF, (tag >> 8) & 0xFF,
                      (tag >> 16) & 0xFF])
               + b"\x9d\x01\x2a" + struct.pack("<HH", w16, h16)
               + part1 + size_table + coef)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) & 1 else b"")   # RIFF pad byte
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" \
        + chunk
    return riff
