"""H.264/AVC sequence-parameter-set parsing (ITU-T H.264 §7.3.2.1)
and the avcC configuration-box walk (ISO 14496-15 §5.2.4).

Real video corpora are H.264-dominated; full sample decode needs the
whole AVC stack (CABAC/CAVLC, inter prediction, deblocking), but the
metadata a corpus pipeline FILTERS on — profile, level, true cropped
dimensions, reference-frame count, interlace — lives entirely in the
SPS, which is self-contained and spec-derivable:

- `parse_avcc`: the avcC box (configurationVersion, profile/level
  echo, length-size, SPS/PPS NAL arrays).
- `parse_sps`: RBSP un-escape (00 00 03 emulation prevention, §7.4.1)
  then the exp-Golomb walk: profile/constraints/level, the
  high-profile chroma branch (chroma_format_idc, separate planes,
  bit-depth luma/chroma, scaling matrices skipped when absent),
  log2_max_frame_num, pic_order_cnt_type 0/1/2 (type 1's offset list
  walked), ref frames, mb dims, frame_mbs_only, and the frame-crop
  rectangle -> TRUE pixel width/height via the §7.4.2.1.1 crop-unit
  table (4:2:0/4:2:2/4:4:4/monochrome, interlace doubling).
- `synth_sps` / `synth_mp4_avc`: spec-symmetric bit writer (ue/se
  encode + emulation-prevention INSERTION) muxes closed-form SPS
  fixtures into a minimal avc1/avcC MP4 — every field below is
  derived from the seed, so the oracle entry is exact; the
  emulation-prevention path is load-bearing in fixtures whose
  pic-order fields produce 00 00 runs.

Malformed input raises ValueError; the Spark kernel degrades bad
files to zero rows (codec-family convention).
"""

from __future__ import annotations

import struct

# profiles whose SPS carries the chroma-format branch (§7.3.2.1.1)
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                  134, 135, 138, 139}


# ---------------------------------------------------------------------------
# RBSP escaping (§7.4.1): 00 00 {00,01,02,03} -> 00 00 03 xx on the
# wire; the 03 is dropped when reading.
# ---------------------------------------------------------------------------

def rbsp_unescape(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for i, b in enumerate(data):
        if zeros >= 2 and b == 3:
            # emulation-prevention byte: drop, reset the zero run
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def rbsp_escape(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _Bits:
    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("h264 sps: bit underrun")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Unsigned exp-Golomb (§9.1)."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264 sps: ue overflow")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        """Signed exp-Golomb: k -> (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc, self.n = 0, 0

    def u(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def ue(self, v: int):
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def done(self) -> bytes:
        # rbsp_stop_one_bit + alignment zeros (§7.4.1)
        self.u(1, 1)
        if self.n:
            self.u(0, 8 - self.n)
        return bytes(self.buf)


# parse_sps output field order (shared with the Spark kernel schema)
SPS_FIELDS = ("profile_idc", "level_idc", "chroma_format_idc",
              "bit_depth_luma", "log2_max_frame_num",
              "pic_order_cnt_type", "max_num_ref_frames",
              "frame_mbs_only", "width", "height")


def parse_sps(nal: bytes) -> tuple:
    """SPS NAL (header byte included) -> SPS_FIELDS tuple."""
    if not nal or nal[0] & 0x1F != 7:
        raise ValueError("h264: not an SPS NAL")
    b = _Bits(rbsp_unescape(nal[1:]))
    profile = b.u(8)
    b.u(8)                                    # constraint flags + reserved
    level = b.u(8)
    b.ue()                                    # seq_parameter_set_id
    chroma, bd_luma = 1, 8
    if profile in _HIGH_PROFILES:
        chroma = b.ue()
        if chroma == 3:
            b.u(1)                            # separate_colour_plane
        bd_luma = b.ue() + 8
        b.ue()                                # bit_depth_chroma_minus8
        b.u(1)                                # qpprime_y_zero_transform
        if b.u(1):                            # seq_scaling_matrix_present
            raise ValueError("h264 sps: scaling matrices unsupported")
    log2_mfn = b.ue() + 4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()                                # log2_max_pic_order_cnt_lsb
    elif poc_type == 1:
        b.u(1)                                # delta_pic_order_always_zero
        b.se()                                # offset_for_non_ref_pic
        b.se()                                # offset_for_top_to_bottom
        for _ in range(b.ue()):               # num_ref_frames_in_cycle
            b.se()
    elif poc_type != 2:
        raise ValueError("h264 sps: bad pic_order_cnt_type")
    ref_frames = b.ue()
    b.u(1)                                    # gaps_in_frame_num_allowed
    w_mbs = b.ue() + 1
    h_units = b.ue() + 1
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)                                # mb_adaptive_frame_field
    b.u(1)                                    # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if b.u(1):                                # frame_cropping_flag
        crop_l, crop_r = b.ue(), b.ue()
        crop_t, crop_b = b.ue(), b.ue()
    # crop units (§7.4.2.1.1): SubWidthC/SubHeightC by chroma format
    sub_w = {0: 1, 1: 2, 2: 2, 3: 1}[chroma if chroma <= 3 else 3]
    sub_h = {0: 1, 1: 2, 2: 1, 3: 1}[chroma if chroma <= 3 else 3]
    unit_x = 1 if chroma == 0 else sub_w
    unit_y = (1 if chroma == 0 else sub_h) * (2 - frame_mbs_only)
    width = w_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_units * 16 \
        - unit_y * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("h264 sps: crop exceeds frame")
    return (profile, level, chroma, bd_luma, log2_mfn, poc_type,
            ref_frames, frame_mbs_only, width, height)


def parse_avcc(box: bytes) -> tuple[list[bytes], list[bytes]]:
    """avcC body -> (sps_nals, pps_nals)."""
    if len(box) < 7 or box[0] != 1:
        raise ValueError("h264: bad avcC")
    n_sps = box[5] & 0x1F
    pos = 6
    sps = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", box, pos)
        pos += 2
        sps.append(box[pos:pos + ln])
        if len(sps[-1]) != ln:
            raise ValueError("h264: avcC SPS underrun")
        pos += ln
    if pos >= len(box):
        raise ValueError("h264: avcC missing PPS count")
    n_pps = box[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", box, pos)
        pos += 2
        pps.append(box[pos:pos + ln])
        pos += ln
    return sps, pps


# ---------------------------------------------------------------------------
# fixtures: closed-form SPS per seed, muxed into a minimal avc1 MP4
# ---------------------------------------------------------------------------

def sps_fixture_params(seed: int) -> dict:
    """Every field a closed-form function of the seed; the oracle SQL
    mirrors these expressions exactly."""
    return {
        "profile_idc": (66, 77, 100, 100)[seed % 4],
        "level_idc": 10 + (seed % 5) * 10,
        "chroma_format_idc": (1, 2)[(seed // 2) % 2]
        if (66, 77, 100, 100)[seed % 4] == 100 else 1,
        "log2_max_frame_num": 4 + seed % 8,
        "pic_order_cnt_type": (0, 1, 2)[seed % 3],
        "max_num_ref_frames": 1 + seed % 6,
        "frame_mbs_only": 0 if seed % 5 == 0 else 1,
        "w_mbs": 2 + seed % 9,
        "h_units": 1 + seed % 7,
        "crop_r": seed % 3,
        "crop_b": (seed // 3) % 2,
    }


def synth_sps(seed: int) -> bytes:
    p = sps_fixture_params(seed)
    w = _BitW()
    w.u(p["profile_idc"], 8)
    w.u(0, 8)
    w.u(p["level_idc"], 8)
    w.ue(0)                                   # sps id
    if p["profile_idc"] in _HIGH_PROFILES:
        w.ue(p["chroma_format_idc"])
        w.ue(0)                               # bit_depth_luma_minus8
        w.ue(0)                               # bit_depth_chroma_minus8
        w.u(0, 1)
        w.u(0, 1)                             # no scaling matrices
    w.ue(p["log2_max_frame_num"] - 4)
    w.ue(p["pic_order_cnt_type"])
    if p["pic_order_cnt_type"] == 0:
        w.ue(4)                               # log2_max_poc_lsb_minus4
    elif p["pic_order_cnt_type"] == 1:
        w.u(0, 1)
        # large power-of-two offsets encode as 17 zero bits + 1 +
        # 17 zero bits each -> the muxed stream grows 00 00 0x byte
        # runs, making emulation prevention LOAD-BEARING in these
        # fixtures (asserted by test_h264_fixture_emulation_bytes)
        w.se(1 << 17)
        w.se(-(1 << 17))
        w.ue(2)
        w.se(1 << 17)
        w.se(0)
    w.ue(p["max_num_ref_frames"])
    w.u(0, 1)
    w.ue(p["w_mbs"] - 1)
    w.ue(p["h_units"] - 1)
    w.u(p["frame_mbs_only"], 1)
    if not p["frame_mbs_only"]:
        w.u(0, 1)
    w.u(0, 1)
    crop = p["crop_r"] or p["crop_b"]
    w.u(1 if crop else 0, 1)
    if crop:
        w.ue(0)
        w.ue(p["crop_r"])
        w.ue(0)
        w.ue(p["crop_b"])
    w.u(0, 1)                                 # vui_parameters_present
    return bytes([0x67]) + rbsp_escape(w.done())


def expected_sps_fields(seed: int) -> tuple:
    """Closed-form SPS_FIELDS for a fixture seed (mirrors the crop
    arithmetic in parse_sps)."""
    p = sps_fixture_params(seed)
    chroma = p["chroma_format_idc"]
    sub_w = 2
    sub_h = {1: 2, 2: 1}[chroma]
    unit_y = sub_h * (2 - p["frame_mbs_only"])
    width = p["w_mbs"] * 16 - sub_w * p["crop_r"]
    height = (2 - p["frame_mbs_only"]) * p["h_units"] * 16 \
        - unit_y * p["crop_b"]
    return (p["profile_idc"], p["level_idc"], chroma, 8,
            p["log2_max_frame_num"], p["pic_order_cnt_type"],
            p["max_num_ref_frames"], p["frame_mbs_only"],
            width, height)


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def synth_mp4_avc(seed: int) -> bytes:
    """Minimal MP4 with one avc1 video track whose stsd carries the
    fixture avcC (no media samples — the metadata surface a corpus
    filters on; frame tables are the mp4frames fixtures' job)."""
    sps = synth_sps(seed)
    pps = bytes([0x68, 0xCE, 0x38, 0x80])     # tiny valid-shape PPS
    avcc = (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)
    fields = expected_sps_fields(seed)
    w, h = fields[8], fields[9]
    avc1 = (b"\x00" * 6 + struct.pack(">H", 1)     # sample entry hdr
            + b"\x00" * 16
            + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x480000, 0x480000)
            + b"\x00" * 4 + struct.pack(">H", 1)
            + b"\x00" * 32
            + struct.pack(">H", 0x18) + struct.pack(">h", -1)
            + _box(b"avcC", avcc))
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + _box(b"avc1", avc1))
    stbl = _box(b"stbl", stsd
                + _box(b"stts", struct.pack(">II", 0, 0))
                + _box(b"stsc", struct.pack(">II", 0, 0))
                + _box(b"stsz", struct.pack(">III", 0, 0, 0))
                + _box(b"stco", struct.pack(">II", 0, 0)))
    minf = _box(b"minf", _box(b"vmhd", struct.pack(">IHHHH", 1, 0, 0,
                                                   0, 0)) + stbl)
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\x00" * 12 + b"\x00")
    mdhd = _box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, 1000, 0)
                + struct.pack(">HH", 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", struct.pack(">III", 7, 0, 0)
                + struct.pack(">I", 1) + b"\x00" * 4
                + struct.pack(">I", 0) + b"\x00" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, 1000, 0)
                + struct.pack(">I", 0x00010000)
                + struct.pack(">H", 0x0100) + b"\x00" * 10
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                              0, 0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomavc1")
    return ftyp + moov


def sps_from_mp4(content: bytes) -> tuple:
    """Walk an MP4's moov for the first avc1/avcC and parse its first
    SPS -> SPS_FIELDS tuple."""
    from .mediameta import _boxes
    avcc = _find_avcc(content, 0, len(content))
    if avcc is None:
        raise ValueError("h264: no avcC in container")
    sps, _pps = parse_avcc(avcc)
    if not sps:
        raise ValueError("h264: avcC carries no SPS")
    return parse_sps(sps[0])


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _find_avcc(content: bytes, start: int, end: int) -> bytes | None:
    from .mediameta import _boxes
    for typ, b0, b1 in _boxes(content, start, end):
        if typ in _CONTAINERS:
            got = _find_avcc(content, b0, b1)
            if got is not None:
                return got
        elif typ == b"stsd":
            # fullbox header (4) + entry_count (4), then sample
            # entries; avc1 entry: 8-byte box hdr + 78-byte sample
            # description, then child boxes
            for etyp, e0, e1 in _boxes(content, b0 + 8, b1):
                if etyp != b"avc1":
                    continue
                for ctyp, c0, c1 in _boxes(content, e0 + 78, e1):
                    if ctyp == b"avcC":
                        return content[c0:c1]
    return None
