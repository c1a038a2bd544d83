"""Dependency-free MP3/MP4 container METADATA walkers.

Full sample decode of MPEG audio/video needs licensed-codec-scale DSP
(librosa/pyav territory — see README 'Multimodal codec support'), but
the metadata a corpus pipeline actually filters and accounts on
(duration, sample rate, channel count, bitrate, track dims) lives in
the container framing and is exactly parseable with no dependencies:

- `decode_mp3_meta`: skips an ID3v2 tag (syncsafe size), then walks
  MPEG audio frame headers (MPEG1/2/2.5 x Layer I/II/III bitrate and
  sample-rate tables, padding, frame-length formulas) and returns
  [duration_ms, sample_rate, n_channels, bitrate_kbps, n_frames,
  truncated] summed over the actual frames — i.e. VBR-correct, not a
  header-extrapolated guess.  ``truncated`` is 1.0 when the walk
  stopped at corrupt mid-stream bytes rather than clean end-of-data
  (trailing ID3v1/TAG/zero padding counts as clean), so a damaged
  file's understated duration is distinguishable from a clean short
  file (ADVICE r8).
- `decode_mp4_meta`: ISO BMFF box walk (32-bit and 64-bit largesize
  boxes) into moov: mvhd (version 0/1 timescale+duration) for
  duration, tkhd for 16.16 fixed-point track dims, hdlr for
  video/audio track presence. Returns
  [duration_ms, n_tracks, width, height, has_video, has_audio].

Both raise ValueError on malformed input; the multimodal dispatcher
degrades to the sha-stub (a bad file never fails a Spark job). The
fixture generators emit legal minimal containers with closed-form
metadata so `multimodal_meta_mp3` / `multimodal_meta_mp4` are
oracle-checkable like every other decoder.
"""

from __future__ import annotations

import struct

# bitrate kbps tables: [version-group][layer][index]; index 0 = free
# (rejected), 15 = invalid
_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320],
}
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {          # version bits -> [idx0, idx1, idx2]
    3: [44100, 48000, 32000],     # MPEG1
    2: [22050, 24000, 16000],     # MPEG2
    0: [11025, 12000, 8000],      # MPEG2.5
}


def _id3v2_size(content: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    b = content[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("bad ID3v2 syncsafe size")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def decode_mp3_meta(content: bytes) -> list[float]:
    """Walk every MPEG audio frame; see module docstring for layout.

    The final ``truncated`` slot is 0.0 for a clean end (data
    exhausted, zero padding, or an ID3v1 ``TAG`` block after the last
    frame) and 1.0 when the walk stopped on corrupt mid-stream bytes
    — the signal that duration/bitrate understate the original file.
    """
    i = _id3v2_size(content)
    n_frames = 0
    total_samples = 0
    total_bits = 0
    rate = None
    channels = None
    truncated = 0.0
    n = len(content)
    while i + 4 <= n:
        if content[i] == 0x00 and n_frames:
            break                      # trailing padding/ID3v1 zone
        if content[i:i + 3] == b"TAG" and n_frames:
            break                      # ID3v1 trailer — clean end
        h = struct.unpack(">I", content[i:i + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            if n_frames:
                truncated = 1.0
                break                  # junk after real frames
            raise ValueError("no MPEG frame sync")
        ver = (h >> 19) & 3            # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_bits = (h >> 17) & 3     # 3=I, 2=II, 1=III
        br_idx = (h >> 12) & 15
        sr_idx = (h >> 10) & 3
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3            # 3 = mono
        if ver == 1 or layer_bits == 0 or br_idx in (0, 15) \
                or sr_idx == 3:
            if n_frames:
                truncated = 1.0
                break                  # sync-loss tolerance: keep the
                                       # frames already walked (0xFF-
                                       # leading trailing garbage or a
                                       # corrupt mid-stream header)
            raise ValueError("invalid MPEG frame header")
        layer = 4 - layer_bits         # 1, 2, 3
        table = _BITRATES_V1 if ver == 3 else _BITRATES_V2
        kbps = table[layer][br_idx]
        sr = _SAMPLE_RATES[ver][sr_idx]
        if layer == 1:
            samples = 384
            size = (12 * kbps * 1000 // sr + pad) * 4
        else:
            samples = 1152 if (ver == 3 or layer == 2) else 576
            size = samples // 8 * kbps * 1000 // sr + pad
        if size <= 4:
            if n_frames:
                truncated = 1.0
                break                  # same sync-loss tolerance
            raise ValueError("degenerate frame size")
        n_frames += 1
        total_samples += samples
        total_bits += kbps
        rate = sr
        channels = 1 if mode == 3 else 2
        i += size
    if not n_frames:
        raise ValueError("no MPEG frames")
    if i > n:
        truncated = 1.0                # final frame body cut short
    return [total_samples * 1000.0 / rate, float(rate),
            float(channels), total_bits / n_frames, float(n_frames),
            truncated]


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF)
# ---------------------------------------------------------------------------

def _boxes(content: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in a range."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", content[i:i + 4])[0]
        typ = content[i + 4:i + 8]
        body = i + 8
        if size == 1:                  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", content[i + 8:i + 16])[0]
            body = i + 16
        elif size == 0:                # box extends to end
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("bad box size")
        yield typ, body, i + size
        i += size


def decode_mp4_meta(content: bytes) -> list[float]:
    """ISO BMFF box walk; see module docstring for the layout."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp)")
    duration_ms = 0.0
    n_tracks = 0
    width = height = 0.0
    has_video = has_audio = 0.0
    saw_moov = False
    for typ, b0, b1 in _boxes(content, 0, len(content)):
        if typ != b"moov":
            continue
        saw_moov = True
        for t2, c0, c1 in _boxes(content, b0, b1):
            if t2 == b"mvhd":
                ver = content[c0]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", content[c0 + 20:c0 + 32])
                else:
                    ts, dur = struct.unpack(
                        ">II", content[c0 + 12:c0 + 20])
                if ts == 0:
                    raise ValueError("mvhd timescale 0")
                duration_ms = dur * 1000.0 / ts
            elif t2 == b"trak":
                n_tracks += 1
                for t3, d0, d1 in _boxes(content, c0, c1):
                    if t3 == b"tkhd":
                        ver = content[d0]
                        off = d0 + (96 if ver == 1 else 84)
                        w16, h16 = struct.unpack(
                            ">II", content[off - 8:off])
                        if w16:        # video tracks carry dims
                            width = w16 / 65536.0
                            height = h16 / 65536.0
                    elif t3 == b"mdia":
                        for t4, e0, e1 in _boxes(content, d0, d1):
                            if t4 == b"hdlr":
                                handler = content[e0 + 8:e0 + 12]
                                if handler == b"vide":
                                    has_video = 1.0
                                elif handler == b"soun":
                                    has_audio = 1.0
    if not saw_moov:
        raise ValueError("no moov box")
    return [duration_ms, float(n_tracks), width, height,
            has_video, has_audio]


# ---------------------------------------------------------------------------
# fixture generators (closed-form metadata)
# ---------------------------------------------------------------------------

def synth_mp3(seed: int) -> bytes:
    """CBR MPEG1 Layer III mono stream with zeroed payloads:
    n_frames = 4 + seed % 7, bitrate index 9 + seed % 5 (128..224
    kbps), 44100 Hz -> duration_ms = n_frames * 1152000 / 44100."""
    n_frames = 4 + seed % 7
    br_idx = 9 + seed % 5
    kbps = _BITRATES_V1[3][br_idx]
    size = 1152 // 8 * kbps * 1000 // 44100
    out = bytearray()
    # ID3v2 tag with a 13-byte body exercises the syncsafe skip
    out += b"ID3\x04\x00\x00" + bytes([0, 0, 0, 13]) + bytes(13)
    for _ in range(n_frames):
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (br_idx << 12) | (0 << 10) | (3 << 6)
        out += struct.pack(">I", h) + bytes(size - 4)
    return bytes(out)


def synth_mp4(seed: int) -> bytes:
    """Minimal ftyp+moov MP4: timescale 1000, duration 500 + seed*37 %
    60000 ms, one video track (dims 16*(1+seed%5) x 16*(1+seed%3))
    and one audio track."""
    dur = 500 + (seed * 37) % 60000
    w = 16 * (1 + seed % 5)
    h = 16 * (1 + seed % 3)

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    mvhd = box(b"mvhd", bytes(12) + struct.pack(">II", 1000, dur)
               + bytes(80))
    tkhd_v = box(b"tkhd", bytes(76) + struct.pack(">II", w << 16,
                                                  h << 16))
    tkhd_a = box(b"tkhd", bytes(84))
    hdlr_v = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    hdlr_a = box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    trak_v = box(b"trak", tkhd_v + box(b"mdia", hdlr_v))
    trak_a = box(b"trak", tkhd_a + box(b"mdia", hdlr_a))
    moov = box(b"moov", mvhd + trak_v + trak_a)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov
