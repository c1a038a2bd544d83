"""ISO BMFF (MP4) sample-table parsing and MJPEG video-frame decode.

`mediameta.decode_mp4_meta` stops at container METADATA (duration,
dims, track kinds).  This module goes to the per-SAMPLE level — the
structure a video corpus pipeline actually fans frame work out on
(reference parity note: the reference migrates rows, not media; this
whole family is beyond-parity LLM-pipeline surface, like the other
codecs):

- `mp4_video_samples(content)`: walk moov/trak[vide]/mdia/minf/stbl
  and join the five sample tables into one per-frame record:
  stts (decode-time deltas, run-length) -> dts/duration,
  ctts (composition offsets, v0 unsigned / v1 signed) -> cts,
  stsz (uniform or per-sample sizes), stsc (sample-to-chunk runs) +
  stco/co64 (chunk offsets) -> absolute byte offsets, stss (sync
  table; ABSENT means all frames are sync per ISO 14496-12 8.6.2).
  Returns (codec, timescale, [SampleInfo]).
- `mp4_frame_bytes(content)`: slice each sample's bytes out of mdat
  via those offsets — the frame fan-out primitive.
- `decode_mjpeg_frames(content)`: for 'jpeg'-coded tracks (Motion
  JPEG in MP4), every sample is a complete baseline JPEG image;
  decode each through the repo's from-scratch JPEG codec
  (jpeg.decode_jpeg_pixels) -> list of HxWx3 uint8 frames.  This is
  real video-frame PIXEL decode end-to-end with zero new
  entropy-coder surface.
- `synth_mp4_mjpeg(seed)`: legal minimal MJPEG/MP4 muxer fixture with
  closed-form sample table AND closed-form frame pixels (the
  synth_jpeg block-constant even-gray trick, so the lossy codec
  round-trips EXACTLY): two stts runs, 2-samples-per-chunk stsc with
  a short last chunk on odd counts, stss present (even seeds) or
  omitted (odd seeds).

Malformed input raises ValueError; the Spark kernels degrade a bad
file to zero rows, like every other decode path.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

from .mediameta import _boxes


class SampleInfo(NamedTuple):
    idx: int          # 0-based frame index in decode order
    dts: int          # decode timestamp, media-timescale ticks
    dur: int          # sample duration, ticks
    cts: int          # composition timestamp (dts + ctts offset)
    size: int         # sample byte size
    offset: int       # absolute file offset of the sample's bytes
    keyframe: int     # 1 if a sync sample (stss absent -> all 1)


def _full_box(content: bytes, b0: int) -> tuple[int, int, int]:
    """(version, flags, body_start_after_fullbox_header)."""
    ver = content[b0]
    flags = int.from_bytes(content[b0 + 1:b0 + 4], "big")
    return ver, flags, b0 + 4


def _parse_stbl(content: bytes, s0: int, s1: int):
    """Raw tables out of one stbl box."""
    codec = None
    stts: list[tuple[int, int]] = []
    ctts: list[tuple[int, int]] = []
    stsc: list[tuple[int, int]] = []
    sizes: list[int] | None = None
    uniform = 0
    n_samples = 0
    chunk_offsets: list[int] = []
    stss: set[int] | None = None
    for typ, b0, b1 in _boxes(content, s0, s1):
        if typ == b"stsd":
            _, _, p = _full_box(content, b0)
            n_entries = struct.unpack(">I", content[p:p + 4])[0]
            if n_entries < 1 or p + 16 > b1:
                raise ValueError("empty stsd")
            # first sample entry: 4 size + 4 fourcc
            codec = content[p + 8:p + 12].decode("latin-1")
        elif typ == b"stts":
            _, _, p = _full_box(content, b0)
            (n,) = struct.unpack(">I", content[p:p + 4])
            p += 4
            for _ in range(n):
                cnt, delta = struct.unpack(">II", content[p:p + 8])
                stts.append((cnt, delta))
                p += 8
        elif typ == b"ctts":
            ver, _, p = _full_box(content, b0)
            (n,) = struct.unpack(">I", content[p:p + 4])
            p += 4
            fmt = ">Ii" if ver == 1 else ">II"
            for _ in range(n):
                cnt, off = struct.unpack(fmt, content[p:p + 8])
                ctts.append((cnt, off))
                p += 8
        elif typ == b"stsz":
            _, _, p = _full_box(content, b0)
            uniform, n_samples = struct.unpack(">II",
                                               content[p:p + 8])
            p += 8
            if uniform == 0:
                sizes = list(struct.unpack(
                    f">{n_samples}I", content[p:p + 4 * n_samples]))
        elif typ == b"stsc":
            _, _, p = _full_box(content, b0)
            (n,) = struct.unpack(">I", content[p:p + 4])
            p += 4
            for _ in range(n):
                first, spc, _sdi = struct.unpack(
                    ">III", content[p:p + 12])
                stsc.append((first, spc))
                p += 12
        elif typ in (b"stco", b"co64"):
            _, _, p = _full_box(content, b0)
            (n,) = struct.unpack(">I", content[p:p + 4])
            p += 4
            w, fmt = (8, ">Q") if typ == b"co64" else (4, ">I")
            for _ in range(n):
                chunk_offsets.append(
                    struct.unpack(fmt, content[p:p + w])[0])
                p += w
        elif typ == b"stss":
            _, _, p = _full_box(content, b0)
            (n,) = struct.unpack(">I", content[p:p + 4])
            p += 4
            stss = {struct.unpack(">I", content[p + 4 * i:
                                                p + 4 * i + 4])[0]
                    for i in range(n)}
    if codec is None:
        raise ValueError("sample table without stsd")
    if sizes is None:
        if uniform == 0 and n_samples:
            raise ValueError("stsz uniform size 0 with no table")
        sizes = [uniform] * n_samples
    # a zero-sample stbl is the LEGAL fragmented-MP4 shape (samples
    # live in moof/trun); a NON-empty one missing its joins is corrupt
    if sizes and (not stts or not stsc or not chunk_offsets):
        raise ValueError("incomplete sample table")
    return codec, stts, ctts, stsc, sizes, chunk_offsets, stss


def mp4_video_samples(content: bytes
                      ) -> tuple[str, int, list[SampleInfo]]:
    """(codec_fourcc, media_timescale, per-frame SampleInfo rows) of
    the FIRST video ('vide' handler) track; ValueError if none.

    Handles BOTH layouts real corpora carry: the classic single-mdat
    stbl form, and fragmented MP4 (DASH/CMAF) where the moov's stbl
    is EMPTY and the samples live in moof/traf/trun runs with
    trex/tfhd default inheritance — detected by an mvex box plus a
    zero-sample stbl, then completed by `_walk_fragments`."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no ftyp)")
    for typ, b0, b1 in _boxes(content, 0, len(content)):
        if typ != b"moov":
            continue
        trex = _parse_mvex(content, b0, b1)
        for t2, c0, c1 in _boxes(content, b0, b1):
            if t2 != b"trak":
                continue
            got = _try_video_trak(content, c0, c1)
            if got is not None:
                codec, timescale, samples = got
                if not samples and trex is not None:
                    track_id = _trak_id(content, c0, c1)
                    samples = _walk_fragments(
                        content, track_id, trex.get(track_id, {}))
                return codec, timescale, samples
    raise ValueError("no video track with a sample table")


def _trak_id(content: bytes, c0: int, c1: int) -> int:
    for t3, d0, d1 in _boxes(content, c0, c1):
        if t3 == b"tkhd":
            ver = content[d0]
            off = d0 + 4 + (16 if ver == 1 else 8)
            return struct.unpack(">I", content[off:off + 4])[0]
    raise ValueError("trak without tkhd")


def _parse_mvex(content: bytes, b0: int, b1: int):
    """moov/mvex/trex -> {track_id: defaults} or None (unfragmented)."""
    trex = None
    for t2, c0, c1 in _boxes(content, b0, b1):
        if t2 != b"mvex":
            continue
        trex = {}
        for t3, d0, d1 in _boxes(content, c0, c1):
            if t3 == b"trex":
                _, _, p = _full_box(content, d0)
                tid, _sdi, ddur, dsize, dflags = struct.unpack(
                    ">IIIII", content[p:p + 20])
                trex[tid] = {"dur": ddur, "size": dsize,
                             "flags": dflags}
    return trex


# tfhd / trun flag bits (ISO 14496-12 8.8.7 / 8.8.8)
_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_SAMPLE_DESC = 0x000002
_TFHD_DEFAULT_DUR = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_DEFAULT_FLAGS = 0x000020
_TFHD_DEFAULT_BASE_IS_MOOF = 0x020000
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_SAMPLE_DUR = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800
_SAMPLE_NON_SYNC = 0x00010000


def _walk_fragments(content: bytes, track_id: int,
                    trex: dict) -> list[SampleInfo]:
    """Top-level moof walk: tfhd default inheritance (trex -> tfhd ->
    trun -> first-sample-flags), tfdt decode-time anchoring, trun
    data offsets relative to base-data-offset or the moof start
    (default-base-is-moof AND the modern no-bdo default)."""
    samples: list[SampleInfo] = []
    idx = 0
    next_dts = 0
    for typ, b0, b1 in _boxes(content, 0, len(content)):
        if typ != b"moof":
            continue
        moof_start = b0 - 8
        for t2, c0, c1 in _boxes(content, b0, b1):
            if t2 != b"traf":
                continue
            tfhd = None
            base_dt = None
            truns = []
            for t3, d0, d1 in _boxes(content, c0, c1):
                if t3 == b"tfhd":
                    _, flags, p = _full_box(content, d0)
                    tid = struct.unpack(">I", content[p:p + 4])[0]
                    p += 4
                    h = {"flags": flags}
                    if flags & _TFHD_BASE_DATA_OFFSET:
                        h["bdo"] = struct.unpack(
                            ">Q", content[p:p + 8])[0]
                        p += 8
                    if flags & _TFHD_SAMPLE_DESC:
                        p += 4
                    if flags & _TFHD_DEFAULT_DUR:
                        h["dur"] = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    if flags & _TFHD_DEFAULT_SIZE:
                        h["size"] = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    if flags & _TFHD_DEFAULT_FLAGS:
                        h["sflags"] = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    h["tid"] = tid
                    tfhd = h
                elif t3 == b"tfdt":
                    ver, _, p = _full_box(content, d0)
                    base_dt = struct.unpack(
                        ">Q" if ver == 1 else ">I",
                        content[p:p + (8 if ver == 1 else 4)])[0]
                elif t3 == b"trun":
                    truns.append(d0)
            if tfhd is None or tfhd["tid"] != track_id:
                continue
            base = tfhd.get("bdo", moof_start)
            pos = None
            dts = base_dt if base_dt is not None else next_dts
            for d0 in truns:
                ver, flags, p = _full_box(content, d0)
                (cnt,) = struct.unpack(">I", content[p:p + 4])
                p += 4
                if flags & _TRUN_DATA_OFFSET:
                    doff = struct.unpack(">i", content[p:p + 4])[0]
                    pos = base + doff
                    p += 4
                elif pos is None:
                    pos = base
                first_flags = None
                if flags & _TRUN_FIRST_FLAGS:
                    first_flags = struct.unpack(
                        ">I", content[p:p + 4])[0]
                    p += 4
                for si in range(cnt):
                    dur = tfhd.get("dur", trex.get("dur"))
                    size = tfhd.get("size", trex.get("size"))
                    sflags = tfhd.get("sflags", trex.get("flags", 0))
                    if flags & _TRUN_SAMPLE_DUR:
                        dur = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    if flags & _TRUN_SAMPLE_SIZE:
                        size = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    if flags & _TRUN_SAMPLE_FLAGS:
                        sflags = struct.unpack(
                            ">I", content[p:p + 4])[0]
                        p += 4
                    elif si == 0 and first_flags is not None:
                        sflags = first_flags
                    cof = 0
                    if flags & _TRUN_SAMPLE_CTS:
                        cof = struct.unpack(
                            ">i" if ver == 1 else ">I",
                            content[p:p + 4])[0]
                        p += 4
                    if dur is None or size is None:
                        raise ValueError(
                            "trun sample without duration/size and "
                            "no tfhd/trex default")
                    samples.append(SampleInfo(
                        idx=idx, dts=dts, dur=dur, cts=dts + cof,
                        size=size, offset=pos,
                        keyframe=0 if sflags & _SAMPLE_NON_SYNC
                        else 1))
                    idx += 1
                    dts += dur
                    pos += size
            next_dts = dts
    if not samples:
        raise ValueError("fragmented track with no trun samples")
    return samples


def _try_video_trak(content: bytes, c0: int, c1: int):
    timescale = None
    is_video = False
    tables = None
    for t3, d0, d1 in _boxes(content, c0, c1):
        if t3 != b"mdia":
            continue
        for t4, e0, e1 in _boxes(content, d0, d1):
            if t4 == b"mdhd":
                ver = content[e0]
                if ver == 1:
                    timescale = struct.unpack(
                        ">I", content[e0 + 20:e0 + 24])[0]
                else:
                    timescale = struct.unpack(
                        ">I", content[e0 + 12:e0 + 16])[0]
            elif t4 == b"hdlr":
                is_video = content[e0 + 8:e0 + 12] == b"vide"
            elif t4 == b"minf":
                for t5, f0, f1 in _boxes(content, e0, e1):
                    if t5 == b"stbl":
                        tables = _parse_stbl(content, f0, f1)
    if not is_video or tables is None:
        return None
    if not timescale:
        raise ValueError("video mdhd timescale 0/missing")
    codec, stts, ctts, stsc, sizes, chunk_offsets, stss = tables
    n = len(sizes)

    # stts -> per-sample dts/dur
    dts: list[int] = []
    durs: list[int] = []
    t = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            dts.append(t)
            durs.append(delta)
            t += delta
    if len(dts) != n:
        raise ValueError(
            f"stts covers {len(dts)} samples, stsz has {n}")

    # ctts -> per-sample composition offset (default 0)
    cofs = [0] * n
    i = 0
    for cnt, off in ctts:
        for _ in range(cnt):
            if i >= n:
                raise ValueError("ctts covers more samples than stsz")
            cofs[i] = off
            i += 1

    # stsc runs + chunk offsets -> absolute per-sample offsets.
    # Run r applies to chunks [first_r, first_{r+1}) — the classic
    # open-ended last run.
    offsets: list[int] = []
    si = 0
    nchunks = len(chunk_offsets)
    for ri, (first, spc) in enumerate(stsc):
        last = (stsc[ri + 1][0] - 1 if ri + 1 < len(stsc)
                else nchunks)
        if first < 1 or last > nchunks or spc < 1:
            raise ValueError("bad stsc run")
        for chunk in range(first, last + 1):
            pos = chunk_offsets[chunk - 1]
            for _ in range(spc):
                if si >= n:
                    break
                offsets.append(pos)
                pos += sizes[si]
                si += 1
    if si < n:
        raise ValueError(f"stsc/stco map only {si} of {n} samples")

    out = [SampleInfo(
        idx=i, dts=dts[i], dur=durs[i], cts=dts[i] + cofs[i],
        size=sizes[i], offset=offsets[i],
        keyframe=1 if (stss is None or (i + 1) in stss) else 0)
        for i in range(n)]
    return codec, timescale, out


def mp4_frame_bytes(content: bytes) -> tuple[str, int,
                                             list[tuple[SampleInfo,
                                                        bytes]]]:
    """(codec, timescale, [(SampleInfo, sample_bytes)]): the frame
    fan-out primitive — sample table applied to the file bytes."""
    codec, timescale, samples = mp4_video_samples(content)
    out = []
    n = len(content)
    for s in samples:
        if s.offset + s.size > n:
            raise ValueError("sample range beyond file end")
        out.append((s, content[s.offset:s.offset + s.size]))
    return codec, timescale, out


def decode_mjpeg_frames(content: bytes) -> list["np.ndarray"]:
    """Motion-JPEG-in-MP4 -> per-frame HxWx3 uint8 RGB arrays via the
    from-scratch baseline JPEG decoder.  ValueError for non-'jpeg'
    tracks (name the codec so the caller can degrade knowingly)."""
    from .jpeg import decode_jpeg_pixels
    codec, _ts, frames = mp4_frame_bytes(content)
    if codec != "jpeg":
        raise ValueError(f"not an MJPEG track (codec={codec})")
    return [decode_jpeg_pixels(b) for _s, b in frames]


# ---------------------------------------------------------------------------
# fixture muxer (closed-form sample table + closed-form pixels)
# ---------------------------------------------------------------------------

def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def _full(typ: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(typ, bytes([ver]) + flags.to_bytes(3, "big") + body)


def mjpeg_fixture_params(seed: int) -> dict:
    """Closed forms shared with the multimodal_mp4_frames /
    multimodal_decode_mjpeg oracle SQL."""
    n = 2 + seed % 4                      # frames
    dur_a = 100 + (seed % 5) * 20         # ticks (timescale 1000)
    return {"n_frames": n, "timescale": 1000,
            "dur_a": dur_a, "dur_b": dur_a + 40,
            "run_a": (n + 1) // 2,        # first-run sample count
            "nbx": 1 + seed % 3, "nby": 1 + seed % 2}


def mjpeg_block_value(seed: int, fi: int, bx: int, by: int) -> int:
    """Even gray in [28, 226] — the synth_jpeg exact-decode trick with
    the frame index mixed in; shared with the oracle SQL."""
    return 2 * ((seed * 7 + fi * 13 + bx * 31 + by * 97) % 100) + 28


def _mjpeg_frame(seed: int, fi: int, nbx: int, nby: int) -> bytes:
    from .jpeg import encode_jpeg
    w, h = 8 * nbx, 8 * nby
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, :] = \
                mjpeg_block_value(seed, fi, bx, by)
    return encode_jpeg(px, subsample="444")


def synth_mp4_mjpeg(seed: int) -> bytes:
    """Legal minimal MJPEG/MP4: ftyp + mdat(JPEG frames) + moov with
    a full stbl.  Structure exercised per seed:

    - stts: TWO runs — first run_a frames at dur_a ticks, the rest at
      dur_b (run-length walk is load-bearing);
    - stsc/stco: 2 samples per chunk, odd frame counts add a
      (last_chunk, 1) run — the open-ended-run walk is load-bearing;
    - stsz: per-sample table (JPEG sizes genuinely vary);
    - stss: even seeds carry an explicit all-frames sync table, odd
      seeds OMIT the box (ISO 14496-12 8.6.2 all-sync default) —
      both keyframe paths land in the oracle;
    - every frame decodes EXACTLY (block-constant even-gray JPEG).
    """
    p = mjpeg_fixture_params(seed)
    frames = [_mjpeg_frame(seed, fi, p["nbx"], p["nby"])
              for fi in range(p["n_frames"])]
    return mux_mp4_mjpeg(frames, 8 * p["nbx"], 8 * p["nby"], p,
                         with_stss=(seed % 2 == 0))


def mux_mp4_mjpeg(frames: list[bytes], w: int, h: int, p: dict,
                  with_stss: bool = True) -> bytes:
    """The synth_mp4_mjpeg container muxer over CALLER-SUPPLIED JPEG
    frame bytes (r16: shared with the video perceptual-hash fixture,
    which muxes flat-quant frames of the dHash grid).  ``p`` supplies
    the sample-timing shape (n_frames/timescale/run_a/dur_a/dur_b);
    the stbl structure choices are unchanged."""
    n, ts = p["n_frames"], p["timescale"]
    assert len(frames) == n
    total = (p["run_a"] * p["dur_a"]
             + (n - p["run_a"]) * p["dur_b"])

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_body0 = len(ftyp) + 8            # first frame's file offset

    # chunking: 2 samples per chunk
    sizes = [len(f) for f in frames]
    chunk_offsets = []
    pos = mdat_body0
    for ci in range(0, n, 2):
        chunk_offsets.append(pos)
        pos += sum(sizes[ci:ci + 2])

    stsd_entry = (struct.pack(">I", 86) + b"jpeg" + bytes(6)
                  + struct.pack(">H", 1)          # data_ref_idx
                  + bytes(16)
                  + struct.pack(">HH", w, h)
                  + struct.pack(">II", 0x00480000, 0x00480000)  # dpi
                  + bytes(4) + struct.pack(">H", 1)  # frame_count
                  + bytes(32)                        # compressorname
                  + struct.pack(">Hh", 24, -1))      # depth, ct_id
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts_runs = [(p["run_a"], p["dur_a"])]
    if n > p["run_a"]:
        stts_runs.append((n - p["run_a"], p["dur_b"]))
    stts = _full(b"stts", 0, 0, struct.pack(">I", len(stts_runs))
                 + b"".join(struct.pack(">II", c, d)
                            for c, d in stts_runs))
    stsc_runs = [(1, 2, 1)]
    if n % 2:
        stsc_runs.append((len(chunk_offsets), 1, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                 + b"".join(struct.pack(">III", *r)
                            for r in stsc_runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0,
                 struct.pack(">I", len(chunk_offsets))
                 + b"".join(struct.pack(">I", o)
                            for o in chunk_offsets))
    stbl_children = stsd + stts + stsc + stsz + stco
    if with_stss:
        stbl_children += _full(
            b"stss", 0, 0, struct.pack(">I", n)
            + b"".join(struct.pack(">I", i + 1) for i in range(n)))
    stbl = _box(b"stbl", stbl_children)

    vmhd = _full(b"vmhd", 0, 1, bytes(8))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, ts, total)
                 + struct.pack(">HH", 0x55C4, 0))   # 'und', predef
    hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(13))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0)    # times, track 1
                 + struct.pack(">I", total) + bytes(8)
                 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + bytes(36)
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, bytes(8)
                 + struct.pack(">II", ts, total) + bytes(80))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def synth_mp4_mjpeg_frag(seed: int) -> bytes:
    """FRAGMENTED twin of synth_mp4_mjpeg: identical frames, sample
    timing, and closed forms, but in DASH/CMAF layout — the moov's
    stbl is EMPTY (stsd only + zero-entry tables), mvex/trex declares
    track 1 fragmentable, and the samples arrive as
    [moof(mfhd,traf(tfhd,tfdt,trun)) + mdat] pairs of 2 frames each:

    - tfhd: default-base-is-moof, NO base-data-offset (the modern
      CMAF shape) — offsets resolve relative to each moof start;
    - tfdt: version 1 (64-bit) explicit baseMediaDecodeTime, so a
      fragment dropped in isolation still timestamps correctly;
    - trun: data-offset + per-sample duration AND size present
      (sizes genuinely vary per JPEG frame).

    A parser that ignores fragments sees zero samples; a correct one
    reproduces EXACTLY the unfragmented twin's SampleInfo rows
    (offsets aside) — pinned by a unit test.
    """
    p = mjpeg_fixture_params(seed)
    n, ts = p["n_frames"], p["timescale"]
    frames = [_mjpeg_frame(seed, fi, p["nbx"], p["nby"])
              for fi in range(n)]
    durs = [p["dur_a"] if fi < p["run_a"] else p["dur_b"]
            for fi in range(n)]
    total = sum(durs)
    w, h = 8 * p["nbx"], 8 * p["nby"]

    ftyp = _box(b"ftyp", b"iso6" + struct.pack(">I", 512)
                + b"iso6cmfc")
    stsd_entry = (struct.pack(">I", 86) + b"jpeg" + bytes(6)
                  + struct.pack(">H", 1) + bytes(16)
                  + struct.pack(">HH", w, h)
                  + struct.pack(">II", 0x00480000, 0x00480000)
                  + bytes(4) + struct.pack(">H", 1)
                  + bytes(32) + struct.pack(">Hh", 24, -1))
    stbl = _box(b"stbl",
                _full(b"stsd", 0, 0, struct.pack(">I", 1)
                      + stsd_entry)
                + _full(b"stts", 0, 0, struct.pack(">I", 0))
                + _full(b"stsc", 0, 0, struct.pack(">I", 0))
                + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                + _full(b"stco", 0, 0, struct.pack(">I", 0)))
    vmhd = _full(b"vmhd", 0, 1, bytes(8))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, ts, total)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(13))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0)
                 + struct.pack(">I", total) + bytes(8)
                 + struct.pack(">HHHH", 0, 0, 0, 0) + bytes(36)
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(b"trex", 0, 0,
                 struct.pack(">IIIII", 1, 1, 0, 0, 0))
    mvex = _box(b"mvex", trex)
    mvhd = _full(b"mvhd", 0, 0, bytes(8)
                 + struct.pack(">II", ts, total) + bytes(80))
    moov = _box(b"moov", mvhd + trak + mvex)

    out = bytearray(ftyp + moov)
    dts = 0
    for f0 in range(0, n, 2):
        group = list(range(f0, min(f0 + 2, n)))
        trun_body = struct.pack(">I", len(group))
        # data_offset patched after moof length is known
        trun_flags = (_TRUN_DATA_OFFSET | _TRUN_SAMPLE_DUR
                      | _TRUN_SAMPLE_SIZE)
        sample_rows = b"".join(
            struct.pack(">II", durs[fi], len(frames[fi]))
            for fi in group)
        tfhd = _full(b"tfhd", 0, _TFHD_DEFAULT_BASE_IS_MOOF,
                     struct.pack(">I", 1))
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", dts))
        mfhd = _full(b"mfhd", 0, 0,
                     struct.pack(">I", f0 // 2 + 1))
        # two-pass: assemble with offset 0, then patch
        trun = _full(b"trun", 1, trun_flags,
                     trun_body + struct.pack(">i", 0) + sample_rows)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        data_offset = len(moof) + 8          # into mdat payload
        trun = _full(b"trun", 1, trun_flags,
                     trun_body + struct.pack(">i", data_offset)
                     + sample_rows)
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        out += moof + _box(b"mdat",
                           b"".join(frames[fi] for fi in group))
        dts += sum(durs[fi] for fi in group)
    return bytes(out)
