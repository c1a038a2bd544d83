"""Ogg Vorbis sample decoder tests (VERDICT r11 ask 7).

Validation strategy (the module docstring's honest boundary): every
property checkable WITHOUT third-party Vorbis bytes is pinned
externally — the Huffman assignment against the spec's own printed
codeword example, the IMDCT against a literal O(n^2) cos-sum, window
power complementarity, TDAC perfect reconstruction — and the
encode->decode fixtures then exercise the full in-stream-codebook
chain (including page-spanning packets and the residue-2 stereo
interleave)."""

import math
import struct

import numpy as np
import pytest

from harbourbridge_spark.pipeline import vorbis as V
from harbourbridge_spark.pipeline.ogg import (build_page, ogg_crc,
                                              ogg_packets)


def test_codeword_assignment_matches_spec_example():
    """The Vorbis I spec §3.2.1 prints the full assignment for
    lengths [2,4,4,4,4,2,3,3] — an EXTERNAL anchor (not an encoder
    round-trip) for the 'lowest valid codeword, entry order' rule."""
    got = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert got == {(0b00, 2): 0, (0b0100, 4): 1, (0b0101, 4): 2,
                   (0b0110, 4): 3, (0b0111, 4): 4, (0b10, 2): 5,
                   (0b110, 3): 6, (0b111, 3): 7}


def test_codeword_assignment_rejects_overspecified():
    with pytest.raises(ValueError, match="overspecified"):
        V.assign_codewords([1, 1, 1])
    # unused entries (length 0) are skipped, not assigned
    t = V.assign_codewords([0, 1, 0, 1])
    assert set(t.values()) == {1, 3}


def test_bitpacking_lsb_first_roundtrip():
    w = V.BitWriter()
    vals = [(5, 3), (1, 1), (100, 7), (0, 2), (123456, 20), (3, 2),
            (0xFFFFFFFF, 32)]
    for v, n in vals:
        w.write(v, n)
    r = V.BitReader(w.getvalue())
    assert [r.read(n) for _, n in vals] == [v for v, _ in vals]
    # LSB-first convention: value 1 written in 2 bits occupies the
    # byte's low bit
    w2 = V.BitWriter()
    w2.write(1, 2)
    assert w2.getvalue() == b"\x01"


def test_float32_pack_unpack_roundtrip():
    for x in [0.5, -0.25, 1e-6, 3.14159, 0.001953125, -8 * 0.0121,
              1.0, 2.0 ** -20]:
        y = V.float32_unpack(V.float32_pack(x))
        assert abs(y - x) <= abs(x) * 1e-6, (x, y)


def test_window_power_complementarity():
    for n in (64, 256):
        w = V.vorbis_window(n)
        assert np.allclose(w[:n // 2] ** 2 + w[n // 2:] ** 2, 1.0)


def test_imdct_matches_literal_cos_sum():
    spec = np.random.RandomState(0).randn(32)
    n = 64
    ref = np.array([
        sum(spec[k] * math.cos(math.pi / (2 * n)
                               * (2 * i + 1 + 32) * (2 * k + 1))
            for k in range(32)) for i in range(n)])
    assert np.allclose(V.imdct(spec), ref)


def test_tdac_perfect_reconstruction():
    """window -> mdct -> imdct -> window -> overlap-add is the
    identity for arbitrary signals (the Princen-Bradley property the
    whole decode chain rests on)."""
    rng = np.random.RandomState(1)
    x = rng.randn(64 * 6)
    win = V.vorbis_window(64)
    blocks = [V.mdct(win * x[b * 32:b * 32 + 64])
              for b in range((len(x) - 64) // 32 + 1)]
    prev, rec = None, []
    for X in blocks:
        out = V.imdct(X) * win
        if prev is not None:
            rec.append(prev[32:] + out[:32])
        prev = out
    rec = np.concatenate(rec)
    assert np.abs(rec - x[32:32 + len(rec)]).max() < 1e-9


def test_fixture_lattice_analysis_closed_form():
    """30 consecutive fixture ids (covers both rates, all block
    counts, twelve bins, mono AND stereo): full decode analysis ==
    the closed form the oracle SQL renders."""
    for mid in range(30):
        got = V.vorbis_tone_analysis(V.synth_vorbis_tone(mid))
        assert got == V.expected_vorbis_fields(mid), mid


def test_stereo_interleave_and_reconstruction_quality():
    mid = 10                                # stereo, 8 kHz
    rate, ch, s = V.decode_vorbis_samples(V.synth_vorbis_tone(mid))
    assert ch == 2 and np.allclose(s[0], s[1])
    k0 = 1 + mid % 12
    f = (2 * k0 + 1) * rate / 128.0
    t = np.arange(s.shape[1])
    err = min(np.abs(s[0] - 0.5 * np.cos(
        2 * math.pi * f * (t + t0) / rate)).max() for t0 in (0, 32))
    # quantization bound: 17-level grid over the MDCT peak
    assert err < 0.12, err


def test_ogg_packet_reassembly_across_pages():
    """A packet whose tail continues on the next page (continuation
    flag + 255-lacing) must reassemble byte-exactly — real Vorbis
    setup headers span pages."""
    payload = bytes(range(256)) * 3          # 768 bytes
    serial = 7
    # page 0: first 510 bytes as lacing [255, 255] (unterminated)
    head = struct.pack("<4sBBqIIIB", b"OggS", 0, 0x02, 0, serial, 0,
                       0, 2) + b"\xff\xff"
    body = payload[:510]
    crc = ogg_crc(head + body)
    page0 = head[:22] + struct.pack("<I", crc) + head[26:] + body
    # page 1: continuation flag, remaining 258 bytes = [255, 3]
    head = struct.pack("<4sBBqIIIB", b"OggS", 0, 0x01, 0, serial, 1,
                       0, 2) + b"\xff\x03"
    body = payload[510:]
    crc = ogg_crc(head + body)
    page1 = head[:22] + struct.pack("<I", crc) + head[26:] + body
    pkts = list(ogg_packets(page0 + page1))
    assert pkts == [payload]
    # a second whole-packet page via the muxer still parses
    tail = build_page(serial, 2, 0, 0x04, [b"tail-packet"])
    assert list(ogg_packets(page0 + page1 + tail)) \
        == [payload, b"tail-packet"]
    # dangling continuation is an error, not silence
    with pytest.raises(ValueError, match="unterminated"):
        list(ogg_packets(page0))


def test_rejections():
    blob = bytearray(V.synth_vorbis_tone(3))
    # corrupt a page body byte -> CRC mismatch from the page walk
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(blob)
        bad[-3] ^= 0xFF
        V.decode_vorbis_samples(bytes(bad))
    # floor types >= 2 are reserved — hard refusal (floor 0 now
    # PARSES and degrades per packet; see the salvage tests below)
    pkts = list(ogg_packets(bytes(blob)))
    with pytest.raises(ValueError, match="reserved|floor type"):
        w = V.BitWriter()
        w.write(0, 8)                        # 1 codebook
        w.write(0x564342, 24)
        w.write(1, 16)
        w.write(2, 24)
        w.write(0, 1)
        w.write(0, 1)
        w.write(0, 5)
        w.write(0, 5)
        w.write(0, 4)
        w.write(0, 6)
        w.write(0, 16)                       # time
        w.write(0, 6)                        # 1 floor
        w.write(2, 16)                       # floor type 2 (reserved)
        V.parse_setup_header(b"\x05vorbis" + w.getvalue(), 1)
    # truncated audio packet -> exhausted, never a wrong decode
    with pytest.raises(ValueError, match="exhausted|invalid"):
        rate, ch, bs0, bs1 = V.parse_id_header(pkts[0])
        s = V.parse_setup_header(pkts[2], ch)
        V.decode_audio_packet(pkts[3][:2], s, ch, bs0, bs1,
                              V.vorbis_window(bs0))


def test_spark_kernel_e2e(spark):
    """synth -> analyze through the Arrow kernel; a corrupt stream
    yields nulls, never a task failure."""
    import pyspark.sql.functions as F

    from harbourbridge_spark.pipeline.multimodal import (
        analyze_vorbis, synth_media)

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    got = {r.media_id: r for r in
           analyze_vorbis(synth_media(ids, "audio",
                                      fmt="vorbis_tone")).collect()}
    assert len(got) == 12
    for mid in range(12):
        want = V.expected_vorbis_fields(mid)
        r = got[mid]
        assert [r.duration_ms, float(r.sample_rate),
                float(r.n_channels), float(r.n_frames),
                r.dominant_hz] == want, mid
    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"OggS garbage"), None)],
        "media_id long, kind string, content binary, meta map<string,string>")
    row = analyze_vorbis(bad).first()
    assert row.duration_ms is None and row.dominant_hz is None


# ---------------------------------------------------------------------------
# counted per-packet degrade (VERDICT r12 ask 5)
# ---------------------------------------------------------------------------

def test_truncated_packet_degrades_counted():
    """A stream whose final audio packet is cut to one byte loses
    exactly that packet: silence in its place, degraded == 1, and
    every other sample bit-identical to the clean decode."""
    clean = V.synth_vorbis_tone(3)                 # id 3: %7!=2
    dam = V.encode_vorbis_tone(1 + 3 % 12, 4 * (1 + 3 % 3) + 1,
                               16000, truncate_last=True)
    r0, c0, s0 = V.decode_vorbis_samples(clean)
    r1, c1, s1, dg = V.decode_vorbis_samples_salvage(dam)
    assert (r0, c0) == (r1, c1) and dg == 1
    assert s0.shape == s1.shape
    half = s0.shape[1] - V._N2                     # last lap half
    assert np.allclose(s0[:, :half], s1[:, :half])
    # the degraded packet contributes zeros to the final half-lap:
    # what remains there is the previous block's windowed tail only
    assert not np.allclose(s0[:, half:], s1[:, half:])


def test_floor0_stream_degrades_every_packet():
    """floor0-mapped packets degrade BEFORE any floor bits are read:
    all-silence PCM of the right length, degraded == packet count;
    the floor0 CONFIG parse keeps the setup aligned (a desynced
    setup would be a hard ValueError, not a degrade)."""
    blob = V.encode_vorbis_tone(5, 9, 8000, floor0=True)
    rate, ch, samples, dg = V.decode_vorbis_samples_salvage(blob)
    assert (rate, ch, dg) == (8000, 1, 9)
    assert samples.shape == (1, 8 * V._N2)
    assert np.all(samples == 0.0)


def test_strict_decode_still_raises_on_damaged():
    with pytest.raises(ValueError):
        V.decode_vorbis_samples(
            V.encode_vorbis_tone(2, 5, 8000, floor0=True))
    with pytest.raises(ValueError, match="exhausted"):
        V.decode_vorbis_samples(
            V.encode_vorbis_tone(2, 5, 8000, truncate_last=True))


def test_salvage_lattice_closed_form():
    """expected_vorbis_salvage_fields over a lattice slice covering
    every damage class x rate x channels (the full 4620-id lattice
    was validated before registration, NOTES_DEV r13)."""
    for mid in range(0, 180):
        got = V.vorbis_salvage_analysis(V.synth_vorbis_tone_damaged(mid))
        want = V.expected_vorbis_salvage_fields(mid)
        assert len(got) == 6
        assert all(abs(g - w) < 1e-9 for g, w in zip(got, want)), mid


def test_salvage_equals_strict_on_clean_streams():
    for mid in (0, 1, 5, 6):
        blob = V.synth_vorbis_tone(mid)
        strict = V.vorbis_tone_analysis(blob)
        got = V.vorbis_salvage_analysis(blob)
        assert got[:5] == strict and got[5] == 0.0


def test_spark_salvage_kernel_e2e(spark):
    from pyspark.sql import functions as F

    from harbourbridge_spark.pipeline.multimodal import (
        analyze_vorbis_salvage, synth_media)

    ids = spark.range(23).select(F.col("id").alias("media_id"))
    got = {r.media_id: r for r in
           analyze_vorbis_salvage(
               synth_media(ids, "audio",
                           fmt="vorbis_tone_damaged")).collect()}
    assert len(got) == 23
    for mid in range(23):                  # ids 2,9,16 truncated; 4,15 floor0
        want = V.expected_vorbis_salvage_fields(mid)
        r = got[mid]
        assert [r.duration_ms, float(r.sample_rate),
                float(r.n_channels), float(r.n_frames),
                r.dominant_hz, float(r.degraded_packets)] == want, mid
    # header-fatal stream still quarantines to nulls
    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"OggS garbage"), None)],
        "media_id long, kind string, content binary, meta map<string,string>")
    row = analyze_vorbis_salvage(bad).first()
    assert row.dominant_hz is None and row.degraded_packets is None


def test_salvage_corruption_fuzz_contract():
    """Property (the WARC 600-case pattern): single-byte corruption
    at ANY offset either decodes — a damaged AUDIO page costs a
    counted resync event (r13 page salvage), never the stream — or
    raises ValueError (corruption that takes out a HEADER page
    leaves the stream without a decode identity).  Never any other
    exception, and never a geometry lie: on decode, the channel
    count matches the id header and the sample count is a multiple
    of the half-window.  200 deterministic corruption positions."""
    blob = V.synth_vorbis_tone(7)
    n = len(blob)
    decoded = raised = degraded_seen = 0
    for i in range(200):
        pos = (i * 7919) % n
        bad = bytearray(blob)
        bad[pos] ^= 0xA5
        try:
            rate, ch, samples, dg = \
                V.decode_vorbis_samples_salvage(bytes(bad))
        except ValueError:
            raised += 1
            continue
        decoded += 1
        assert samples.shape[0] == ch
        assert samples.shape[1] % V._N2 == 0
        assert dg >= 0
        degraded_seen += int(dg > 0)
    # all three behaviors must actually occur over 200 positions:
    # header-page hits raise, audio-page hits decode WITH a counted
    # degrade, and a mid-stream flip cannot silently vanish
    assert decoded > 0 and raised > 0 and degraded_seen > 0, \
        (decoded, raised, degraded_seen)


def test_page_salvage_clean_stream_identical():
    """ogg_packets_salvage on an undamaged stream == the strict walk
    with zero drops (the warc salvage-vs-strict anchor pattern)."""
    from harbourbridge_spark.pipeline.ogg import ogg_packets_salvage

    blob = V.synth_vorbis_tone(4)
    pkts, dropped = ogg_packets_salvage(blob)
    assert dropped == 0
    assert pkts == list(ogg_packets(blob))


def test_damaged_audio_page_costs_itself():
    """Flip one byte inside the LAST audio page's body: the page
    drops (counted), every earlier packet decodes bit-identically,
    and the PCM just ends one lap earlier."""
    blob = bytearray(V.synth_vorbis_tone(3))     # 9 audio pages
    r0, c0, s0 = V.decode_vorbis_samples(bytes(blob))
    last = blob.rindex(b"OggS")
    blob[-1] ^= 0xA5                             # inside last body
    r1, c1, s1, dg = V.decode_vorbis_samples_salvage(bytes(blob))
    assert (r1, c1) == (r0, c0)
    assert dg == 1
    assert s1.shape[1] == s0.shape[1] - V._N2
    assert np.allclose(s1, s0[:, :s1.shape[1]])
