"""H.264 SPS parse tests: fixture-lattice round-trips through the
spec-symmetric bit writer, RBSP emulation-prevention fuzz, the avcC
walk, and rejection paths."""

import random

import pytest

from harbourbridge_spark.pipeline.h264 import (expected_sps_fields,
                                               parse_avcc, parse_sps,
                                               rbsp_escape,
                                               rbsp_unescape,
                                               sps_from_mp4, synth_mp4_avc,
                                               synth_sps)


def test_sps_lattice_roundtrip():
    """Every fixture seed: profile branch (baseline/main/high),
    chroma 4:2:0/4:2:2, all three pic-order-cnt layouts, interlace,
    crop rectangle -> exact SPS_FIELDS."""
    for seed in range(60):
        assert parse_sps(synth_sps(seed)) == expected_sps_fields(seed)


def test_h264_fixture_emulation_bytes():
    """The 00 00 03 emulation-prevention path is LOAD-BEARING: the
    poc-type-1 fixtures' large offsets force escape insertions, and
    the parse must still round-trip (previous test) — here we pin
    that the escapes actually occur."""
    n = sum(b"\x00\x00\x03" in synth_sps(s) for s in range(60))
    assert n >= 15, n


def test_rbsp_escape_fuzz_roundtrip():
    rng = random.Random(3)
    for _ in range(500):
        data = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255])
                     for _ in range(rng.randrange(0, 40)))
        assert rbsp_unescape(rbsp_escape(data)) == data


def test_avcc_walk_from_mp4():
    for seed in range(20):
        assert sps_from_mp4(synth_mp4_avc(seed)) == \
            expected_sps_fields(seed)


def test_rejections():
    with pytest.raises(ValueError, match="not an SPS"):
        parse_sps(bytes([0x68, 0x00]))            # PPS nal type
    with pytest.raises(ValueError, match="bad avcC"):
        parse_avcc(b"\x02\x00\x00\x00\x00\x00")   # wrong version
    with pytest.raises(ValueError, match="no avcC"):
        sps_from_mp4(b"\x00\x00\x00\x08ftyp")
    blob = bytearray(synth_sps(3))
    blob = blob[:6]                               # truncated stream
    with pytest.raises(ValueError):
        parse_sps(bytes(blob))


def test_spark_kernel_degrades_bad_rows(spark):
    import pyspark.sql.functions as F

    from harbourbridge_spark.pipeline.multimodal import \
        h264_sps_features
    good = synth_mp4_avc(4)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage")), (3, None)],
        "media_id long, content binary")
    got = h264_sps_features(df).collect()
    assert len(got) == 1 and got[0].media_id == 1
    assert (got[0].width, got[0].height) == \
        expected_sps_fields(4)[8:]
