"""Ogg container tests: fixture-lattice round-trips (Vorbis + Opus),
page-CRC rejection (single flipped bit), lacing edge cases, and the
Spark kernel degrade path."""

import struct

import pytest

from harbourbridge_spark.pipeline.ogg import (build_page,
                                              decode_ogg_meta,
                                              expected_ogg_fields,
                                              ogg_crc, ogg_pages,
                                              synth_ogg)


def test_ogg_lattice_roundtrip():
    for seed in range(30):
        assert decode_ogg_meta(synth_ogg(seed)) == \
            expected_ogg_fields(seed)


def test_crc_rejects_any_flipped_bit():
    blob = bytearray(synth_ogg(2))
    for pos in (5, 40, 80, len(blob) - 3):
        bad = bytearray(blob)
        bad[pos] ^= 0x01
        with pytest.raises(ValueError):
            decode_ogg_meta(bytes(bad))


def test_255_lacing_boundary():
    """Packets of exactly 255 and 510 bytes need 255-run lacing with
    a 0 terminator — the classic off-by-one spot."""
    for n in (254, 255, 256, 510):
        page = build_page(1, 0, 0, 0x02, [bytes(n)])
        (htype, granule, serial, seq, body), = list(ogg_pages(page))
        assert len(body) == n


def test_framing_rejections():
    with pytest.raises(ValueError, match="capture"):
        decode_ogg_meta(b"NotOggS" + bytes(40))
    # valid page but unknown codec payload
    page = build_page(1, 0, 0, 0x02, [b"\x01unknowncodec"])
    with pytest.raises(ValueError, match="unknown codec"):
        decode_ogg_meta(page)
    # first page without BOS flag
    page = build_page(1, 0, 0, 0x00, [b"\x01vorbis" + bytes(23)])
    with pytest.raises(ValueError, match="BOS"):
        decode_ogg_meta(page)


def test_opus_preskip_subtraction():
    """Opus duration subtracts pre-skip from the 48 kHz granule —
    seed 1: granule = 312 + 48000*k, duration exactly k seconds."""
    got = decode_ogg_meta(synth_ogg(1))
    assert got[0] == "opus" and got[3] == (1 + 1 % 5) * 1000.0


def test_spark_kernel_degrades_bad_rows(spark):
    from harbourbridge_spark.pipeline.multimodal import \
        ogg_meta_features
    good = synth_ogg(6)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)],
        "media_id long, content binary")
    got = ogg_meta_features(df).collect()
    assert len(got) == 1 and got[0].codec == "vorbis"
