"""Third-party-encoder conformance corpus (VERDICT r10 ask 4).

Every fixture under tests/fixtures/conformance/ was encoded by
OpenJDK 17's javax.imageio / javax.sound.sampled writers — an encoder
implementation that shares no code, tables, or authors with this
repo's decoders (generator: tools/GenConformance.java, run once; the
bytes are committed so this suite never needs Java).  Until this
corpus, every decoder was validated only against the repo's OWN
fixture encoders plus constructed streams; these tests convert
"spec-correct by construction" into "interoperable with a real
independent encoder":

- PNG: the JDK writer picks its own row filters and zlib strategy —
  decode must be pixel-exact.
- BMP: 24-bit BI_RGB bottom-up with padded strides — pixel-exact.
- GIF: the JDK's LZW packer and code-width schedule — pixel-exact.
- JPEG: the JDK's quant/Huffman tables and subsampling choices,
  baseline AND progressive — dims exact, mean abs error bounded
  (lossy), plus corner continuity.
- WAV/AIFF: the JDK's RIFF/AIFF chunk writers — sample-exact PCM16.

Formats the JDK cannot encode (WebP, FLAC, Y4M, PPM) remain validated
by construction only; that residual gap is documented in the README
codec matrix.
"""

import json
import os

import numpy as np
import pytest

from harbourbridge_spark.pipeline import multimodal as mm
from harbourbridge_spark.pipeline.gif import decode_gif_pixels
from harbourbridge_spark.pipeline.jpeg import decode_jpeg_pixels

CONF_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                        "conformance")

with open(os.path.join(CONF_DIR, "manifest.json")) as _f:
    MANIFEST = json.load(_f)


# ---- the pattern definitions, mirrored from GenConformance.java ----

def _gradient(w: int, h: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return np.stack([(x * 7 + y * 3) % 256,
                     (x * 5 + y * 13) % 256,
                     (x * 11 + y * 17) % 256], -1).astype(np.uint8)


def _smooth(w: int, h: int) -> np.ndarray:
    x = np.broadcast_to(np.arange(w)[None, :], (h, w))
    y = np.broadcast_to(np.arange(h)[:, None], (h, w))
    r = x * 255 // (w - 1) if w > 1 else np.zeros((h, w), int)
    g = y * 255 // (h - 1) if h > 1 else np.zeros((h, w), int)
    b = ((x + y) * 255 // (w + h - 2) if w + h > 2
         else np.zeros((h, w), int))
    return np.stack([r, g, b], -1).astype(np.uint8)


_PALETTE4 = np.array([[0, 0, 0], [255, 0, 0], [0, 128, 255],
                      [255, 255, 0]], np.uint8)


def _palette4(w: int, h: int) -> np.ndarray:
    idx = (np.arange(w)[None, :] + 2 * np.arange(h)[:, None]) % 4
    return _PALETTE4[idx]


def _pcm16(frames: int, channels: int) -> np.ndarray:
    """Interleaved int16: ch0 = (i*2731+12345) mod 2^16 - 2^15,
    ch1 = (i*1103+999) mod 2^16 - 2^15."""
    out = np.empty(frames * channels, np.int64)
    for c in range(channels):
        mul, add = (2731, 12345) if c == 0 else (1103, 999)
        out[c::channels] = (np.arange(frames) * mul + add) % 65536 \
            - 32768
    return out


def _expected_pixels(entry: dict) -> np.ndarray:
    return {"gradient": _gradient, "smooth": _smooth,
            "palette4": _palette4}[entry["pattern"]](
                entry["w"], entry["h"])


def _bytes(entry: dict) -> bytes:
    with open(os.path.join(CONF_DIR, entry["file"]), "rb") as f:
        return f.read()


def _by_format(fmt: str) -> list:
    rows = [e for e in MANIFEST if e["format"] == fmt]
    assert rows, f"manifest has no {fmt} fixtures"
    return rows


# ------------------------------ tests ------------------------------

def test_manifest_covers_every_fixture_file():
    files = {e["file"] for e in MANIFEST}
    on_disk = {f for f in os.listdir(CONF_DIR) if f != "manifest.json"}
    assert files == on_disk


@pytest.mark.parametrize("entry", _by_format("png"),
                         ids=lambda e: e["file"])
def test_jdk_png_decodes_pixel_exact(entry):
    px = mm._png_pixels(_bytes(entry))
    assert np.array_equal(px, _expected_pixels(entry))


@pytest.mark.parametrize("entry", _by_format("bmp"),
                         ids=lambda e: e["file"])
def test_jdk_bmp_decodes_pixel_exact(entry):
    px = mm.decode_pixels(_bytes(entry))
    assert np.array_equal(px, _expected_pixels(entry))


@pytest.mark.parametrize("entry", _by_format("gif"),
                         ids=lambda e: e["file"])
def test_jdk_gif_decodes_pixel_exact(entry):
    px = decode_gif_pixels(_bytes(entry))
    assert np.array_equal(px, _expected_pixels(entry))


@pytest.mark.parametrize("entry", _by_format("tiff"),
                         ids=lambda e: e["file"])
def test_jdk_tiff_decodes_pixel_exact(entry):
    """The JDK TIFF writer's strip layout, PackBits runs, and above
    all its TIFF-LZW EARLY code-width schedule — the one place a
    from-spec LZW most plausibly diverges (it did, by one entry,
    until these bytes pinned it; NOTES_DEV r11 TIFF section)."""
    from harbourbridge_spark.pipeline.tiff import tiff_pixels
    px = tiff_pixels(_bytes(entry))
    assert np.array_equal(px, _expected_pixels(entry))


@pytest.mark.parametrize("entry", _by_format("g711"),
                         ids=lambda e: e["file"])
def test_jdk_g711_compress_byte_exact_and_decode(entry):
    """The JDK's ULAW/ALAW codecs compressed the shared pcm16
    pattern; our G.711 compressor must produce the IDENTICAL bytes
    (this pinned two real divergences: the A-law inverted sign bit
    and its negative-magnitude -x-8 rule), and wav_samples must
    decode the companded file through format codes 7/6."""
    import struct

    from harbourbridge_spark.pipeline.g711 import (g711_compress,
                                                   g711_expand)
    raw = _bytes(entry)
    pos, data, fmt = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        csz = struct.unpack_from("<I", raw, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", raw, pos + 8)
        elif cid == b"data":
            data = raw[pos + 8:pos + 8 + csz]
        pos += 8 + csz + (csz & 1)
    law = entry["law"]
    assert fmt[0] == (7 if law == "ulaw" else 6)
    want_pcm = _pcm16(entry["frames"], 1)
    assert g711_compress(want_pcm, law) == data
    rate, n_ch, samples = mm.wav_samples(raw)
    assert (rate, n_ch) == (entry["rate"], entry["channels"])
    assert np.array_equal(samples * 32768.0,
                          g711_expand(data, law).astype(np.float64))


@pytest.mark.parametrize("entry", _by_format("jpeg"),
                         ids=lambda e: e["file"])
def test_jdk_jpeg_decodes_within_lossy_bound(entry):
    """JDK quant/Huffman tables and subsampling are the JDK's own
    choices; the decode must land close to the smooth source.  The
    measured MAEs on these fixtures are 1.97 / 5.13 / 2.08 — the 8.0
    bound is ~1.5x headroom over the worst (the 17x11 odd-size one,
    where partial-MCU edges weigh more), far below the ~64 MAE a
    channel swap, transposed basis, or wrong upsample would produce."""
    px = decode_jpeg_pixels(_bytes(entry))
    exp = _expected_pixels(entry)
    assert px.shape == exp.shape
    mae = float(np.abs(px.astype(np.float64)
                       - exp.astype(np.float64)).mean())
    assert mae < 8.0, f"{entry['file']}: MAE {mae:.2f}"
    # corners pin orientation: a vertical or horizontal flip of the
    # smooth ramp moves corner values by ~255, far beyond lossy noise
    for cy, cx in ((0, 0), (0, -1), (-1, 0), (-1, -1)):
        diff = np.abs(px[cy, cx].astype(int) - exp[cy, cx].astype(int))
        assert diff.max() < 48, (entry["file"], cy, cx, diff)


@pytest.mark.parametrize("entry", _by_format("wav"),
                         ids=lambda e: e["file"])
def test_jdk_wav_decodes_sample_exact(entry):
    rate, n_ch, samples = mm.wav_samples(_bytes(entry))
    assert (rate, n_ch) == (entry["rate"], entry["channels"])
    got = np.round(samples * 32768.0).astype(np.int64)
    assert np.array_equal(
        got, _pcm16(entry["frames"], entry["channels"]))


@pytest.mark.parametrize("entry", _by_format("aiff"),
                         ids=lambda e: e["file"])
def test_jdk_aiff_decodes_sample_exact(entry):
    rate, n_ch, samples = mm.aiff_samples(_bytes(entry))
    assert (rate, n_ch) == (entry["rate"], entry["channels"])
    got = np.round(samples * 32768.0).astype(np.int64)
    assert np.array_equal(
        got, _pcm16(entry["frames"], entry["channels"]))


def test_progressive_fixture_really_is_progressive():
    """The conformance corpus must actually exercise the progressive
    path: assert the JDK emitted SOF2 for the progressive fixture and
    SOF0 for the baseline ones, so a silent generator regression can't
    downgrade this suite to baseline-only."""
    for entry in _by_format("jpeg"):
        data = _bytes(entry)
        markers = set()
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            m = data[pos + 1]
            markers.add(m)
            if m == 0xDA:       # SOS: entropy data follows
                break
            pos += 2 + int.from_bytes(data[pos + 2:pos + 4], "big")
        if entry.get("progressive"):
            assert 0xC2 in markers and 0xC0 not in markers
        else:
            assert 0xC0 in markers and 0xC2 not in markers
