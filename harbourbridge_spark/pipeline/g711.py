"""G.711 companded audio (ITU-T G.711, 1972/1988): mu-law and A-law
expand/compress.  Telephony and call-center corpora store 8-bit
companded WAV (format codes 7 / 6); the expansion is pure integer
arithmetic straight from the recommendation — segment exponent +
4-bit mantissa around a bias — so the oracle entry computes the SAME
expansion in SQL and every feature is integer-exact.

Interop: OpenJDK's javax.sound encodes ULAW/ALAW WAVE files; the
conformance suite cross-checks this compressor byte-for-byte against
the JDK's on the shared PCM pattern (tests/fixtures/conformance/
conf_pcm16_*law*.wav).
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84                    # 132, mu-law bias


def _ulaw_expand_scalar(b: int) -> int:
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 7
    mant = b & 0x0F
    val = (((mant << 3) + _BIAS) << exp) - _BIAS
    return -val if sign else val


def _alaw_expand_scalar(b: int) -> int:
    b ^= 0x55
    # A-law sign convention is INVERTED vs mu-law: bit 7 SET means
    # positive (G.711 Table 1a; pinned byte-exact vs the JDK encoder)
    sign = b & 0x80
    exp = (b >> 4) & 7
    mant = b & 0x0F
    if exp == 0:
        val = (mant << 4) + 8
    else:
        val = ((mant << 4) + 0x108) << (exp - 1)
    return val if sign else -val


# 256-entry expansion tables (the form every implementation ships)
ULAW_TABLE = np.array([_ulaw_expand_scalar(b) for b in range(256)],
                      np.int16)
ALAW_TABLE = np.array([_alaw_expand_scalar(b) for b in range(256)],
                      np.int16)


def g711_expand(data: bytes, law: str) -> np.ndarray:
    """companded bytes -> int16 PCM (mu: +-32124, A: +-32256)."""
    table = ULAW_TABLE if law == "ulaw" else ALAW_TABLE
    return table[np.frombuffer(data, np.uint8)]


def ulaw_compress(x: int) -> int:
    """PCM16 -> mu-law byte (G.711 table 2a as arithmetic)."""
    sign = 0x80 if x < 0 else 0
    x = min(abs(x), 32635) + _BIAS
    exp = x.bit_length() - 8            # MSB position above bit 7
    mant = (x >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_compress(x: int) -> int:
    """PCM16 -> A-law byte (G.711 table 1a as arithmetic; sign bit
    SET for non-negative — the inverted A-law convention).  Negative
    magnitudes are taken as -x - 8 before the 13-bit shift — the
    quantizer's half-step asymmetry (CCITT reference C, pinned
    byte-exact against the JDK encoder on the conformance PCM)."""
    sign = 0x80 if x >= 0 else 0
    x = x if x >= 0 else max(0, -x - 8)
    x = min(x, 32767) >> 3              # to 13-bit magnitude
    if x >= 32:
        exp = x.bit_length() - 5
        mant = (x >> exp) & 0x0F
        val = (exp << 4) | mant
    else:
        val = x >> 1
    return (val | sign) ^ 0x55


def g711_compress(pcm: np.ndarray, law: str) -> bytes:
    fn = ulaw_compress if law == "ulaw" else alaw_compress
    return bytes(fn(int(v)) for v in pcm)
