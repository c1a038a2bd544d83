"""Engine-portable deterministic hashing.

The correctness gate compares Spark results against DuckDB, so every
hash used in dedup/similarity must produce the *same integer* in both
engines. Native hashes differ (Spark xxhash64/murmur vs DuckDB hash),
so we derive integers from md5 hex (identical everywhere):

    hash48(s) = int(md5(s)[:12], 16)   # 48 bits, fits comfortably in i64

Spark renders this with conv(); DuckDB 1.0 lacks conv(), so its SQL is
an ascii()-polynomial over the same 12 hex chars. MinHash permutations
are (a*h + b) mod P with P = 2^61-1; a bounded so a*h stays < 2^63.
"""

from __future__ import annotations

MERSENNE61 = (1 << 61) - 1
HASH_BITS = 48


def spark_hash48(expr: str) -> str:
    """Spark SQL for hash48 of a string expression."""
    return f"CAST(conv(substring(md5({expr}), 1, 12), 16, 10) AS BIGINT)"


def duck_hash48(expr: str) -> str:
    """DuckDB SQL for the same value: polynomial over the hex chars
    (ascii(c) - 87 for a-f, - 48 for 0-9)."""
    h = f"md5({expr})"
    terms = []
    for i in range(1, 13):
        digit = (f"(ascii(substring({h}, {i}, 1)) - "
                 f"CASE WHEN ascii(substring({h}, {i}, 1)) >= 97 "
                 f"THEN 87 ELSE 48 END)")
        terms.append(f"{digit} * CAST({16 ** (12 - i)} AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def hash48(expr: str, engine: str) -> str:
    return spark_hash48(expr) if engine == "spark" else duck_hash48(expr)


def spark_hash_slice(expr: str, start: int = 1, nhex: int = 15) -> str:
    """Spark SQL: integer from ``nhex`` hex chars of md5 starting at
    1-based ``start``. nhex <= 15 keeps the value < 2^60 < 2^63
    (conv returns a string; the CAST must not overflow BIGINT)."""
    assert 1 <= nhex <= 15 and start + nhex - 1 <= 32
    return (f"CAST(conv(substring(md5({expr}), {start}, {nhex}), 16, 10) "
            f"AS BIGINT)")


def duck_hash_slice(expr: str, start: int = 1, nhex: int = 15) -> str:
    """DuckDB twin: ascii()-polynomial over the same hex chars.
    Largest term is 15 * 16^(nhex-1) = 15 * 2^56 < 2^60; the full sum
    stays < 2^61, ANSI-overflow-safe."""
    assert 1 <= nhex <= 15 and start + nhex - 1 <= 32
    h = f"md5({expr})"
    terms = []
    for j in range(nhex):
        i = start + j
        digit = (f"(ascii(substring({h}, {i}, 1)) - "
                 f"CASE WHEN ascii(substring({h}, {i}, 1)) >= 97 "
                 f"THEN 87 ELSE 48 END)")
        terms.append(f"{digit} * CAST({16 ** (nhex - 1 - j)} AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def hash60(expr: str, engine: str, start: int = 1) -> str:
    """60-bit md5 slice (15 hex chars from 1-based ``start``).

    Sized for LINE/GRAM cardinality: at 100 TB a corpus holds
    10^10-10^11 distinct lines, where hash48's birthday term is
    N^2/2^49 ~ 10^5-10^7 false merges (each silently deleting an
    innocent line).  60 bits cuts that 4096x; pairing two disjoint
    slices (start=1 and start=16) gives 120 effective bits — zero
    expected collisions at any conceivable corpus size.  Document-
    cardinality keys (10^9 docs) stay on hash48: ~10^3 expected
    collisions, tolerable for dedup (see SCALE.md collision budget)."""
    if engine == "spark":
        return spark_hash_slice(expr, start, 15)
    return duck_hash_slice(expr, start, 15)


def hash31_poly(expr: str, n: int = 5) -> str:
    """Arithmetic 31-bit polynomial hash over the first ``n`` characters
    of a string expression — the cheap alternative to the md5-derived
    hash48 for fixed-width shingles. The SAME text runs in both engines:
    ascii() returns the Unicode code point in Spark and DuckDB alike
    (verified incl. non-BMP-adjacent cases), and ascii('') is 0 in both,
    so short tails degrade identically. Every intermediate stays well
    under 2^63 (code point < 2^21, running hash < 2^31, base 131 →
    products < 2^39), so the expression is ANSI-overflow-safe.

    Collision note: 31 bits vs hash48's 48 — fine for MinHash (both
    engines evaluate the identical expression, so collisions agree and
    the oracle comparison stays exact; the S-curve shifts negligibly)."""
    h = f"ascii(substring({expr}, 1, 1))"
    for j in range(2, n + 1):
        h = (f"(({h}) * 131 + ascii(substring({expr}, {j}, 1))) "
             f"% {1 << 31}")
    return f"({h})"


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for K permutations. a is odd and small
    enough that a * (2^48 - 1) + b < 2^63."""
    return [(2 * i + 3, 0x9E3779B9 + i * 0x85EBCA77) for i in range(k)]


def perm_sql(hash_expr: str, a: int, b: int) -> str:
    """(a*h + b) mod 2^61-1 — same text works in both engines."""
    return f"(({a} * {hash_expr} + {b}) % {MERSENNE61})"
