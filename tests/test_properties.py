"""Property-based tests (hypothesis) for the pure driver-side kernels:
identifier legalization, bit-reversal, INSERT tokenizers, COPY escaping.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from harbourbridge_spark.mapping import fix_name

LEGAL = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")


@given(st.text(max_size=40))
@settings(max_examples=300)
def test_fix_name_always_legal_and_idempotent(name):
    fixed, changed = fix_name(name)
    assert LEGAL.match(fixed), (name, fixed)
    again, changed2 = fix_name(fixed)
    assert again == fixed
    assert changed2 is False
    if not changed:
        assert fixed == name


def _bit_reverse_py(x: int) -> int:
    """Python reference for the SQL bit-reversal expression: reverse the
    64-bit pattern, reinterpreted signed."""
    r = int(f"{x:064b}"[::-1], 2)
    return r - (1 << 64) if r >= (1 << 63) else r


@given(st.integers(min_value=0, max_value=(1 << 62)))
@settings(max_examples=200)
def test_bit_reverse_reference(x):
    # involution on the unsigned pattern
    r = _bit_reverse_py(x)
    rr = _bit_reverse_py(r % (1 << 64))
    assert rr == x or rr - (1 << 64) == x or rr == x - (1 << 64)
    # even sequences stay non-negative, odd go negative (top bit set)
    assert (r < 0) == (x % 2 == 1)


_SQL_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    max_size=30)


@given(st.lists(st.one_of(st.none(), _SQL_TEXT), min_size=1, max_size=5))
@settings(max_examples=300)
def test_mysql_insert_tokenizer_roundtrip(values):
    """values -> SQL literal tuple -> tokenizer == values."""
    from harbourbridge_spark.sources.mysqldump import parse_insert_values

    def lit(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    sql = "(" + ", ".join(lit(v) for v in values) + ")"
    rows = parse_insert_values(sql)
    assert rows == [values]


@given(st.lists(st.one_of(st.none(), _SQL_TEXT), min_size=1, max_size=5))
@settings(max_examples=300)
def test_pg_insert_tokenizer_roundtrip(values):
    from harbourbridge_spark.sources.pgdump import _parse_insert_values

    def lit(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("'", "''") + "'"

    sql = "(" + ", ".join(lit(v) for v in values) + ")"
    rows = _parse_insert_values(sql)
    assert rows == [values]


def _copy_escape(v):
    if v is None:
        return "\\N"
    return (v.replace("\x00", "").replace("\\", "\\\\")
             .replace("\t", "\\t").replace("\n", "\\n")
             .replace("\r", "\\r"))


def _copy_decode(s):
    """Python mirror of read_staged_table's sentinel decode chain."""
    if s == "\\N":
        return None
    out = s.replace("\\\\", "\x00")   # park escaped backslashes
    out = out.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")
    return out.replace("\x00", "\\")  # restore


@given(_SQL_TEXT)
@settings(max_examples=300)
def test_copy_escape_roundtrip(v):
    """The staging escape must survive the Spark-side decode chain.
    The original sequential-regex decode mangled a literal backslash
    followed by 'r' ('\\' + 'r' -> CR) — hypothesis found it; the
    sentinel chain must hold for arbitrary text (NUL is stripped at
    staging, so it maps to the NUL-free equivalent)."""
    s = _copy_escape(v)
    assert "\t" not in s and "\n" not in s and "\x00" not in s
    assert _copy_decode(s) == v.replace("\x00", "")


# ---------------------------------------------------------------------------
# pg array literal: random corpora through BOTH parsers (the JVM
# expression and the python reference) must agree exactly
# ---------------------------------------------------------------------------

def _render_pg_array(elems):
    """pg array_out: quote an element if it is empty, 'NULL', or has
    structural characters; escape backslash and double-quote."""
    parts = []
    for e in elems:
        if e is None:
            parts.append("NULL")
            continue
        needs_quote = (e == "" or e.upper() == "NULL"
                       or any(c in e for c in '{},"\\ \t\n'))
        if needs_quote:
            parts.append('"' + e.replace("\\", "\\\\")
                         .replace('"', '\\"') + '"')
        else:
            parts.append(e)
    return "{" + ",".join(parts) + "}"


def test_pg_array_jvm_parser_matches_python_reference(spark):
    import random
    from harbourbridge_spark import types as tt
    from harbourbridge_spark.convert import (_pg_array_expr,
                                             parse_pg_array_literal)

    rng = random.Random(20240813)
    alphabet = list("abcXYZ019 ,\"\\{}'\t\u00e9\u4e2d")
    corpora = []
    for _ in range(250):
        n = rng.randint(0, 5)
        elems = []
        for _ in range(n):
            if rng.random() < 0.1:
                elems.append(None)
            elif rng.random() < 0.1:
                elems.append("NULL")
            else:
                elems.append("".join(rng.choice(alphabet)
                                     for _ in range(rng.randint(0, 8))))
        corpora.append(elems)

    lits = [_render_pg_array(e) for e in corpora]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lits)],
                               "i int, v string")
    val, err = _pg_array_expr("v", tt.Type(tt.STRING), "postgres", "+00:00")
    got = {r.i: (r.arr, r.err) for r in
           df.select("i", val.alias("arr"), err.alias("err")).collect()}
    for i, (elems, lit) in enumerate(zip(corpora, lits)):
        want = parse_pg_array_literal(lit)
        assert want == elems, (lit, want)   # renderer sanity
        arr, e = got[i]
        assert e is False, (lit, arr)
        assert arr == elems, (lit, arr, elems)
