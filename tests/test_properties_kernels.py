"""Property-based parity: the vectorized pandas_udf kernels vs the
dual-engine SQL templates (DuckDB side), over hypothesis-generated
corpora.

Alphabet notes: includes ASCII text/punct/digits, interior and edge
tabs/newlines (neither engine's trim() touches them; both regex \\s
classes split on them), runs of spaces, and lowercase/uppercase
Latin-1 accents + CJK (lower() agrees across Python/DuckDB/Java for
these).  EXCLUDED: non-ASCII space-category chars (U+00A0, U+3000...)
— DuckDB's trim() strips them while Spark's keeps them, a documented
template divergence (NOTES_DEV "cross-engine trim hazard") that is
orthogonal to the kernels.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from harbourbridge_spark.pipeline.dedup import (_hashed_gram_set,
                                                _minhash_md5_signature,
                                                _simhash_int,
                                                minhash_signature_sql,
                                                simhash_sql)

ALPHABET = ("abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
            " \t\n.,;:!?-_'\"()[]/" "éüñÉÜÑß中文日本語")

texts_strategy = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=60),
    min_size=1, max_size=6)


def _norm(s: str) -> str:
    # the JVM-side normalization the kernels' callers apply:
    # F.trim(F.lower(text)) — trim strips 0x20 only
    return s.lower().strip(" ")


def _con(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE raw(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)",
                    list(enumerate(texts)))
    con.execute("CREATE VIEW documents AS SELECT doc_id, text FROM raw")
    return con


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_minhash_kernel_matches_template(texts):
    con = _con(texts)
    rows = {r[0]: list(r[1:]) for r in con.execute(
        minhash_signature_sql("duckdb")).fetchall()}
    for i, t in enumerate(texts):
        assert _minhash_md5_signature(_norm(t)) == rows[i]


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_simhash_kernel_matches_template(texts):
    con = _con(texts)
    rows = dict(con.execute(simhash_sql("duckdb")).fetchall())
    for i, t in enumerate(texts):
        assert format(_simhash_int(_norm(t)), "032b") == rows[i]


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_gram_kernel_matches_template(texts):
    from harbourbridge_spark.pipeline.hashing import duck_hash48
    con = _con(texts)
    sql = """
    WITH g AS (
        SELECT doc_id, list_distinct(list_transform(
            list_distinct(list_transform(
                generate_series(1, greatest(len(tk) - 2, 1)),
                i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))),
            x -> {h})) AS grams
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
              FROM documents) _t
    ) SELECT doc_id, grams FROM g
    """.format(h=duck_hash48("x"))
    rows = dict(con.execute(sql).fetchall())
    for i, t in enumerate(texts):
        assert sorted(_hashed_gram_set(_norm(t))) == sorted(rows[i])
