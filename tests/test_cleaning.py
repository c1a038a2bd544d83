"""CCNet line dedup / Gopher rules / C4 filters (pipeline/cleaning).

Hand-computed verdicts on a crafted corpus plus Spark-vs-DuckDB
parity on the fixture tables (the dual-engine template contract the
oracle gate re-checks at sf0.01)."""

import duckdb
import pytest

from harbourbridge_spark.pipeline import cleaning as C

DOCS_COLS = "doc_id long, lang string, source string, text string"


def _both(spark, rows, sql_fn):
    """Run the template on a crafted corpus in BOTH engines; assert
    identical sorted results; return them as a dict by doc_id."""
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.createDataFrame(rows, DOCS_COLS) \
        .createOrReplaceTempView("documents")
    sdf = spark.sql(sql_fn("spark")).toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR,"
                " source VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?,?)", rows)
    ddf = con.execute(sql_fn("duckdb")).df()
    cols = sorted(sdf.columns)
    assert sorted(ddf.columns) == cols
    a = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    b = ddf[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.astype(str).equals(b.astype(str)), (a, b)
    return {int(r.doc_id): r for r in sdf.itertuples()}


# 12 tokens -> 2 body lines; doc 77 repeats doc 3's first 6 tokens so
# its first body line is a cross-doc duplicate
_T3 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_T77 = "alpha beta gamma delta epsilon zeta one two three four five six"


def test_ccnet_line_dedup_hand_computed(spark):
    rows = [(3, "en", "s", _T3), (77, "en", "s", _T77)]
    got = _both(spark, rows, C.line_dedup_sql)
    # every doc carries the corpus-wide nav line; keep-first = doc 3
    # (min doc_id).  doc 77 additionally loses its duplicated first
    # body line: lpos 1 of doc 3 is (3+1)%4=0 -> NO terminal '.',
    # lpos 1 of doc 77 is (77+1)%4!=0 -> '.', so the two lines DIFFER
    # -> only the nav line dedups from doc 77.
    assert got[3].n_removed == 0
    assert got[77].n_removed == 1
    assert "all rights reserved site nav" in got[3].text_clean
    assert "all rights reserved site nav" not in got[77].text_clean
    # reassembly order: body lines before the nav tail
    assert got[3].text_clean.splitlines()[0].startswith("alpha beta")


def test_ccnet_identical_body_line_dedups(spark):
    """Two docs sharing a byte-identical line (same terminal-punct
    schedule): the later occurrence is removed."""
    rows = [(4, "en", "s", _T3), (8, "en", "s", _T3)]
    got = _both(spark, rows, C.line_dedup_sql)
    # (4+1)%4 and (8+1)%4 are both nonzero -> line 1 identical; line 2
    # schedules also agree ((4+2)%4=2, (8+2)%4=2) -> both body lines
    # plus nav dedup away from doc 8
    assert got[4].n_removed == 0
    assert got[8].n_removed == 3
    assert got[8].text_clean == ""


def test_gopher_rules_hand_computed(spark):
    # 60 words incl. >= 2 Gopher stopwords -> passes word count; a
    # 10-word doc fails it; a doc with 20% symbol words fails the
    # symbol rule
    long_text = ("the of " + " ".join(f"word{i}" for i in range(58)))
    short_text = "the of just a few words here now ok end"
    symbols = ("the of " + " ".join(
        "#" if i % 5 == 0 else f"tok{i}" for i in range(58)))
    rows = [(1, "en", "s", long_text), (2, "en", "s", short_text),
            (3, "en", "s", symbols)]
    got = _both(spark, rows, C.gopher_rules_sql)
    assert got[1].rule_word_count == 1 and got[1].keep == 1
    assert got[2].rule_word_count == 0 and got[2].keep == 0
    assert got[3].rule_symbol_ratio == 0 and got[3].keep == 0
    # symbol doc: 12 '#' of 60 words -> 12*10 > 60 trips the rule
    assert got[3].n_words == 60


def test_c4_rules_hand_computed(spark):
    # doc 7 gets the javascript line (7%7=0): present in n_lines but
    # never kept; doc 11 gets the brace line -> page dropped whole
    base = " ".join(f"word{i}" for i in range(36))   # 6 body lines
    rows = [(7, "en", "s", base), (11, "en", "s", base),
            (13, "en", "s", base)]
    got = _both(spark, rows, C.c4_clean_sql)
    assert got[11].has_brace == 1 and got[11].page_keep == 0
    assert got[11].text_clean == ""
    assert got[7].has_brace == 0
    assert "javascript" not in got[7].text_clean
    # body lines with (doc_id+pos)%4==0 lack terminal punct -> dropped
    for d in (7, 13):
        for ln in got[d].text_clean.splitlines():
            assert ln[-1] in ".!?"
    # nav line (no punct) never survives C4
    assert "site nav" not in got[13].text_clean


def test_c4_min_sentence_page_rule(spark):
    """A page with fewer than 5 surviving sentences is dropped whole
    (the C4 page rule), even with zero bad lines."""
    rows = [(2, "en", "s", "only six words here so far now")]
    got = _both(spark, rows, C.c4_clean_sql)
    assert got[2].n_kept < 5 and got[2].page_keep == 0


@pytest.mark.parametrize("sql_fn", [C.line_dedup_sql,
                                    C.gopher_rules_sql,
                                    C.c4_clean_sql])
def test_fixture_parity_spark_vs_duckdb(spark, sql_fn):
    """Dual-engine parity on the real sf0.001 fixture — the same
    check the driver's oracle gate runs at sf0.01."""
    import pandas as pd

    from harbourbridge_spark.queries import load

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    load(spark, sf, "documents").createOrReplaceTempView("documents")
    sdf = spark.sql(sql_fn("spark")).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    ddf = con.execute(sql_fn("duckdb")).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    b = ddf[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))
