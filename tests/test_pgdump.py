"""End-to-end pg_dump migration tests with an in-memory fixture dump.

Mirrors the reference's dump->sink tests (postgres/pgdump_test.go:39-859)
and data-conversion tests (postgres/data_test.go): schema extraction,
COPY + INSERT data paths, scalar/array casts, bad-row quarantine,
synthetic keys.
"""

import datetime as dt
import decimal
import io

import pytest

from harbourbridge_spark import schema_ir as ir
from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.convert import SEQ_COL, convert_table
from harbourbridge_spark.issues import SchemaIssue
from harbourbridge_spark.sources import pgdump

DUMP = r"""
--
-- PostgreSQL database dump
--

SET statement_timeout = 0;
SET client_encoding = 'UTF8';
SET timezone = 'UTC';

CREATE TABLE public.basket (
    itemid text NOT NULL,
    owner character varying(36) NOT NULL,
    amount bigint
);

ALTER TABLE public.basket OWNER TO postgres;

CREATE TABLE public.stamps (
    id integer NOT NULL,
    t timestamp without time zone,
    tz timestamp with time zone
);

CREATE TABLE public.scalars (
    id integer NOT NULL,
    a boolean,
    b bytea,
    c date,
    d double precision,
    e integer,
    f numeric(38, 9),
    g text
);

CREATE TABLE public.arrs (
    id integer NOT NULL,
    a integer[],
    b text[]
);

CREATE TABLE public.nopk (
    v text
);

COPY public.basket (itemid, owner, quantity) FROM stdin;
\.

COPY public.basket (itemid, owner, amount) FROM stdin;
X1	u-1	2
X2	u-2	1
X2	u-3	125
X3	u-4	\N
\.

COPY public.stamps (id, t, tz) FROM stdin;
1	2019-10-28 15:00:00	2019-10-28 19:00:00+00
2	2019-10-28 15:00:00.123457	2019-10-28 15:00:00.123457+00
3	2019-10-28 15:00:00	2019-10-28 19:00:00+05:30
\.

COPY public.scalars (id, a, b, c, d, e, f, g) FROM stdin;
1	t	\\x00010203deadbeef	2019-10-28	99.9	42	1234567890123456789012345678.123456789	hi
2	f	\\x00010203424344	2018-11-28	12.3	6	1234567890123456789012345.1223456	hello
3	notabool	\\xzz	2019-99-99	xx	1.5	nan-ish	ok
\.

COPY public.arrs (id, a, b) FROM stdin;
1	{1,2,3}	{1,nice,foo}
2	{6}	{i,am,not,a,number}
3	{}	{"quoted item",NULL,"has \\" quote"}
4	{1,bad}	{x}
\.

COPY public.nopk (v) FROM stdin;
r0
r1
r2
\.

INSERT INTO public.basket (itemid, owner, amount) VALUES ('X9', 'u-9', 7), ('X10', 'u-10', NULL);

ALTER TABLE ONLY public.basket
    ADD CONSTRAINT basket_pkey PRIMARY KEY (owner, itemid);

ALTER TABLE ONLY public.stamps
    ADD CONSTRAINT stamps_pkey PRIMARY KEY (id);

ALTER TABLE ONLY public.scalars
    ADD CONSTRAINT scalars_pkey PRIMARY KEY (id);

ALTER TABLE ONLY public.arrs
    ADD CONSTRAINT arrs_pkey PRIMARY KEY (id);

ALTER TABLE ONLY public.basket
    ADD CONSTRAINT fk_owner FOREIGN KEY (owner) REFERENCES public.stamps(id);

CREATE INDEX idx_amount ON public.basket USING btree (amount DESC);
"""


@pytest.fixture(scope="module")
def migrated(spark, tmp_path_factory):
    staging = str(tmp_path_factory.mktemp("staging"))
    dump_file = tmp_path_factory.mktemp("dump") / "test.pg_dump"
    dump_file.write_text(DUMP)
    ctx, results = pgdump.migrate_pg_dump(spark, str(dump_file), staging)
    return ctx, results


def test_schema_extraction(migrated):
    ctx, _ = migrated
    basket = ctx.sp_schema["basket"]
    assert basket.col_names == ["itemid", "owner", "amount"]
    assert basket.col_defs["owner"].type == tt.Type(tt.STRING, 36)
    assert basket.pk_cols() == ["owner", "itemid"]
    assert [k.desc for k in basket.indexes[0].keys] == [True]
    stamps = ctx.sp_schema["stamps"]
    assert stamps.col_defs["t"].type == tt.Type(tt.TIMESTAMP)
    assert SchemaIssue.TIMESTAMP in ctx.issues["stamps"]["t"]
    arrs = ctx.sp_schema["arrs"]
    assert arrs.col_defs["a"].type == tt.Type(tt.INT64, is_array=True)
    assert ctx.location == "UTC"
    # FK captured
    assert basket.fks[0].refer_table == "stamps"


def test_copy_and_insert_rows(migrated):
    ctx, results = migrated
    rows = results["basket"].good.orderBy("itemid").collect()
    assert len(rows) == 6  # 4 COPY + 2 INSERT
    by_item = {r.itemid: r for r in rows}
    assert by_item["X2"].amount in (1, 125)
    assert by_item["X3"].amount is None
    assert by_item["X9"].amount == 7
    assert by_item["X10"].amount is None
    assert results["basket"].bad.count() == 0


def test_scalar_conversion_and_bad_rows(migrated):
    ctx, results = migrated
    good = results["scalars"].good.orderBy("id").collect()
    bad = results["scalars"].bad.collect()
    assert len(good) == 2
    assert len(bad) == 1
    r1 = good[0]
    assert r1.a is True
    assert bytes(r1.b) == bytes.fromhex("00010203deadbeef")
    assert r1.c == dt.date(2019, 10, 28)
    assert r1.d == 99.9
    assert r1.e == 42
    assert r1.f == decimal.Decimal("1234567890123456789012345678.123456789")
    assert r1.g == "hi"
    # the bad row flags every failing column
    errs = set(bad[0]["_hb_errs"])
    assert {"a", "b", "c", "d"} <= errs


def test_timestamp_conversion(migrated):
    _, results = migrated
    rows = results["stamps"].good.orderBy("id").collect()
    # session tz pinned to UTC: naive == UTC wall clock
    assert rows[0].t == dt.datetime(2019, 10, 28, 15, 0, 0)
    assert rows[0].tz == dt.datetime(2019, 10, 28, 19, 0, 0)
    assert rows[1].t == dt.datetime(2019, 10, 28, 15, 0, 0, 123457)
    assert rows[1].tz == dt.datetime(2019, 10, 28, 15, 0, 0, 123457)
    # +05:30 zone converted to UTC instant
    assert rows[2].tz == dt.datetime(2019, 10, 28, 13, 30, 0)


def test_array_conversion(migrated):
    _, results = migrated
    good = {r.id: r for r in results["arrs"].good.collect()}
    bad = results["arrs"].bad.collect()
    assert good[1].a == [1, 2, 3]
    assert good[1].b == ["1", "nice", "foo"]
    assert good[2].a == [6]
    assert good[2].b == ["i", "am", "not", "a", "number"]
    assert good[3].a == []
    assert good[3].b == ["quoted item", None, 'has " quote']
    # {1,bad} fails int element cast -> row quarantined
    assert len(bad) == 1 and bad[0].id == "4"


def test_synthetic_pk(migrated):
    ctx, results = migrated
    assert ctx.sp_schema["nopk"].pk_cols() == ["synth_id"]
    rows = results["nopk"].good.orderBy("v").collect()
    vals = [r.synth_id for r in rows]
    # bits.Reverse64 of 0,1,2 -> 0, 1<<63 (negative), 1<<62
    assert vals[0] == 0
    assert vals[1] == -(1 << 63)
    assert vals[2] == 1 << 62


def test_stats_and_report_counts(migrated):
    ctx, _ = migrated
    assert ctx.table_stats["basket"].rows == 6
    assert ctx.table_stats["scalars"].rows == 3
    assert ctx.statement_stats["CreateStmt"].schema == 5


def test_strict_array_quoted_comma(spark, tmp_path):
    """The pandas-UDF array path handles quoted commas — the documented
    limitation of the SQL fast path (postgres/data.go:242-398 parity)."""
    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.toddl import schema_to_ddl
    from harbourbridge_spark import schema_ir as ir
    from harbourbridge_spark import types as tt
    from harbourbridge_spark.convert import SEQ_COL, convert_table

    ctx = MigrationContext()
    ctx.src_schema["t"] = ir.SourceTable(
        name="t", col_names=["id", "a"],
        col_defs={
            "id": ir.SourceColumn("id", tt.SourceType("int4"), not_null=True),
            "a": ir.SourceColumn("a", tt.SourceType("text", array_bounds=(-1,))),
        },
        primary_keys=[ir.Key("id")])
    schema_to_ddl(ctx, "postgres")
    df = spark.createDataFrame(
        [(0, "1", '{"a,b",c,NULL,"NULL","q\\"uote"}'),
         (1, "2", "{}"),
         (2, "3", None)],
        f"{SEQ_COL} long, id string, a string")
    res = convert_table(ctx, df, "t", "postgres", strict_arrays=True)
    rows = {r.id: r.a for r in res.good.collect()}
    assert rows[1] == ["a,b", "c", None, "NULL", 'q"uote']
    assert rows[2] == []
    assert rows[3] is None
    assert res.bad.count() == 0


def test_default_array_path_quoted_comma(spark):
    """The default JVM array path now tokenizes with a quoted-token-or-
    non-comma-run regexp, so quoted elements containing commas convert
    correctly without the pandas UDF (postgres/data.go:242-398 parity);
    an unterminated quote quarantines the row instead of converting
    wrong."""
    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.toddl import schema_to_ddl
    from harbourbridge_spark import schema_ir as ir
    from harbourbridge_spark import types as tt
    from harbourbridge_spark.convert import SEQ_COL, convert_table

    ctx = MigrationContext()
    ctx.src_schema["t"] = ir.SourceTable(
        name="t", col_names=["id", "a"],
        col_defs={
            "id": ir.SourceColumn("id", tt.SourceType("int4"), not_null=True),
            "a": ir.SourceColumn("a", tt.SourceType("text", array_bounds=(-1,))),
        },
        primary_keys=[ir.Key("id")])
    schema_to_ddl(ctx, "postgres")
    df = spark.createDataFrame(
        [(0, "1", '{"a,b",c,NULL,"NULL","q\\"uote"}'),
         (1, "2", "{}"),
         (2, "3", None),
         (3, "4", '{ok,"unterminated}')],
        f"{SEQ_COL} long, id string, a string")
    res = convert_table(ctx, df, "t", "postgres")
    rows = {r.id: r.a for r in res.good.collect()}
    assert rows[1] == ["a,b", "c", None, "NULL", 'q"uote']
    assert rows[2] == []
    assert rows[3] is None
    bad = res.bad.collect()
    assert len(bad) == 1 and bad[0].id == "4"


def test_reference_data_error_matrix(spark, tmp_path):
    """The full per-type error matrix of postgres/pgdump_test.go
    ('Data conversion errors', :653-688): 8 good rows (incl. the
    all-types baseline), 7 quarantined — one per failing type,
    including '{42, 6}' (space makes the int element invalid) and the
    ANSI 'integer array' column type."""
    f = tmp_path / "errs.sql"
    f.write_text(
        "CREATE TABLE test (int8 int8, float8 float8, bool bool, "
        "timestamp timestamp, date date, bytea bytea, arr integer array);\n"
        "COPY public.test (int8, float8, bool, timestamp, date, bytea, arr) "
        "FROM stdin;\n"
        "7\t42.1\ttrue\t2019-10-29 05:30:00\t2019-10-29\t\\\\x0001beef\t{42,6}\n"
        "7\t\\N\t\\N\t\\N\t\\N\t\\N\t\\N\n"
        "7-\t\\N\t\\N\t\\N\t\\N\t\\N\t\\N\n"
        "\\N\t42.1\t\\N\t\\N\t\\N\t\\N\t\\N\n"
        "\\N\t4.2.1\t\\N\t\\N\t\\N\t\\N\t\\N\n"
        "\\N\t\\N\ttrue\t\\N\t\\N\t\\N\t\\N\n"
        "\\N\t\\N\ttruefalse\t\\N\t\\N\t\\N\t\\N\n"
        "\\N\t\\N\t\\N\t2019-10-29 05:30:00\t\\N\t\\N\t\\N\n"
        "\\N\t\\N\t\\N\t2019-100-29 05:30:00\t\\N\t\\N\t\\N\n"
        "\\N\t\\N\t\\N\t\\N\t2019-10-29\t\\N\t\\N\n"
        "\\N\t\\N\t\\N\t\\N\t2019-10-42\t\\N\t\\N\n"
        "\\N\t\\N\t\\N\t\\N\t\\N\t\\\\x0001beef\t\\N\n"
        "\\N\t\\N\t\\N\t\\N\t\\N\t\\ \\x0001beef\t\\N\n"
        "\\N\t\\N\t\\N\t\\N\t\\N\t\\N\t{42,6}\n"
        "\\N\t\\N\t\\N\t\\N\t\\N\t\\N\t{42, 6}\n"
        "\\.\n")
    import datetime as dt
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    good = results["test"].good.collect()
    bad = results["test"].bad.collect()
    assert len(good) == 8
    assert len(bad) == 7
    assert sorted(tuple(b._hb_errs) for b in bad) == [
        ("arr",), ("bool",), ("bytea",), ("date",), ("float8",),
        ("int8",), ("timestamp",)]
    base = [r for r in good if r.int8 == 7 and r.float8 is not None][0]
    assert base.float8 == 42.1 and base.bool is True
    assert base.timestamp == dt.datetime(2019, 10, 29, 5, 30)
    assert base.date == dt.date(2019, 10, 29)
    assert bytes(base.bytea) == b"\x00\x01\xbe\xef"
    assert base.arr == [42, 6]


def test_copy_without_column_list(spark, tmp_path):
    """COPY t FROM stdin; (no column list) is legal COPY — rows are in
    table column order."""
    f = tmp_path / "nocols.sql"
    f.write_text("CREATE TABLE test (a text, n bigint);\n"
                 "COPY public.test FROM stdin;\n"
                 "x\t1\ny\t2\n\\.\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    rows = {r.a: r.n for r in results["test"].good.collect()}
    assert rows == {"x": 1, "y": 2}


def test_copy_reordered_and_partial_columns(spark, tmp_path):
    """A COPY column list in a different order than CREATE TABLE (or
    listing a subset) must re-map fields, not assign them
    positionally."""
    f = tmp_path / "reorder.sql"
    f.write_text("CREATE TABLE test (a text, b text, n bigint);\n"
                 "COPY public.test (n, a, b) FROM stdin;\n"
                 "42\tx\ty\n\\.\n"
                 "COPY public.test (a) FROM stdin;\n"
                 "solo\n\\.\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    rows = {r.a: (r.b, r.n) for r in results["test"].good.collect()}
    assert rows["x"] == ("y", 42)
    assert rows["solo"] == (None, None)


def test_set_timezone_location_applied(spark, tmp_path):
    """S9+D11: zone-less timestamptz values are interpreted in the
    dump's SET timezone (postgres/pgdump.go:409-431 -> conv.Location,
    data.go:216-224 ParseInLocation), DST-aware; zone-carrying values
    and plain `timestamp` columns are unaffected."""
    f = tmp_path / "tz.sql"
    f.write_text(
        "SET timezone = 'America/New_York';\n"
        "CREATE TABLE t (id bigint, tz timestamp with time zone,\n"
        "                naive timestamp without time zone,\n"
        "                tzarr timestamptz[]);\n"
        "COPY public.t (id, tz, naive, tzarr) FROM stdin;\n"
        "1\t2019-10-28 15:00:00\t2019-10-28 15:00:00\t{2019-10-28 15:00:00}\n"
        "2\t2019-01-28 15:00:00\t\\N\t\\N\n"
        "3\t2019-10-28 15:00:00+05:30\t\\N\t\\N\n"
        "\\.\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    assert ctx.location == "America/New_York"
    rows = {r.id: r for r in results["t"].good.collect()}
    # EDT (-04) on Oct 28; EST (-05) on Jan 28
    assert rows[1].tz == dt.datetime(2019, 10, 28, 19, 0, 0)
    assert rows[2].tz == dt.datetime(2019, 1, 28, 20, 0, 0)
    # explicit zone wins over location
    assert rows[3].tz == dt.datetime(2019, 10, 28, 9, 30, 0)
    # plain timestamp stays naive-UTC
    assert rows[1].naive == dt.datetime(2019, 10, 28, 15, 0, 0)
    # array elements follow the same location chain
    assert rows[1].tzarr == [dt.datetime(2019, 10, 28, 19, 0, 0)]


def test_set_timezone_invalid_zone_logged(spark, tmp_path):
    """An unresolvable zone mirrors the reference's LoadLocation error
    path (pgdump.go:419-423): unexpected condition + statement error,
    location stays default (UTC)."""
    f = tmp_path / "badtz.sql"
    f.write_text(
        "SET timezone = 'Not/AZone';\n"
        "CREATE TABLE t (id bigint, tz timestamptz);\n"
        "COPY public.t (id, tz) FROM stdin;\n"
        "1\t2019-10-28 15:00:00\n"
        "\\.\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    assert ctx.location is None
    assert ctx.statement_stats["VariableSetStmt"].error == 1
    assert any("VariableSetStmt" in k for k in ctx.unexpecteds)
    # conversion fell back to UTC
    rows = results["t"].good.collect()
    assert rows[0].tz == dt.datetime(2019, 10, 28, 15, 0, 0)


def test_insert_estring_escapes():
    """E'...' escape strings decode with pg's C-style escape grammar —
    the reference's pg_query parser handles these natively
    (/root/reference/postgres/pgdump.go:88-105), so the hand tokenizer
    must too (it previously swallowed the rest of the tuple list)."""
    from harbourbridge_spark.sources.pgdump import _parse_insert_values

    assert _parse_insert_values(r"(901, E'esc\'ape'), (902, NULL)") \
        == [["901", "esc'ape"], ["902", None]]
    assert _parse_insert_values(r"(1, E'a\tb\nc\\d')") \
        == [["1", "a\tb\nc\\d"]]
    assert _parse_insert_values(r"(1, E'\x41\101é')") \
        == [["1", "AAé"]]
    assert _parse_insert_values(r"(1, E'dbl''q'), (2, e'low\tc')") \
        == [["1", "dbl'q"], ["2", "low\tc"]]
    # unknown escape falls back to the bare char (pg behavior)
    assert _parse_insert_values(r"(1, E'\q')") == [["1", "q"]]
    # plain strings are untouched; a stray E token alone is not a prefix
    assert _parse_insert_values(r"('no\escape')") == [["no\\escape"]]


def test_estring_surrogate_pairs_and_rejects(spark, tmp_path):
    """pg E'...' \\u escapes: a UTF-16 surrogate PAIR combines into
    one code point (PostgreSQL lexer behavior); a LONE surrogate or a
    \\U beyond U+10FFFF quarantines the STATEMENT instead of crashing
    the staging writer with UnicodeEncodeError later (code-review
    r7)."""
    from harbourbridge_spark.sources import pgdump
    f = tmp_path / "sur.sql"
    f.write_text(
        "CREATE TABLE public.t (id integer NOT NULL, v text, "
        "PRIMARY KEY (id));\n"
        "INSERT INTO public.t VALUES (1, E'\\ud83d\\ude00');\n"  # pair
        "INSERT INTO public.t VALUES (2, E'\\ud83d lone');\n"    # lone
        "INSERT INTO public.t VALUES (3, E'\\U00110000');\n"     # > max
        "INSERT INTO public.t VALUES (4, 'plain');\n")
    for mode in ("staged", "distributed"):
        ctx, res = pgdump.migrate_pg_dump(
            spark, str(f), str(tmp_path / mode), mode=mode)
        good = {r.id: r.v for r in res["t"].good.collect()}
        assert good == {1: "\U0001F600", 4: "plain"}, (mode, good)
    # the schema pass records the two rejected statements
    assert sum(1 for u in ctx.unexpecteds
               if "unparsable INSERT" in u) >= 2 \
        or ctx.statement_errors.get("InsertStmt", 0) >= 2


def test_count_insert_tuples_matches_parser():
    """The schema-pass fast tuple counter must agree with the full
    tokenizer on every adversarial VALUES shape (strings containing
    parens/commas/quotes, E-string escapes, nested parens, NULLs),
    and must route \\u/\\U statements to the full parser so invalid
    Unicode still errors at schema time."""
    import pytest as _pytest

    from harbourbridge_spark.sources.pgdump import (
        _count_insert_tuples, _parse_insert_values)
    bs = chr(92)
    cases = [
        "(1, 'a'), (2, 'b'), (3, 'c')",
        "(1, 'pa(ren')",
        "(1, 'two''quotes ))((')",
        "(1, E'esc" + bs + "'quote ( deep')",
        "(1, E'" + bs + "n" + bs + "t'), (2, NULL), (3, 'x,y')",
        # (function calls in VALUES are out of the pg_dump grammar:
        # both the parser and the counter treat nested parens as
        # garbage-in — no case for them here)
        "(42, '),(')",                   # tuple-separator INSIDE string
        "(1, 'a')",
        "(1, E'" + bs + "ud83d" + bs + "ude00')",   # slow path, valid
    ]
    for vals in cases:
        assert _count_insert_tuples(vals) \
            == len(_parse_insert_values(vals)), vals
    with _pytest.raises(ValueError):
        _count_insert_tuples("(1, E'" + bs + "ud83d lone')")


def test_strip_sql_comments_matches_reference_walk():
    """The span-copying strip (fast) must agree with the obvious
    per-char reference implementation on adversarial inputs —
    comments in/out of strings, doubling, unterminated constructs."""
    from harbourbridge_spark.sources.pgdump import strip_sql_comments

    def reference(stmt):
        out, i, n, in_squote = [], 0, len(stmt), False
        while i < n:
            ch = stmt[i]
            if in_squote:
                out.append(ch)
                if ch == "'":
                    if i + 1 < n and stmt[i + 1] == "'":
                        out.append("'")
                        i += 1
                    else:
                        in_squote = False
            elif ch == "'":
                in_squote = True
                out.append(ch)
            elif stmt.startswith("/*", i):
                end = stmt.find("*/", i + 2)
                i = (end + 1) if end != -1 else n
            elif stmt.startswith("--", i):
                end = stmt.find("\n", i)
                i = (end - 1) if end != -1 else n
            else:
                out.append(ch)
            i += 1
        return "".join(out)

    cases = [
        "SELECT 1; -- tail comment",
        "SELECT 1 /* mid */ + 2;",
        "SELECT '--not a comment' /* c */;",
        "SELECT 'it''s -- fine /* too */';",
        "a -- c1\nb -- c2\nc",
        "unterminated 'string -- kept",
        "/* unterminated block",
        "-- only a comment",
        "no comments at all",
        "'/*'||'*/' -- both in strings\nrest",
        "a /* one */ b /* two */ c -- three",
        "", "'", "--", "/*", "x'--'y",
    ]
    import random
    rng = random.Random(7)
    toks = ["'", "''", "--", "/*", "*/", "\n", ";", "a", " ", "$x$"]
    for _ in range(300):
        cases.append("".join(rng.choice(toks)
                             for _ in range(rng.randint(0, 40))))
    for c in cases:
        assert strip_sql_comments(c) == reference(c), repr(c)


def test_parse_insert_values_matches_reference():
    """The bulk-advancement tokenizer must be byte-identical to the
    per-char reference (kept here verbatim) on adversarial inputs —
    including its established quirks (post-string whitespace joins
    the quoted value; unterminated input discards the pending token),
    which downstream goldens pin."""
    import random

    from harbourbridge_spark.sources.pgdump import (_estring_escape,
                                                    _parse_insert_values)

    def reference(values_text):
        rows = []
        i, n = 0, len(values_text)
        while i < n:
            while i < n and values_text[i] != "(":
                i += 1
            if i >= n:
                break
            i += 1
            row, cur = [], []
            in_squote = in_estring = was_quoted = False
            while i < n:
                ch = values_text[i]
                if in_squote:
                    if in_estring and ch == "\\" and i + 1 < n:
                        dec, i = _estring_escape(values_text, i + 1)
                        cur.append(dec)
                        continue
                    if ch == "'":
                        if i + 1 < n and values_text[i + 1] == "'":
                            cur.append("'")
                            i += 1
                        else:
                            in_squote = False
                            in_estring = False
                    else:
                        cur.append(ch)
                else:
                    if ch == "'":
                        in_squote = True
                        was_quoted = True
                        pref = "".join(cur).strip()
                        in_estring = pref in ("E", "e")
                        if in_estring or not pref:
                            cur = []
                    elif ch in ",)":
                        if was_quoted:
                            row.append("".join(cur))
                        else:
                            tok = "".join(cur).strip()
                            if tok.upper() == "NULL":
                                row.append(None)
                            elif tok.upper() == "TRUE":
                                row.append("t")
                            elif tok.upper() == "FALSE":
                                row.append("f")
                            else:
                                row.append(tok)
                        cur = []
                        was_quoted = False
                        if ch == ")":
                            i += 1
                            break
                    else:
                        cur.append(ch)
                i += 1
            rows.append(row)
        return rows

    bs = chr(92)
    cases = [
        "(1, 'a'), (2, NULL), (3, TRUE), (4, false)",
        "(1, 'it''s'), (2, E'" + bs + "n" + bs + "t')",
        "( 'post space'  , 2 )",
        "('a' 'b', 3)",                     # adjacent quoted strings
        "(1, E'" + bs + "x41" + bs + "101')",
        "(e'" + bs + "'', ')",
        "(1, 'unterminated",
        "(1, E'" + bs,                      # backslash at EOF
        "(), (,), ( , )",
        "(1, 'a)b'), (2, 'c,(d')",
        "junk before (1) junk after",
        "",
        "(E 'spaced prefix')",
        "(  e  'lower prefix')",
        "(NOTNULL, nullx, TRUEISH)",
    ]
    rng = random.Random(13)
    toks = ["'", "''", ",", "(", ")", "E", "e", bs, "n", "1", " ",
            "NULL", "TRUE", bs + "u0041", bs + "x41"]
    for _ in range(500):
        cases.append("".join(rng.choice(toks)
                             for _ in range(rng.randint(0, 30))))

    def run_both(v):
        try:
            got = ("ok", _parse_insert_values(v))
        except ValueError as ex:
            got = ("err", str(ex))
        try:
            want = ("ok", reference(v))
        except ValueError as ex:
            want = ("err", str(ex))
        return got, want

    for c in cases:
        got, want = run_both(c)
        assert got == want, (repr(c), got, want)
