"""Edge-case dump fixtures (FIXTURES.md §5): identifier collisions,
multi-dimensional arrays, INSERT without column list, inline unique,
bpchar default length, serial columns, mysql bit/negative-bool data."""

import pytest

from harbourbridge_spark import types as tt
from harbourbridge_spark.issues import SchemaIssue
from harbourbridge_spark.sources import mysqldump, pgdump

PG_EDGE_DUMP = r"""
CREATE TABLE public."tab le" (
    id integer NOT NULL,
    v text
);

CREATE TABLE public.tab_le (
    id integer NOT NULL,
    v text
);

CREATE TABLE public.edge (
    id serial,
    code character(1),
    fixed bpchar,
    grid integer[][],
    tag text UNIQUE,
    CONSTRAINT edge_pk PRIMARY KEY (id)
);

COPY public."tab le" (id, v) FROM stdin;
1	first
\.

COPY public.tab_le (id, v) FROM stdin;
2	second
\.

INSERT INTO public.edge VALUES (1, 'a', 'b', '{{1,2},{3,4}}', 'x');
"""


@pytest.fixture(scope="module")
def pg_edges(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edges")
    f = d / "edge.sql"
    f.write_text(PG_EDGE_DUMP)
    return pgdump.migrate_pg_dump(spark, str(f), str(d / "staging"))


def test_table_name_collision(pg_edges):
    ctx, results = pg_edges
    names = {ctx.to_target[s]["name"] for s in ("tab le", "tab_le")}
    assert "tab_le" in names
    assert len(names) == 2  # deduped, both present
    # each table got its own data
    for src in ("tab le", "tab_le"):
        assert results[src].good.count() == 1


def test_multidim_array_degrades_to_string(pg_edges):
    ctx, results = pg_edges
    edge = ctx.sp_schema["edge"]
    assert edge.col_defs["grid"].type == tt.Type(tt.STRING)
    assert SchemaIssue.MULTI_DIMENSIONAL_ARRAY in ctx.issues["edge"]["grid"]
    # the literal is preserved as text
    row = results["edge"].good.first()
    assert row.grid == "{{1,2},{3,4}}"


def test_serial_bpchar_unique(pg_edges):
    ctx, _ = pg_edges
    edge = ctx.sp_schema["edge"]
    assert edge.col_defs["id"].type == tt.Type(tt.INT64)
    assert edge.col_defs["id"].not_null  # serial implies NOT NULL
    assert SchemaIssue.SERIAL in ctx.issues["edge"]["id"]
    assert edge.col_defs["code"].type == tt.Type(tt.STRING, 1)
    assert edge.col_defs["fixed"].type == tt.Type(tt.STRING, 1)  # bare bpchar
    # inline UNIQUE -> unique index (T16)
    uniq = [i for i in edge.indexes if i.unique]
    assert any(k.col == "tag" for i in uniq for k in i.keys)


def test_insert_without_column_list(pg_edges):
    _, results = pg_edges
    row = results["edge"].good.first()
    assert row.id == 1 and row.tag == "x"


def test_copy_escape_fidelity_through_spark(spark, tmp_path):
    """A literal backslash followed by 'r', plus real tabs/newlines,
    must survive staging + the Spark decode chain (the sequential-regex
    decode turned '\\'+'r' into a carriage return)."""
    f = tmp_path / "esc.sql"
    # pg standard_conforming_strings: backslashes in '...' are literal
    backslash_r = "back" + "\\" + "rslash"
    f.write_text(
        "CREATE TABLE public.esc (id integer NOT NULL, v text);\n"
        "ALTER TABLE ONLY public.esc ADD CONSTRAINT e_pk PRIMARY KEY (id);\n"
        f"INSERT INTO public.esc VALUES (1, '{backslash_r}'), "
        "(2, 'tab\there'), (3, 'line\nbreak');\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    rows = {r.id: r.v for r in results["esc"].good.collect()}
    assert rows[1] == "back\\rslash"
    assert rows[2] == "tab\there"
    assert rows[3] == "line\nbreak"


MYSQL_EDGE_DUMP = r"""
CREATE TABLE `flags` (
  `id` bigint NOT NULL,
  `b` bit(8) DEFAULT NULL,
  `neg` tinyint(1) DEFAULT NULL,
  PRIMARY KEY (`id`)
);
INSERT IGNORE INTO `flags` VALUES (1, 'A', -3), (2, NULL, 0);
"""


def test_mysql_bit_and_negative_bool(spark, tmp_path):
    f = tmp_path / "edge.mysqldump"
    f.write_text(MYSQL_EDGE_DUMP)
    ctx, results = mysqldump.migrate_mysql_dump(
        spark, str(f), str(tmp_path / "staging"))
    flags = ctx.sp_schema["flags"]
    assert flags.col_defs["b"].type == tt.Type(tt.BYTES)
    assert flags.col_defs["neg"].type == tt.Type(tt.BOOL)
    rows = {r.id: r for r in results["flags"].good.collect()}
    # mysql bool-as-int: any value in [-128,127] converts as v != 0
    assert rows[1].neg is True
    assert rows[2].neg is False
    assert bytes(rows[1].b) == b"A"
    assert rows[2].b is None


def test_block_comment_with_semicolon(spark, tmp_path):
    """A /* */ comment containing ';' must not split the statement."""
    f = tmp_path / "bc.sql"
    f.write_text(
        "CREATE TABLE public.bc (\n"
        "    id integer NOT NULL, /* tricky; comment\n"
        "       spans lines; */\n"
        "    v text\n"
        ");\n"
        "INSERT INTO public.bc VALUES (1, 'ok');\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    assert ctx.sp_schema["bc"].col_names[:2] == ["id", "v"]  # + synth_id
    assert results["bc"].good.first().v == "ok"


def test_pg_multi_file_dump_appends_and_continues_seq(spark, tmp_path):
    """One table's data spanning two dump files (sharded dump): the
    second file must append to the staging TSV and continue the
    sequence, not truncate it — truncation loses rows AND restarts
    _hb_seq, colliding the bit-reversed synthetic PKs."""
    f1 = tmp_path / "part1.sql"
    f1.write_text(
        "CREATE TABLE public.sharded (v text);\n"
        "COPY public.sharded (v) FROM stdin;\n"
        "alpha\nbeta\n\\.\n")
    f2 = tmp_path / "part2.sql"
    f2.write_text(
        "COPY public.sharded (v) FROM stdin;\n"
        "gamma\ndelta\n\\.\n")
    ctx, results = pgdump.migrate_pg_dump(
        spark, [str(f1), str(f2)], str(tmp_path / "staging"))
    good = results["sharded"].good
    rows = good.collect()
    assert {r.v for r in rows} == {"alpha", "beta", "gamma", "delta"}
    # synthetic PKs distinct across files (sequence did not restart)
    synth = [r.synth_id for r in rows]
    assert len(set(synth)) == 4


def test_mysql_multi_file_dump_appends_and_continues_seq(spark, tmp_path):
    f1 = tmp_path / "part1.mysqldump"
    f1.write_text(
        "CREATE TABLE `sharded` (`v` text);\n"
        "INSERT INTO `sharded` VALUES ('alpha'), ('beta');\n")
    f2 = tmp_path / "part2.mysqldump"
    f2.write_text("INSERT INTO `sharded` VALUES ('gamma'), ('delta');\n")
    ctx, results = mysqldump.migrate_mysql_dump(
        spark, [str(f1), str(f2)], str(tmp_path / "staging"))
    good = results["sharded"].good
    rows = good.collect()
    assert {r.v for r in rows} == {"alpha", "beta", "gamma", "delta"}
    synth = [r.synth_id for r in rows]
    assert len(set(synth)) == 4


def test_multiple_statements_on_one_line(spark, tmp_path):
    """pgdump_test.go 'Multiple statements on one line': the chunker
    splits at every top-level semicolon, not just line ends."""
    f = tmp_path / "oneline.sql"
    f.write_text(
        "CREATE TABLE t1 (a text, b text); CREATE TABLE t2 (c text);"
        "ALTER TABLE ONLY t1 ADD CONSTRAINT t1_pkey PRIMARY KEY (a);"
        "ALTER TABLE ONLY t2 ADD CONSTRAINT t2_pkey PRIMARY KEY (c);"
        "INSERT INTO t1 VALUES ('x', 'y'); INSERT INTO t2 VALUES ('z');\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    assert sorted(ctx.src_schema) == ["t1", "t2"]
    assert [k.column for k in ctx.src_schema["t1"].primary_keys] == ["a"]
    assert [k.column for k in ctx.src_schema["t2"].primary_keys] == ["c"]
    assert results["t1"].good.first().a == "x"
    assert results["t2"].good.first().c == "z"


def test_copy_crlf_and_midline_header(spark, tmp_path):
    """pgdump_test.go 'COPY FROM with CRLF' + 'with spaces': CRLF rows
    decode cleanly (the \\. terminator is not a data row, values carry
    no trailing CR) and a COPY header may follow another statement on
    the same line."""
    f = tmp_path / "crlf.sql"
    f.write_bytes(
        b"CREATE TABLE test (a text NOT NULL, b text NOT NULL, n bigint);\r\n"
        b"ALTER TABLE ONLY test ADD CONSTRAINT test_pkey PRIMARY KEY (a, b);"
        b"COPY public.test (a, b, n) FROM stdin;\r\n"
        b"a1 \t b1\t42\r\n"
        b"a22\tb 99 \t6\r\n"
        b"\\.\r\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    rows = sorted((r.a, r.b, r.n) for r in results["test"].good.collect())
    assert rows == [("a1 ", " b1", 42), ("a22", "b 99 ", 6)]


def test_copy_space_before_semicolon(spark, tmp_path):
    f = tmp_path / "sp.sql"
    f.write_text("CREATE TABLE test (a text, b text);\n"
                 "COPY public.test (a, b) FROM stdin ;\n"
                 "1\t2\n\\.\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    assert results["test"].good.count() == 1


def test_mysql_multiple_statements_on_one_line(spark, tmp_path):
    f = tmp_path / "oneline.mysqldump"
    f.write_text(
        "CREATE TABLE `t1` (`a` bigint NOT NULL); "
        "CREATE TABLE `t2` (`b` text);"
        "ALTER TABLE t1 ADD CONSTRAINT t1_pkey PRIMARY KEY (a);\r\n"
        "INSERT INTO `t1` VALUES (1); INSERT INTO `t2` VALUES ('z');\r\n")
    ctx, results = mysqldump.migrate_mysql_dump(
        spark, str(f), str(tmp_path / "staging"))
    assert sorted(ctx.src_schema) == ["t1", "t2"]
    assert results["t1"].good.first().a == 1
    assert results["t2"].good.first().b == "z"


def test_comment_after_midline_semicolon_pg(spark, tmp_path):
    """A trailing '-- comment' after a mid-line semicolon must not seed
    the next statement's text — the data pass gates on
    startswith('INSERT') against un-stripped text, so a seeded comment
    would silently drop the following INSERT's rows."""
    f = tmp_path / "ctail.sql"
    f.write_text(
        "CREATE TABLE t (a text, n bigint); -- trailing comment\n"
        "INSERT INTO t VALUES ('x', 1);\n"
        "INSERT INTO t VALUES ('y', 2); -- another\n"
        "INSERT INTO t VALUES ('z', 3);\n")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f),
                                          str(tmp_path / "staging"))
    rows = sorted((r.a, r.n) for r in results["t"].good.collect())
    assert rows == [("x", 1), ("y", 2), ("z", 3)]
    # a comment inside a continuing statement is still kept as text
    f2 = tmp_path / "ctail2.sql"
    f2.write_text(
        "CREATE TABLE u (a text, -- inline comment\n"
        "                n bigint);\n"
        "INSERT INTO u VALUES ('q', 9);\n")
    ctx2, results2 = pgdump.migrate_pg_dump(spark, str(f2),
                                            str(tmp_path / "staging2"))
    assert sorted((r.a, r.n) for r in results2["u"].good.collect()) \
        == [("q", 9)]


def test_comment_after_midline_semicolon_mysql(spark, tmp_path):
    f = tmp_path / "ctail.mysqldump"
    f.write_text(
        "CREATE TABLE `t` (`a` text, `n` bigint); -- trailing comment\n"
        "INSERT INTO t VALUES ('x', 1);\n"
        "INSERT INTO t VALUES ('y', 2); -- another\n"
        "INSERT INTO t VALUES ('z', 3);\n")
    ctx, results = mysqldump.migrate_mysql_dump(
        spark, str(f), str(tmp_path / "staging"))
    rows = sorted((r.a, r.n) for r in results["t"].good.collect())
    assert rows == [("x", 1), ("y", 2), ("z", 3)]


def test_synth_id_clash_matches_reference():
    """postgres/pgdump_test.go "synth_id clash": the synthetic key
    dedups past existing synth_id* columns and lands on synth_id2."""
    import io

    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources import pgdump
    from harbourbridge_spark.toddl import schema_to_ddl

    ctx = MigrationContext()
    pgdump.process_pg_dump_schema(ctx, io.StringIO(
        "CREATE TABLE test (synth_id text, synth_id0 text, "
        "synth_id1 bigint);"))
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()
    t = ctx.sp_schema["test"]
    assert t.col_names == ["synth_id", "synth_id0", "synth_id1",
                           "synth_id2"]
    assert t.pk_cols() == ["synth_id2"]
    assert t.col_defs["synth_id2"].type.name == "INT64"


def test_fk_name_legalization_collision_matches_reference():
    """mysql/mysqldump_test.go "multiple foreign key test constraint
    name": `1_fk_test_2` legalizes to A_fk_test_2; `__fk_test_2`
    legalizes into the SAME name and dedups with the reference's
    counter suffix (A_fk_test_2_4)."""
    import io

    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources import mysqldump
    from harbourbridge_spark.toddl import schema_to_ddl

    dump = (
        "CREATE TABLE test (a SMALLINT, b text, PRIMARY KEY (a) );\n"
        "CREATE TABLE test3 (e SMALLINT, f text, PRIMARY KEY (e) );\n"
        "CREATE TABLE test2 (c SMALLINT, d SMALLINT, CONSTRAINT "
        "`1_fk_test_2` FOREIGN KEY (d) REFERENCES test (a) "
        "ON DELETE RESTRICT ON UPDATE CASCADE );\n"
        "ALTER TABLE test2 ADD CONSTRAINT __fk_test_2 "
        "FOREIGN KEY (c) REFERENCES test3(e);\n")
    ctx = MigrationContext()
    mysqldump.process_mysql_dump_schema(ctx, io.StringIO(dump))
    schema_to_ddl(ctx, "mysql")
    ctx.add_synthetic_pkeys()
    t2 = ctx.sp_schema["test2"]
    assert [(fk.name, fk.columns, fk.refer_table) for fk in t2.fks] == \
        [("A_fk_test_2", ["d"], "test"),
         ("A_fk_test_2_4", ["c"], "test3")]
    assert t2.pk_cols() == ["synth_id"]


def test_fast_insert_line_path_differential():
    """The count-check fast path for long INSERT lines must yield
    statement streams IDENTICAL to the exact token scanner — over
    adversarial contents (';' and '--' and quotes inside values,
    '' doubling, E-strings with backslash-quotes, dollar quotes,
    multi-statement lines).  The threshold is dropped to 0 so every
    line is OFFERED to the fast path; lines it declines take the
    exact scanner, and the combined output must equal the
    all-exact-scanner run."""
    import io

    from harbourbridge_spark.sources import pgdump as P

    lines = [
        "INSERT INTO t VALUES (1, 'plain'), (2, 'x');",
        "INSERT INTO t VALUES (1, 'semi;colon'), (2, 'a');",
        "INSERT INTO t VALUES (1, 'it''s'), (2, 'b');",
        "INSERT INTO t VALUES (1, E'esc\\'aped'), (2, 'c');",
        "INSERT INTO t VALUES (1, 'dash--dash'), (2, 'd');",
        "INSERT INTO t VALUES (1, 'sl/*ash*/'), (2, 'e');",
        "INSERT INTO t VALUES (1, $tag$dollar;$tag$), (2, 'f');",
        "INSERT INTO t VALUES (1, 'x'); INSERT INTO t VALUES (2, 'y');",
        "INSERT INTO t VALUES (1, 'no-semi'),",
        "(2, 'continued');",
        "INSERT INTO t VALUES (3, 'i18n '';'' déjà');",
        "INSERT INTO t VALUES (4, 'backslash \\\\ inside');",
    ]
    dump = "\n".join(lines) + "\n"

    def collect():
        out = []
        for stmt in P._iter_statements(io.StringIO(dump),
                                       lambda b: None):
            out.append((stmt.text, stmt.line))
        return out

    old = P._FAST_INSERT_MIN_LEN
    try:
        P._FAST_INSERT_MIN_LEN = 1 << 60      # never: exact only
        exact = collect()
        P._FAST_INSERT_MIN_LEN = 0            # always offered
        fast = collect()
    finally:
        P._FAST_INSERT_MIN_LEN = old
    assert fast == exact
    # sanity: the suite exercises real statements
    assert sum("INSERT" in s for s, _ in exact) >= 10


def test_bulk_copy_count_matches_line_iteration():
    """Schema-pass bulk COPY counting must equal per-line counting on
    every edge: CRLF rows, rows that START with '\\.', unterminated
    blocks at EOF, empty blocks, terminators straddling the 1 MiB
    chunk boundary."""
    import io

    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources import pgdump as P

    def schema_rows(dump: str) -> dict:
        ctx = MigrationContext()
        P.process_pg_dump_schema(ctx, io.StringIO(dump))
        return {t: s.rows for t, s in ctx.table_stats.items() if s.rows}

    hdr = "CREATE TABLE public.t (a integer, PRIMARY KEY (a));\n"
    cp = "COPY public.t (a) FROM stdin;\n"
    # plain, CRLF, row starting with \., empty, unterminated-at-EOF
    assert schema_rows(hdr + cp + "1\n2\n3\n\\.\n") == {"t": 3}
    assert schema_rows(hdr + cp + "1\r\n2\r\n\\.\r\n") == {"t": 2}
    assert schema_rows(hdr + cp + "\\.x\n\\.y\n\\.\n") == {"t": 2}
    assert schema_rows(hdr + cp + "\\.\n") == {}
    assert schema_rows(hdr + cp + "1\n2\n") == {"t": 2}
    assert schema_rows(hdr + cp + "1\n2") == {"t": 2}
    # terminator split across the bulk-read chunk boundary
    big = "x" * ((1 << 20) - len(hdr + cp) - 2) + "\n"
    assert schema_rows(hdr + cp + big + "\\.\n") == {"t": 1}
    # statements AFTER the block still parse (pushback correctness)
    dump = (hdr + cp + "1\n2\n\\.\n"
            + "CREATE TABLE public.u (b integer, PRIMARY KEY (b));\n"
            + "COPY public.u (b) FROM stdin;\n9\n\\.\n")
    got = schema_rows(dump)
    assert got == {"t": 2, "u": 1}


def test_mysql_fast_insert_line_path_differential():
    """The MySQL fast-line path must yield statement streams
    IDENTICAL to the exact token scanner over adversarial quoting:
    backslash escapes, backticked identifiers with quotes/semicolons,
    double-quoted strings, '--' comments, multi-statement lines,
    unterminated strings continuing across lines."""
    import io

    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources import mysqldump as M

    lines = [
        "INSERT INTO `t` VALUES (1, 'plain'), (2, 'x');",
        "INSERT INTO `t` VALUES (1, 'semi;colon'), (2, 'a');",
        "INSERT INTO `t` VALUES (1, 'it''s'), (2, 'b');",
        "INSERT INTO `t` VALUES (1, 'esc\\'aped'), (2, 'c');",
        "INSERT INTO `t` VALUES (1, 'back`tick'), (2, 'd');",
        "INSERT INTO `we;rd` VALUES (1, 'e');",
        "INSERT INTO `qu'ote` VALUES (1, 'f');",
        'INSERT INTO `t` VALUES (1, "dquoted;"), (2, \'g\');',
        "INSERT INTO `t` VALUES (1, 'dash -- dash'), (2, 'h');",
        "INSERT INTO `t` VALUES (1, 'x'); INSERT INTO `t` VALUES (2, 'y');",
        "INSERT INTO `t` VALUES (1, 'no-semi'),",
        "(2, 'continued');",
        "INSERT INTO `t` VALUES (3, 'a`x`b');",
        "INSERT INTO `t` VALUES (4, 'open",
        "still open; not a boundary');",
    ]
    dump = "\n".join(lines) + "\n"

    def collect():
        ctx = MigrationContext()
        return list(M._iter_statements(io.StringIO(dump), ctx))

    old = M._FAST_INSERT_MIN_LEN
    try:
        M._FAST_INSERT_MIN_LEN = 1 << 60
        exact = collect()
        M._FAST_INSERT_MIN_LEN = 0
        fast = collect()
    finally:
        M._FAST_INSERT_MIN_LEN = old
    assert fast == exact
    assert sum("INSERT" in s for s in exact) >= 12


def test_mysql_tuple_count_fast_path_empty_tuples():
    from harbourbridge_spark.sources import mysqldump as M

    assert M.count_insert_tuples("(1,'a'),(2,'b'),(3,'c')") == 3
    assert M.count_insert_tuples("(),(1),( ),(2)") == 2
    assert M.count_insert_tuples("(1,'(nested'),(2,')')") == 2
