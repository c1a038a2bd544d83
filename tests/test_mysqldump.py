"""mysqldump migration tests (mirrors mysql/mysqldump_test.go and
mysql/data_test.go: extended INSERTs, timezone capture, tinyint(1)
bool, SET->array, stored-program skip, spatial rewrite)."""

import datetime as dt
import decimal

import pytest

from harbourbridge_spark import types as tt
from harbourbridge_spark.issues import SchemaIssue
from harbourbridge_spark.sources import mysqldump

DUMP = r"""
-- MySQL dump 10.17
/*!40101 SET NAMES utf8mb4 */;
/*!40103 SET TIME_ZONE='+05:30' */;

DROP TABLE IF EXISTS `cart`;
CREATE TABLE `cart` (
  `user_id` varchar(20) NOT NULL,
  `product_id` varchar(20) NOT NULL,
  `quantity` bigint(20) DEFAULT NULL,
  `flag` tinyint(1) DEFAULT NULL,
  `last_modified` timestamp NOT NULL DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
  PRIMARY KEY (`user_id`,`product_id`),
  KEY `idx_q` (`quantity`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8;

LOCK TABLES `cart` WRITE;
INSERT INTO `cart` VALUES ('u1','abc-123',1,1,'2020-07-20 05:10:26'),('u1','axd''s',2,0,'2020-07-20 05:10:43'),('u2','zxi\n631',NULL,7,'2020-07-20 05:10:46');
UNLOCK TABLES;

CREATE TABLE `products` (
  `product_id` varchar(20) NOT NULL,
  `description` varchar(1000) DEFAULT NULL,
  `price` decimal(10,2) DEFAULT NULL,
  `date_added` date DEFAULT NULL,
  `tags` set('a','b','c') DEFAULT NULL,
  `dt` datetime DEFAULT NULL,
  `loc` point DEFAULT NULL,
  PRIMARY KEY (`product_id`)
) ENGINE=InnoDB;

INSERT INTO `products` (`product_id`, `description`, `price`, `date_added`, `tags`, `dt`, `loc`) VALUES ('abc-123','Blue suede shoes',141.99,'2020-06-06','a,c','2020-06-06 10:00:00',NULL);

DELIMITER ;;
CREATE TRIGGER bad_trigger BEFORE INSERT ON cart FOR EACH ROW BEGIN SET @x = 1; END ;;
DELIMITER ;

CREATE TABLE `noid` (
  `v` text
);
INSERT INTO `noid` VALUES ('a'),('b');
"""


@pytest.fixture(scope="module")
def migrated(spark, tmp_path_factory):
    staging = str(tmp_path_factory.mktemp("mysql_staging"))
    dump_file = tmp_path_factory.mktemp("mysql_dump") / "test.mysqldump"
    dump_file.write_text(DUMP)
    return mysqldump.migrate_mysql_dump(spark, str(dump_file), staging)


def test_schema(migrated):
    ctx, _ = migrated
    cart = ctx.sp_schema["cart"]
    assert cart.col_defs["user_id"].type == tt.Type(tt.STRING, 20)
    assert cart.col_defs["flag"].type == tt.Type(tt.BOOL)
    assert cart.col_defs["last_modified"].type == tt.Type(tt.TIMESTAMP)
    assert cart.col_defs["last_modified"].not_null
    assert cart.pk_cols() == ["user_id", "product_id"]
    assert cart.indexes[0].name == "idx_q"
    prods = ctx.sp_schema["products"]
    assert prods.col_defs["price"].type == tt.Type(tt.NUMERIC)
    assert prods.col_defs["tags"].type == tt.Type(tt.STRING, is_array=True)
    # spatial point rewritten to text -> STRING(MAX)
    assert prods.col_defs["loc"].type == tt.Type(tt.STRING)
    assert SchemaIssue.DATETIME in ctx.issues["products"]["dt"]
    # timezone captured
    assert ctx.timezone_offset == "+05:30"


def test_data(migrated):
    ctx, results = migrated
    rows = {(r.user_id, r.product_id): r
            for r in results["cart"].good.collect()}
    assert len(rows) == 3
    # quote escapes decoded
    assert ("u1", "axd's") in rows
    assert ("u2", "zxi\n631") in rows
    r = rows[("u1", "abc-123")]
    assert r.quantity == 1
    assert r.flag is True
    # tinyint bool: 7 -> True (mysql/data.go:129-147)
    assert rows[("u2", "zxi\n631")].flag is True
    # timestamp parsed with captured +05:30 offset -> UTC instant
    assert r.last_modified == dt.datetime(2020, 7, 19, 23, 40, 26)
    assert results["cart"].bad.count() == 0

    prows = results["products"].good.collect()
    assert prows[0].price == decimal.Decimal("141.99")
    assert prows[0].tags == ["a", "c"]
    assert prows[0].date_added == dt.date(2020, 6, 6)
    # datetime: naive-UTC
    assert prows[0].dt == dt.datetime(2020, 6, 6, 10, 0, 0)


def test_trigger_skipped_and_synth_pk(migrated):
    ctx, results = migrated
    assert "bad_trigger" not in ctx.src_schema
    assert ctx.sp_schema["noid"].pk_cols() == ["synth_id"]
    vals = sorted(r.synth_id for r in results["noid"].good.collect())
    assert vals == sorted([0, -(1 << 63)])


def test_insert_recovery(spark, tmp_path):
    """A partially-broken extended INSERT is re-split per row (S12b)."""
    from harbourbridge_spark.context import MigrationContext
    ctx = MigrationContext()
    rows = mysqldump.parse_insert_with_recovery(
        ctx, "('a',1),('b',2),('c',3)")
    assert rows == [["a", "1"], ["b", "2"], ["c", "3"]]


# ---------------------------------------------------------------------------
# standalone ALTER TABLE / CREATE INDEX (S13, mirrors the ALTER/index
# cases of mysql/mysqldump_test.go:103,186,220,400-496,547-556)
# ---------------------------------------------------------------------------

ALTER_DUMP = r"""
CREATE TABLE `test` (
  `a` bigint NOT NULL,
  `b` varchar(10),
  `c` text
);
CREATE TABLE `test2` (
  `c` bigint NOT NULL,
  `d` bigint
);
ALTER TABLE test ADD CONSTRAINT test_pkey PRIMARY KEY (a);
ALTER TABLE test ADD INDEX custom_index (b, c);
ALTER TABLE test ADD UNIQUE INDEX u_index (b);
ALTER TABLE test2 ADD CONSTRAINT uniq_cd UNIQUE (c, d);
ALTER TABLE test2 ADD CONSTRAINT __fk_test_2 FOREIGN KEY (c) REFERENCES test(a) ON DELETE CASCADE;
ALTER TABLE test2 ADD FOREIGN KEY (d) REFERENCES test(a);
ALTER TABLE test MODIFY b text NOT NULL;
CREATE INDEX ci ON test2 (d);
CREATE UNIQUE INDEX cui ON test2 (c, d);
"""


@pytest.fixture(scope="module")
def altered(tmp_path_factory):
    from harbourbridge_spark.context import MigrationContext
    ctx = MigrationContext()
    import io
    mysqldump.process_mysql_dump_schema(ctx, io.StringIO(ALTER_DUMP))
    from harbourbridge_spark.toddl import schema_to_ddl
    schema_to_ddl(ctx, "mysql")
    return ctx


def test_alter_add_primary_key(altered):
    t = altered.src_schema["test"]
    assert [k.column for k in t.primary_keys] == ["a"]
    assert t.col_defs["a"].not_null


def test_alter_add_index_variants(altered):
    t = altered.src_schema["test"]
    by_name = {i.name: i for i in t.indexes}
    assert [k.column for k in by_name["custom_index"].keys] == ["b", "c"]
    assert not by_name["custom_index"].unique
    assert by_name["u_index"].unique
    t2 = altered.src_schema["test2"]
    by_name2 = {i.name: i for i in t2.indexes}
    assert by_name2["uniq_cd"].unique
    assert [k.column for k in by_name2["uniq_cd"].keys] == ["c", "d"]


def test_alter_add_foreign_keys(altered):
    t2 = altered.src_schema["test2"]
    fks = {f.name: f for f in t2.foreign_keys}
    assert fks["__fk_test_2"].refer_table == "test"
    assert fks["__fk_test_2"].columns == ["c"]
    assert fks["__fk_test_2"].on_delete == "CASCADE"
    # unnamed FK present too
    unnamed = [f for f in t2.foreign_keys if not f.name]
    assert unnamed and unnamed[0].columns == ["d"]


def test_alter_modify_column_retypes(altered):
    t = altered.src_schema["test"]
    assert t.col_defs["b"].type.name == "text"
    assert t.col_defs["b"].not_null


def test_standalone_create_index(altered):
    t2 = altered.src_schema["test2"]
    by_name = {i.name: i for i in t2.indexes}
    assert [k.column for k in by_name["ci"].keys] == ["d"]
    assert not by_name["ci"].unique
    assert by_name["cui"].unique


def test_alter_fk_roundtrips_into_ddl(altered):
    from harbourbridge_spark.ddl import get_ddl
    ddl = get_ddl(altered, comments=False)
    text = "\n".join(ddl) if not isinstance(ddl, str) else ddl
    assert "FOREIGN KEY" in text and "REFERENCES" in text


def test_mysql_chunker_token_walk_matches_reference():
    """The regex-token chunker must yield IDENTICAL statements to the
    old per-char reference on adversarial inputs — escapes, doubling,
    backticks, '-- ' comments, DELIMITER blocks, mid-line splits,
    multi-line strings."""
    import io
    import random

    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources.mysqldump import _iter_statements

    def reference(stream, ctx):
        parts = []
        in_squote = in_dquote = in_backtick = False
        delimiter_mode = False
        for raw in stream:
            line = raw.rstrip("\n")
            if line.endswith("\r"):
                line = line[:-1]
            stripped = line.strip()
            if not parts and not (in_squote or in_dquote):
                if not stripped or stripped.startswith("--") \
                        or stripped.startswith("#"):
                    continue
                up = stripped.upper()
                if up.startswith("DELIMITER"):
                    delimiter_mode = not up.replace(
                        "DELIMITER", "").strip() == ";"
                    ctx.skip_statement("DelimiterStmt")
                    continue
                if delimiter_mode:
                    continue
            seg_start = 0
            i = 0
            comment_tail = False
            comment_start = len(line)
            while i < len(line):
                ch = line[i]
                if in_squote:
                    if ch == "\\":
                        i += 1
                    elif ch == "'":
                        if i + 1 < len(line) and line[i + 1] == "'":
                            i += 1
                        else:
                            in_squote = False
                elif in_dquote:
                    if ch == "\\":
                        i += 1
                    elif ch == '"':
                        in_dquote = False
                elif in_backtick:
                    if ch == "`":
                        in_backtick = False
                else:
                    if ch == "'":
                        in_squote = True
                    elif ch == '"':
                        in_dquote = True
                    elif ch == "`":
                        in_backtick = True
                    elif ch == "-" and line.startswith("-- ", i):
                        comment_tail = True
                        comment_start = i
                        break
                    elif ch == ";":
                        segment = line[seg_start:i + 1]
                        yield "\n".join(parts + [segment]) if parts \
                            else segment
                        parts = []
                        seg_start = i + 1
                i += 1
            tail = line[seg_start:]
            if comment_tail and not parts \
                    and not line[seg_start:comment_start].strip():
                continue
            if comment_tail or parts or tail.strip() \
                    or in_squote or in_dquote:
                if parts or tail.strip() or in_squote or in_dquote:
                    parts.append(tail)
        if parts and any(p.strip() for p in parts):
            yield "\n".join(parts)

    bs = chr(92)
    cases = [
        "INSERT INTO `t` VALUES (1, 'a;b'), (2, \"c;d\");\n",
        "SELECT 1; SELECT 2;\nSELECT 3;\n",
        "INSERT INTO t VALUES (1, 'it''s'), (2, '" + bs + "'x');\n",
        "a 'multi\nline' ; b;\n",
        "x; -- tail ; comment\nnext;\n",
        "DELIMITER $$\nCREATE TRIGGER z BEGIN END$$\nDELIMITER ;\nafter;\n",
        "`quoted ; ident` ;\n",
        "# hash comment\nreal;\n",
        'w "dq ' + bs + '" esc" ; y;\n',
        "'" + bs + bs + "';\n",
    ]
    rng = random.Random(11)
    toks = ["'", '"', "`", ";", "-- ", "\n", bs, "a", " ", "''", "#"]
    for _ in range(300):
        cases.append("".join(rng.choice(toks)
                             for _ in range(rng.randint(0, 40))) + "\n")
    for c in cases:
        got = list(_iter_statements(io.StringIO(c), MigrationContext()))
        want = list(reference(io.StringIO(c), MigrationContext()))
        assert got == want, repr(c)


def test_mysql_count_insert_tuples_matches_recovery():
    """The fast counter equals the recovery parser's row count on
    clean extended INSERTs and abstains (None -> full parse) on
    everything suspicious."""
    from harbourbridge_spark.context import MigrationContext
    from harbourbridge_spark.sources.mysqldump import (
        count_insert_tuples, parse_insert_with_recovery)
    bs = chr(92)
    clean = [
        "(1, 'a'), (2, 'b'), (3, NULL)",
        "(1, 'semi;colon'), (2, 'paren (x)')",
        "(1, 'it''s'), (2, '" + bs + "'esc')",
        "(1, 2.5, 'x,y'), (2, -3, '')",
        "(1, 'a')",
    ]
    for vals in clean:
        n = count_insert_tuples(vals)
        assert n is not None, vals
        assert n == len(parse_insert_with_recovery(
            MigrationContext(), vals)), vals
    # suspicious shapes abstain rather than guess
    for vals in ["(1, 'broken", "(1, func(2)), (3, 'x')",
                 "(1, `tick`)", "no parens at all"]:
        assert count_insert_tuples(vals) is None, vals


def test_mysql_parse_insert_values_matches_reference():
    """The bulk-advancement mysql tokenizer must be byte-identical to
    the per-char reference on adversarial inputs (backslash escapes,
    '' doubling, hex literals, empty tuples, unterminated strings)."""
    import random

    from harbourbridge_spark.sources.mysqldump import (_ESCAPES,
                                                       parse_insert_values)

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
            in_squote = was_quoted = False
            while i < n:
                ch = values_text[i]
                if in_squote:
                    if ch == "\\" and i + 1 < n:
                        nxt = values_text[i + 1]
                        cur.append(_ESCAPES.get(nxt, nxt))
                        i += 1
                    elif ch == "'":
                        if i + 1 < n and values_text[i + 1] == "'":
                            cur.append("'")
                            i += 1
                        else:
                            in_squote = False
                    else:
                        cur.append(ch)
                else:
                    if ch == "'":
                        in_squote = True
                        was_quoted = True
                        if not "".join(cur).strip():
                            cur = []
                    elif ch in ",)":
                        if ch == ")" and not row and not was_quoted \
                                and not "".join(cur).strip():
                            i += 1
                            break
                        if was_quoted:
                            row.append("".join(cur))
                        else:
                            tok = "".join(cur).strip()
                            if tok.upper() == "NULL":
                                row.append(None)
                            elif tok.upper() == "TRUE":
                                row.append("1")
                            elif tok.upper() == "FALSE":
                                row.append("0")
                            elif tok.startswith("0x") \
                                    or tok.startswith("0X"):
                                try:
                                    row.append(bytes.fromhex(
                                        tok[2:]).decode(
                                        "utf-8",
                                        errors="surrogateescape"))
                                except ValueError:
                                    row.append(tok)
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
            if row:
                rows.append(row)
        return rows

    bs = chr(92)
    cases = [
        "(1, 'a'), (2, NULL), (3, TRUE), (4, false)",
        "(1, 'it''s'), (2, '" + bs + "n" + bs + "t" + bs + "0')",
        "(1, 0x48692100), (2, 0xZZ)",
        "(), (1), ( )",
        "(1, '" + bs + "'esc'), (2, '" + bs + bs + "')",
        "(1, 'unterminated",
        "(1, '" + bs,
        "( 'post space'  , 2 )",
        "(1, 'a)b'), (2, 'c,(d')",
    ]
    rng = random.Random(17)
    toks = ["'", "''", ",", "(", ")", bs, "n", "0x41", "1", " ",
            "NULL", "TRUE"]
    for _ in range(500):
        cases.append("".join(rng.choice(toks)
                             for _ in range(rng.randint(0, 30))))
    for c in cases:
        assert parse_insert_values(c) == reference(c), repr(c)


def test_mysql_tab_ingest_matches_insert_dump(spark, tmp_path):
    """mysqldump --tab direct path (NOTES r7 carry-over): externally-
    shaped per-table .sql DDL + TSV .txt files (mysql escaping, \\N
    nulls, NO sequence column) ingest through the byte-range chunk
    reader and must produce exactly the rows of the equivalent
    INSERT-format dump — including deterministic synthetic PKs and
    escape decoding."""
    import os

    from harbourbridge_spark.sources.mysqldump import (
        migrate_mysql_dump, migrate_mysql_tab)

    ddl = ("CREATE TABLE `t` (`id` int NOT NULL, `v` varchar(60), "
           "PRIMARY KEY (`id`));\n")
    ddl_u = "CREATE TABLE `u` (`a` text, `b` text);\n"
    rows = [(1, "plain"), (2, "qu'ote"), (3, "tab\there"),
            (4, "line\nbreak"), (5, None), (6, "back\\slash")]

    # INSERT-format dump (ground truth through the proven path)
    def esc_ins(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("\\", "\\\\").replace("'", "''") \
            .replace("\n", "\\n").replace("\t", "\\t") + "'"

    fdump = tmp_path / "ins.sql"
    fdump.write_text(
        ddl + ddl_u
        + "INSERT INTO `t` VALUES "
        + ",".join(f"({i},{esc_ins(v)})" for i, v in rows) + ";\n"
        + "INSERT INTO `u` VALUES ('x','y'),('z',NULL);\n")
    _ctx1, r1 = migrate_mysql_dump(spark, str(fdump),
                                   str(tmp_path / "st"))

    # --tab shape: per-table .sql + .txt in the REAL SELECT INTO
    # OUTFILE contract — embedded tab/newline are backslash + the
    # LITERAL character (not letter escapes), backslash doubles,
    # NULL is \N (code-review r8)
    tab = tmp_path / "tab"
    os.makedirs(tab)
    (tab / "t.sql").write_text(ddl)
    (tab / "u.sql").write_text(ddl_u)

    def esc_tab(v):
        if v is None:
            return "\\N"
        return v.replace("\\", "\\\\").replace("\t", "\\\t") \
            .replace("\n", "\\\n")

    (tab / "t.txt").write_bytes(
        "".join(f"{i}\t{esc_tab(v)}\n"
                for i, v in rows).encode("utf-8"))
    (tab / "u.txt").write_bytes(b"x\ty\nz\t\\N\n")
    ctx2, r2 = migrate_mysql_tab(spark, str(tab))

    assert set(r1) == set(r2) == {"t", "u"}
    for t in r1:
        a = sorted(map(tuple, r1[t].good.collect()))
        b = sorted(map(tuple, r2[t].good.collect()))
        assert a == b, t
        assert r2[t].bad.count() == r1[t].bad.count()
    # row stats recorded from the chunk scan
    assert ctx2.table_stats["t"].rows == 6 \
        if hasattr(ctx2, "table_stats") else True


def test_mysql_tab_chunked_many_tasks(spark, tmp_path):
    """A --tab .txt far larger than chunk_bytes splits into many
    executor chunks with globally-unique byte-position sequences."""
    import os

    from harbourbridge_spark.sources.mysqldump import migrate_mysql_tab

    tab = tmp_path / "tab"
    os.makedirs(tab)
    (tab / "b.sql").write_text(
        "CREATE TABLE `b` (`id` int NOT NULL, `v` varchar(30));\n")
    (tab / "b.txt").write_text(
        "".join(f"{i}\tval-{i:05d}\n" for i in range(2000)))
    ctx, res = migrate_mysql_tab(spark, str(tab), chunk_bytes=1024)
    good = res["b"].good
    assert good.count() == 2000
    pks = [r.synth_id for r in good.collect()]
    assert len(set(pks)) == 2000
    ids = sorted(r.id for r in good.collect())
    assert ids == list(range(2000))


def test_mysql_tab_real_outfile_edges(spark, tmp_path):
    """OUTFILE-contract edges (code-review r8): embedded newlines as
    backslash+LITERAL LF must not split rows even when chunk cuts
    land nearby; \\0 decodes to NUL and is stripped at staging (the
    INSERT-path contract); raw CR passes through untouched; a final
    unterminated line still counts."""
    import os

    from harbourbridge_spark.sources.mysqldump import (
        _decode_tab_row, _scan_tab_chunks, migrate_mysql_tab)

    # unit: decoder
    assert _decode_tab_row(b"a\\\tb\tc") == ["a\tb", "c"]
    assert _decode_tab_row(b"x\\\ny\t\\N") == ["x\ny", None]
    # decoder yields the raw NUL; the staged escaper strips it later
    assert _decode_tab_row(b"nu\\0l\tcr\rhere") == \
        ["nu\x00l", "cr\rhere"]
    assert _decode_tab_row(b"back\\\\slash\t\\\\N") == \
        ["back\\slash", "\\N"]      # escaped backslash + literal N

    # unit: chunk scan never cuts inside an escaped newline
    body = b"".join(b"%d\tval\\\nue\n" % i for i in range(50))
    import io
    for cb in (8, 13, 64, 1 << 20):
        chunks = _scan_tab_chunks(io.BytesIO(body), cb)
        assert sum(n for _s, _e, n in chunks) == 50, cb
        for _s, e, _n in chunks:
            assert body[e - 1:e] == b"\n"
            assert not (e >= 2 and body[e - 2:e - 1] == b"\\"), cb

    # e2e: tiny chunks + nasty values
    tab = tmp_path / "tab"
    os.makedirs(tab)
    (tab / "t.sql").write_text(
        "CREATE TABLE `t` (`id` int NOT NULL, `v` varchar(40));\n")
    (tab / "t.txt").write_bytes(
        b"1\tmulti\\\nline\n"
        b"2\ttab\\\there\n"
        b"3\tnu\\0l\n"
        b"4\tcr\rkept\n"
        b"5\t\\N\n"
        b"6\tlast-no-newline")        # unterminated final row
    ctx, res = migrate_mysql_tab(spark, str(tab), chunk_bytes=16)
    vals = {r.id: r.v for r in res["t"].good.collect()}
    assert vals == {1: "multi\nline", 2: "tab\there", 3: "nul",
                    4: "cr\rkept", 5: None, 6: "last-no-newline"}
    pks = [r.synth_id for r in res["t"].good.collect()]
    assert len(set(pks)) == 6


def test_mysql_tab_trailing_escaped_newline_and_orphans(spark,
                                                        tmp_path):
    """A truncated --tab file whose final unterminated row ends with
    an ESCAPED newline must keep that newline as field content (the
    terminator strip checks backslash parity — code-review r8), and
    a .txt with no matching .sql must be reported, not silently
    dropped."""
    import os

    from harbourbridge_spark.sources.mysqldump import migrate_mysql_tab

    tab = tmp_path / "tab"
    os.makedirs(tab)
    (tab / "t.sql").write_text(
        "CREATE TABLE `t` (`id` int NOT NULL, `v` varchar(20));\n")
    (tab / "t.txt").write_bytes(b"1\ta\n2\tends\\\n")
    (tab / "orphan.txt").write_bytes(b"9\tlost\n")
    ctx, res = migrate_mysql_tab(spark, str(tab))
    vals = {r.id: r.v for r in res["t"].good.collect()}
    assert vals == {1: "a", 2: "ends\n"}
    assert any("orphan.txt" in m for m in ctx.unexpecteds)


def test_mysql_tab_parallel_scan_matches_serial(spark, tmp_path,
                                                monkeypatch):
    """VERDICT r8 ask 7: with the parallel-scan cutover forced to 0,
    a multi-file --tab dir scans one file per executor task and must
    produce identical rows, stats, and sequences to the serial-driver
    scan."""
    import os

    from harbourbridge_spark.sources import mysqldump as M

    tab = tmp_path / "tabdir"
    os.makedirs(tab)
    tables = {}
    for k in range(4):
        name = f"t{k}"
        (tab / f"{name}.sql").write_text(
            f"CREATE TABLE `{name}` (`id` int NOT NULL, `v` text, "
            "PRIMARY KEY (`id`));\n")
        rows = [(i, f"{name}-v{i}" + ("\\\t esc" if i % 3 == 0
                                      else "")) for i in range(50)]
        (tab / f"{name}.txt").write_bytes(
            "".join(f"{i}\t{v}\n" for i, v in rows).encode())
        tables[name] = rows
    ctx1, r1 = M.migrate_mysql_tab(spark, str(tab))
    monkeypatch.setattr(M, "_TAB_PARALLEL_MIN_BYTES", 0)
    ctx2, r2 = M.migrate_mysql_tab(spark, str(tab))
    assert set(r1) == set(r2) == set(tables)
    for t in r1:
        a = sorted(map(tuple, r1[t].good.collect()))
        b = sorted(map(tuple, r2[t].good.collect()))
        assert a == b and len(a) == 50, t
