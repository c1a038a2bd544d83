"""pg_dump stream source (S1-S10, S26 in SURVEY §2.1).

Two-pass protocol, mirroring ProcessPgDump
(/root/reference/postgres/pgdump.go:50-84):

Pass 1 (schema): the dump is streamed once on the driver; DDL
statements (CREATE TABLE / ALTER TABLE / CREATE INDEX / SET) are parsed
into the source-schema IR. COPY data blocks are *skipped* but counted
(postgres/pgdump.go:137-141). DDL text is tiny relative to data, so a
driver-side parse is the right distribution boundary — exactly the
reference's structure.

Pass 2 (data): the dump is streamed again (the caller stages stdin to a
seekable file first, like getSeekable, conversion/conversion.go:378-406)
and every COPY block is split out to a per-table staging file, each row
prefixed with a line-sequence number. Spark then reads the staging
files distributed: split on tabs, decode COPY escapes, cast-project via
convert.py. INSERT statements are parsed on the driver and appended to
the same staging files (S8 folds INSERT rows into the same per-table
stream, postgres/pgdump.go:334-371).

Scale notes (100 TB): a single dump file is an inherently sequential
container — the driver-side splitter is I/O-bound, not CPU-bound, and
writes straight through to staging. Real deployments shard dumps into
many files (pg_dump -Fd directory format, or per-table dumps); this
source accepts a list of files and processes them independently, so
ingest parallelism scales with file count while every expensive step
(escape decode, casts, error split, write) runs distributed on the
staged data. The expensive path never materializes rows on the driver.

Statement chunking: the reference accumulates lines until ';' and
re-parses on failure (readAndParseChunk, postgres/pgdump.go:88-120) to
survive semicolons inside strings. We chunk with a quote-aware scanner
(single quotes with '' escapes, $$ dollar quotes, -- and block
comments), which handles the same cases in one pass.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Iterator, Optional, TextIO, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema_ir as ir
from ..context import MigrationContext
from ..convert import SEQ_COL, ConversionResult, convert_table
from ..toddl import schema_to_ddl
from ..types import SourceType

# ---------------------------------------------------------------------------
# statement chunker (S2)
# ---------------------------------------------------------------------------

# table names may be schema-qualified and double-quoted (quoted parts
# can contain spaces): public."tab le"
_NAME = r'(?:[\w]+\.)?"[^"]+"|[\w\".]+'

COPY_RE = re.compile(
    rf"^COPY\s+(?P<table>{_NAME})\s*(?:\((?P<cols>[^)]*)\)\s*)?FROM\s+stdin"
    r"\s*;\s*$",
    re.IGNORECASE)


@dataclass
class Statement:
    text: str           # full statement text (without trailing data block)
    line: int           # 1-based line number where the statement started


@dataclass
class CopyBlock:
    table: str
    cols: list[str]
    first_row_line: int
    rows: Iterator[str]  # raw tab-separated row lines (terminator excluded)


def _iter_statements(stream: TextIO, on_copy) -> Iterator[Statement]:
    """Yield SQL statements from a pg_dump stream; COPY data blocks are
    handed to ``on_copy(CopyBlock)`` inline (they must be consumed
    before the iterator resumes).

    Statements split at every top-level semicolon — including several
    statements on ONE line (pg_dump doesn't emit those, but hand-edited
    and tool-generated dumps do; the reference's parser handles them,
    postgres/pgdump_test.go "Multiple statements on one line"). CRLF
    dumps are normalized by stripping one trailing CR per line — the
    COPY terminator ``\\.\\r`` otherwise reads as a data row and every
    last column gains a carriage return."""
    parts: list[str] = []
    start_line = 1
    in_squote = False
    in_dollar: Optional[str] = None
    in_block_comment = False
    lineno = 0
    it = iter(stream)

    def _read_copy_rows() -> Iterator[str]:
        nonlocal lineno
        for data_raw in it:
            lineno += 1
            data_line = data_raw.rstrip("\n")
            if data_line.endswith("\r"):
                data_line = data_line[:-1]
            if data_line == "\\.":
                return
            yield data_line

    def _try_copy(segment: str) -> bool:
        """A fresh statement segment that is a COPY header: hand the
        following data lines to on_copy. (pg format: data always starts
        on the next physical line, so the header ends its line.)"""
        m = COPY_RE.match(segment.strip())
        if not m:
            return False
        table = _clean_name(m.group("table"))
        # no column list = table column order (legal COPY; pg_dump
        # always lists columns, hand-written dumps may not)
        cols = [_clean_name(c.strip()) for c in
                (m.group("cols") or "").split(",") if c.strip()]
        on_copy(CopyBlock(table, cols, lineno + 1, _read_copy_rows()))
        return True

    for raw in it:
        lineno += 1
        line = raw.rstrip("\n")
        if line.endswith("\r"):
            line = line[:-1]
        stripped = line.strip()
        if not parts and not in_block_comment:
            start_line = lineno
            if not stripped or stripped.startswith("--"):
                continue
            if not in_squote and in_dollar is None and _try_copy(line):
                continue
        # scan for top-level semicolons, tracking quotes, dollar
        # quotes, and /* */ block comments; split statements mid-line
        seg_start = 0
        copy_consumed = False
        comment_tail = False
        comment_start = len(line)
        i = 0
        while i < len(line):
            ch = line[i]
            if in_block_comment:
                if line.startswith("*/", i):
                    in_block_comment = False
                    i += 1
            elif in_squote:
                if ch == "'":
                    if i + 1 < len(line) and line[i + 1] == "'":
                        i += 1
                    else:
                        in_squote = False
            elif in_dollar is not None:
                if line.startswith(in_dollar, i):
                    i += len(in_dollar) - 1
                    in_dollar = None
            else:
                if ch == "'":
                    in_squote = True
                elif ch == "-" and line.startswith("--", i):
                    comment_tail = True
                    comment_start = i
                    break  # rest of line is a comment (kept as text)
                elif ch == "/" and line.startswith("/*", i):
                    in_block_comment = True
                    i += 1
                elif ch == "$":
                    m = re.match(r"\$[A-Za-z_]*\$", line[i:])
                    if m:
                        in_dollar = m.group(0)
                        i += len(m.group(0)) - 1
                elif ch == ";":
                    segment = line[seg_start:i + 1]
                    text = "\n".join(parts + [segment]) if parts \
                        else segment
                    yield Statement(text, start_line)
                    parts = []
                    seg_start = i + 1
                    start_line = lineno
                    rest = line[seg_start:]
                    if rest.strip() and _try_copy(rest):
                        copy_consumed = True
                        break
            i += 1
        if copy_consumed:
            continue
        tail = line[seg_start:]
        # a comment-only residue after a mid-line ';' must NOT seed the
        # next statement: the data pass gates on startswith('INSERT')
        # against un-stripped text, so leading comment text would
        # silently drop the following INSERT's rows
        if comment_tail and not parts \
                and not line[seg_start:comment_start].strip():
            continue
        if comment_tail or parts or tail.strip() \
                or in_squote or in_dollar is not None or in_block_comment:
            if parts or tail.strip() or in_squote or in_dollar is not None:
                parts.append(tail)
    if parts and any(p.strip() for p in parts):
        yield Statement("\n".join(parts), start_line)


def strip_sql_comments(stmt: str) -> str:
    """Remove /* */ and -- comments outside string literals (the DDL
    parsers see clean statement text; the chunker already guarantees
    statement boundaries)."""
    out: list[str] = []
    i, n = 0, len(stmt)
    in_squote = False
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


def _clean_name(name: str) -> str:
    """Strip quotes and the default 'public.' schema prefix, mirroring
    the reference's table naming (postgres/pgdump.go getTableName)."""
    name = name.strip().strip('"')
    parts = [p.strip('"') for p in name.split(".")]
    if len(parts) == 2 and parts[0] == "public":
        return parts[1]
    return ".".join(parts)


# ---------------------------------------------------------------------------
# DDL statement parsers (S5, S6, S7, S9, S10)
# ---------------------------------------------------------------------------

_CREATE_TABLE_RE = re.compile(
    rf"^CREATE\s+TABLE\s+(?P<name>{_NAME})\s*\((?P<body>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_ALTER_NOTNULL_RE = re.compile(
    rf"^ALTER\s+TABLE\s+(?:ONLY\s+)?(?P<table>{_NAME})\s+ALTER\s+COLUMN\s+"
    r"(?P<col>[\w\"]+)\s+SET\s+NOT\s+NULL\s*;?\s*$", re.IGNORECASE)
_ALTER_CONSTRAINT_RE = re.compile(
    rf"^ALTER\s+TABLE\s+(?:ONLY\s+)?(?P<table>{_NAME})\s+ADD\s+CONSTRAINT\s+"
    r"(?P<name>[\w\"]+)\s+(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)
_PK_RE = re.compile(r"^PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)", re.IGNORECASE)
_UNIQUE_RE = re.compile(r"^UNIQUE\s*\((?P<cols>[^)]*)\)", re.IGNORECASE)
_FK_RE = re.compile(
    rf"^FOREIGN\s+KEY\s*\((?P<cols>[^)]*)\)\s+REFERENCES\s+"
    rf"(?P<ref>{_NAME})\s*\((?P<refcols>[^)]*)\)"
    r"(?:\s+ON\s+DELETE\s+(?P<ondelete>CASCADE|RESTRICT|SET\s+NULL|SET\s+DEFAULT|NO\s+ACTION))?"
    r"(?:\s+ON\s+UPDATE\s+(?P<onupdate>CASCADE|RESTRICT|SET\s+NULL|SET\s+DEFAULT|NO\s+ACTION))?",
    re.IGNORECASE)
_INDEX_RE = re.compile(
    rf"^CREATE\s+(?P<unique>UNIQUE\s+)?INDEX\s+(?P<name>[\w\"]+)\s+ON\s+"
    rf"(?P<table>{_NAME})\s+(?:USING\s+\w+\s+)?\((?P<cols>[^)]*)\)\s*;?\s*$",
    re.IGNORECASE)
_SET_TZ_RE = re.compile(
    r"^SET\s+(?:TIME\s+ZONE|timezone\s*=)\s*(?P<val>[^;]+);?\s*$",
    re.IGNORECASE)
_INSERT_RE = re.compile(
    rf"^INSERT\s+INTO\s+(?P<table>{_NAME})\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?VALUES\s*(?P<values>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

# column types that may appear in pg dumps, longest-match first; mirrors
# the id set of toSpannerType (postgres/toddl.go:107-163)
_MULTIWORD_TYPES = [
    "timestamp without time zone", "timestamp with time zone",
    "time without time zone", "time with time zone",
    "double precision", "character varying", "character",
]


def _parse_type(type_text: str) -> SourceType:
    """Parse a pg column type like 'character varying(20)[]',
    'numeric(38, 9)', or the ANSI form 'integer ARRAY[4]' into a
    SourceType (postgres also accepts ARRAY without brackets)."""
    t = type_text.strip()
    array_bounds: list[int] = []
    # ANSI SQL array syntax: '<type> ARRAY' or '<type> ARRAY[n]'
    m = re.search(r"\s+ARRAY(?:\s*\[\s*\d*\s*\])?\s*$", t, re.IGNORECASE)
    if m:
        array_bounds.append(-1)
        t = t[:m.start()].strip()
    # bracketed bounds, sized or not: 'integer[]', 'integer[4][2]'
    # (pg ignores the sizes but the DIMENSION count decides the
    # multi-dimensional-array issue, pg_dump.go type handling)
    while True:
        m = re.search(r"\[\s*(\d*)\s*\]\s*$", t)
        if not m:
            break
        array_bounds.append(int(m.group(1)) if m.group(1) else -1)
        t = t[:m.start()].strip()
    array_bounds.reverse()
    mods: tuple = ()
    m = re.search(r"\((?P<mods>[^)]*)\)\s*$", t)
    if m:
        mods = tuple(int(x.strip()) for x in m.group("mods").split(",")
                     if x.strip().lstrip("-").isdigit())
        t = t[:m.start()].strip()
    return SourceType(t.lower(), mods, tuple(array_bounds))


def _split_top_level(body: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas."""
    parts, depth, in_squote, cur = [], 0, False, []
    for ch in body:
        if in_squote:
            cur.append(ch)
            if ch == "'":
                in_squote = False
            continue
        if ch == "'":
            in_squote = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


_COL_CONSTRAINT_WORDS = re.compile(
    r"\s+(NOT\s+NULL|NULL|DEFAULT\s+.*|PRIMARY\s+KEY|UNIQUE|CHECK\s*\(.*|"
    r"REFERENCES\s+.*|GENERATED\s+.*)$",
    re.IGNORECASE | re.DOTALL)


def _parse_create_table(ctx: MigrationContext, stmt: str) -> bool:
    """S5 (postgres/pgdump.go:267-315)."""
    m = _CREATE_TABLE_RE.match(stmt.strip())
    if not m:
        return False
    name = _clean_name(m.group("name"))
    table = ir.SourceTable(name=name)
    for item in _split_top_level(m.group("body")):
        up = item.upper()
        if up.startswith("CONSTRAINT"):
            cm = re.match(r"CONSTRAINT\s+([\w\"]+)\s+(.*)$", item,
                          re.IGNORECASE | re.DOTALL)
            if cm:
                _apply_constraint(ctx, table, cm.group(2),
                                  _clean_name(cm.group(1)))
            continue
        if (up.startswith("PRIMARY KEY") or up.startswith("UNIQUE")
                or up.startswith("FOREIGN KEY") or up.startswith("CHECK")
                or up.startswith("EXCLUDE") or up.startswith("LIKE")):
            _apply_constraint(ctx, table, item, "")
            continue
        # column definition: name type [constraints]
        cm = re.match(r'^(?P<name>"[^"]+"|[\w$]+)\s+(?P<rest>.*)$', item,
                      re.DOTALL)
        if not cm:
            ctx.unexpected(f"unparsable column def: {item[:80]}")
            continue
        col_name = cm.group("name").strip('"')
        rest = cm.group("rest").strip()
        ignored = ir.Ignored()
        not_null = bool(re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE))
        unique = bool(re.search(r"\bUNIQUE\b", rest, re.IGNORECASE))
        is_pk = bool(re.search(r"\bPRIMARY\s+KEY\b", rest, re.IGNORECASE))
        if re.search(r"\bDEFAULT\b", rest, re.IGNORECASE):
            ignored.default = True
        if re.search(r"\bCHECK\b", rest, re.IGNORECASE):
            ignored.check = True
        if re.search(r"\bGENERATED\b.*\bIDENTITY\b", rest,
                     re.IGNORECASE | re.DOTALL):
            ignored.identity = True
        # strip trailing constraint words to isolate the type
        type_text = _COL_CONSTRAINT_WORDS.sub("", " " + rest).strip()
        st = _parse_type(type_text)
        if st.name in ("serial", "bigserial"):
            not_null = True  # serial implies NOT NULL in pg
        table.col_names.append(col_name)
        table.col_defs[col_name] = ir.SourceColumn(
            col_name, st, not_null=not_null, unique=unique, ignored=ignored)
        if is_pk:
            table.primary_keys.append(ir.Key(col_name))
            table.col_defs[col_name].not_null = True
    ctx.src_schema[name] = table
    ctx.schema_statement("CreateStmt")
    return True


def _apply_constraint(ctx: MigrationContext, table: ir.SourceTable,
                      text: str, name: str) -> None:
    """S10 (postgres/pgdump.go:523-633): normalize a table constraint."""
    text = text.strip()
    m = _PK_RE.match(text)
    if m:
        cols = [_clean_name(c) for c in m.group("cols").split(",") if c.strip()]
        table.primary_keys = [ir.Key(c) for c in cols]
        for c in cols:
            if c in table.col_defs:
                table.col_defs[c].not_null = True
        return
    m = _UNIQUE_RE.match(text)
    if m:
        cols = [_clean_name(c) for c in m.group("cols").split(",") if c.strip()]
        # UNIQUE constraint -> unique index (T16, postgres/pgdump.go:618-626)
        table.indexes.append(ir.SourceIndex(
            name=name, unique=True, keys=[ir.Key(c) for c in cols]))
        return
    m = _FK_RE.match(text)
    if m:
        table.foreign_keys.append(ir.SourceForeignKey(
            name=name,
            columns=[_clean_name(c) for c in m.group("cols").split(",") if c.strip()],
            refer_table=_clean_name(m.group("ref")),
            refer_columns=[_clean_name(c) for c in m.group("refcols").split(",") if c.strip()],
            on_delete=(m.group("ondelete") or "").upper(),
            on_update=(m.group("onupdate") or "").upper(),
        ))
        return
    up = text.upper()
    if up.startswith("CHECK"):
        ctx.skip_statement("CheckConstraint")
        return
    ctx.unexpected(f"unhandled constraint: {text[:60]}")


def _parse_alter_table(ctx: MigrationContext, stmt: str) -> bool:
    """S6 (postgres/pgdump.go:222-265)."""
    m = _ALTER_NOTNULL_RE.match(stmt.strip())
    if m:
        t = ctx.src_schema.get(_clean_name(m.group("table")))
        if t is not None:
            col = m.group("col").strip('"')
            if col in t.col_defs:
                t.col_defs[col].not_null = True
                ctx.schema_statement("AlterTableStmt")
                return True
        ctx.skip_statement("AlterTableStmt")
        return True
    m = _ALTER_CONSTRAINT_RE.match(stmt.strip())
    if m:
        t = ctx.src_schema.get(_clean_name(m.group("table")))
        if t is None:
            ctx.skip_statement("AlterTableStmt")
            return True
        _apply_constraint(ctx, t, m.group("rest"), _clean_name(m.group("name")))
        ctx.schema_statement("AlterTableStmt")
        return True
    return False


def _parse_index(ctx: MigrationContext, stmt: str) -> bool:
    """S7 (postgres/pgdump.go:199-220)."""
    m = _INDEX_RE.match(stmt.strip())
    if not m:
        return False
    t = ctx.src_schema.get(_clean_name(m.group("table")))
    if t is None:
        ctx.skip_statement("IndexStmt")
        return True
    keys = []
    for part in m.group("cols").split(","):
        part = part.strip()
        if not part:
            continue
        desc = bool(re.search(r"\bDESC\b", part, re.IGNORECASE))
        col = re.split(r"\s+", part)[0].strip('"')
        keys.append(ir.Key(col, desc))
    t.indexes.append(ir.SourceIndex(
        name=_clean_name(m.group("name")),
        unique=bool(m.group("unique")), keys=keys))
    ctx.schema_statement("IndexStmt")
    return True


def _parse_set(ctx: MigrationContext, stmt: str) -> bool:
    """S9 (postgres/pgdump.go:409-431): capture the dump's timezone.

    The value is validated against the IANA database the same way the
    reference runs time.LoadLocation: an unknown zone is logged as an
    unexpected condition + statement error (pgdump.go:419-423,
    logStmtError) and the previous location is kept, so downstream
    to_utc_timestamp never sees an unresolvable zone id."""
    m = _SET_TZ_RE.match(stmt.strip())
    if not m:
        return False
    val = m.group("val").strip().strip("'\"")
    try:
        import zoneinfo
        zoneinfo.ZoneInfo(val)
    except Exception as e:
        ctx.unexpected(f"Processing VariableSetStmt statement: {e}")
        ctx.error_in_statement("VariableSetStmt")
        return True
    ctx.location = val
    ctx.schema_statement("VariableSetStmt")
    return True


# ---------------------------------------------------------------------------
# INSERT value parsing (S8) — driver-side, like the reference's AST walk
# ---------------------------------------------------------------------------

def _parse_insert_values(values_text: str) -> list[list[Optional[str]]]:
    """Parse VALUES (...),(...) tuples into COPY-equivalent string rows
    (None = NULL). Handles quoted strings with '' escapes, numbers,
    NULL, TRUE/FALSE (lowered to pg literals t/f)."""
    rows: list[list[Optional[str]]] = []
    i, n = 0, len(values_text)
    while i < n:
        while i < n and values_text[i] != "(":
            i += 1
        if i >= n:
            break
        i += 1
        row: list[Optional[str]] = []
        cur: list[str] = []
        in_squote = False
        was_quoted = False
        while i < n:
            ch = values_text[i]
            if in_squote:
                if ch == "'":
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
                        cur = []  # drop whitespace preceding the quote
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


# ---------------------------------------------------------------------------
# the two passes
# ---------------------------------------------------------------------------

def process_pg_dump_schema(ctx: MigrationContext,
                           stream: TextIO) -> None:
    """Pass 1: build ctx.src_schema from the dump (S1 schema mode)."""
    ctx.set_schema_mode()

    def on_copy(block: CopyBlock) -> None:
        n = 0
        for _ in block.rows:
            n += 1
        ctx.stats_add_row(block.table, n)
        ctx.data_statement("CopyFrom")

    for stmt in _iter_statements(stream, on_copy):
        s = strip_sql_comments(stmt.text).strip()
        up = s.upper()
        if up.startswith("CREATE TABLE"):
            if "INHERITS" in up:
                ctx.skip_statement("CreateStmt")  # inherited tables skipped
                continue
            if not _parse_create_table(ctx, s):
                ctx.error_in_statement("CreateStmt")
        elif up.startswith("ALTER TABLE"):
            if not _parse_alter_table(ctx, s):
                ctx.skip_statement("AlterTableStmt")
        elif up.startswith("CREATE INDEX") or up.startswith("CREATE UNIQUE INDEX"):
            if not _parse_index(ctx, s):
                ctx.error_in_statement("IndexStmt")
        elif up.startswith("SET"):
            if not _parse_set(ctx, s):
                ctx.skip_statement("VariableSetStmt")
        elif up.startswith("INSERT"):
            m = _INSERT_RE.match(s)
            if m:
                table = _clean_name(m.group("table"))
                ctx.stats_add_row(table, len(_parse_insert_values(m.group("values"))))
                ctx.data_statement("InsertStmt")
            else:
                ctx.error_in_statement("InsertStmt")
        else:
            # everything else (SELECT set_config, ALTER OWNER, comments...)
            kind = up.split(None, 1)[0] if up else "?"
            ctx.skip_statement(kind.title() + "Stmt")


class StagingWriter:
    """Per-table staging TSV files shared across dump files.

    Sharded dumps (pg_dump -Fd, mysqldump --tab, manual splits) spread
    one table's rows over several files; the stager must append across
    files and keep one monotone sequence per table, otherwise later
    files truncate earlier rows and the bit-reversed synthetic PKs
    derived from the restarted sequence collide. One writer instance
    spans all dump files of a migration; ``close()`` once at the end.
    """

    def __init__(self, staging_dir: str) -> None:
        os.makedirs(staging_dir, exist_ok=True)
        self.staging_dir = staging_dir
        self.files: dict[str, TextIO] = {}
        self.paths: dict[str, str] = {}
        self.seqs: dict[str, int] = {}

    def file(self, table: str) -> TextIO:
        if table not in self.files:
            path = os.path.join(self.staging_dir, f"{table}.tsv")
            self.files[table] = open(path, "w", encoding="utf-8")
            self.paths[table] = path
            self.seqs[table] = 0
        return self.files[table]

    @staticmethod
    def copy_escape(v: Optional[str]) -> str:
        if v is None:
            return "\\N"
        # NUL is the decode sentinel and pg text disallows it anyway
        return (v.replace("\x00", "").replace("\\", "\\\\")
                 .replace("\t", "\\t")
                 .replace("\n", "\\n").replace("\r", "\\r"))

    def write_raw(self, table: str, row: str) -> None:
        """Append one already-COPY-escaped row."""
        f = self.file(table)
        f.write(f"{self.seqs[table]}\t{row}\n")
        self.seqs[table] += 1

    def write_values(self, table: str, ordered: list) -> None:
        """Append one row of raw (unescaped) string-or-None values."""
        f = self.file(table)
        f.write(f"{self.seqs[table]}\t"
                + "\t".join(self.copy_escape(v) for v in ordered) + "\n")
        self.seqs[table] += 1

    def close(self) -> None:
        for f in self.files.values():
            f.close()
        self.files.clear()


def stage_pg_dump_data(ctx: MigrationContext, stream: TextIO,
                       staging_dir: str,
                       writer: Optional[StagingWriter] = None,
                       ) -> dict[str, str]:
    """Pass 2 splitter: stream the dump once, writing each table's COPY
    rows (and INSERT rows, converted to COPY text format) to
    ``staging_dir/<table>.tsv`` with a prepended sequence column.

    Returns {src_table: staging_path}. Constant driver memory: rows
    stream straight to disk. Pass a shared ``writer`` when one table's
    data spans multiple dump files — it appends and continues each
    table's sequence instead of truncating (the caller closes it).
    """
    own_writer = writer is None
    w = writer if writer is not None else StagingWriter(staging_dir)

    def on_copy(block: CopyBlock) -> None:
        schema_table = ctx.src_schema.get(block.table)
        schema_cols = list(schema_table.col_names) if schema_table else []
        if not block.cols or not schema_table \
                or block.cols == schema_cols:
            # fast path: rows already in schema column order
            for row in block.rows:
                w.write_raw(block.table, row)
            return
        # COPY column list differs from schema order (reordered or
        # partial): re-map fields so the staged TSV is always in
        # schema order; absent columns become NULL
        idx = {c: i for i, c in enumerate(block.cols)}
        for row in block.rows:
            vals = row.split("\t")
            ordered = [vals[idx[c]] if c in idx and idx[c] < len(vals)
                       else "\\N" for c in schema_cols]
            w.write_raw(block.table, "\t".join(ordered))

    for stmt in _iter_statements(stream, on_copy):
        s = stmt.text.strip()
        if not s.upper().startswith("INSERT"):
            continue
        m = _INSERT_RE.match(s)
        if not m:
            continue
        table = _clean_name(m.group("table"))
        schema_table = ctx.src_schema.get(table)
        if schema_table is None:
            ctx.unexpected(f"INSERT into unknown table {table}")
            continue
        cols = ([_clean_name(c) for c in m.group("cols").split(",")]
                if m.group("cols") else list(schema_table.col_names))
        for vals in _parse_insert_values(m.group("values")):
            # reorder INSERT cols into full schema column order
            by_col = dict(zip(cols, vals))
            ordered = [by_col.get(c) for c in schema_table.col_names]
            w.write_values(table, ordered)

    if own_writer:
        w.close()
    return dict(w.paths)


def read_staged_table(spark: SparkSession, ctx: MigrationContext,
                      src_table: str, path: str) -> DataFrame:
    """Distributed read of a staged TSV: split on tabs, decode COPY
    escapes (\\N null, plus \\\\ \\t \\n \\r; superset of
    processCopyBlock which only collapses backslashes,
    postgres/pgdump.go:122-152), name columns with source names, keep
    the sequence column for deterministic synthetic keys.

    Decode order matters: '\\' followed by 'r' in DATA would be mangled
    by naive sequential replaces ('\\\\r' contains the substring
    '\\r'). Escaped backslashes are parked on a NUL sentinel first —
    NUL cannot appear in staged text (pg text disallows it; the
    stagers strip it) — then single-char escapes decode, then the
    sentinel restores to a backslash.
    """
    table = ctx.src_schema[src_table]
    df = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    cols = [parts.getItem(0).cast("long").alias(SEQ_COL)]
    nul = F.lit("\x00")
    for i, cn in enumerate(table.col_names):
        raw = parts.getItem(i + 1)
        s = F.replace(raw, F.lit("\\\\"), nul)
        s = F.replace(s, F.lit("\\t"), F.lit("\t"))
        s = F.replace(s, F.lit("\\n"), F.lit("\n"))
        s = F.replace(s, F.lit("\\r"), F.lit("\r"))
        s = F.replace(s, nul, F.lit("\\"))
        decoded = F.when(raw == "\\N", F.lit(None)).otherwise(s)
        cols.append(decoded.alias(cn))
    return df.select(*cols)


def stage_stream(stream: TextIO, staging_dir: str,
                 name: str = "dump.sql") -> str:
    """S26 (getSeekable, conversion/conversion.go:378-406): the dump is
    read twice (schema pass + data pass), so a non-seekable stream
    (stdin, a network pipe) is spooled to a staging file once and both
    passes read that path. Streams through in 1 MB chunks — constant
    memory for arbitrarily large dumps."""
    os.makedirs(staging_dir, exist_ok=True)
    path = os.path.join(staging_dir, name)
    with open(path, "w", encoding="utf-8") as out:
        while True:
            chunk = stream.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return path


# ---------------------------------------------------------------------------
# top-level driver (entry point 1, SURVEY §3.1)
# ---------------------------------------------------------------------------

def migrate_pg_dump(spark: SparkSession, dump_path: Union[str, list[str]],
                    staging_dir: str,
                    ctx: Optional[MigrationContext] = None,
                    ) -> tuple[MigrationContext, dict[str, ConversionResult]]:
    """Full pg_dump migration: schema pass + staged data pass + typed
    conversion with bad-row split. Returns (ctx, {src_table: result}).

    The caller writes results via sink/ (e.g. parquet per table).
    """
    if ctx is None:
        ctx = MigrationContext()
    paths = [dump_path] if isinstance(dump_path, str) else list(dump_path)

    for p in paths:
        with open(p, encoding="utf-8") as f:
            process_pg_dump_schema(ctx, f)
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()

    ctx.set_data_mode()
    # one writer across all dump files: appends + continuous per-table
    # sequence (sharded dumps put one table's rows in several files)
    writer = StagingWriter(staging_dir)
    try:
        for p in paths:
            with open(p, encoding="utf-8") as f:
                stage_pg_dump_data(ctx, f, staging_dir, writer=writer)
    finally:
        writer.close()
    staged = dict(writer.paths)

    results: dict[str, ConversionResult] = {}
    for src_table, path in staged.items():
        if src_table not in ctx.src_schema:
            ctx.unexpected(f"data for unknown table {src_table}")
            continue
        df = read_staged_table(spark, ctx, src_table, path)
        results[src_table] = convert_table(ctx, df, src_table, "postgres")
    return ctx, results
