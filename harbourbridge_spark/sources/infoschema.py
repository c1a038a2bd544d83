"""Live-database schema + data readers over JDBC (S14-S18, SURVEY §2.1).

Schema extraction issues the same catalog queries as the reference
(postgres/infoschema.go:42-483, mysql/infoschema.go:32-418) through an
injectable ``run_query`` seam (in production: spark.read.jdbc with the
query pushed down; in tests: canned rows, mirroring the reference's SQL
mocks in infoschema_test.go).

Data reads (S15/S18) use spark.read.jdbc with partitioned parallel
scans on the primary key — the Spark-native replacement for the
reference's single-threaded `SELECT * FROM t` row loop
(postgres/infoschema.go:76-126). At scale, partitionColumn/num_partitions
bound per-task row counts; the reference itself flags its
single-connection scan as the bottleneck (whitepaper.md:52-62).

The known snapshot-consistency caveat carries over: schema and data
reads are not one transaction (postgres/infoschema.go:34-37).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from .. import schema_ir as ir
from ..context import MigrationContext
from ..toddl import schema_to_ddl
from ..types import SourceType

# run_query(sql) -> list of tuples
QueryRunner = Callable[[str], Sequence[Sequence]]


@dataclass
class JdbcConfig:
    url: str                      # jdbc:postgresql://... / jdbc:mysql://...
    properties: dict
    num_partitions: int = 32


def jdbc_runner(spark: SparkSession, cfg: JdbcConfig) -> QueryRunner:
    """Production runner: push each catalog query through the JDBC source."""
    def run(sql: str) -> Sequence[Sequence]:
        df = spark.read.jdbc(cfg.url, f"({sql}) AS q",
                             properties=cfg.properties)
        return [tuple(r) for r in df.collect()]
    return run


# ---------------------------------------------------------------------------
# PostgreSQL catalog queries (postgres/infoschema.go)
# ---------------------------------------------------------------------------

PG_TABLES_SQL = """\
SELECT table_schema, table_name FROM information_schema.tables
WHERE table_type = 'BASE TABLE'
  AND table_schema NOT IN ('information_schema', 'pg_catalog')"""

# columns incl. array element types via element_types view
# (postgres/infoschema.go:263-270)
PG_COLUMNS_SQL = """\
SELECT c.column_name, c.data_type, e.data_type, c.is_nullable,
       c.column_default, c.character_maximum_length,
       c.numeric_precision, c.numeric_scale
FROM information_schema.COLUMNS c
LEFT JOIN information_schema.element_types e
  ON ((c.table_catalog, c.table_schema, c.table_name, 'TABLE',
       c.dtd_identifier)
    = (e.object_catalog, e.object_schema, e.object_name, e.object_type,
       e.collection_type_identifier))
WHERE table_schema = '{schema}' AND table_name = '{table}'
ORDER BY c.ordinal_position"""

# PK/UNIQUE/CHECK constraints (postgres/infoschema.go:317-349)
PG_CONSTRAINTS_SQL = """\
SELECT k.COLUMN_NAME, t.CONSTRAINT_TYPE
FROM information_schema.TABLE_CONSTRAINTS t
  JOIN information_schema.KEY_COLUMN_USAGE k
    USING (constraint_name, table_schema, table_name)
WHERE k.TABLE_SCHEMA = '{schema}' AND k.TABLE_NAME = '{table}'
ORDER BY k.ordinal_position"""

# FKs via pg_constraint UNNEST join (postgres/infoschema.go:359-421)
PG_FOREIGN_KEYS_SQL = """\
SELECT c.conname AS constraint_name,
       ns.nspname AS ref_schema, cl.relname AS ref_table,
       att.attname AS col, att2.attname AS ref_col
FROM pg_constraint c
  JOIN pg_class tbl ON tbl.oid = c.conrelid
  JOIN pg_namespace sch ON sch.oid = tbl.relnamespace
  JOIN pg_class cl ON cl.oid = c.confrelid
  JOIN pg_namespace ns ON ns.oid = cl.relnamespace
  JOIN LATERAL UNNEST(c.conkey) WITH ORDINALITY AS a(attnum, n)
    ON TRUE
  JOIN LATERAL UNNEST(c.confkey) WITH ORDINALITY AS af(attnum, n)
    ON a.n = af.n
  JOIN pg_attribute att ON att.attrelid = tbl.oid AND att.attnum = a.attnum
  JOIN pg_attribute att2 ON att2.attrelid = cl.oid AND att2.attnum = af.attnum
WHERE c.contype = 'f' AND sch.nspname = '{schema}' AND tbl.relname = '{table}'
ORDER BY c.conname, a.n"""

# secondary indexes via pg_index (postgres/infoschema.go:427-483)
PG_INDEXES_SQL = """\
SELECT irel.relname AS index_name, a.attname AS column_name,
       1 + Array_position(ix.indkey, a.attnum) AS column_position,
       ix.indisunique AS is_unique,
       CASE o.OPTION & 1 WHEN 1 THEN 'DESC' ELSE 'ASC' END AS order
FROM pg_index ix
  JOIN pg_class trel ON trel.oid = ix.indrelid
  JOIN pg_namespace tnsp ON trel.relnamespace = tnsp.oid
  JOIN pg_class irel ON irel.oid = ix.indexrelid
  CROSS JOIN LATERAL UNNEST(ix.indkey) WITH ORDINALITY AS c(colnum, ordinality)
  LEFT JOIN LATERAL UNNEST(ix.indoption) WITH ORDINALITY AS o(OPTION, ordinality)
    ON c.ordinality = o.ordinality
  JOIN pg_attribute a ON trel.oid = a.attrelid AND a.attnum = c.colnum
WHERE tnsp.nspname = '{schema}' AND trel.relname = '{table}'
  AND ix.indisprimary = false
GROUP BY irel.relname, a.attname, array_position(ix.indkey, a.attnum),
         ix.indisunique, o.OPTION
ORDER BY irel.relname, array_position(ix.indkey, a.attnum)"""

PG_ROWCOUNT_SQL = 'SELECT COUNT(*) FROM "{schema}"."{table}"'


def _pg_source_type(data_type: str, elem_type: Optional[str],
                    char_len, num_prec, num_scale) -> SourceType:
    if data_type == "ARRAY" and elem_type:
        base = _pg_source_type(elem_type, None, char_len, num_prec, num_scale)
        return SourceType(base.name, base.mods, (-1,))
    mods: tuple = ()
    if char_len:
        mods = (int(char_len),)
    elif data_type in ("numeric", "decimal") and num_prec:
        mods = (int(num_prec), int(num_scale)) if num_scale else (int(num_prec),)
    return SourceType(data_type, mods)


def process_pg_info_schema(ctx: MigrationContext, run_query: QueryRunner,
                           schema: str = "public") -> None:
    """S14 (ProcessInfoSchema, postgres/infoschema.go:42-55): the five
    catalog queries, assembled into SourceTable IR."""
    tables = run_query(PG_TABLES_SQL)
    for tschema, tname in tables:
        if tschema != schema:
            continue
        table = ir.SourceTable(name=tname)
        for (col, dt, elem, nullable, default, char_len, num_prec,
             num_scale) in run_query(
                 PG_COLUMNS_SQL.format(schema=tschema, table=tname)):
            ignored = ir.Ignored(default=default is not None)
            table.col_names.append(col)
            table.col_defs[col] = ir.SourceColumn(
                col, _pg_source_type(dt, elem, char_len, num_prec, num_scale),
                not_null=(nullable == "NO"), ignored=ignored)
        for col, ctype in run_query(
                PG_CONSTRAINTS_SQL.format(schema=tschema, table=tname)):
            if ctype == "PRIMARY KEY":
                table.primary_keys.append(ir.Key(col))
                if col in table.col_defs:
                    table.col_defs[col].not_null = True
            elif ctype == "UNIQUE":
                table.indexes.append(ir.SourceIndex(
                    name="", unique=True, keys=[ir.Key(col)]))
            elif ctype == "CHECK" and col in table.col_defs:
                table.col_defs[col].ignored.check = True
        fks: dict[str, ir.SourceForeignKey] = {}
        for cname, rschema, rtable, col, rcol in run_query(
                PG_FOREIGN_KEYS_SQL.format(schema=tschema, table=tname)):
            fk = fks.setdefault(cname, ir.SourceForeignKey(
                name=cname, refer_table=rtable))
            fk.columns.append(col)
            fk.refer_columns.append(rcol)
        table.foreign_keys = list(fks.values())
        idxs: dict[str, ir.SourceIndex] = {}
        for iname, col, pos, unique, order in run_query(
                PG_INDEXES_SQL.format(schema=tschema, table=tname)):
            idx = idxs.setdefault(iname, ir.SourceIndex(
                name=iname, unique=bool(unique)))
            idx.keys.append(ir.Key(col, desc=(order == "DESC")))
        table.indexes.extend(idxs.values())
        ctx.src_schema[tname] = table
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()


def set_pg_row_stats(ctx: MigrationContext, run_query: QueryRunner,
                     schema: str = "public") -> None:
    """S16 (SetRowStats, postgres/infoschema.go:169-199)."""
    for tname in ctx.src_schema:
        rows = run_query(PG_ROWCOUNT_SQL.format(schema=schema, table=tname))
        if rows:
            ctx.stats_add_row(tname, int(rows[0][0]))


def read_pg_table(spark: SparkSession, cfg: JdbcConfig,
                  ctx: MigrationContext, src_table: str,
                  schema: str = "public") -> DataFrame:
    """S15: partitioned parallel JDBC scan of one table. Partitions on
    the first numeric PK column when available (replaces the reference's
    single-threaded row loop)."""
    table = ctx.src_schema[src_table]
    dbtable = f'"{schema}"."{src_table}"'
    pk_col = table.primary_keys[0].column if table.primary_keys else None
    if pk_col is not None:
        bounds = spark.read.jdbc(
            cfg.url,
            f'(SELECT MIN("{pk_col}") AS lo, MAX("{pk_col}") AS hi '
            f"FROM {dbtable}) AS b",
            properties=cfg.properties).first()
        # positional access: backends fold alias case (Derby/pg
        # uppercase vs lowercase), so bounds.lo is not portable
        if bounds and bounds[0] is not None:
            try:
                lo, hi = int(bounds[0]), int(bounds[1])
                return spark.read.jdbc(
                    cfg.url, dbtable, column=pk_col,
                    lowerBound=lo, upperBound=max(hi, lo + 1),
                    numPartitions=cfg.num_partitions,
                    properties=cfg.properties)
            except (TypeError, ValueError):
                pass  # non-numeric PK: fall back to single partition
    return spark.read.jdbc(cfg.url, dbtable, properties=cfg.properties)


# ---------------------------------------------------------------------------
# MySQL catalog queries (mysql/infoschema.go)
# ---------------------------------------------------------------------------

MYSQL_TABLES_SQL = """\
SELECT table_name FROM information_schema.tables
WHERE table_type = 'BASE TABLE' AND table_schema = '{db}'"""

MYSQL_COLUMNS_SQL = """\
SELECT column_name, data_type, column_type, is_nullable, column_default,
       character_maximum_length, numeric_precision, numeric_scale, extra
FROM information_schema.COLUMNS
WHERE table_schema = '{db}' AND table_name = '{table}'
ORDER BY ordinal_position"""

MYSQL_CONSTRAINTS_SQL = """\
SELECT k.COLUMN_NAME, t.CONSTRAINT_TYPE
FROM information_schema.TABLE_CONSTRAINTS t
  JOIN information_schema.KEY_COLUMN_USAGE k
    USING (constraint_name, table_schema, table_name)
WHERE k.TABLE_SCHEMA = '{db}' AND k.TABLE_NAME = '{table}'
ORDER BY k.ordinal_position"""

MYSQL_FOREIGN_KEYS_SQL = """\
SELECT k.REFERENCED_TABLE_NAME, k.COLUMN_NAME, k.REFERENCED_COLUMN_NAME,
       k.CONSTRAINT_NAME
FROM information_schema.KEY_COLUMN_USAGE k
WHERE k.TABLE_SCHEMA = '{db}' AND k.TABLE_NAME = '{table}'
  AND k.REFERENCED_TABLE_SCHEMA = '{db}'
ORDER BY k.CONSTRAINT_NAME, k.ORDINAL_POSITION"""

MYSQL_INDEXES_SQL = """\
SELECT DISTINCT INDEX_NAME, COLUMN_NAME, SEQ_IN_INDEX, COLLATION, NON_UNIQUE
FROM INFORMATION_SCHEMA.STATISTICS
WHERE INDEX_NAME != 'PRIMARY' AND TABLE_SCHEMA = '{db}'
  AND TABLE_NAME = '{table}'
ORDER BY INDEX_NAME, SEQ_IN_INDEX"""


def _mysql_source_type(data_type: str, column_type: str,
                       char_len, num_prec, num_scale) -> SourceType:
    dt = data_type.lower()
    if dt == "set":
        return SourceType("set", (), (-1,))
    # tinyint(1) distinction comes from column_type
    mods: tuple = ()
    if char_len:
        mods = (int(char_len),)
    elif dt in ("numeric", "decimal") and num_prec:
        mods = (int(num_prec), int(num_scale)) if num_scale is not None \
            else (int(num_prec),)
    elif dt == "tinyint" and column_type and "(1)" in column_type:
        mods = (1,)
    return SourceType(dt, mods)


def process_mysql_info_schema(ctx: MigrationContext, run_query: QueryRunner,
                              db: str) -> None:
    """S17 (mysql/infoschema.go:32-45)."""
    for (tname,) in run_query(MYSQL_TABLES_SQL.format(db=db)):
        table = ir.SourceTable(name=tname)
        for (col, dt, ctype, nullable, default, char_len, num_prec,
             num_scale, extra) in run_query(
                 MYSQL_COLUMNS_SQL.format(db=db, table=tname)):
            ignored = ir.Ignored(
                default=default is not None,
                auto_increment=bool(extra and "auto_increment" in extra))
            table.col_names.append(col)
            table.col_defs[col] = ir.SourceColumn(
                col, _mysql_source_type(dt, ctype, char_len, num_prec, num_scale),
                not_null=(nullable == "NO"), ignored=ignored)
        for col, ctype2 in run_query(
                MYSQL_CONSTRAINTS_SQL.format(db=db, table=tname)):
            if ctype2 == "PRIMARY KEY":
                table.primary_keys.append(ir.Key(col))
                if col in table.col_defs:
                    table.col_defs[col].not_null = True
        fks: dict[str, ir.SourceForeignKey] = {}
        for rtable, col, rcol, cname in run_query(
                MYSQL_FOREIGN_KEYS_SQL.format(db=db, table=tname)):
            fk = fks.setdefault(cname, ir.SourceForeignKey(
                name=cname, refer_table=rtable))
            fk.columns.append(col)
            fk.refer_columns.append(rcol)
        table.foreign_keys = list(fks.values())
        idxs: dict[str, ir.SourceIndex] = {}
        for iname, col, seq, collation, non_unique in run_query(
                MYSQL_INDEXES_SQL.format(db=db, table=tname)):
            idx = idxs.setdefault(iname, ir.SourceIndex(
                name=iname, unique=not int(non_unique)))
            idx.keys.append(ir.Key(col, desc=(collation == "D")))
        table.indexes.extend(idxs.values())
        ctx.src_schema[tname] = table
    schema_to_ddl(ctx, "mysql")
    ctx.add_synthetic_pkeys()


def mysql_data_query(ctx: MigrationContext, src_table: str) -> str:
    """S18: explicit column list with spatial columns wrapped in
    ST_AsText (mysql/infoschema.go:122-138)."""
    table = ctx.src_schema[src_table]
    cols = []
    for cn in table.col_names:
        if table.col_defs[cn].type.name in (
                "geometry", "point", "linestring", "polygon", "multipoint",
                "multilinestring", "multipolygon", "geometrycollection"):
            cols.append(f"ST_AsText(`{cn}`) AS `{cn}`")
        else:
            cols.append(f"`{cn}`")
    return f"SELECT {', '.join(cols)} FROM `{src_table}`"
