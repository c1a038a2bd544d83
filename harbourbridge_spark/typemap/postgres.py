"""PostgreSQL type mapping (T1, /root/reference/postgres/toddl.go:107-163).

Array handling: a single ArrayBounds dimension makes the target an
ARRAY<T>; more than one degrades to STRING(MAX) with a
MultiDimensionalArray issue (postgres/toddl.go:60-73).
"""

from __future__ import annotations

from ..issues import SchemaIssue
from ..types import (BOOL, BYTES, DATE, FLOAT64, INT64, NUMERIC, STRING,
                     TIMESTAMP, SourceType, Type)


def _scalar(src_name: str, mods: tuple) -> tuple[Type, list[SchemaIssue]]:
    n = src_name.lower()
    if n in ("bool", "boolean"):
        return Type(BOOL), []
    if n in ("bigserial", "serial"):
        return Type(INT64), [SchemaIssue.SERIAL]
    if n in ("bpchar", "character", "char"):
        # no mod => STRING(1) (bpchar default length is 1)
        return Type(STRING, mods[0] if mods else 1), []
    if n == "bytea":
        return Type(BYTES), []
    if n == "date":
        return Type(DATE), []
    if n in ("float8", "double precision"):
        return Type(FLOAT64), []
    if n in ("float4", "real"):
        return Type(FLOAT64), [SchemaIssue.WIDENED]
    if n in ("int8", "bigint"):
        return Type(INT64), []
    if n in ("int4", "integer", "int", "int2", "smallint"):
        return Type(INT64), [SchemaIssue.WIDENED]
    if n == "numeric":
        # Spanner NUMERIC (29.9) is narrower than unconstrained pg numeric;
        # the reference maps it with no issue (postgres/toddl.go:133-146)
        return Type(NUMERIC), []
    if n == "text":
        return Type(STRING), []
    if n in ("timestamptz", "timestamp with time zone"):
        return Type(TIMESTAMP), []
    if n in ("timestamp", "timestamp without time zone"):
        return Type(TIMESTAMP), [SchemaIssue.TIMESTAMP]
    if n in ("varchar", "character varying"):
        return Type(STRING, mods[0] if mods else None), []
    return Type(STRING), [SchemaIssue.NO_GOOD_TYPE]


def to_target_type(src: SourceType) -> tuple[Type, list[SchemaIssue]]:
    if len(src.array_bounds) > 1:
        return Type(STRING), [SchemaIssue.MULTI_DIMENSIONAL_ARRAY]
    t, issues = _scalar(src.name, src.mods)
    if len(src.array_bounds) == 1:
        t = Type(t.name, t.length, is_array=True)
    return t, issues


# Alternative target scalar names per source type, mirroring the web
# typemap (web/postgres_typemap.go): any numeric-ish type may be widened
# to STRING; bool may go to INT64/STRING; etc.
ALT_TARGETS: dict[str, list[str]] = {
    "bool": [BOOL, INT64, STRING],
    "boolean": [BOOL, INT64, STRING],
    "bigserial": [INT64, STRING],
    "serial": [INT64, STRING],
    "bpchar": [BYTES, STRING],
    "character": [BYTES, STRING],
    "bytea": [BYTES, STRING],
    "date": [DATE, STRING],
    "float8": [FLOAT64, STRING],
    "double precision": [FLOAT64, STRING],
    "float4": [FLOAT64, STRING],
    "real": [FLOAT64, STRING],
    "int8": [INT64, STRING],
    "bigint": [INT64, STRING],
    "int4": [INT64, STRING],
    "integer": [INT64, STRING],
    "int2": [INT64, STRING],
    "smallint": [INT64, STRING],
    "numeric": [NUMERIC, STRING],
    # text/varchar may remap to BYTES (web/postgres_typemap.go text,
    # varchar cases: spType==ddl.Bytes branch)
    "text": [STRING, BYTES],
    "timestamptz": [TIMESTAMP, STRING],
    "timestamp with time zone": [TIMESTAMP, STRING],
    "timestamp": [TIMESTAMP, STRING],
    "timestamp without time zone": [TIMESTAMP, STRING],
    "varchar": [STRING, BYTES],
    "character varying": [STRING, BYTES],
}
