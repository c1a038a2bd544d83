"""MySQL type mapping (T2, /root/reference/mysql/toddl.go:114-168).

``tinyint(1)`` maps to BOOL; ``set`` columns arrive with one
ArrayBounds dimension (mysql/mysqldump.go:649-654) and so become
ARRAY<STRING(MAX)>.
"""

from __future__ import annotations

from ..issues import SchemaIssue
from ..types import (BOOL, BYTES, DATE, FLOAT64, INT64, NUMERIC, STRING,
                     TIMESTAMP, SourceType, Type)


def _scalar(src_name: str, mods: tuple) -> tuple[Type, list[SchemaIssue]]:
    n = src_name.lower()
    if n in ("bool", "boolean"):
        return Type(BOOL), []
    if n == "tinyint":
        if mods and mods[0] == 1:  # tinyint(1) is MySQL's bool
            return Type(BOOL), []
        return Type(INT64), [SchemaIssue.WIDENED]
    if n == "double":
        return Type(FLOAT64), []
    if n == "float":
        return Type(FLOAT64), [SchemaIssue.WIDENED]
    if n in ("numeric", "decimal"):
        return Type(NUMERIC), []
    if n == "bigint":
        return Type(INT64), []
    if n in ("smallint", "mediumint", "integer", "int"):
        return Type(INT64), [SchemaIssue.WIDENED]
    if n == "bit":
        return Type(BYTES), []
    if n in ("varchar", "char"):
        return Type(STRING, mods[0] if mods else None), []
    if n in ("text", "tinytext", "mediumtext", "longtext"):
        return Type(STRING), []
    if n in ("set", "enum"):
        return Type(STRING), []
    if n == "json":
        return Type(STRING), []
    if n in ("binary", "varbinary", "tinyblob", "mediumblob", "blob", "longblob"):
        return Type(BYTES), []
    if n == "date":
        return Type(DATE), []
    if n == "datetime":
        return Type(TIMESTAMP), [SchemaIssue.DATETIME]
    if n == "timestamp":
        return Type(TIMESTAMP), []
    if n in ("time", "year"):
        return Type(STRING), [SchemaIssue.TIME]
    return Type(STRING), [SchemaIssue.NO_GOOD_TYPE]


def to_target_type(src: SourceType) -> tuple[Type, list[SchemaIssue]]:
    if len(src.array_bounds) > 1:
        return Type(STRING), [SchemaIssue.MULTI_DIMENSIONAL_ARRAY]
    t, issues = _scalar(src.name, src.mods)
    if len(src.array_bounds) == 1:
        t = Type(t.name, t.length, is_array=True)
    return t, issues


ALT_TARGETS: dict[str, list[str]] = {
    "bool": [BOOL, INT64, STRING],
    "boolean": [BOOL, INT64, STRING],
    "tinyint": [BOOL, INT64, STRING],
    "double": [FLOAT64, STRING],
    "float": [FLOAT64, STRING],
    "numeric": [NUMERIC, STRING],
    "decimal": [NUMERIC, STRING],
    "bigint": [INT64, STRING],
    "smallint": [INT64, STRING],
    "mediumint": [INT64, STRING],
    "integer": [INT64, STRING],
    "int": [INT64, STRING],
    "bit": [BYTES, STRING],
    "varchar": [STRING, BYTES],
    "char": [STRING, BYTES],
    "text": [STRING, BYTES],
    "tinytext": [STRING, BYTES],
    "mediumtext": [STRING, BYTES],
    "longtext": [STRING, BYTES],
    "set": [STRING],
    "enum": [STRING],
    "json": [STRING, BYTES],
    "binary": [BYTES, STRING],
    "varbinary": [BYTES, STRING],
    "tinyblob": [BYTES, STRING],
    "mediumblob": [BYTES, STRING],
    "blob": [BYTES, STRING],
    "longblob": [BYTES, STRING],
    "date": [DATE, STRING],
    "datetime": [TIMESTAMP, STRING],
    "timestamp": [TIMESTAMP, STRING],
    "time": [STRING],
    "year": [STRING],
}
