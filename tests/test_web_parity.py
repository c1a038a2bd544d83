"""Scenario parity with the reference's own web tests: the EXACT
16-column fixtures and expected post-remap schemas of
/root/reference/web/web_test.go TestSetTypeMapGlobalLevelPostgres
(:650) and TestSetTypeMapGlobalLevelMySQL (:891), driven through the
/typemap/global route.  Each case starts from a fresh conv, exactly as
the reference rebuilds sessionState.conv per case."""

import pytest

from harbourbridge_spark import schema_ir as ir
from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.session import EditSession
from harbourbridge_spark.toddl import schema_to_ddl
from harbourbridge_spark.web_api import WebApi

MAX = None   # repo renders MaxLength as length=None


def _conv(dialect, col_types):
    ctx = MigrationContext()
    names = list("abcdefghijklmnop")
    ctx.src_schema["t1"] = ir.SourceTable(
        name="t1", col_names=names,
        col_defs={n: ir.SourceColumn(n, tt.SourceType(t, list(mods)))
                  for n, (t, *mods) in zip(names, col_types)},
        primary_keys=[ir.Key("a")])
    schema_to_ddl(ctx, dialect)
    return WebApi(EditSession(ctx, dialect))


# buildConvPostgres (web_test.go:2331): column -> source type
PG_COLS = [("int8",), ("float4",), ("bool",), ("varchar", 6),
           ("numeric",), ("timestamptz",), ("bigserial",), ("bpchar",),
           ("bytea",), ("date",), ("float8",), ("int4",), ("serial",),
           ("text",), ("timestamp",), ("bool",)]

# buildConvMySQL (web_test.go:2225)
MY_COLS = [("bool",), ("text",), ("bool",), ("varchar", 6),
           ("numeric",), ("enum",), ("json",), ("binary",), ("blob",),
           ("smallint",), ("double",), ("float",), ("decimal",),
           ("date",), ("timestamp",), ("time",)]

S, B, I64, F64, NUM, TS, D = ("STRING", "BYTES", "INT64", "FLOAT64",
                              "NUMERIC", "TIMESTAMP", "DATE")

CASES = [
    # (dialect, cols, payload, expected {col: (type, len)})
    ("postgres", PG_COLS,
     {"bool": S, "int8": S, "float4": S, "varchar": B, "numeric": S,
      "timestamptz": S, "bigserial": S, "bpchar": B, "bytea": S,
      "date": S, "float8": S, "int4": S, "serial": S, "text": B,
      "timestamp": S},
     {"a": (S, MAX), "b": (S, MAX), "c": (S, MAX), "d": (B, 6),
      "e": (S, MAX), "f": (S, MAX), "g": (S, MAX), "h": (B, 1),
      "i": (S, MAX), "j": (S, MAX), "k": (S, MAX), "l": (S, MAX),
      "m": (S, MAX), "n": (B, MAX), "o": (S, MAX), "p": (S, MAX)}),
    ("postgres", PG_COLS,
     {"bool": I64, "int8": S, "float4": S},
     {"a": (S, MAX), "b": (S, MAX), "c": (I64, MAX), "d": (S, 6),
      "e": (NUM, MAX), "f": (TS, MAX), "g": (I64, MAX), "h": (S, 1),
      "i": (B, MAX), "j": (D, MAX), "k": (F64, MAX), "l": (I64, MAX),
      "m": (I64, MAX), "n": (S, MAX), "o": (TS, MAX),
      "p": (I64, MAX)}),
    ("mysql", MY_COLS,
     {"bool": S, "smallint": S, "float": S, "varchar": B, "numeric": S,
      "timestamp": S, "decimal": S, "json": B, "binary": S, "blob": S,
      "double": S, "date": S, "time": S, "enum": S, "text": B},
     {"a": (S, MAX), "b": (B, MAX), "c": (S, MAX), "d": (B, 6),
      "e": (S, MAX), "f": (S, MAX), "g": (B, MAX), "h": (S, MAX),
      "i": (S, MAX), "j": (S, MAX), "k": (S, MAX), "l": (S, MAX),
      "m": (S, MAX), "n": (S, MAX), "o": (S, MAX), "p": (S, MAX)}),
    ("mysql", MY_COLS,
     {"bool": I64, "varchar": B},
     {"a": (I64, MAX), "b": (S, MAX), "c": (I64, MAX), "d": (B, 6),
      "e": (NUM, MAX), "f": (S, MAX), "g": (S, MAX), "h": (B, MAX),
      "i": (B, MAX), "j": (I64, MAX), "k": (F64, MAX), "l": (F64, MAX),
      "m": (NUM, MAX), "n": (D, MAX), "o": (TS, MAX), "p": (S, MAX)}),
]


@pytest.mark.parametrize("dialect,cols,payload,want", CASES)
def test_set_typemap_global_matches_reference_scenarios(
        dialect, cols, payload, want):
    api = _conv(dialect, cols)
    status, _ = api.handle("POST", "/typemap/global", body=payload)
    assert status == 200
    sp = api.session.ctx.sp_schema["t1"]
    got = {c: (sp.col_defs[c].type.name, sp.col_defs[c].type.length)
           for c in sp.col_names}
    assert got == want
    # PK preserved through the remap (reference asserts Pks unchanged)
    assert [k.col for k in sp.pks] == ["a"]


def test_set_typemap_global_illegal_target_400():
    """The reference's bad-request case (malformed JSON) maps in this
    API to any illegal remap: whole request rejected, schema rolled
    back untouched."""
    api = _conv("postgres", PG_COLS)
    before = {c: api.session.ctx.sp_schema["t1"].col_defs[c].type.name
              for c in "abcdefghijklmnop"}
    status, _ = api.handle("POST", "/typemap/global",
                           body={"bool": "INT64", "date": "BYTES"})
    assert status == 400
    after = {c: api.session.ctx.sp_schema["t1"].col_defs[c].type.name
             for c in "abcdefghijklmnop"}
    assert after == before       # rollback: the bool remap undone too
