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


def _guard_api(index_on_b=False, fk_b_to_t2=False,
               fk_from_t2_to_b=False):
    """t1(a PK, b, c) [+ optional index/FK shapes] + t2(x PK, y) — the
    conv shapes of web_test.go TestUpdateTableSchema:116-420."""
    ctx = MigrationContext()
    ctx.src_schema["t1"] = ir.SourceTable(
        name="t1", col_names=["a", "b", "c"],
        col_defs={n: ir.SourceColumn(n, tt.SourceType("text"))
                  for n in ("a", "b", "c")},
        primary_keys=[ir.Key("a")],
        indexes=([ir.SourceIndex(name="idx", keys=[ir.Key("b")])]
                 if index_on_b else []),
        foreign_keys=([ir.SourceForeignKey(
            name="fk1", columns=["b"], refer_table="t2",
            refer_columns=["y"])] if fk_b_to_t2 else []))
    ctx.src_schema["t2"] = ir.SourceTable(
        name="t2", col_names=["x", "y"],
        col_defs={n: ir.SourceColumn(n, tt.SourceType("text"))
                  for n in ("x", "y")},
        primary_keys=[ir.Key("x")],
        foreign_keys=([ir.SourceForeignKey(
            name="fk1", columns=["y"], refer_table="t1",
            refer_columns=["b"])] if fk_from_t2_to_b else []))
    schema_to_ddl(ctx, "postgres")
    return WebApi(EditSession(ctx, "postgres"))


def _update(api, table, spec):
    return api.handle("POST", "/typemap/table", query={"table": table},
                      body={"UpdateCols": spec})


def test_update_table_schema_guard_status_codes():
    """The reference's remove/rename guard matrix with its EXACT
    status-code split (web_test.go:116-420 + web.go:857-895): PK and
    interleave violations are 400; index/FK dependencies are 412."""
    # remove a: part of PK -> 400
    st, _ = _update(_guard_api(), "t1", {"a": {"Removed": True}})
    assert st == 400
    # remove b: part of secondary index -> 412
    st, _ = _update(_guard_api(index_on_b=True), "t1",
                    {"b": {"Removed": True}})
    assert st == 412
    # remove b: part of an FK -> 412
    st, _ = _update(_guard_api(fk_b_to_t2=True), "t1",
                    {"b": {"Removed": True}})
    assert st == 412
    # remove b: referenced by t2's FK -> 412
    st, _ = _update(_guard_api(fk_from_t2_to_b=True), "t1",
                    {"b": {"Removed": True}})
    assert st == 412
    # rename b under an index / an FK -> 412
    st, _ = _update(_guard_api(index_on_b=True), "t1",
                    {"b": {"Rename": "bb"}})
    assert st == 412
    st, _ = _update(_guard_api(fk_b_to_t2=True), "t1",
                    {"b": {"Rename": "bb"}})
    assert st == 412


def test_update_table_schema_remove_success_cleans_maps():
    """web_test.go "Test remove success": the column disappears from
    ColNames/ColDefs AND both name maps."""
    api = _guard_api()
    st, payload = _update(api, "t1", {"c": {"Removed": True}})
    assert st == 200
    sp = api.session.ctx.sp_schema["t1"]
    assert "c" not in sp.col_names and "c" not in sp.col_defs
    assert "c" not in api.session.ctx.to_source["t1"]["cols"]
    assert "c" not in api.session.ctx.to_target["t1"]["cols"]
    assert "c" not in payload["conv"]["sp_schema"]["t1"]["col_defs"]


def test_rename_pk_of_interleaved_table_400():
    """web_test.go "rename fail column part of PK and child/parent
    table": PK renames are legal UNLESS the table is in an interleave
    relation — then 400, not 412."""
    ctx = MigrationContext()
    ctx.src_schema["parent"] = ir.SourceTable(
        name="parent", col_names=["id", "v"],
        col_defs={"id": ir.SourceColumn("id", tt.SourceType("int8"),
                                        not_null=True),
                  "v": ir.SourceColumn("v", tt.SourceType("text"))},
        primary_keys=[ir.Key("id")])
    ctx.src_schema["child"] = ir.SourceTable(
        name="child", col_names=["id", "cid", "w"],
        col_defs={"id": ir.SourceColumn("id", tt.SourceType("int8"),
                                        not_null=True),
                  "cid": ir.SourceColumn("cid", tt.SourceType("int8"),
                                         not_null=True),
                  "w": ir.SourceColumn("w", tt.SourceType("text"))},
        primary_keys=[ir.Key("id"), ir.Key("cid")],
        foreign_keys=[ir.SourceForeignKey(
            name="fkp", columns=["id"], refer_table="parent",
            refer_columns=["id"])])
    schema_to_ddl(ctx, "postgres")
    api = WebApi(EditSession(ctx, "postgres"))
    st, resp = api.handle("GET", "/setparent", query={"table": "child"})
    assert st == 200 and resp["tableInterleaveStatus"]["Possible"]
    # parent-side PK rename -> 400 (interleave), child-side too
    st, _ = _update(api, "parent", {"id": {"Rename": "pid"}})
    assert st == 400
    st, _ = _update(api, "child", {"id": {"Rename": "pid"}})
    assert st == 400
    # a PK rename on a NON-interleaved table is allowed (contrast)
    api2 = _guard_api()
    st, _ = _update(api2, "t1", {"a": {"Rename": "aa"}})
    assert st == 200
    assert [k.col for k in api2.session.ctx.sp_schema["t1"].pks] == ["aa"]


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
