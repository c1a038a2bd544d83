"""Unit tests for the M0 core: types, schema IR, mapping, context, typemaps.

Mirrors the reference's table-driven unit tests
(internal/fixname_test.go, internal/mapping_test.go,
postgres/toddl_test.go, mysql/toddl_test.go, dynamodb/toddl_test.go).
"""

import json

import pytest
from pyspark.sql import types as T

from harbourbridge_spark import schema_ir as ir
from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.issues import SchemaIssue
from harbourbridge_spark.mapping import fix_name, get_target_col, get_target_table
from harbourbridge_spark.toddl import schema_to_ddl
from harbourbridge_spark.typemap import dynamodb as dy
from harbourbridge_spark.typemap import mysql as my
from harbourbridge_spark.typemap import postgres as pg


# ---------------------------------------------------------------- fix_name
@pytest.mark.parametrize("src,want,changed", [
    ("table", "table", False),
    ("Tab_1", "Tab_1", False),
    ("2table", "Atable", True),
    ("tab le", "tab_le", True),
    ("tab-le", "tab_le", True),
    ("", "BogusEmptyId", True),
    ("_tab", "Atab", True),
])
def test_fix_name(src, want, changed):
    got, ch = fix_name(src)
    assert got == want
    assert ch == changed


def test_name_collision_dedup():
    ctx = MigrationContext()
    a = get_target_table(ctx, "tab le")
    b = get_target_table(ctx, "tab_le")
    assert a == "tab_le"
    assert b != a and b.startswith("tab_le_")
    # consistent on re-lookup
    assert get_target_table(ctx, "tab le") == a


def test_col_mapping_per_table():
    ctx = MigrationContext()
    c1 = get_target_col(ctx, "t", "a b")
    c2 = get_target_col(ctx, "t", "a_b")
    assert c1 == "a_b"
    assert c2 != c1
    with pytest.raises(KeyError):
        get_target_col(ctx, "t", "zzz", must_exist=True)


# ---------------------------------------------------------------- types
def test_type_print_and_spark():
    assert tt.Type(tt.STRING).print() == "STRING(MAX)"
    assert tt.Type(tt.STRING, 10).print() == "STRING(10)"
    assert tt.Type(tt.BYTES).print() == "BYTES(MAX)"
    assert tt.Type(tt.INT64, is_array=True).print() == "ARRAY<INT64>"
    assert tt.Type(tt.NUMERIC).to_spark() == T.DecimalType(38, 9)
    assert tt.Type(tt.INT64, is_array=True).to_spark() == \
        T.ArrayType(T.LongType(), True)


# ---------------------------------------------------------------- typemaps
@pytest.mark.parametrize("src,want,issues", [
    (tt.SourceType("bool"), tt.Type(tt.BOOL), []),
    (tt.SourceType("serial"), tt.Type(tt.INT64), [SchemaIssue.SERIAL]),
    (tt.SourceType("bpchar", (8,)), tt.Type(tt.STRING, 8), []),
    (tt.SourceType("bpchar"), tt.Type(tt.STRING, 1), []),
    (tt.SourceType("bytea"), tt.Type(tt.BYTES), []),
    (tt.SourceType("date"), tt.Type(tt.DATE), []),
    (tt.SourceType("float8"), tt.Type(tt.FLOAT64), []),
    (tt.SourceType("float4"), tt.Type(tt.FLOAT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("int8"), tt.Type(tt.INT64), []),
    (tt.SourceType("int4"), tt.Type(tt.INT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("numeric", (6, 4)), tt.Type(tt.NUMERIC), []),
    (tt.SourceType("text"), tt.Type(tt.STRING), []),
    (tt.SourceType("timestamptz"), tt.Type(tt.TIMESTAMP), []),
    (tt.SourceType("timestamp"), tt.Type(tt.TIMESTAMP), [SchemaIssue.TIMESTAMP]),
    (tt.SourceType("varchar", (42,)), tt.Type(tt.STRING, 42), []),
    (tt.SourceType("varchar"), tt.Type(tt.STRING), []),
    (tt.SourceType("path"), tt.Type(tt.STRING), [SchemaIssue.NO_GOOD_TYPE]),
    (tt.SourceType("int4", array_bounds=(-1,)),
     tt.Type(tt.INT64, is_array=True), [SchemaIssue.WIDENED]),
    (tt.SourceType("text", array_bounds=(-1, -1)),
     tt.Type(tt.STRING), [SchemaIssue.MULTI_DIMENSIONAL_ARRAY]),
])
def test_pg_typemap(src, want, issues):
    got, got_issues = pg.to_target_type(src)
    assert got == want
    assert got_issues == issues


@pytest.mark.parametrize("src,want,issues", [
    (tt.SourceType("tinyint", (1,)), tt.Type(tt.BOOL), []),
    (tt.SourceType("tinyint", (2,)), tt.Type(tt.INT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("tinyint"), tt.Type(tt.INT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("double"), tt.Type(tt.FLOAT64), []),
    (tt.SourceType("float"), tt.Type(tt.FLOAT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("decimal", (10, 2)), tt.Type(tt.NUMERIC), []),
    (tt.SourceType("bigint"), tt.Type(tt.INT64), []),
    (tt.SourceType("mediumint"), tt.Type(tt.INT64), [SchemaIssue.WIDENED]),
    (tt.SourceType("bit"), tt.Type(tt.BYTES), []),
    (tt.SourceType("varchar", (20,)), tt.Type(tt.STRING, 20), []),
    (tt.SourceType("longtext"), tt.Type(tt.STRING), []),
    (tt.SourceType("set", array_bounds=(-1,)),
     tt.Type(tt.STRING, is_array=True), []),
    (tt.SourceType("json"), tt.Type(tt.STRING), []),
    (tt.SourceType("blob"), tt.Type(tt.BYTES), []),
    (tt.SourceType("datetime"), tt.Type(tt.TIMESTAMP), [SchemaIssue.DATETIME]),
    (tt.SourceType("timestamp"), tt.Type(tt.TIMESTAMP), []),
    (tt.SourceType("year"), tt.Type(tt.STRING), [SchemaIssue.TIME]),
    (tt.SourceType("geometry"), tt.Type(tt.STRING), [SchemaIssue.NO_GOOD_TYPE]),
])
def test_mysql_typemap(src, want, issues):
    got, got_issues = my.to_target_type(src)
    assert got == want
    assert got_issues == issues


@pytest.mark.parametrize("src,want", [
    ("String", tt.Type(tt.STRING)),
    ("Number", tt.Type(tt.NUMERIC)),
    ("NumberString", tt.Type(tt.STRING)),
    ("Bool", tt.Type(tt.BOOL)),
    ("Binary", tt.Type(tt.BYTES)),
    ("List", tt.Type(tt.STRING)),
    ("Map", tt.Type(tt.STRING)),
    ("StringSet", tt.Type(tt.STRING, is_array=True)),
    ("NumberSet", tt.Type(tt.NUMERIC, is_array=True)),
    ("BinarySet", tt.Type(tt.BYTES, is_array=True)),
    ("NumberStringSet", tt.Type(tt.STRING, is_array=True)),
])
def test_dynamodb_typemap(src, want):
    got, issues = dy.to_target_type(tt.SourceType(src))
    assert got == want
    assert issues == []


# ------------------------------------------------------------ schema_to_ddl
def _cart_source() -> ir.SourceTable:
    return ir.SourceTable(
        name="cart",
        col_names=["productid", "userid", "quantity"],
        col_defs={
            "productid": ir.SourceColumn("productid", tt.SourceType("text"), not_null=True),
            "userid": ir.SourceColumn("userid", tt.SourceType("text"), not_null=True),
            "quantity": ir.SourceColumn("quantity", tt.SourceType("int8")),
        },
        primary_keys=[ir.Key("userid"), ir.Key("productid")],
    )


def test_schema_to_ddl_cart():
    ctx = MigrationContext()
    ctx.src_schema["cart"] = _cart_source()
    schema_to_ddl(ctx, "postgres")
    tgt = ctx.sp_schema["cart"]
    assert tgt.col_names == ["productid", "userid", "quantity"]
    assert tgt.col_defs["productid"].type == tt.Type(tt.STRING)
    assert tgt.col_defs["productid"].not_null
    assert not tgt.col_defs["quantity"].not_null
    assert tgt.pk_cols() == ["userid", "productid"]
    st = tgt.to_struct_type()
    assert st["quantity"].dataType == T.LongType()
    assert st["productid"].nullable is False


def test_synthetic_pk_added():
    ctx = MigrationContext()
    t = _cart_source()
    t.primary_keys = []
    ctx.src_schema["cart"] = t
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()
    tgt = ctx.sp_schema["cart"]
    assert tgt.pk_cols() == ["synth_id"]
    assert tgt.col_defs["synth_id"].type == tt.Type(tt.INT64)
    assert "cart" in ctx.synthetic_pkeys


def test_fk_conversion_and_resolution():
    ctx = MigrationContext()
    ctx.src_schema["orders"] = ir.SourceTable(
        name="orders",
        col_names=["id", "cust"],
        col_defs={
            "id": ir.SourceColumn("id", tt.SourceType("int8"), not_null=True),
            "cust": ir.SourceColumn("cust", tt.SourceType("int8")),
        },
        primary_keys=[ir.Key("id")],
        foreign_keys=[ir.SourceForeignKey(
            name="fk_cust", columns=["cust"],
            refer_table="Customers", refer_columns=["ID"])],
    )
    ctx.src_schema["customers"] = ir.SourceTable(
        name="customers",
        col_names=["id"],
        col_defs={"id": ir.SourceColumn("id", tt.SourceType("int8"), not_null=True)},
        primary_keys=[ir.Key("id")],
    )
    schema_to_ddl(ctx, "postgres")
    fks = ctx.sp_schema["orders"].fks
    # case-insensitive resolution: "Customers" resolves to customers
    assert len(fks) == 1
    assert fks[0].refer_table.lower() == "customers"
    assert fks[0].name == "fk_cust"


# ---------------------------------------------------------------- context
def test_context_session_roundtrip():
    ctx = MigrationContext()
    ctx.src_schema["cart"] = _cart_source()
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()
    ctx.stats_add_row("cart", 10)
    ctx.stats_add_good_row("cart", 9)
    ctx.stats_add_bad_row("cart", 1)
    ctx.add_issue("cart", "quantity", SchemaIssue.WIDENED)
    ctx.unexpected("weird thing")
    s = ctx.to_json()
    # valid JSON and round-trips to an equivalent context
    ctx2 = MigrationContext.from_json(s)
    assert ctx2.to_json() == s
    assert ctx2.sp_schema["cart"].pk_cols() == ctx.sp_schema["cart"].pk_cols()
    assert ctx2.table_stats["cart"].bad_rows == 1
    assert SchemaIssue.WIDENED in ctx2.issues["cart"]["quantity"]


def test_unexpected_cap():
    ctx = MigrationContext()
    for i in range(2000):
        ctx.unexpected(f"cond{i}")
    assert len(ctx.unexpecteds) == 1000
