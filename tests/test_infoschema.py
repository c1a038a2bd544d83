"""Info-schema reader tests with scripted query/result pairs (mirrors
postgres/infoschema_test.go and mysql/infoschema_test.go SQL mocks)."""

from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.sources import infoschema as isch


def _pg_runner(sql):
    if "information_schema.tables" in sql:
        return [("public", "cart")]
    if "element_types" in sql:
        return [
            ("productid", "text", None, "NO", None, None, None, None),
            ("userid", "character varying", None, "NO", None, 36, None, None),
            ("quantity", "bigint", None, "YES", None, None, 64, 0),
            ("price", "numeric", None, "YES", "0.0", None, 10, 2),
            ("tags", "ARRAY", "text", "YES", None, None, None, None),
        ]
    if "TABLE_CONSTRAINTS" in sql:
        return [("userid", "PRIMARY KEY"), ("productid", "PRIMARY KEY"),
                ("quantity", "CHECK")]
    if "pg_constraint" in sql:
        return [("fk_prod", "public", "products", "productid", "id")]
    if "pg_index" in sql:
        return [("idx_qty", "quantity", 1, True, "DESC")]
    if "COUNT(*)" in sql:
        return [(42,)]
    raise AssertionError(f"unexpected query: {sql[:60]}")


def test_pg_info_schema():
    ctx = MigrationContext()
    isch.process_pg_info_schema(ctx, _pg_runner)
    t = ctx.src_schema["cart"]
    assert t.col_names == ["productid", "userid", "quantity", "price", "tags"]
    assert t.col_defs["userid"].type == tt.SourceType("character varying", (36,))
    assert t.col_defs["price"].type == tt.SourceType("numeric", (10, 2))
    assert t.col_defs["tags"].type == tt.SourceType("text", (), (-1,))
    assert t.col_defs["quantity"].ignored.check
    assert [k.column for k in t.primary_keys] == ["userid", "productid"]
    assert t.foreign_keys[0].refer_table == "products"
    idx = [i for i in t.indexes if i.name == "idx_qty"][0]
    assert idx.unique and idx.keys[0].desc
    # target conversion happened
    tgt = ctx.sp_schema["cart"]
    assert tgt.col_defs["tags"].type == tt.Type(tt.STRING, is_array=True)
    isch.set_pg_row_stats(ctx, _pg_runner)
    assert ctx.table_stats["cart"].rows == 42


def _mysql_runner(sql):
    if "information_schema.tables" in sql:
        return [("products",)]
    if "information_schema.COLUMNS" in sql:
        return [
            ("id", "bigint", "bigint(20)", "NO", None, None, 19, 0,
             "auto_increment"),
            ("flag", "tinyint", "tinyint(1)", "YES", None, None, 3, 0, ""),
            ("name", "varchar", "varchar(100)", "YES", None, 100, None, None, ""),
            ("loc", "point", "point", "YES", None, None, None, None, ""),
        ]
    if "TABLE_CONSTRAINTS" in sql:
        return [("id", "PRIMARY KEY")]
    if "KEY_COLUMN_USAGE" in sql:
        return []
    if "STATISTICS" in sql:
        return [("idx_name", "name", 1, "A", 1)]
    raise AssertionError(f"unexpected query: {sql[:60]}")


def test_mysql_info_schema():
    ctx = MigrationContext()
    isch.process_mysql_info_schema(ctx, _mysql_runner, "shop")
    t = ctx.src_schema["products"]
    assert t.col_defs["id"].ignored.auto_increment
    assert t.col_defs["flag"].type == tt.SourceType("tinyint", (1,))
    tgt = ctx.sp_schema["products"]
    assert tgt.col_defs["flag"].type == tt.Type(tt.BOOL)
    # spatial -> NoGoodType -> STRING; data query wraps in ST_AsText
    assert tgt.col_defs["loc"].type == tt.Type(tt.STRING)
    q = isch.mysql_data_query(ctx, "products")
    assert "ST_AsText(`loc`) AS `loc`" in q
    assert q.startswith("SELECT `id`, `flag`, `name`")
    idx = t.indexes[0]
    assert idx.name == "idx_name" and not idx.unique
