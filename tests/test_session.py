"""Session-editing API tests (mirrors web/web_test.go: typemap
overrides, column edit guards, interleave, constraint CRUD, rollback)."""

import pytest

from harbourbridge_spark import schema_ir as ir
from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.session import EditSession, SessionError
from harbourbridge_spark.toddl import schema_to_ddl


def _singers_ctx() -> MigrationContext:
    ctx = MigrationContext()
    ctx.src_schema["singers"] = ir.SourceTable(
        name="singers", col_names=["singerid", "name", "score"],
        col_defs={
            "singerid": ir.SourceColumn("singerid", tt.SourceType("int8"), not_null=True),
            "name": ir.SourceColumn("name", tt.SourceType("text")),
            "score": ir.SourceColumn("score", tt.SourceType("int4")),
        },
        primary_keys=[ir.Key("singerid")])
    ctx.src_schema["albums"] = ir.SourceTable(
        name="albums", col_names=["singerid", "albumid", "title"],
        col_defs={
            "singerid": ir.SourceColumn("singerid", tt.SourceType("int8"), not_null=True),
            "albumid": ir.SourceColumn("albumid", tt.SourceType("int8"), not_null=True),
            "title": ir.SourceColumn("title", tt.SourceType("text")),
        },
        primary_keys=[ir.Key("singerid"), ir.Key("albumid")],
        foreign_keys=[ir.SourceForeignKey(
            name="fk_singers", columns=["singerid"],
            refer_table="singers", refer_columns=["singerid"])])
    ctx.src_schema["loose"] = ir.SourceTable(
        name="loose", col_names=["v"],
        col_defs={"v": ir.SourceColumn("v", tt.SourceType("text"))})
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()
    return ctx


@pytest.fixture
def sess():
    return EditSession(_singers_ctx(), "postgres")


def test_interleave_prefix(sess):
    st = sess.set_parent_table("albums", update=True)
    assert st.possible and st.parent == "singers"
    assert sess.ctx.sp_schema["albums"].parent == "singers"
    # FK consumed by the interleave
    assert sess.ctx.sp_schema["albums"].fks == []


def test_interleave_rejects_synthetic_pk(sess):
    st = sess.set_parent_table("loose")
    assert not st.possible
    assert st.comment == "Has synthetic pk"


def test_typemap_global_override(sess):
    sess.set_type_map_global("int4", tt.STRING)
    assert sess.ctx.sp_schema["singers"].col_defs["score"].type == \
        tt.Type(tt.STRING)
    # int8 columns untouched
    assert sess.ctx.sp_schema["singers"].col_defs["singerid"].type == \
        tt.Type(tt.INT64)
    with pytest.raises(SessionError):
        sess.set_type_map_global("int4", tt.BYTES)


def test_column_guards(sess):
    with pytest.raises(SessionError):  # PK column
        sess.remove_column("singers", "singerid")
    with pytest.raises(SessionError):  # FK source column
        sess.remove_column("albums", "singerid")
    # name is free
    sess.remove_column("singers", "name")
    assert "name" not in sess.ctx.sp_schema["singers"].col_defs


def test_rename_guards_interleave(sess):
    sess.set_parent_table("albums", update=True)
    with pytest.raises(SessionError):  # PK col in parent-child relation
        sess.rename_column("albums", "singerid", "sid")
    sess.rename_column("albums", "title", "album_title")
    assert "album_title" in sess.ctx.sp_schema["albums"].col_defs
    # name maps stay bidirectional
    assert sess.ctx.to_target["albums"]["cols"]["title"] == "album_title"


def test_change_type_and_not_null(sess):
    sess.change_column_type("singers", "score", tt.STRING)
    assert sess.ctx.sp_schema["singers"].col_defs["score"].type.name == tt.STRING
    sess.set_not_null("singers", "score", True)
    assert sess.ctx.sp_schema["singers"].col_defs["score"].not_null


def test_constraint_crud_and_namespace(sess):
    sess.add_index("singers", "idx_score", False, [("score", True)])
    with pytest.raises(SessionError):  # collides with table name
        sess.rename_index("singers", "idx_score", "albums")
    sess.rename_index("singers", "idx_score", "idx_score2")
    sess.drop_secondary_index("singers", "idx_score2")
    with pytest.raises(SessionError):
        sess.drop_secondary_index("singers", "idx_score2")
    sess.drop_foreign_key("albums", "fk_singers")
    assert sess.ctx.sp_schema["albums"].fks == []


def test_snapshot_rollback(sess):
    sess.snapshot()
    sess.remove_column("singers", "name")
    sess.rollback()
    assert "name" in sess.ctx.sp_schema["singers"].col_defs


def test_rate_colors(sess):
    colors = sess.conversion_rate_color()
    # singers has Widened note only -> GREEN; loose has synthetic pk -> BLUE
    assert colors["singers"] == "GREEN"
    assert colors["loose"] == "BLUE"
