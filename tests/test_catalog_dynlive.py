"""Tests for catalog creation (K3/K4) and the dynamo live scanner seam."""
import json
import pytest
from harbourbridge_spark import schema_ir as ir, types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.toddl import schema_to_ddl
from harbourbridge_spark.sink.parquet import create_database
from harbourbridge_spark.sources import dynamo_live


def _ctx():
    ctx = MigrationContext()
    ctx.src_schema["singers"] = ir.SourceTable(
        name="singers", col_names=["id", "name"],
        col_defs={"id": ir.SourceColumn("id", tt.SourceType("int8"), not_null=True),
                  "name": ir.SourceColumn("name", tt.SourceType("text"))},
        primary_keys=[ir.Key("id")])
    ctx.src_schema["albums"] = ir.SourceTable(
        name="albums", col_names=["id", "aid"],
        col_defs={"id": ir.SourceColumn("id", tt.SourceType("int8"), not_null=True),
                  "aid": ir.SourceColumn("aid", tt.SourceType("int8"), not_null=True)},
        primary_keys=[ir.Key("id"), ir.Key("aid")],
        foreign_keys=[ir.SourceForeignKey(name="fk_s", columns=["id"],
                                          refer_table="singers", refer_columns=["id"])])
    schema_to_ddl(ctx, "postgres")
    return ctx


def test_create_database(spark, tmp_path):
    ctx = _ctx()
    create_database(spark, ctx, "migr_test", location=str(tmp_path))
    try:
        cols = spark.sql("DESCRIBE migr_test.singers").collect()
        assert [c.col_name for c in cols[:2]] == ["id", "name"]
        props = {r.key: r.value for r in
                 spark.sql("SHOW TBLPROPERTIES migr_test.albums").collect()}
        assert json.loads(props["primary_keys"]) == [["id", False], ["aid", False]]
        fks = json.loads(props["foreign_keys"])
        assert fks[0]["refer_table"] == "singers"
        # empty but queryable
        assert spark.sql("SELECT COUNT(*) c FROM migr_test.albums").first().c == 0
    finally:
        spark.sql("DROP DATABASE IF EXISTS migr_test CASCADE")


class FakeDynamoClient:
    def __init__(self):
        self.items = [{"a": {"S": f"v{i}"}, "n": {"N": str(i)}} for i in range(25)]

    def list_tables(self, **kw):
        if "ExclusiveStartTableName" in kw:
            return {"TableNames": ["t2"]}
        return {"TableNames": ["t1"], "LastEvaluatedTableName": "t1"}

    def describe_table(self, TableName):
        return {"Table": {
            "KeySchema": [{"AttributeName": "a", "KeyType": "HASH"}],
            "GlobalSecondaryIndexes": [
                {"IndexName": "gsi1",
                 "KeySchema": [{"AttributeName": "n", "KeyType": "HASH"}]}],
            "ItemCount": 25}}

    def scan(self, TableName, Segment, TotalSegments, **kw):
        mine = [it for i, it in enumerate(self.items)
                if i % TotalSegments == Segment]
        half = len(mine) // 2
        if "ExclusiveStartKey" not in kw and half:
            return {"Items": mine[:half], "LastEvaluatedKey": {"i": half}}
        return {"Items": mine[half:] if half else mine}


def test_dynamo_live_seam(spark):
    assert dynamo_live.list_tables(FakeDynamoClient()) == ["t1", "t2"]
    meta = dynamo_live.describe_table("t1", FakeDynamoClient())
    assert meta["partition_keys"] == ["a"]
    assert meta["indexes"][0]["name"] == "gsi1"
    assert meta["approx_rows"] == 25

    # the factory crosses the driver->executor boundary: define the
    # fake inline so cloudpickle serializes it by value (the test
    # module is not importable on executors)
    def make_client():
        class _Fake:
            items = [{"a": {"S": f"v{i}"}, "n": {"N": str(i)}}
                     for i in range(25)]

            def scan(self, TableName, Segment, TotalSegments, **kw):
                mine = [it for i, it in enumerate(self.items)
                        if i % TotalSegments == Segment]
                half = len(mine) // 2
                if "ExclusiveStartKey" not in kw and half:
                    return {"Items": mine[:half],
                            "LastEvaluatedKey": {"i": half}}
                return {"Items": mine[half:] if half else mine}
        return _Fake()

    df = dynamo_live.scan_items(spark, "t1", num_segments=4,
                                client_factory=make_client)
    items = [json.loads(r.item) for r in df.collect()]
    assert len(items) == 25
    assert {i["a"]["S"] for i in items} == {f"v{i}" for i in range(25)}
