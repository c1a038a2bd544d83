"""Validation-expression tests: STRING(n)/BYTES(n) length limits, the
NUMERIC 29.9 envelope, NOT NULL, and unique-constraint checks."""

import decimal

import pytest

from harbourbridge_spark import schema_ir as ir
from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.toddl import schema_to_ddl
from harbourbridge_spark.validation import (validate_table,
                                            validate_unique_constraints)


@pytest.fixture
def vctx():
    ctx = MigrationContext()
    ctx.src_schema["t"] = ir.SourceTable(
        name="t", col_names=["id", "name", "amount", "tags"],
        col_defs={
            "id": ir.SourceColumn("id", tt.SourceType("int8"), not_null=True),
            "name": ir.SourceColumn("name", tt.SourceType("varchar", (5,))),
            "amount": ir.SourceColumn("amount", tt.SourceType("numeric")),
            "tags": ir.SourceColumn(
                "tags", tt.SourceType("varchar", (3,), (-1,))),
        },
        primary_keys=[ir.Key("id")],
        indexes=[ir.SourceIndex(name="u_name", unique=True,
                                keys=[ir.Key("name")])])
    schema_to_ddl(ctx, "postgres")
    return ctx


def test_validate_table(spark, vctx):
    rows = [
        (1, "ok", decimal.Decimal("5"), ["a", "b"]),
        (2, "toolong", decimal.Decimal("5"), ["a"]),           # name > 5
        (None, "ok3", None, ["a"]),                            # id NULL
        (5, "ok4", decimal.Decimal("5"), ["wide"]),            # element > 3
    ]
    df = spark.createDataFrame(
        rows, "id long, name string, amount decimal(38,9), tags array<string>")
    bad, counts = validate_table(vctx, df, "t")
    assert counts["name_limit"] == 1
    # NUMERIC has no check: decimal(38,9) IS the 29.9 envelope
    assert "amount_limit" not in counts
    assert counts["id_not_null"] == 1
    assert counts["tags_limit"] == 1
    viol = {tuple(r["_violations"]) for r in bad.collect()}
    assert ("name_limit",) in viol
    assert ("id_not_null",) in viol


def test_validate_unique(spark, vctx):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (3, "c")], "id long, name string")
    out = validate_unique_constraints(vctx, df, "t")
    assert out["PRIMARY_KEY"] == 1   # id=3 duplicated
    assert out["u_name"] == 1        # name='a' duplicated
