"""DynamoDB-style inference tests (mirrors dynamodb/schema_test.go:
full-type fixture, inference thresholds, and data conversion)."""

import decimal
import json

import pytest

from harbourbridge_spark import types as tt
from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.sources import dynamo


def _items_df(spark, items):
    return spark.createDataFrame([(json.dumps(i),) for i in items], "item string")


def test_full_type_inference_and_mapping(spark):
    """One row exercising all observed types -> T3 target mapping."""
    item = {
        "a": {"S": "hello"},
        "b": {"N": "123.456"},
        "c": {"N": "9" * 30 + ".5"},          # overflows 29.9 -> NumberString
        "d": {"BOOL": True},
        "e": {"B": "aGVsbG8="},
        "f": {"L": [{"S": "x"}, {"N": "1"}]},
        "g": {"M": {"k": {"S": "v"}}},
        "h": {"SS": ["s1", "s2"]},
        "i": {"NS": ["1.5", "2"]},
        "j": {"BS": ["aGk="]},
        "k": {"NS": ["1", "9" * 30]},          # element overflow -> NumberStringSet
    }
    ctx, result = dynamo.migrate_dynamo_items(
        spark, _items_df(spark, [item] * 10), "t", partition_keys=["a"])
    tgt = ctx.sp_schema["t"]
    assert tgt.col_defs["a"].type == tt.Type(tt.STRING)
    assert tgt.col_defs["b"].type == tt.Type(tt.NUMERIC)
    assert tgt.col_defs["c"].type == tt.Type(tt.STRING)
    assert tgt.col_defs["d"].type == tt.Type(tt.BOOL)
    assert tgt.col_defs["e"].type == tt.Type(tt.BYTES)
    assert tgt.col_defs["f"].type == tt.Type(tt.STRING)
    assert tgt.col_defs["g"].type == tt.Type(tt.STRING)
    assert tgt.col_defs["h"].type == tt.Type(tt.STRING, is_array=True)
    assert tgt.col_defs["i"].type == tt.Type(tt.NUMERIC, is_array=True)
    assert tgt.col_defs["j"].type == tt.Type(tt.BYTES, is_array=True)
    assert tgt.col_defs["k"].type == tt.Type(tt.STRING, is_array=True)
    assert tgt.pk_cols() == ["a"]

    row = result.good.first()
    assert row.a == "hello"
    assert row.b == decimal.Decimal("123.456000000")
    assert row.d is True
    assert bytes(row.e) == b"hello"
    assert row.h == ["s1", "s2"]
    assert [str(x) for x in row.i] == ["1.500000000", "2.000000000"]
    assert json.loads(row.g) == {"k": {"S": "v"}}
    assert result.bad.count() == 0


def test_inference_thresholds(spark):
    """Noise/nullability/conflict thresholds (dynamodb/schema.go:236-292)."""
    rows = []
    # 'a': always string; 'b': string in 96%, number in 4% (< 5% conflict
    # but > 0.1% noise -> two candidates at >0.1%: only string above 5%
    # -> string); 'c': absent in 2% of rows -> nullable
    for i in range(1000):
        item = {"a": {"S": f"v{i}"}}
        if i < 40:
            item["b"] = {"N": "1"}
        else:
            item["b"] = {"S": "x"}
        if i >= 20:
            item["c"] = {"S": "y"}
        rows.append(item)
    ctx = MigrationContext()
    dynamo.infer_schema(ctx, _items_df(spark, rows), "t", ["a"])
    t = ctx.src_schema["t"]
    assert t.col_defs["b"].type.name == "String"
    assert t.col_defs["c"].not_null is False
    assert t.col_defs["a"].not_null is True


def test_conflict_to_string(spark):
    """Two candidates both above 5% -> String fallback."""
    rows = [{"x": {"N": "1"}} for _ in range(50)] + \
           [{"x": {"S": "s"}} for _ in range(50)]
    ctx = MigrationContext()
    dynamo.infer_schema(ctx, _items_df(spark, rows), "t")
    assert ctx.src_schema["t"].col_defs["x"].type.name == "String"


def test_bad_row_quarantine(spark):
    """A Number column receiving an unparsable value quarantines the row."""
    rows = [{"k": {"S": "a"}, "v": {"N": "1.5"}} for _ in range(100)]
    rows.append({"k": {"S": "z"}, "v": {"N": "not-a-number"}})
    ctx, result = dynamo.migrate_dynamo_items(
        spark, _items_df(spark, rows), "t", partition_keys=["k"])
    assert result.good.count() == 100
    bad = result.bad.collect()
    assert len(bad) == 1
    assert bad[0]["_hb_errs"] == ["v"]


def test_infer_data_types_reference_matrix():
    """The EXACT 12-case threshold matrix of
    dynamodb/schema_test.go TestInferDataTypes:272-341 (1000 rows,
    0.1% error / 5% conflict thresholds), including the skip rules for
    empty/all-noise columns."""
    from harbourbridge_spark.sources.dynamo import infer_data_types

    stats = {
        "all_rows_not_null": {"Number": 1000},
        "err_row": {"NumberString": 1, "Number": 999},
        "err_null_row": {"Number": 999},
        "enough_null_row": {"Number": 900},
        "not_conflict_row": {"String": 50, "Number": 950},
        "conflict_row": {"String": 51, "Number": 949},
        "equal_conflict_rows": {"String": 500, "Number": 500},
        "not_conflict_row_with_noise":
            {"String": 40, "Number": 760, "NumberString": 10},
        "conflict_row_with_noise":
            {"String": 41, "Number": 759, "NumberString": 10},
        "equal_conflict_row_with_noise":
            {"String": 400, "Number": 400, "NumberString": 10},
        "empty_records": {"String": 0},
        "empty_stats": {},
    }
    rows = [{"attr": a, "obs_type": t, "n": n}
            for a, m in stats.items() for t, n in m.items()]
    got = infer_data_types(rows, 1000)
    want = {
        "all_rows_not_null": ("Number", False),
        "err_row": ("Number", False),
        "err_null_row": ("Number", False),
        "enough_null_row": ("Number", True),
        "not_conflict_row": ("Number", False),
        "conflict_row": ("String", False),
        "equal_conflict_rows": ("String", False),
        "not_conflict_row_with_noise": ("Number", True),
        "conflict_row_with_noise": ("String", True),
        "equal_conflict_row_with_noise": ("String", True),
        # empty_records / empty_stats: skipped entirely
    }
    assert got == want


def test_inference_is_escape_mode_independent(spark):
    """The type-classifier SQL must mean the same thing under BOTH
    parser escape modes: the session-wide escapedStringLiterals conf
    is toggled freely by the template convention, and a '\\.'-style
    regex silently flips meaning with it (the r11 regression: every
    Number classified NumberString -> inference String -> quarantine
    disabled whenever a template entry ran first in the session)."""
    rows = [{"k": {"S": "a"}, "v": {"N": "1.5"}} for _ in range(100)]
    rows.append({"k": {"S": "z"}, "v": {"N": "not-a-number"}})
    for esc in ("true", "false"):
        spark.conf.set("spark.sql.parser.escapedStringLiterals", esc)
        ctx, result = dynamo.migrate_dynamo_items(
            spark, _items_df(spark, rows), "t", partition_keys=["k"])
        assert result.good.count() == 100, esc
        assert result.bad.count() == 1, esc
