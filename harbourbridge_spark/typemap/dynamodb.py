"""DynamoDB observed-type mapping (T3, /root/reference/dynamodb/toddl.go:76-95).

Source "types" here are the inference labels produced by
sources/dynamo.py's type-vote aggregation (S22/S23): String, Bool,
Number, NumberString, Binary, Null, List, Map, StringSet, NumberSet,
NumberStringSet, BinarySet.
"""

from __future__ import annotations

from ..issues import SchemaIssue
from ..types import (BOOL, BYTES, NUMERIC, STRING, SourceType, Type, array_of)

# observed-type labels (dynamodb/schema.go:25-41)
TYPE_STRING = "String"
TYPE_BOOL = "Bool"
TYPE_NUMBER = "Number"
TYPE_NUMBER_STRING = "NumberString"
TYPE_BINARY = "Binary"
TYPE_NULL = "Null"
TYPE_LIST = "List"
TYPE_MAP = "Map"
TYPE_STRING_SET = "StringSet"
TYPE_NUMBER_SET = "NumberSet"
TYPE_NUMBER_STRING_SET = "NumberStringSet"
TYPE_BINARY_SET = "BinarySet"


_MATRIX: dict[str, Type] = {
    TYPE_STRING: Type(STRING),
    TYPE_BOOL: Type(BOOL),
    TYPE_NUMBER: Type(NUMERIC),
    TYPE_NUMBER_STRING: Type(STRING),
    TYPE_BINARY: Type(BYTES),
    TYPE_NULL: Type(STRING),
    TYPE_LIST: Type(STRING),   # serialized to JSON (dynamodb/data.go:132-152)
    TYPE_MAP: Type(STRING),    # serialized to JSON
    TYPE_STRING_SET: array_of(Type(STRING)),
    TYPE_NUMBER_SET: array_of(Type(NUMERIC)),
    TYPE_NUMBER_STRING_SET: array_of(Type(STRING)),
    TYPE_BINARY_SET: array_of(Type(BYTES)),
}


def to_target_type(src: SourceType) -> tuple[Type, list[SchemaIssue]]:
    t = _MATRIX.get(src.name)
    if t is None:
        return Type(STRING), [SchemaIssue.NO_GOOD_TYPE]
    return t, []


ALT_TARGETS: dict[str, list[str]] = {
    TYPE_NUMBER: [NUMERIC, STRING],
    TYPE_BOOL: [BOOL, STRING],
    TYPE_BINARY: [BYTES, STRING],
    TYPE_STRING: [STRING],
}
