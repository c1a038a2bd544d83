"""Target type system: the 8 scalar types + single-level ARRAY.

Mirrors the reference's target type surface
(/root/reference/spanner/ddl/ast.go:31-64): BOOL, BYTES(n|MAX), DATE,
FLOAT64, INT64, STRING(n|MAX), TIMESTAMP, NUMERIC, plus ARRAY<T>.
``MAX`` is represented as ``length=None`` (the reference uses the
sentinel math.MaxInt64, spanner/ddl/ast.go:49).

Each target type maps onto exactly one Spark SQL type; length limits
(STRING(n)/BYTES(n)) are kept as metadata and enforced by validation
expressions, since Spark types carry no length.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T

# Scalar type names (spanner/ddl/ast.go:31-50)
BOOL = "BOOL"
BYTES = "BYTES"
DATE = "DATE"
FLOAT64 = "FLOAT64"
INT64 = "INT64"
STRING = "STRING"
TIMESTAMP = "TIMESTAMP"
NUMERIC = "NUMERIC"

SCALAR_TYPES = (BOOL, BYTES, DATE, FLOAT64, INT64, STRING, TIMESTAMP, NUMERIC)

# Spanner NUMERIC holds 29 digits before / 9 after the decimal point
# (postgres/toddl.go:140-143). Spark's DecimalType(38, 9) is a strict
# superset; the 29.9 envelope is enforced by `numeric_fits` validation.
NUMERIC_PRECISION = 38
NUMERIC_SCALE = 9
NUMERIC_INT_DIGITS = 29  # digits allowed before the point


@dataclass(frozen=True)
class Type:
    """A target type: scalar or single-level array of a scalar.

    ``length`` is only meaningful for STRING/BYTES; ``None`` means MAX.
    Multi-dimensional arrays do not exist here — the type mappers
    degrade them to STRING(MAX) (postgres/toddl.go:67-69).
    """

    name: str
    length: Optional[int] = None
    is_array: bool = False

    def __post_init__(self) -> None:
        if self.name not in SCALAR_TYPES:
            raise ValueError(f"unknown target type: {self.name!r}")

    # -- printing (spanner/ddl/ast.go:67-80) --------------------------------
    def print(self) -> str:
        if self.name in (STRING, BYTES):
            n = "MAX" if self.length is None else str(self.length)
            s = f"{self.name}({n})"
        else:
            s = self.name
        return f"ARRAY<{s}>" if self.is_array else s

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.print()

    # -- Spark mapping ------------------------------------------------------
    def to_spark(self) -> T.DataType:
        scalar = _SPARK_SCALARS[self.name]
        if self.is_array:
            return T.ArrayType(scalar, containsNull=True)
        return scalar

    @staticmethod
    def from_spark(dt: T.DataType) -> "Type":
        """Best-effort reverse mapping (used when importing existing Spark
        tables into the migration context)."""
        if isinstance(dt, T.ArrayType):
            inner = Type.from_spark(dt.elementType)
            if inner.is_array:
                # nested arrays degrade to STRING(MAX) like the reference
                return Type(STRING)
            return Type(inner.name, inner.length, is_array=True)
        for name, spark_t in _SPARK_SCALARS.items():
            if dt == spark_t:
                return Type(name)
        if isinstance(dt, T.DecimalType):
            return Type(NUMERIC)
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return Type(INT64)
        if isinstance(dt, T.FloatType):
            return Type(FLOAT64)
        if isinstance(dt, T.TimestampNTZType):
            return Type(TIMESTAMP)
        return Type(STRING)


_SPARK_SCALARS: dict[str, T.DataType] = {
    BOOL: T.BooleanType(),
    BYTES: T.BinaryType(),
    DATE: T.DateType(),
    FLOAT64: T.DoubleType(),
    INT64: T.LongType(),
    STRING: T.StringType(),
    TIMESTAMP: T.TimestampType(),
    NUMERIC: T.DecimalType(NUMERIC_PRECISION, NUMERIC_SCALE),
}


# Convenience constructors
def string(length: Optional[int] = None) -> Type:
    return Type(STRING, length)


def bytes_(length: Optional[int] = None) -> Type:
    return Type(BYTES, length)


def array_of(t: Type) -> Type:
    if t.is_array:
        return Type(STRING)  # nested -> STRING(MAX), like the reference
    return Type(t.name, t.length, is_array=True)


@dataclass(frozen=True)
class SourceType:
    """A source-dialect type: name + modifiers + array bounds.

    Mirrors schema.Type (/root/reference/schema/schema.go:83-87):
    ``mods`` are length/precision arguments (varchar(8) -> [8],
    numeric(6,4) -> [6,4]); ``array_bounds`` is one entry per array
    dimension (-1 = unbounded).
    """

    name: str
    mods: tuple = field(default_factory=tuple)
    array_bounds: tuple = field(default_factory=tuple)

    def print(self) -> str:  # schema/schema.go:102-123
        s = self.name
        if self.mods:
            s += "(" + ",".join(str(m) for m in self.mods) + ")"
        for b in self.array_bounds:
            s += "[]" if b == -1 else f"[{b}]"
        return s

    def __str__(self) -> str:  # pragma: no cover
        return self.print()
