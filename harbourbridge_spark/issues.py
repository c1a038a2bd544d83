"""Schema-conversion issue taxonomy + severity catalog.

Mirrors the SchemaIssue enum (/root/reference/internal/convert.go:62-78)
and the IssueDB severity/batching table
(/root/reference/internal/report.go:248-267).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class SchemaIssue(enum.Enum):
    DEFAULT_VALUE = "DefaultValue"
    FOREIGN_KEY = "ForeignKey"
    MISSING_PRIMARY_KEY = "MissingPrimaryKey"
    MULTI_DIMENSIONAL_ARRAY = "MultiDimensionalArray"
    NO_GOOD_TYPE = "NoGoodType"
    NUMERIC = "Numeric"
    NUMERIC_THAT_FITS = "NumericThatFits"
    DECIMAL = "Decimal"
    DECIMAL_THAT_FITS = "DecimalThatFits"
    SERIAL = "Serial"
    AUTO_INCREMENT = "AutoIncrement"
    TIMESTAMP = "Timestamp"
    DATETIME = "Datetime"
    WIDENED = "Widened"
    TIME = "Time"


class Severity(enum.Enum):
    WARNING = "warning"
    NOTE = "note"


@dataclass(frozen=True)
class IssueInfo:
    brief: str
    severity: Severity
    # batch=True: report groups all columns with this issue into one line
    batch: bool = False


# internal/report.go:248-267 (brief strings paraphrased, semantics kept)
ISSUE_DB: dict[SchemaIssue, IssueInfo] = {
    SchemaIssue.DEFAULT_VALUE: IssueInfo("Some columns have default values which are not migrated", Severity.WARNING, batch=True),
    SchemaIssue.FOREIGN_KEY: IssueInfo("Foreign key constraint actions are not supported", Severity.WARNING),
    SchemaIssue.MISSING_PRIMARY_KEY: IssueInfo("Table has no primary key; a synthetic key was added", Severity.WARNING),
    SchemaIssue.MULTI_DIMENSIONAL_ARRAY: IssueInfo("Multi-dimensional arrays mapped to STRING(MAX)", Severity.WARNING),
    SchemaIssue.NO_GOOD_TYPE: IssueInfo("No appropriate target type; mapped to STRING(MAX)", Severity.WARNING, batch=True),
    SchemaIssue.NUMERIC: IssueInfo("Target NUMERIC capacity is smaller than source numeric", Severity.WARNING),
    SchemaIssue.NUMERIC_THAT_FITS: IssueInfo("Source numeric fits target NUMERIC", Severity.NOTE),
    SchemaIssue.DECIMAL: IssueInfo("Target NUMERIC capacity is smaller than source decimal", Severity.WARNING),
    SchemaIssue.DECIMAL_THAT_FITS: IssueInfo("Source decimal fits target NUMERIC", Severity.NOTE),
    SchemaIssue.SERIAL: IssueInfo("Serial auto-generation is not supported; values must be generated", Severity.WARNING, batch=True),
    SchemaIssue.AUTO_INCREMENT: IssueInfo("AUTO_INCREMENT is not supported; values must be generated", Severity.WARNING, batch=True),
    SchemaIssue.TIMESTAMP: IssueInfo("timestamp without time zone stored as UTC-naive TIMESTAMP", Severity.NOTE, batch=True),
    SchemaIssue.DATETIME: IssueInfo("datetime stored as UTC-naive TIMESTAMP", Severity.NOTE, batch=True),
    SchemaIssue.WIDENED: IssueInfo("Some columns were widened to INT64/FLOAT64", Severity.NOTE, batch=True),
    SchemaIssue.TIME: IssueInfo("time/year types mapped to STRING(MAX)", Severity.NOTE, batch=True),
}
