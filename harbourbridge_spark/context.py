"""MigrationContext: the single mutable conversion-state object.

Mirrors internal.Conv (/root/reference/internal/convert.go:26-181):
both schemas, bidirectional name maps, issues, synthetic keys, stats,
bad-row samples, processing mode, timezone — and, like the reference,
the JSON serialization of this object IS the session-file format
(conversion/conversion.go:606-657).

Differences from the reference are deliberate Spark-first choices:
- there is no row-at-a-time ``dataSink``; data flows as DataFrames and
  stats come back from ``df.observe()`` / counts (convert.py, sink/).
- per-row bad samples are capped DataFrame side-outputs, not an
  in-memory buffer.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from . import schema_ir as ir
from .issues import SchemaIssue
from .mapping import NamePool

# Caps mirroring the reference
MAX_UNEXPECTEDS = 1000          # internal/convert.go:297
BAD_ROW_SAMPLE_BYTES = 10 << 20  # internal/convert.go:131 (10 MB)

SCHEMA_MODE = "schema"
DATA_MODE = "data"


@dataclass
class SyntheticPKey:
    """internal.SyntheticPKey (internal/convert.go:51-54): the added key
    column plus the next sequence value (kept for session resume)."""

    col: str
    sequence: int = 0


@dataclass
class TableStats:
    rows: int = 0
    good_rows: int = 0
    bad_rows: int = 0


@dataclass
class StatementStat:
    """Per-statement-type counters (internal/convert.go:114-119)."""

    schema: int = 0
    data: int = 0
    skip: int = 0
    error: int = 0


class MigrationContext:
    """Everything about a migration in one JSON-round-trippable object."""

    def __init__(self) -> None:
        self.src_schema: dict[str, ir.SourceTable] = {}
        self.sp_schema: dict[str, ir.TargetTable] = {}
        # bidirectional name maps: {src_table: {"name": target, "cols": {src: tgt}}}
        self.to_target: dict[str, dict] = {}
        self.to_source: dict[str, dict] = {}
        self.name_pool = NamePool()
        self.synthetic_pkeys: dict[str, SyntheticPKey] = {}
        self.issues: dict[str, dict[str, list[SchemaIssue]]] = {}
        self.table_stats: dict[str, TableStats] = {}
        self.statement_stats: dict[str, StatementStat] = {}
        self.unexpecteds: dict[str, int] = {}
        self.reparsed = 0
        self.mode = SCHEMA_MODE
        # timezone of the dump for naive-timestamp interpretation
        self.timezone_offset: str = "+00:00"   # mysql-style captured offset
        self.location: Optional[str] = None    # pg-style zone name
        self.bad_row_samples: list[tuple[str, list[str]]] = []
        self._bad_sample_bytes = 0

    # -- mode (internal/convert.go:148-168) ---------------------------------
    def set_schema_mode(self) -> None:
        self.mode = SCHEMA_MODE

    def set_data_mode(self) -> None:
        self.mode = DATA_MODE

    def schema_mode(self) -> bool:
        return self.mode == SCHEMA_MODE

    def data_mode(self) -> bool:
        return self.mode == DATA_MODE

    # -- issues -------------------------------------------------------------
    def add_issue(self, table: str, col: str, issue: SchemaIssue) -> None:
        cols = self.issues.setdefault(table, {})
        lst = cols.setdefault(col, [])
        if issue not in lst:
            lst.append(issue)

    # -- stats (internal/convert.go:289-367) --------------------------------
    def unexpected(self, condition: str) -> None:
        """Capped-cardinality counter of unexpected conditions."""
        if condition in self.unexpecteds:
            self.unexpecteds[condition] += 1
        elif len(self.unexpecteds) < MAX_UNEXPECTEDS:
            self.unexpecteds[condition] = 1

    def stats_add_row(self, table: str, n: int = 1) -> None:
        self._tstats(table).rows += n

    def stats_add_good_row(self, table: str, n: int = 1) -> None:
        self._tstats(table).good_rows += n

    def stats_add_bad_row(self, table: str, n: int = 1) -> None:
        self._tstats(table).bad_rows += n

    def _tstats(self, table: str) -> TableStats:
        return self.table_stats.setdefault(table, TableStats())

    def _sstats(self, stmt_type: str) -> StatementStat:
        return self.statement_stats.setdefault(stmt_type, StatementStat())

    def skip_statement(self, stmt_type: str) -> None:
        if self.schema_mode():
            self._sstats(stmt_type).skip += 1

    def error_in_statement(self, stmt_type: str) -> None:
        if self.schema_mode():
            self._sstats(stmt_type).error += 1

    def schema_statement(self, stmt_type: str) -> None:
        if self.schema_mode():
            self._sstats(stmt_type).schema += 1

    def data_statement(self, stmt_type: str) -> None:
        if self.schema_mode():
            self._sstats(stmt_type).data += 1

    def collect_bad_row(self, table: str, vals: list[str]) -> None:
        """Keep a bounded sample of bad rows (internal/convert.go:228-249)."""
        nbytes = sum(len(v) for v in vals) + 16
        if self._bad_sample_bytes + nbytes <= BAD_ROW_SAMPLE_BYTES:
            self.bad_row_samples.append((table, vals))
            self._bad_sample_bytes += nbytes

    def rows(self) -> int:
        return sum(s.rows for s in self.table_stats.values())

    def bad_rows(self) -> int:
        return sum(s.bad_rows for s in self.table_stats.values())

    # -- synthetic keys (internal/convert.go:253-287) -----------------------
    def add_synthetic_pkeys(self) -> None:
        """Give every target table without a PK a synthetic INT64 key
        column named synth_id (deduped synth_id0, synth_id1, ...)."""
        for name, table in self.sp_schema.items():
            if not table.pks:
                col = "synth_id"
                i = 0
                while col in table.col_defs:
                    col = f"synth_id{i}"
                    i += 1
                from .types import Type, INT64
                table.col_names.append(col)
                table.col_defs[col] = ir.TargetColumn(col, Type(INT64))
                table.pks = [ir.IndexKey(col)]
                self.synthetic_pkeys[name] = SyntheticPKey(col)
                src = self.to_source.get(name, {}).get("name", name)
                self.add_issue(src, col, SchemaIssue.MISSING_PRIMARY_KEY)

    # -- session file (conversion/conversion.go:606-657) --------------------
    def to_json(self) -> str:
        d = {
            "src_schema": {k: ir.source_table_to_json(v) for k, v in self.src_schema.items()},
            "sp_schema": {k: ir.target_table_to_json(v) for k, v in self.sp_schema.items()},
            "to_target": self.to_target,
            "to_source": self.to_source,
            "used_names": sorted(self.name_pool.used),
            "synthetic_pkeys": {k: {"col": v.col, "sequence": v.sequence}
                                for k, v in self.synthetic_pkeys.items()},
            "issues": {t: {c: [i.value for i in lst] for c, lst in cols.items()}
                       for t, cols in self.issues.items()},
            "table_stats": {t: vars(s).copy() for t, s in self.table_stats.items()},
            "statement_stats": {t: vars(s).copy() for t, s in self.statement_stats.items()},
            "unexpecteds": self.unexpecteds,
            "reparsed": self.reparsed,
            "timezone_offset": self.timezone_offset,
            "location": self.location,
        }
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "MigrationContext":
        d = json.loads(s)
        ctx = cls()
        ctx.src_schema = {k: ir.source_table_from_json(v)
                          for k, v in d.get("src_schema", {}).items()}
        ctx.sp_schema = {k: ir.target_table_from_json(v)
                         for k, v in d.get("sp_schema", {}).items()}
        ctx.to_target = d.get("to_target", {})
        ctx.to_source = d.get("to_source", {})
        ctx.name_pool.used = set(d.get("used_names", []))
        ctx.synthetic_pkeys = {k: SyntheticPKey(v["col"], v.get("sequence", 0))
                               for k, v in d.get("synthetic_pkeys", {}).items()}
        ctx.issues = {t: {c: [SchemaIssue(i) for i in lst] for c, lst in cols.items()}
                      for t, cols in d.get("issues", {}).items()}
        ctx.table_stats = {t: TableStats(**s) for t, s in d.get("table_stats", {}).items()}
        ctx.statement_stats = {t: StatementStat(**s)
                               for t, s in d.get("statement_stats", {}).items()}
        ctx.unexpecteds = d.get("unexpecteds", {})
        ctx.reparsed = d.get("reparsed", 0)
        ctx.timezone_offset = d.get("timezone_offset", "+00:00")
        ctx.location = d.get("location")
        return ctx
