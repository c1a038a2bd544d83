"""Conversion statistics analysis, quality rating, and report rendering
(A4-A7, /root/reference/internal/report.go).

Pure functions over MigrationContext — same thresholds and weighting:
- warnings: non-batched issues count at most once per column; batched
  issues at most once per table (report.go:268-304);
- good = bad < total/20, ok = bad < total/3 (report.go:356-362);
- summary weights per-table column/warning counts by row count
  (report.go:372-398).
"""

from __future__ import annotations

import textwrap
from dataclasses import dataclass, field
from typing import Optional

from .context import MigrationContext
from .issues import ISSUE_DB, SchemaIssue, Severity


# -- rating (report.go:313-369) ---------------------------------------------

def good(total: int, bad: int) -> bool:
    return bad < total // 20


def ok(total: int, bad: int) -> bool:
    return bad < total // 3


def pct(total: int, bad: int) -> str:
    """internal/report.go:525-538 exactly: >99.9 -> 5 decimals (shows
    "99.99998%"-style near-perfect rates), >95 -> 3 decimals, else
    whole percent."""
    if total == 0:
        return "0"
    p = 100.0 * (total - bad) / total
    if p > 99.9:
        return f"{p:2.5f}"
    if p > 95.0:
        return f"{p:2.3f}"
    return f"{p:2.0f}"


def rate_schema(cols: int, warnings: int, missing_pkey: bool,
                summary: bool) -> str:
    pk_msg = "some missing primary keys" if summary else "missing primary key"
    if cols == 0:
        return "NONE (no schema found)"
    if warnings == 0 and not missing_pkey:
        return "EXCELLENT (all columns mapped cleanly)"
    if warnings == 0:
        return f"GOOD (all columns mapped cleanly, but {pk_msg})"
    if good(cols, warnings) and not missing_pkey:
        return "GOOD (most columns mapped cleanly)"
    if good(cols, warnings):
        return f"GOOD (most columns mapped cleanly, but {pk_msg})"
    if ok(cols, warnings) and not missing_pkey:
        return "OK (some columns did not map cleanly)"
    if ok(cols, warnings):
        return f"OK (some columns did not map cleanly + {pk_msg})"
    if not missing_pkey:
        return "POOR (many columns did not map cleanly)"
    return f"POOR (many columns did not map cleanly + {pk_msg})"


def rate_data(rows: int, bad_rows: int) -> str:
    s = f" ({pct(rows, bad_rows)}% of {rows} rows written to target)"
    if rows == 0:
        return "NONE (no data rows found)"
    if bad_rows == 0:
        return f"EXCELLENT (all {rows} rows written to target)"
    if good(rows, bad_rows):
        return "GOOD" + s
    if ok(rows, bad_rows):
        return "OK" + s
    return "POOR" + s


def rate_conversion(rows: int, bad_rows: int, cols: int, warnings: int,
                    missing_pkey: bool, summary: bool,
                    schema_only: bool) -> str:
    out = f"Schema conversion: {rate_schema(cols, warnings, missing_pkey, summary)}.\n"
    if not schema_only:
        out += f"Data conversion: {rate_data(rows, bad_rows)}.\n"
    return out


# -- per-table analysis (report.go:215-304) ---------------------------------

@dataclass
class TableReportBody:
    heading: str
    lines: list[str] = field(default_factory=list)


@dataclass
class TableReport:
    src_table: str
    sp_table: str
    rows: int = 0
    bad_rows: int = 0
    cols: int = 0
    warnings: int = 0
    synthetic_pkey: str = ""
    body: list[TableReportBody] = field(default_factory=list)


def analyze_cols(ctx: MigrationContext,
                 src_table: str) -> tuple[dict, int, int]:
    """Count warnings: non-batched at most one per column, batched at
    most one per table (analyzeCols, report.go:268-304)."""
    src = ctx.src_schema[src_table]
    issues = ctx.issues.get(src_table, {})
    warnings = 0
    batched: set[SchemaIssue] = set()
    for col, lst in issues.items():
        col_warning = False
        for i in lst:
            info = ISSUE_DB.get(i)
            if info is None or i is SchemaIssue.MISSING_PRIMARY_KEY:
                continue  # synthetic-PK handled via synthetic_pkeys
            if info.severity is Severity.WARNING and info.batch:
                batched.add(i)
            elif info.severity is Severity.WARNING:
                col_warning = True
        if col_warning:
            warnings += 1
    warnings += len(batched)
    return issues, len(src.col_defs), warnings


def build_table_report(ctx: MigrationContext, src_table: str,
                       bad_writes: Optional[dict[str, int]] = None
                       ) -> TableReport:
    sp_table = ctx.to_target.get(src_table, {}).get("name", src_table)
    tr = TableReport(src_table=src_table, sp_table=sp_table)
    issues, cols, warnings = analyze_cols(ctx, src_table)
    tr.cols = cols
    tr.warnings = warnings
    synth = ctx.synthetic_pkeys.get(sp_table)
    if synth:
        tr.synthetic_pkey = synth.col
    tr.body = _build_body(ctx, src_table, issues, synth.col if synth else None)
    if not ctx.schema_mode():
        stats = ctx.table_stats.get(src_table)
        if stats:
            bad_w = (bad_writes or {}).get(src_table, 0)
            tr.rows = stats.rows
            tr.bad_rows = stats.bad_rows + bad_w
    return tr


def _build_body(ctx: MigrationContext, src_table: str, issues: dict,
                synthetic_pk: Optional[str]) -> list[TableReportBody]:
    warnings: list[str] = []
    notes: list[str] = []
    batched_seen: set[SchemaIssue] = set()
    for col in sorted(issues):
        for i in issues[col]:
            info = ISSUE_DB.get(i)
            if info is None or i is SchemaIssue.MISSING_PRIMARY_KEY:
                continue
            if info.batch:
                if i in batched_seen:
                    continue
                batched_seen.add(i)
                line = info.brief
            else:
                line = f"Column '{col}': {info.brief}"
            (warnings if info.severity is Severity.WARNING else notes).append(line)
    if synthetic_pk:
        warnings.insert(0, f"Column '{synthetic_pk}' was added as a synthetic "
                           "primary key (table has no primary key)")
    body = []
    if warnings:
        h = "Warning" + ("s" if len(warnings) > 1 else "")
        body.append(TableReportBody(h, warnings))
    if notes:
        h = "Note" + ("s" if len(notes) > 1 else "")
        body.append(TableReportBody(h, notes))
    return body


def analyze_tables(ctx: MigrationContext,
                   bad_writes: Optional[dict[str, int]] = None
                   ) -> list[TableReport]:
    """A4: per-table reports in alphabetical order (report.go:99-110)."""
    return [build_table_report(ctx, t, bad_writes)
            for t in sorted(ctx.src_schema)]


# -- summary (report.go:372-398) --------------------------------------------

def generate_summary(ctx: MigrationContext, reports: list[TableReport],
                     bad_writes: Optional[dict[str, int]] = None) -> str:
    cols = warnings = 0
    missing_pkey = False
    for t in reports:
        weight = t.rows if t.rows else 1  # empty tables count as one row
        cols += t.cols * weight
        warnings += t.warnings * weight
        if t.synthetic_pkey:
            missing_pkey = True
    rows = ctx.rows()
    bad_rows = ctx.bad_rows() + sum((bad_writes or {}).values())
    return rate_conversion(rows, bad_rows, cols, warnings, missing_pkey,
                           summary=True, schema_only=ctx.schema_mode())


def ignored_statements(ctx: MigrationContext) -> list[str]:
    """report.go:400-419: statement types detected but ignored."""
    names = {
        "CheckConstraint": "check constraints",
        "StoredProgram": "stored programs/triggers",
        "DelimiterStmt": "stored programs/triggers",
        "CreateFunctionStmt": "functions",
        "CreateSeqStmt": "sequences",
        "CreatePlangStmt": "procedural languages",
        "CreateTrigStmt": "triggers",
        "ViewStmt": "views",
        "SpatialKey": "spatial indexes",
    }
    out = sorted({v for k, v in names.items()
                  if k in ctx.statement_stats and
                  (ctx.statement_stats[k].skip or ctx.statement_stats[k].error)})
    return out


# -- full report (A7, report.go:29-81) --------------------------------------

def _heading(title: str) -> str:
    return f"{'-' * 78}\n{title}\n{'-' * 78}\n"


def generate_report(ctx: MigrationContext, driver_name: str = "pg_dump",
                    bad_writes: Optional[dict[str, int]] = None,
                    print_table_reports: bool = True,
                    print_unexpecteds: bool = True) -> str:
    reports = analyze_tables(ctx, bad_writes)
    summary = generate_summary(ctx, reports, bad_writes)
    out = [_heading("Summary of Conversion"), summary, "\n"]
    ignored = ignored_statements(ctx)
    if ignored:
        out.append(textwrap.fill(
            "Note that the following source DB statements were detected "
            f"but ignored: {', '.join(ignored)}.", width=80) + "\n\n")
    if "dump" in driver_name and ctx.statement_stats:
        out.append(_heading(f"Statements Processed by {driver_name}"))
        out.append(f"{'schema':>9} {'data':>6} {'skip':>6} {'error':>6}  statement\n")
        for stype in sorted(ctx.statement_stats):
            s = ctx.statement_stats[stype]
            out.append(f"{s.schema:>9} {s.data:>6} {s.skip:>6} {s.error:>6}"
                       f"  {stype}\n")
        out.append("\n")
    if print_table_reports:
        for t in reports:
            h = f"Table {t.src_table}"
            if t.src_table != t.sp_table:
                h += f" (mapped to target table {t.sp_table})"
            out.append(_heading(h))
            out.append(rate_conversion(t.rows, t.bad_rows, t.cols, t.warnings,
                                       bool(t.synthetic_pkey), False,
                                       ctx.schema_mode()))
            out.append("\n")
            for b in t.body:
                out.append(b.heading + "\n")
                for i, line in enumerate(b.lines, 1):
                    out.append(textwrap.fill(
                        f"{i}) {line}.", width=80,
                        subsequent_indent="   ") + "\n")
                out.append("\n")
    if print_unexpecteds and ctx.unexpecteds:
        out.append(_heading("Unexpected Conditions"))
        out.append(f"{'count':>6}  condition\n")
        for cond in sorted(ctx.unexpecteds):
            out.append(f"{ctx.unexpecteds[cond]:>6}  {cond}\n")
    return "".join(out)
