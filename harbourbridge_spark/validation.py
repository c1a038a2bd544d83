"""Constraint validation expressions for the migrated tables.

Spark types carry no length/precision limits, so the target-type
metadata (STRING(n)/BYTES(n) lengths, the Spanner NUMERIC 29.9
envelope — SURVEY §1.3) is enforced by check expressions over the
converted DataFrames: per-column violation flags, a table validator
returning (violations_df, counts), and unique-constraint checks
(the executable form of T16's unique indexes).

All checks are single-pass projections + one aggregation; uniqueness
shuffles only the key columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import types as tt
from .context import MigrationContext
from .schema_ir import TargetTable


def column_check(col_name: str, t: tt.Type) -> Column | None:
    """Violation predicate for one column (None = nothing to check).
    True => the value violates its declared target-type limits."""
    c = F.col(col_name)
    if t.is_array:
        scalar = tt.Type(t.name, t.length)
        if scalar.name not in (tt.STRING, tt.BYTES) or scalar.length is None:
            return None
        # any element violating the scalar limit
        return c.isNotNull() & F.exists(
            c, lambda x: _elem_violation(x, scalar))
    if t.name == tt.STRING and t.length is not None:
        return c.isNotNull() & (F.length(c) > t.length)
    if t.name == tt.BYTES and t.length is not None:
        return c.isNotNull() & (F.length(c) > t.length)
    # NUMERIC needs no runtime check: DecimalType(38,9) is *exactly*
    # the Spanner envelope (38-9 = 29 integer digits, 9 fractional —
    # postgres/toddl.go:140-143); the type system already rejects
    # anything outside it (conversion quarantines such rows).
    return None


def _elem_violation(x: Column, t: tt.Type) -> Column:
    if t.name in (tt.STRING, tt.BYTES) and t.length is not None:
        return x.isNotNull() & (F.length(x) > t.length)
    return F.lit(False)


def validate_table(ctx: MigrationContext, df: DataFrame,
                   target_table: str) -> tuple[DataFrame, dict[str, int]]:
    """Run all declared checks for one table. Returns (violations_df
    with a _violations column naming the failing constraints, counts
    per check). Executes ONE job for all counts."""
    tgt: TargetTable = ctx.sp_schema[target_table]
    checks: dict[str, Column] = {}
    for cn in tgt.col_names:
        if cn not in df.columns:
            continue
        cd = tgt.col_defs[cn]
        pred = column_check(cn, cd.type)
        if pred is not None:
            checks[f"{cn}_limit"] = pred
        if cd.not_null:
            checks[f"{cn}_not_null"] = F.col(cn).isNull()
    if not checks:
        return df.limit(0).withColumn(
            "_violations", F.array().cast("array<string>")), {}
    viol_arr = F.filter(
        F.array(*[F.when(pred, F.lit(name)).otherwise(F.lit(None))
                  for name, pred in checks.items()]),
        lambda x: x.isNotNull())
    with_v = df.withColumn("_violations", viol_arr)
    bad = with_v.where(F.size("_violations") > 0)
    agg = df.agg(*[F.sum(pred.cast("long")).alias(name)
                   for name, pred in checks.items()]).first()
    counts = {name: (agg[name] or 0) for name in checks}
    return bad, counts


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Executable uniqueness check for a unique index / PK (T16):
    returns the violating key groups (empty = constraint holds)."""
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
            .where(F.col("n_rows") > 1))


def validate_unique_constraints(ctx: MigrationContext, df: DataFrame,
                                target_table: str) -> dict[str, int]:
    """Check the PK and every unique index of a table; returns
    {constraint_name: violating_group_count}."""
    tgt = ctx.sp_schema[target_table]
    out: dict[str, int] = {}
    if tgt.pks:
        out["PRIMARY_KEY"] = check_unique(
            df, [k.col for k in tgt.pks]).count()
    for idx in tgt.indexes:
        if idx.unique:
            out[idx.name] = check_unique(
                df, [k.col for k in idx.keys]).count()
    return out
