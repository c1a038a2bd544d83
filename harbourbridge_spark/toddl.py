"""Schema-to-DDL driver: SourceTable IR -> TargetTable AST (T4-T7, T16).

Mirrors schemaToDDL (/root/reference/postgres/toddl.go:30-101,
mysql/toddl.go:34-108): per-column type mapping via the dialect matrix,
identifier legalization, PK/FK/index conversion, unique-column ->
unique-index rewrite, Ignored-bit issue recording, provenance comments.
"""

from __future__ import annotations

from . import schema_ir as ir
from .context import MigrationContext
from .issues import SchemaIssue
from .mapping import (get_target_col, get_target_table, resolve_refs,
                      to_target_fk_name, to_target_index_name)
from .typemap import DIALECTS


def schema_to_ddl(ctx: MigrationContext, dialect: str) -> None:
    """Convert every table in ctx.src_schema into ctx.sp_schema."""
    mapper = DIALECTS[dialect]
    # Pre-seed the global namespace with all table names first, since
    # Spanner has one namespace for tables/FKs/indexes
    # (postgres/toddl.go:36-47).
    for src_name in ctx.src_schema:
        get_target_table(ctx, src_name)

    for src_name, src in ctx.src_schema.items():
        tgt_name = get_target_table(ctx, src_name)
        tgt = ir.TargetTable(
            name=tgt_name,
            comment=f"Spanner schema for source table {src_name}",
        )
        for cn in src.col_names:
            cd = src.col_defs[cn]
            tgt_col = get_target_col(ctx, src_name, cn)
            t, issues = mapper.to_target_type(cd.type)
            for issue in issues:
                ctx.add_issue(src_name, cn, issue)
            # Ignored-bits become issues (postgres/toddl.go:74-84)
            if cd.ignored.default:
                ctx.add_issue(src_name, cn, SchemaIssue.DEFAULT_VALUE)
            if cd.ignored.auto_increment:
                ctx.add_issue(src_name, cn, SchemaIssue.AUTO_INCREMENT)
            if cd.ignored.foreign_key:
                ctx.add_issue(src_name, cn, SchemaIssue.FOREIGN_KEY)
            comment = f"From: {cn} {cd.type.print()}"
            tgt.col_names.append(tgt_col)
            tgt.col_defs[tgt_col] = ir.TargetColumn(
                tgt_col, t, not_null=cd.not_null, comment=comment)
        tgt.pks = _cvt_primary_keys(ctx, src_name, src.primary_keys)
        tgt.fks = _cvt_foreign_keys(ctx, src_name, src.foreign_keys)
        tgt.indexes = _cvt_indexes(ctx, src_name, tgt_name, src.indexes)
        # unique column constraints -> unique indexes (T16,
        # postgres/pgdump.go:618-626)
        for cn in src.col_names:
            if src.col_defs[cn].unique:
                tgt_col = get_target_col(ctx, src_name, cn)
                tgt.indexes.append(ir.TargetIndex(
                    name=to_target_index_name(ctx, tgt_name, ""),
                    table=tgt_name, unique=True,
                    keys=[ir.IndexKey(tgt_col)]))
        ctx.sp_schema[tgt_name] = tgt

    resolve_refs(ctx)


def _cvt_primary_keys(ctx: MigrationContext, src_table: str,
                      src_keys: list[ir.Key]) -> list[ir.IndexKey]:
    """T5 (postgres/toddl.go:175-186)."""
    return [ir.IndexKey(get_target_col(ctx, src_table, k.column), k.desc)
            for k in src_keys]


def _cvt_foreign_keys(ctx: MigrationContext, src_table: str,
                      src_fks: list[ir.SourceForeignKey]
                      ) -> list[ir.TargetForeignKey]:
    """T6 (postgres/toddl.go:188-220). Table/col references are renamed
    through the same name maps; final existence validation happens in
    resolve_refs."""
    out = []
    for fk in src_fks:
        if fk.on_delete or fk.on_update:
            for c in fk.columns:
                ctx.add_issue(src_table, c, SchemaIssue.FOREIGN_KEY)
        out.append(ir.TargetForeignKey(
            name=to_target_fk_name(ctx, fk.name),
            columns=[get_target_col(ctx, src_table, c) for c in fk.columns],
            refer_table=get_target_table(ctx, fk.refer_table),
            refer_columns=[get_target_col(ctx, fk.refer_table, c)
                           for c in fk.refer_columns],
        ))
    return out


def _cvt_indexes(ctx: MigrationContext, src_table: str, tgt_table: str,
                 src_indexes: list[ir.SourceIndex]) -> list[ir.TargetIndex]:
    """T7 (postgres/toddl.go:222-249)."""
    out = []
    for idx in src_indexes:
        out.append(ir.TargetIndex(
            name=to_target_index_name(ctx, tgt_table, idx.name),
            table=tgt_table, unique=idx.unique,
            keys=[ir.IndexKey(get_target_col(ctx, src_table, k.column), k.desc)
                  for k in idx.keys]))
    return out
