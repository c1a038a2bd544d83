"""Target DDL rendering (K5) with interleave-aware ordering.

Mirrors /root/reference/spanner/ddl/ast.go:166-314 and the two
renderings of WriteSchemaFile (conversion/conversion.go:552-603):
pretty (comments, no quoting) and legal DDL (backtick-protected ids,
no comments). FK constraints are always emitted as separate ALTER
TABLE statements to dodge definition-order/circularity
(spanner/ddl/ast.go:300-312).
"""

from __future__ import annotations

from .context import MigrationContext
from .schema_ir import TargetTable


def print_create_table(table: TargetTable, comments: bool = True,
                       protect_ids: bool = False) -> str:
    """spanner/ddl/ast.go:177-226."""
    q = "`" if protect_ids else ""
    lines = []
    if comments and table.comment:
        lines.append(f"-- {table.comment}")
    lines.append(f"CREATE TABLE {q}{table.name}{q} (")
    col_lines = []
    for i, cn in enumerate(table.col_names):
        cd = table.col_defs[cn]
        s = "    " + cd.print(protect_ids)
        if i < len(table.col_names) - 1:
            s += ","
        if comments and cd.comment:
            s += f"  -- {cd.comment}"
        col_lines.append(s)
    body = "\n".join(col_lines)
    pk = ", ".join(k.print() for k in table.pks)
    out = "\n".join(lines) + "\n" + body + f"\n) PRIMARY KEY ({pk})"
    if table.parent:
        # physical parent-child clustering (spanner/ddl/ast.go:208-212)
        out += f",\nINTERLEAVE IN PARENT {q}{table.parent}{q}"
    return out


def get_ddl(ctx: MigrationContext, comments: bool = True,
            protect_ids: bool = False, include_fks: bool = True) -> list[str]:
    """Render all tables, parents before interleaved children
    (topological re-append loop, spanner/ddl/ast.go:263-314), FKs as
    trailing ALTER TABLE statements."""
    ddl: list[str] = []
    printed: set[str] = set()
    queue = sorted(ctx.sp_schema)          # deterministic base order
    # re-append children until their parent is printed
    guard = 0
    while queue and guard <= len(ctx.sp_schema) ** 2 + 10:
        guard += 1
        name = queue.pop(0)
        t = ctx.sp_schema[name]
        if t.parent and t.parent not in printed and t.parent in ctx.sp_schema:
            queue.append(name)
            continue
        ddl.append(print_create_table(t, comments, protect_ids))
        printed.add(name)
    if include_fks:
        q = "`" if protect_ids else ""
        for name in sorted(ctx.sp_schema):
            for fk in ctx.sp_schema[name].fks:
                ddl.append(
                    f"ALTER TABLE {q}{name}{q} ADD {fk.print()}")
        for name in sorted(ctx.sp_schema):
            for idx in ctx.sp_schema[name].indexes:
                ddl.append(idx.print(protect_ids))
    return ddl


def write_schema_file(ctx: MigrationContext, path: str) -> None:
    """K5 (conversion/conversion.go:552-603): pretty rendering at
    ``path``, legal DDL at ``path + '.ddl.txt'``."""
    pretty = ";\n\n\n".join(get_ddl(ctx, comments=True, protect_ids=False))
    with open(path, "w", encoding="utf-8") as f:
        f.write(pretty + ";\n")
    legal = ";\n\n\n".join(get_ddl(ctx, comments=False, protect_ids=True))
    with open(path + ".ddl.txt", "w", encoding="utf-8") as f:
        f.write(legal + ";\n")
