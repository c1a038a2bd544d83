"""Identifier legalization and collision-free name mapping.

Mirrors /root/reference/internal/fixname.go:32-42 and
/root/reference/internal/mapping.go:33-264. The target namespace is
shared between tables, foreign keys and indexes (one namespace in
Spanner), so a single "used names" pool backs all of them
(postgres/toddl.go:36-47).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Optional

if TYPE_CHECKING:  # pragma: no cover
    from .context import MigrationContext

_NAME_OK = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]*$")
_BAD_FIRST = re.compile(r"^[^a-zA-Z]")
_BAD_OTHER = re.compile(r"[^a-zA-Z0-9_]")


def fix_name(name: str) -> tuple[str, bool]:
    """Legalize an identifier to ``[a-zA-Z][a-zA-Z0-9_]*``.

    Bad first char is replaced by 'A'; all other problem chars by '_'.
    Returns (fixed, changed). Mirrors internal/fixname.go:32-42
    (including the 'BogusEmptyId' empty-name case).
    """
    if _NAME_OK.match(name):
        return name, False
    if name == "":
        return "BogusEmptyId", True
    name = _BAD_FIRST.sub("A", name, count=1)
    name = _BAD_OTHER.sub("_", name)
    return name, True


def _dedup(name: str, used: set[str]) -> str:
    """Collision-dedup with a numeric suffix seeded by the pool size
    (internal/mapping.go:170-186)."""
    if name not in used:
        return name
    i = len(used)
    while f"{name}_{i}" in used:
        i += 1
    return f"{name}_{i}"


class NamePool:
    """Global used-name pool for the single target namespace."""

    def __init__(self) -> None:
        self.used: set[str] = set()

    def take(self, candidate: str) -> str:
        fixed, _ = fix_name(candidate)
        final = _dedup(fixed, self.used)
        self.used.add(final)
        return final


def get_target_table(ctx: "MigrationContext", src_table: str) -> str:
    """Map a source table name to its (legal, unique) target name,
    creating and recording the mapping on first use
    (internal/mapping.go:33-62)."""
    m = ctx.to_target.get(src_table)
    if m is not None:
        return m["name"]
    target = ctx.name_pool.take(src_table)
    ctx.to_target[src_table] = {"name": target, "cols": {}}
    ctx.to_source[target] = {"name": src_table, "cols": {}}
    return target


def get_target_col(ctx: "MigrationContext", src_table: str, src_col: str,
                   must_exist: bool = False) -> str:
    """Per-table column name mapping (internal/mapping.go:73-118)."""
    get_target_table(ctx, src_table)  # ensure table mapping exists
    tmap = ctx.to_target[src_table]
    if src_col in tmap["cols"]:
        return tmap["cols"][src_col]
    if must_exist:
        raise KeyError(f"column {src_col!r} of table {src_table!r} has no mapping")
    fixed, _ = fix_name(src_col)
    # column namespace is per-table
    used = set(tmap["cols"].values())
    final = _dedup(fixed, used)
    tmap["cols"][src_col] = final
    target_table = tmap["name"]
    ctx.to_source[target_table]["cols"][final] = src_col
    return final


def to_target_fk_name(ctx: "MigrationContext", src_name: str) -> str:
    """FK names live in the global namespace (internal/mapping.go:147-157)."""
    if not src_name:
        return ""
    return ctx.name_pool.take(src_name)


def to_target_index_name(ctx: "MigrationContext", table: str,
                         src_name: str) -> str:
    """Index names: generate ``Index_<table>`` when unnamed, dedup in the
    global namespace (internal/mapping.go:159-168)."""
    candidate = src_name if src_name else f"Index_{table}"
    return ctx.name_pool.take(candidate)


def resolve_refs(ctx: "MigrationContext") -> None:
    """Resolve FK table/col references against the converted schema,
    case-insensitively; drop unresolvable FKs
    (internal/mapping.go:193-264)."""
    lower_tables = {t.lower(): t for t in ctx.sp_schema}
    for table in ctx.sp_schema.values():
        kept = []
        for fk in table.fks:
            rt = lower_tables.get(fk.refer_table.lower())
            if rt is None:
                ctx.unexpected(f"FK {fk.name or '?'} on {table.name}: "
                               f"unknown table {fk.refer_table}")
                continue
            ref = ctx.sp_schema[rt]
            lower_cols = {c.lower(): c for c in ref.col_defs}
            rcols = []
            ok = True
            for c in fk.refer_columns:
                rc = lower_cols.get(c.lower())
                if rc is None:
                    ctx.unexpected(f"FK {fk.name or '?'} on {table.name}: "
                                   f"unknown column {fk.refer_table}.{c}")
                    ok = False
                    break
                rcols.append(rc)
            if not ok:
                continue
            fk.refer_table = rt
            fk.refer_columns = rcols
            kept.append(fk)
        table.fks = kept
