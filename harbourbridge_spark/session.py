"""Interactive schema-editing session API (W2-W9, SURVEY §2.6).

The reference exposes these as web routes mutating a global Conv
(/root/reference/web/web.go, web/session.go); here they are methods on
an EditSession wrapping a MigrationContext — same semantics, same
guards, REST layer out of scope. Every edit operates on the *target*
schema in place (setTypeMapGlobal iterates SpSchema, not SrcSchema —
web/web.go:278-296 — so prior edits are preserved).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from . import schema_ir as ir
from .context import MigrationContext
from .report import analyze_tables, generate_summary
from .typemap import DIALECTS
from .types import BYTES, STRING, Type


class SessionError(Exception):
    """An illegal edit (the reference's http.StatusBadRequest class)."""


class PreconditionError(SessionError):
    """An edit blocked by a removable dependency — secondary index or
    foreign key (the reference's http.StatusPreconditionFailed class,
    web/web.go:857-895)."""


@dataclass
class InterleaveStatus:
    """web.TableInterleaveStatus (web/web.go:439-447)."""

    possible: bool
    parent: str = ""
    comment: str = ""


class EditSession:
    def __init__(self, ctx: MigrationContext, dialect: str = "postgres"):
        self.ctx = ctx
        self.dialect = dialect
        self._snapshot: Optional[str] = None

    # -- W8/W9: snapshot / resume / rollback --------------------------------
    def snapshot(self) -> str:
        self._snapshot = self.ctx.to_json()
        return self._snapshot

    def rollback(self) -> None:
        """web/web.go:785-795: restore the session file on failed edit."""
        if self._snapshot is None:
            raise SessionError("no snapshot to roll back to")
        self.ctx = MigrationContext.from_json(self._snapshot)

    # -- W2/W3: rendering ---------------------------------------------------
    def ddl(self) -> dict[str, str]:
        """Per-table DDL (web/web.go:188-201)."""
        from .ddl import print_create_table
        return {name: print_create_table(t, comments=False)
                for name, t in self.ctx.sp_schema.items()}

    def summary(self) -> str:
        reports = analyze_tables(self.ctx)
        return generate_summary(self.ctx, reports)

    def conversion_rate_color(self) -> dict[str, str]:
        """web/web.go:1066-1089: color-coded per-table schema rate."""
        out = {}
        from .report import analyze_cols, good, ok
        for src_table in self.ctx.src_schema:
            _, cols, warnings = analyze_cols(self.ctx, src_table)
            sp = self.ctx.to_target[src_table]["name"]
            missing_pk = sp in self.ctx.synthetic_pkeys
            if warnings == 0 and not missing_pk:
                out[src_table] = "GREEN"
            elif warnings == 0 or good(cols, warnings):
                out[src_table] = "BLUE"
            elif ok(cols, warnings):
                out[src_table] = "YELLOW"
            else:
                out[src_table] = "ORANGE"
        return out

    # -- W4: typemap --------------------------------------------------------
    def typemap(self) -> dict[str, list[str]]:
        """Legal alternative target types per source type."""
        return dict(DIALECTS[self.dialect].ALT_TARGETS)

    def set_type_map_global(self, src_type: str, target_name: str) -> None:
        """Re-map every column of the given *source* type to a new target
        scalar, preserving all other edits (web/web.go:266-300)."""
        alts = DIALECTS[self.dialect].ALT_TARGETS.get(src_type.lower())
        if alts is None or target_name not in alts:
            raise SessionError(
                f"{target_name} is not a legal target for {src_type}")
        for src_table_name, src_table in self.ctx.src_schema.items():
            sp_name = self.ctx.to_target[src_table_name]["name"]
            sp = self.ctx.sp_schema[sp_name]
            for src_col, col in src_table.col_defs.items():
                if col.type.name.lower() != src_type.lower():
                    continue
                tgt_col = self.ctx.to_target[src_table_name]["cols"][src_col]
                old = sp.col_defs[tgt_col].type
                sp.col_defs[tgt_col].type = Type(
                    target_name,
                    old.length if target_name in (STRING, BYTES) else None,
                    old.is_array)

    # -- W5: per-column edits with guards -----------------------------------
    def _table(self, table: str) -> ir.TargetTable:
        t = self.ctx.sp_schema.get(table)
        if t is None:
            raise SessionError(f"unknown table {table}")
        return t

    def _is_part_of_pk(self, table: str, col: str) -> bool:
        return col in [k.col for k in self._table(table).pks]

    def _is_part_of_index(self, table: str, col: str) -> Optional[str]:
        for idx in self._table(table).indexes:
            if col in [k.col for k in idx.keys]:
                return idx.name
        return None

    def _is_part_of_fk(self, table: str, col: str) -> bool:
        return any(col in fk.columns for fk in self._table(table).fks)

    def _is_referenced_by_fk(self, table: str, col: str) -> Optional[str]:
        for other_name, other in self.ctx.sp_schema.items():
            if other_name == table:
                continue
            for fk in other.fks:
                if fk.refer_table == table and col in fk.refer_columns:
                    return other_name
        return None

    def _is_parent(self, table: str) -> Optional[str]:
        for other_name, other in self.ctx.sp_schema.items():
            if other.parent == table:
                return other_name
        return None

    def can_remove_column(self, table: str, col: str) -> None:
        """web/web.go:857-870.  Guard classes mirror the reference's
        status codes: PK membership is a SessionError (400 — the edit
        is inherently illegal), index/FK membership a
        PreconditionError (412 — legal once the dependent constraint
        is removed)."""
        if self._is_part_of_pk(table, col):
            raise SessionError("column is part of primary key")
        idx = self._is_part_of_index(table, col)
        if idx:
            raise PreconditionError(
                f"column is part of secondary index {idx}; remove it first")
        if self._is_part_of_fk(table, col) or self._is_referenced_by_fk(table, col):
            raise PreconditionError(
                "column is part of a foreign key relation; remove the "
                "constraint first")

    def can_rename_or_change_type(self, table: str, col: str) -> None:
        """web/web.go:872-895; same 400-vs-412 split as
        can_remove_column."""
        is_pk = self._is_part_of_pk(table, col)
        if is_pk and (self._is_parent(table) or self._table(table).parent):
            raise SessionError(
                f"column {col} is part of a parent-child (interleave) "
                "relation")
        idx = self._is_part_of_index(table, col)
        if idx:
            raise PreconditionError(
                f"column is part of secondary index {idx}; remove it first")
        if self._is_part_of_fk(table, col) or self._is_referenced_by_fk(table, col):
            raise PreconditionError(
                "column is part of a foreign key relation; remove the "
                "constraint first")

    def remove_column(self, table: str, col: str) -> None:
        self.can_remove_column(table, col)
        t = self._table(table)
        t.col_names.remove(col)
        del t.col_defs[col]
        # clean name maps
        src_table = self.ctx.to_source[table]["name"]
        src_col = self.ctx.to_source[table]["cols"].pop(col, None)
        if src_col:
            self.ctx.to_target[src_table]["cols"].pop(src_col, None)

    def rename_column(self, table: str, col: str, new_name: str) -> None:
        self.can_rename_or_change_type(table, col)
        t = self._table(table)
        if new_name in t.col_defs:
            raise SessionError(f"column {new_name} already exists")
        t.col_names[t.col_names.index(col)] = new_name
        cd = t.col_defs.pop(col)
        cd.name = new_name
        t.col_defs[new_name] = cd
        for k in t.pks:
            if k.col == col:
                k.col = new_name
        src_table = self.ctx.to_source[table]["name"]
        src_col = self.ctx.to_source[table]["cols"].pop(col, None)
        if src_col:
            self.ctx.to_source[table]["cols"][new_name] = src_col
            self.ctx.to_target[src_table]["cols"][src_col] = new_name

    def change_column_type(self, table: str, col: str, target_name: str) -> None:
        self.can_rename_or_change_type(table, col)
        t = self._table(table)
        src_table = self.ctx.to_source[table]["name"]
        src_col = self.ctx.to_source[table]["cols"].get(col, col)
        src_type = self.ctx.src_schema[src_table].col_defs[src_col].type.name
        alts = DIALECTS[self.dialect].ALT_TARGETS.get(src_type.lower())
        if alts is not None and target_name not in alts:
            raise SessionError(
                f"{target_name} is not a legal target for {src_type}")
        old = t.col_defs[col].type
        t.col_defs[col].type = Type(
            target_name,
            old.length if target_name in (STRING, BYTES) else None,
            old.is_array)

    def set_not_null(self, table: str, col: str, not_null: bool) -> None:
        self._table(table).col_defs[col].not_null = not_null

    # -- W7: constraint CRUD ------------------------------------------------
    def drop_foreign_key(self, table: str, fk_name: str) -> None:
        t = self._table(table)
        before = len(t.fks)
        t.fks = [fk for fk in t.fks if fk.name != fk_name]
        if len(t.fks) == before:
            raise SessionError(f"no foreign key {fk_name} on {table}")

    def drop_secondary_index(self, table: str, index_name: str) -> None:
        t = self._table(table)
        before = len(t.indexes)
        t.indexes = [i for i in t.indexes if i.name != index_name]
        if len(t.indexes) == before:
            raise SessionError(f"no index {index_name} on {table}")

    def _check_unique_name(self, name: str) -> None:
        """canRename (web/web.go:714-743): table/FK/index names share one
        namespace."""
        if name in self.ctx.sp_schema:
            raise SessionError(f"name {name} collides with a table")
        for t in self.ctx.sp_schema.values():
            if any(fk.name == name for fk in t.fks):
                raise SessionError(f"name {name} collides with a foreign key")
            if any(i.name == name for i in t.indexes):
                raise SessionError(f"name {name} collides with an index")

    def rename_foreign_key(self, table: str, old: str, new: str) -> None:
        self._check_unique_name(new)
        for fk in self._table(table).fks:
            if fk.name == old:
                fk.name = new
                return
        raise SessionError(f"no foreign key {old} on {table}")

    def rename_index(self, table: str, old: str, new: str) -> None:
        self._check_unique_name(new)
        for i in self._table(table).indexes:
            if i.name == old:
                i.name = new
                return
        raise SessionError(f"no index {old} on {table}")

    def add_index(self, table: str, name: str, unique: bool,
                  keys: list[tuple[str, bool]]) -> None:
        self._check_unique_name(name)
        t = self._table(table)
        for col, _ in keys:
            if col not in t.col_defs:
                raise SessionError(f"unknown column {col}")
        t.indexes.append(ir.TargetIndex(
            name=name, table=table, unique=unique,
            keys=[ir.IndexKey(c, d) for c, d in keys]))

    # -- W6/T15: interleave -------------------------------------------------
    def set_parent_table(self, table: str, update: bool = True) -> InterleaveStatus:
        """T15 (web/web.go:474-507): find an FK whose referenced table's
        PK is an exact prefix of this table's PK (same columns, and FK
        cols == refer cols positionally); interleave and drop the FK."""
        if table in self.ctx.synthetic_pkeys:
            return InterleaveStatus(False, comment="Has synthetic pk")
        t = self._table(table)
        for i, fk in enumerate(t.fks):
            ref = fk.refer_table
            if ref in self.ctx.synthetic_pkeys or ref not in self.ctx.sp_schema:
                continue
            if self._check_pk_prefix(table, ref, fk):
                if update:
                    t.parent = ref
                    t.fks = t.fks[:i] + t.fks[i + 1:]
                return InterleaveStatus(True, parent=ref)
        return InterleaveStatus(False, comment="No valid prefix")

    def _check_pk_prefix(self, table: str, ref_table: str,
                         fk: ir.TargetForeignKey) -> bool:
        """web/web.go:897-910."""
        child_pks = self._table(table).pks
        parent_pks = self._table(ref_table).pks
        if len(child_pks) < len(parent_pks):
            return False
        for i, pk in enumerate(parent_pks):
            if (i >= len(fk.refer_columns)
                    or pk.col != fk.refer_columns[i]
                    or pk.col != child_pks[i].col
                    or fk.columns[i] != fk.refer_columns[i]):
                return False
        return True
