"""Schema IR: dialect-neutral source schema + target schema AST.

Source side mirrors /root/reference/schema/schema.go:35-99 (deliberately
lossy — captures only what conversion and reporting need). Target side
mirrors the DDL AST /root/reference/spanner/ddl/ast.go:105-253.

Everything is a plain dataclass and JSON-round-trippable (the whole
MigrationContext, including these, is the session-file format — see
context.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Optional

from pyspark.sql import types as T

from .types import SourceType, Type


# --------------------------------------------------------------------------
# Source schema IR (schema/schema.go)
# --------------------------------------------------------------------------

@dataclass
class Ignored:
    """Presence bits for features detected but not converted
    (schema/schema.go:92-99)."""

    check: bool = False
    identity: bool = False
    default: bool = False
    exclusion: bool = False
    foreign_key: bool = False
    auto_increment: bool = False


@dataclass
class SourceColumn:
    """schema.Column (schema/schema.go:46-52)."""

    name: str
    type: SourceType
    not_null: bool = False
    unique: bool = False
    ignored: Ignored = field(default_factory=Ignored)


@dataclass
class Key:
    """schema.Key (schema/schema.go:70-73): column + ordering."""

    column: str
    desc: bool = False


@dataclass
class SourceForeignKey:
    """schema.ForeignKey (schema/schema.go:60-67). OnDelete/OnUpdate are
    captured but dropped at conversion (recorded as an issue)."""

    name: str = ""
    columns: list[str] = field(default_factory=list)
    refer_table: str = ""
    refer_columns: list[str] = field(default_factory=list)
    on_delete: str = ""
    on_update: str = ""


@dataclass
class SourceIndex:
    """schema.Index (schema/schema.go:76-80)."""

    name: str = ""
    unique: bool = False
    keys: list[Key] = field(default_factory=list)


@dataclass
class SourceTable:
    """schema.Table (schema/schema.go:35-42)."""

    name: str
    col_names: list[str] = field(default_factory=list)  # preserves order
    col_defs: dict[str, SourceColumn] = field(default_factory=dict)
    primary_keys: list[Key] = field(default_factory=list)
    foreign_keys: list[SourceForeignKey] = field(default_factory=list)
    indexes: list[SourceIndex] = field(default_factory=list)


# --------------------------------------------------------------------------
# Target schema AST (spanner/ddl/ast.go)
# --------------------------------------------------------------------------

@dataclass
class IndexKey:
    """ddl.IndexKey (spanner/ddl/ast.go:105-117)."""

    col: str
    desc: bool = False

    def print(self) -> str:
        return f"{self.col} DESC" if self.desc else self.col


@dataclass
class TargetColumn:
    """ddl.ColumnDef (spanner/ddl/ast.go:125-147)."""

    name: str
    type: Type
    not_null: bool = False
    comment: str = ""

    def print(self, protect_ids: bool = False) -> str:
        name = f"`{self.name}`" if protect_ids else self.name
        s = f"{name} {self.type.print()}"
        if self.not_null:
            s += " NOT NULL"
        return s


@dataclass
class TargetForeignKey:
    """ddl.Foreignkey (spanner/ddl/ast.go:149-156)."""

    name: str = ""
    columns: list[str] = field(default_factory=list)
    refer_table: str = ""
    refer_columns: list[str] = field(default_factory=list)

    def print(self) -> str:  # spanner/ddl/ast.go:228-239
        cols = ", ".join(self.columns)
        rcols = ", ".join(self.refer_columns)
        prefix = f"CONSTRAINT {self.name} " if self.name else ""
        return f"{prefix}FOREIGN KEY ({cols}) REFERENCES {self.refer_table} ({rcols})"


@dataclass
class TargetIndex:
    """ddl.CreateIndex (spanner/ddl/ast.go:242-251)."""

    name: str
    table: str
    unique: bool = False
    keys: list[IndexKey] = field(default_factory=list)

    def print(self, protect_ids: bool = False) -> str:
        q = "`" if protect_ids else ""
        unique = "UNIQUE " if self.unique else ""
        keys = ", ".join(k.print() for k in self.keys)
        return (f"CREATE {unique}INDEX {q}{self.name}{q} "
                f"ON {q}{self.table}{q} ({keys})")


@dataclass
class TargetTable:
    """ddl.CreateTable (spanner/ddl/ast.go:166-175).

    ``parent`` non-empty => interleaved in parent (physical parent-child
    clustering). In Spark this is metadata driving co-partitioning; see
    ddl.py for rendering and sink/ for the physical analogue.
    """

    name: str
    col_names: list[str] = field(default_factory=list)
    col_defs: dict[str, TargetColumn] = field(default_factory=dict)
    pks: list[IndexKey] = field(default_factory=list)
    fks: list[TargetForeignKey] = field(default_factory=list)
    indexes: list[TargetIndex] = field(default_factory=list)
    parent: str = ""
    comment: str = ""

    # -- Spark mapping ------------------------------------------------------
    def to_struct_type(self) -> T.StructType:
        """Spark schema for the migrated table. NOT NULL -> nullable=False;
        length limits live in metadata (enforced by validation exprs)."""
        fields = []
        for cn in self.col_names:
            cd = self.col_defs[cn]
            md = {}
            if cd.type.length is not None:
                md["maxLength"] = cd.type.length
            fields.append(
                T.StructField(cn, cd.type.to_spark(), not cd.not_null, md)
            )
        return T.StructType(fields)

    def pk_cols(self) -> list[str]:
        return [k.col for k in self.pks]


# --------------------------------------------------------------------------
# JSON round-trip helpers (session-file format, conversion.go:606-657)
# --------------------------------------------------------------------------

def _st_to_json(t: SourceType) -> dict:
    return {"name": t.name, "mods": list(t.mods), "array_bounds": list(t.array_bounds)}


def _st_from_json(d: dict) -> SourceType:
    return SourceType(d["name"], tuple(d.get("mods", ())), tuple(d.get("array_bounds", ())))


def source_table_to_json(t: SourceTable) -> dict:
    d = asdict(t)
    for cn, cd in d["col_defs"].items():
        cd["type"] = _st_to_json(t.col_defs[cn].type)
    return d


def source_table_from_json(d: dict) -> SourceTable:
    cols = {}
    for cn, cd in d.get("col_defs", {}).items():
        cols[cn] = SourceColumn(
            name=cd["name"],
            type=_st_from_json(cd["type"]),
            not_null=cd.get("not_null", False),
            unique=cd.get("unique", False),
            ignored=Ignored(**cd.get("ignored", {})),
        )
    return SourceTable(
        name=d["name"],
        col_names=list(d.get("col_names", [])),
        col_defs=cols,
        primary_keys=[Key(**k) for k in d.get("primary_keys", [])],
        foreign_keys=[SourceForeignKey(**f) for f in d.get("foreign_keys", [])],
        indexes=[
            SourceIndex(name=i.get("name", ""), unique=i.get("unique", False),
                        keys=[Key(**k) for k in i.get("keys", [])])
            for i in d.get("indexes", [])
        ],
    )


def _tt_to_json(t: Type) -> dict:
    return {"name": t.name, "length": t.length, "is_array": t.is_array}


def _tt_from_json(d: dict) -> Type:
    return Type(d["name"], d.get("length"), d.get("is_array", False))


def target_table_to_json(t: TargetTable) -> dict:
    d = asdict(t)
    for cn in d["col_defs"]:
        d["col_defs"][cn]["type"] = _tt_to_json(t.col_defs[cn].type)
    return d


def target_table_from_json(d: dict) -> TargetTable:
    cols = {}
    for cn, cd in d.get("col_defs", {}).items():
        cols[cn] = TargetColumn(
            name=cd["name"], type=_tt_from_json(cd["type"]),
            not_null=cd.get("not_null", False), comment=cd.get("comment", ""),
        )
    return TargetTable(
        name=d["name"],
        col_names=list(d.get("col_names", [])),
        col_defs=cols,
        pks=[IndexKey(**k) for k in d.get("pks", [])],
        fks=[TargetForeignKey(**f) for f in d.get("fks", [])],
        indexes=[
            TargetIndex(name=i["name"], table=i.get("table", d["name"]),
                        unique=i.get("unique", False),
                        keys=[IndexKey(**k) for k in i.get("keys", [])])
            for i in d.get("indexes", [])
        ],
        parent=d.get("parent", ""),
        comment=d.get("comment", ""),
    )
