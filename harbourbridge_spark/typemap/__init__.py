"""Per-dialect source-type -> target-type matrices (SURVEY §2.3).

Each dialect module exposes:

- ``to_target_type(src: SourceType) -> tuple[Type, list[SchemaIssue]]``
  the default mapping (T1/T2/T3),
- ``ALT_TARGETS: dict[str, list[str]]`` — the legal alternative target
  scalar names per source type (the web UI's typemap overrides,
  /root/reference/web/{postgres,mysql}_typemap.go), consumed by
  ``session.set_type_map``.
"""

from . import postgres, mysql, dynamodb  # noqa: F401

DIALECTS = {
    "postgres": postgres,
    "mysql": mysql,
    "dynamodb": dynamodb,
}
