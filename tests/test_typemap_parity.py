"""W4 parity audit: every (source type -> allowed alternative targets)
cell of the reference's interactive web typemaps, enumerated
table-driven against session.typemap() / ALT_TARGETS.

Source of truth transcribed case-by-case from
/root/reference/web/mysql_typemap.go:36-173 (toSpannerTypeMySQL) and
/root/reference/web/postgres_typemap.go:37-168 (toSpannerTypePostgres):
a target name is "allowed" iff the switch has an explicit arm for it
or it is the default arm's type.
"""

import pytest

from harbourbridge_spark.session import EditSession
from harbourbridge_spark.typemap import DIALECTS

BOOL, BYTES, DATE = "BOOL", "BYTES", "DATE"
FLOAT64, INT64, NUMERIC = "FLOAT64", "INT64", "NUMERIC"
STRING, TIMESTAMP = "STRING", "TIMESTAMP"

# web/postgres_typemap.go:37-168, one entry per case arm
PG_CELLS = {
    "bool": {BOOL, INT64, STRING},
    "boolean": {BOOL, INT64, STRING},
    "bigserial": {INT64, STRING},
    "bpchar": {STRING, BYTES},
    "character": {STRING, BYTES},
    "bytea": {BYTES, STRING},
    "date": {DATE, STRING},
    "float8": {FLOAT64, STRING},
    "double precision": {FLOAT64, STRING},
    "float4": {FLOAT64, STRING},
    "real": {FLOAT64, STRING},
    "int8": {INT64, STRING},
    "bigint": {INT64, STRING},
    "int4": {INT64, STRING},
    "integer": {INT64, STRING},
    "int2": {INT64, STRING},
    "smallint": {INT64, STRING},
    "numeric": {NUMERIC, STRING},
    "serial": {INT64, STRING},
    "text": {STRING, BYTES},
    "timestamptz": {TIMESTAMP, STRING},
    "timestamp with time zone": {TIMESTAMP, STRING},
    "timestamp": {TIMESTAMP, STRING},
    "timestamp without time zone": {TIMESTAMP, STRING},
    "varchar": {STRING, BYTES},
    "character varying": {STRING, BYTES},
}

# web/mysql_typemap.go:36-173, one entry per case arm
MYSQL_CELLS = {
    "bool": {BOOL, INT64, STRING},
    "boolean": {BOOL, INT64, STRING},
    "tinyint": {BOOL, INT64, STRING},
    "double": {FLOAT64, STRING},
    "float": {FLOAT64, STRING},
    "numeric": {NUMERIC, STRING},
    "decimal": {NUMERIC, STRING},
    "bigint": {INT64, STRING},
    "smallint": {INT64, STRING},
    "mediumint": {INT64, STRING},
    "integer": {INT64, STRING},
    "int": {INT64, STRING},
    "bit": {BYTES, STRING},
    "varchar": {STRING, BYTES},
    "char": {STRING, BYTES},
    "text": {STRING, BYTES},
    "tinytext": {STRING, BYTES},
    "mediumtext": {STRING, BYTES},
    "longtext": {STRING, BYTES},
    "set": {STRING},
    "enum": {STRING},
    "json": {STRING, BYTES},
    "binary": {BYTES, STRING},
    "varbinary": {BYTES, STRING},
    "tinyblob": {BYTES, STRING},
    "mediumblob": {BYTES, STRING},
    "blob": {BYTES, STRING},
    "longblob": {BYTES, STRING},
    "date": {DATE, STRING},
    "datetime": {TIMESTAMP, STRING},
    "timestamp": {TIMESTAMP, STRING},
    "time": {STRING},
    "year": {STRING},
}


@pytest.mark.parametrize("dialect,cells", [("postgres", PG_CELLS),
                                           ("mysql", MYSQL_CELLS)])
def test_alt_targets_match_reference_web_typemap(dialect, cells):
    alts = DIALECTS[dialect].ALT_TARGETS
    missing_types = set(cells) - set(alts)
    assert not missing_types, f"source types absent: {missing_types}"
    for src, want in cells.items():
        got = set(alts[src])
        assert got == want, (
            f"{dialect}.{src}: repo allows {sorted(got)}, "
            f"reference allows {sorted(want)}")
    # no repo-invented source types beyond the reference matrix
    extra = set(alts) - set(cells)
    assert not extra, f"types not in reference web typemap: {extra}"


@pytest.mark.parametrize("dialect,cells", [("postgres", PG_CELLS),
                                           ("mysql", MYSQL_CELLS)])
def test_default_mapping_is_an_allowed_alternative(dialect, cells):
    """The default to_target_type result for each source type must be a
    member of its own alternative set (the web UI invariant: the
    pre-selected option appears in the dropdown)."""
    from harbourbridge_spark.types import SourceType
    mod = DIALECTS[dialect]
    for src in cells:
        t, _ = mod.to_target_type(SourceType(src))
        assert t.name in cells[src], (
            f"{dialect}.{src}: default {t.name} not in {cells[src]}")


def test_session_typemap_exposes_dialect_matrix(spark=None):
    """session.typemap() (the /typemap endpoint's payload) returns the
    dialect matrix verbatim."""
    s = EditSession.__new__(EditSession)
    s.dialect = "mysql"
    assert s.typemap() == DIALECTS["mysql"].ALT_TARGETS