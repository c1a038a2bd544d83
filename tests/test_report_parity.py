"""Report parity with the reference's own end-to-end report test
(/root/reference/postgres/report_test.go:28-170): the SAME five-table
dump and the SAME injected row stats must produce the reference's
summary ratings, per-table ratings, and the load-bearing warnings."""

import io

from harbourbridge_spark.context import MigrationContext
from harbourbridge_spark.report import generate_report
from harbourbridge_spark.sources import pgdump

DUMP = """
CREATE TABLE bad_schema (
    a numeric,
    b integer NOT NULL,
    c integer[4][2],
    d circle);
CREATE TABLE default_value (
    a text primary key,
    b bigint DEFAULT 42);
CREATE TABLE excellent_schema (
    a text primary key,
    b bigint);
CREATE TABLE foreign_key (
    a text primary key references excellent_schema(a),
    b bigint);
CREATE TABLE no_pk (
    a bigint[],
    b integer NOT NULL,
    c text);
"""


def _conv() -> MigrationContext:
    ctx = MigrationContext()
    pgdump.process_pg_dump_schema(ctx, io.StringIO(DUMP))
    from harbourbridge_spark.toddl import schema_to_ddl
    schema_to_ddl(ctx, "postgres")
    ctx.add_synthetic_pkeys()
    ctx.set_data_mode()
    # report_test.go:52-56 injected stats
    ctx.stats_add_row("bad_schema", 1000)
    ctx.stats_add_good_row("bad_schema", 990)
    ctx.stats_add_bad_row("bad_schema", 10)
    ctx.stats_add_row("no_pk", 5000)
    ctx.stats_add_good_row("no_pk", 3000)
    ctx.stats_add_bad_row("no_pk", 2000)
    ctx.unexpecteds["Testing unexpected messages"] = 5
    return ctx


def test_report_matches_reference_scenario():
    ctx = _conv()
    text = generate_report(
        ctx, driver_name="pg_dump",
        bad_writes={"bad_schema": 50, "no_pk": 0})
    # summary ratings (report_test.go expected:69-72)
    assert ("Schema conversion: OK (some columns did not map cleanly"
            in text)
    assert "missing primary key" in text
    assert "Data conversion: POOR (66% of 6000 rows" in text
    # table bad_schema: schema POOR, data OK at 94% (990 good - 50
    # bad-writes over 1000)
    assert "Table bad_schema" in text
    assert "Data conversion: OK (94% of 1000 rows" in text
    # the three bad_schema warnings (synthetic PK, multi-dim array on
    # 'c', no-good-type on 'd' — the reference's exact warning set,
    # rendered in this engine's phrasing)
    assert "synthetic primary key" in text
    assert "Column 'c': Multi-dimensional arrays" in text
    assert "No appropriate target type" in text
    # default_value: default-values warning
    assert "default values" in text
    # no_pk: 60% data rating (3000/5000)
    assert "60% of 5000 rows" in text
    # unexpected conditions section with the injected count
    assert "Testing unexpected messages" in text


def test_report_excellent_schema_rating():
    ctx = _conv()
    text = generate_report(ctx, driver_name="pg_dump")
    # excellent_schema converts perfectly -> EXCELLENT rating line in
    # its table section (reference expected output)
    seg = text.split("Table excellent_schema")[1].split("Table ")[0]
    assert "Schema conversion: EXCELLENT" in seg
    assert "NONE (no data rows found)" in seg
