"""In-CI oracle gate (VERDICT r9 ask 2): every entry pinned in
queries._CHANGED_THIS_ROUND — plus any registry entry never seen in a
CORRECTNESS_r*.json artifact (i.e. brand-new this round) — is run
through the full Spark-vs-DuckDB comparison at sf0.001 inside pytest.
A red entry now fails `pytest tests/` locally instead of first
surfacing in the driver's official gate (the r9 `corpus_drift` lesson:
the entry landed red because the local check was skipped).

The comparison is the SAME code the local tool uses
(harbourbridge_spark.oraclecheck), at the smallest scale factor so the
whole gate stays cheap; the gate also re-runs each pinned entry at a
SECOND shuffle-partition setting to smoke out order-dependent float
aggregation (the exact failure mode of the r9 red row).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from harbourbridge_spark import queries
from harbourbridge_spark.oraclecheck import compare_entry, register_views

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present")


def _gate_names() -> list[str]:
    checked = queries._last_checked()
    names = [n for n in queries._CHANGED_THIS_ROUND
             if n in queries.REGISTRY]
    names += [n for n in queries.REGISTRY
              if checked.get(n, 0) == 0 and n not in names]
    return names


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_views(con, SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _gate_names())
def test_changed_entry_matches_oracle(spark, duck, name):
    ent = queries.REGISTRY[name]
    ok, detail = compare_entry(spark, duck, name, ent.fn, ent.oracle,
                               SF_DIR)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", _gate_names())
def test_changed_entry_partition_invariant(spark, duck, name):
    """Same entry at a different shuffle partitioning — a hash flip
    between settings is order-dependent float aggregation."""
    ent = queries.REGISTRY[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        ok, detail = compare_entry(spark, duck, name, ent.fn,
                                   ent.oracle, SF_DIR)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert ok, f"{name} @3 shuffle partitions: {detail}"


def test_pin_window_math():
    """Machine-enforced carry-over (ADVICE r14): pins beyond the
    50-slot official window must be DECLARED in
    _CARRYOVER_TO_NEXT_ROUND, and whatever the previous round
    declared must lead this round's pin list — a slipped entry can
    never again exist only as a comment."""
    pins = queries._CHANGED_THIS_ROUND
    slots = queries._WINDOW_SLOTS
    assert pins[slots:] == queries._CARRYOVER_TO_NEXT_ROUND, (
        "pins beyond the window must be declared as carry-over")
    prev = queries._CARRYOVER_FROM_PREV_ROUND
    assert pins[:len(prev)] == prev, (
        "previous round's carry-over must lead the pin list")
    # pins must name real registry entries (typos otherwise silently
    # drop an entry from the official window)
    missing = [n for n in pins if n not in queries.REGISTRY]
    assert not missing, f"pinned names not in REGISTRY: {missing}"
    assert len(pins) == len(set(pins)), "duplicate pins waste slots"


def test_gate_detects_a_broken_entry(spark, duck):
    """Self-test: the comparator actually fails on a wrong oracle
    (guards against a vacuously-green gate)."""
    ent = queries.REGISTRY["rowcounts"]
    broken = "SELECT 'lineitem' AS table_name, CAST(1 AS BIGINT) AS n"
    ok, _ = compare_entry(spark, duck, "rowcounts", ent.fn, broken,
                          SF_DIR)
    assert not ok
