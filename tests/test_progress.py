"""A8 progress meter: reference-parity unit semantics
(internal/progress.go:24-85) + monotone 0->100 output during a real
two-table migration."""

import io
import os
import re

from harbourbridge_spark.progress import (MigrationProgress, Progress,
                                          track_table_job)


def _pcts(out: str) -> list:
    return [int(m) for m in re.findall(r"(\d+)%", out)]


def test_progress_reference_semantics():
    buf = io.StringIO()
    p = Progress(200, "copy", verbose=True, out=buf)
    p.maybe_report(1)          # 0% -> no new report (integer pct unchanged)
    p.maybe_report(100)        # 50%
    p.maybe_report(90)         # regression ignored
    p.maybe_report(100)        # duplicate ignored
    p.maybe_report(1000)       # clamps to 100
    pcts = _pcts(buf.getvalue())
    assert pcts == [0, 50, 100]
    assert p.progress == 1000 and p.pct == 100

    # zero-total tasks are born complete (progress.go:35-37)
    buf2 = io.StringIO()
    Progress(0, "empty", verbose=True, out=buf2)
    assert _pcts(buf2.getvalue()) == [100]

    # non-verbose: overwrite in place with \b\b\b, newline at 100%
    buf3 = io.StringIO()
    p3 = Progress(10, "t", out=buf3)
    p3.maybe_report(5)
    p3.done()
    assert buf3.getvalue() == "t:  0%\b\b\b50%\b\b\b100%\n"

    # non-verbose zero-total: the newline fires on the FIRST call too
    # (progress.go:82-84 gates it only on pct==100), so a zero-work
    # task leaves the cursor at start-of-line, not mid-line
    buf4 = io.StringIO()
    p4 = Progress(0, "empty", out=buf4)
    p4.done()
    assert buf4.getvalue() == "empty: 100%\n"


def test_progress_monotone_through_two_table_migration(spark, tmp_path):
    from harbourbridge_spark.sources import pgdump

    f = tmp_path / "d.sql"
    rows_a = ", ".join(f"({i}, 'a-{i}')" for i in range(200))
    rows_b = ", ".join(f"({i}, 'b-{i}')" for i in range(300))
    f.write_text(
        "CREATE TABLE public.alpha (id integer NOT NULL, v text);\n"
        "ALTER TABLE ONLY public.alpha ADD CONSTRAINT apk "
        "PRIMARY KEY (id);\n"
        "CREATE TABLE public.beta (id integer NOT NULL, v text);\n"
        "ALTER TABLE ONLY public.beta ADD CONSTRAINT bpk "
        "PRIMARY KEY (id);\n"
        f"INSERT INTO public.alpha VALUES {rows_a};\n"
        f"INSERT INTO public.beta VALUES {rows_b};\n")
    staging = str(tmp_path / "staging")
    ctx, results = pgdump.migrate_pg_dump(spark, str(f), staging)
    assert set(results) == {"alpha", "beta"}

    staged = {t: os.path.join(staging, f"{t}.tsv") for t in results}
    buf = io.StringIO()
    meter = MigrationProgress(staged, verbose=True, out=buf)
    for t in sorted(results):
        with track_table_job(spark, meter, t):
            results[t].good.write.mode("overwrite").parquet(
                str(tmp_path / f"out_{t}.parquet"))
    meter.done()

    pcts = _pcts(buf.getvalue())
    assert pcts[0] == 0 and pcts[-1] == 100
    assert pcts == sorted(pcts)                    # monotone
    # the first table's completion lands a strictly intermediate report
    assert any(0 < p < 100 for p in pcts)
