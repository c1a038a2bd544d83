"""End-to-end migration driver: the CLI lifecycle of the reference
(SURVEY §3.1, cmd/cmd.go:39-92) as one function + argparse main.

    pg_dump mydb > dump.sql
    python -m harbourbridge_spark.cli dump.sql --dialect postgres \
        --out /data/migrated

Steps (mirroring cmd.CommandLine):
  1. schema pass over the dump -> SourceSchema -> target schema
  2. write schema file (pretty + legal DDL) + session file
  3. data pass: staged COPY/INSERT rows -> typed conversion ->
     good/bad split
  4. write each table (parquet; interleave-aware co-partitioning)
  5. write bad-data samples + conversion report
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from pyspark.sql import SparkSession

from .confscope import apply_recommended
from .context import MigrationContext
from .ddl import write_schema_file
from .report import generate_report
from .sink import write_bad_data, write_table
from .sources import mysqldump, pgdump


def migrate_dump(spark: SparkSession, dump_path, dialect: str,
                 out_dir: str,
                 ctx: Optional[MigrationContext] = None,
                 target: str = "parquet",
                 show_progress: bool = False,
                 progress_out=None,
                 ingest: str = "staged") -> MigrationContext:
    """Full dump migration into ``out_dir``: tables (parquet, or a
    sqlite database / embedded Derby via the batched K1/K2 writer) +
    schema file + session file + report + dropped-row samples.
    ``dump_path`` may be a single path or a list (sharded dumps stage
    through one shared writer).  ``show_progress`` renders the A8
    percent meter over the staged-bytes denominator.  ``ingest``
    selects the data pass: "staged" (driver splitter) or
    "distributed" (executor-side reads — the path for very large
    dumps: COPY byte-range scans for postgres, statement-shard
    tokenization for mysql)."""
    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(out_dir, "_staging")
    if dialect == "postgres":
        ctx, results = pgdump.migrate_pg_dump(spark, dump_path, staging,
                                              ctx, mode=ingest)
    elif dialect == "mysql":
        ctx, results = mysqldump.migrate_mysql_dump(spark, dump_path,
                                                    staging, ctx,
                                                    mode=ingest)
    else:
        raise ValueError(f"unknown dialect {dialect!r}")

    # schema + session files before data (cmd/cmd.go:51-52)
    write_schema_file(ctx, os.path.join(out_dir, "schema.txt"))
    with open(os.path.join(out_dir, "session.json"), "w") as f:
        f.write(ctx.to_json())

    meter = None
    if show_progress:
        from .progress import MigrationProgress
        staged = {t: os.path.join(staging, f"{t}.tsv")
                  for t in results
                  if os.path.exists(os.path.join(staging, f"{t}.tsv"))}
        meter = MigrationProgress(staged, message="Writing data",
                                  out=progress_out)

    db_path = os.path.join(out_dir, "migrated.db")
    for src_table, result in results.items():
        tgt = ctx.to_target[src_table]["name"]
        wstats = None
        if meter is not None:
            from .progress import track_table_job
            tracker = track_table_job(spark, meter, src_table)
        else:
            import contextlib
            tracker = contextlib.nullcontext()
        # a real `with` so a write failure's exc_info reaches
        # __exit__ and the failed table is NOT credited to the meter
        with tracker:
            if target == "sqlite":
                from .sink import write_table_to_sqlite
                wstats = write_table_to_sqlite(ctx, result.good, tgt,
                                               db_path)
            elif target == "derby":
                from .sink.jdbc_writer import write_table_to_derby
                wstats = write_table_to_derby(
                    spark, ctx, result.good, tgt,
                    os.path.join(out_dir, "migrated_derby"))
            else:
                write_table(ctx, result.good, tgt,
                            os.path.join(out_dir, f"{tgt}.parquet"))
        # the good write fired obs_all (total + bad counts in the
        # SAME pass); only spend a second conversion scan collecting
        # bad samples when there is something to sample — on a clean
        # table this halves the per-table cost (r10 rehearsal cliff)
        bad_total = (result.bad_count_from_good_pass()
                     if target == "parquet" else None)
        if bad_total == 0:
            n_bad = 0
        else:
            n_bad = write_bad_data(
                result.bad, os.path.join(out_dir, f"{tgt}.dropped.txt"))
        if wstats is not None:
            # foreachPartition is an RDD action — observations never
            # fire; take the counts from the writer's accumulators
            result.record_stats(ctx, src_table,
                                good_n=wstats.rows_written,
                                bad_n=n_bad + wstats.rows_dropped)
            # rows the writer's constraint bisection rejected are
            # counted into bad stats (and flip the exit code), so they
            # must leave an artifact too — first-N samples, like the
            # conversion-bad file
            if wstats.rows_dropped > 0:
                with open(os.path.join(
                        out_dir, f"{tgt}.writer_dropped.txt"), "w") as f:
                    f.write(f"# {wstats.rows_dropped} row(s) rejected by "
                            f"the target database writer; first "
                            f"{len(wstats.dropped_samples or [])} shown\n")
                    for row in wstats.dropped_samples or []:
                        f.write(repr(row) + "\n")
        else:
            # observations populated by the writes above (A1/A8);
            # bad_n comes from the good pass's obs_all — obs_bad may
            # never fire when the bad-sample scan was skipped
            result.record_stats(ctx, src_table, bad_n=bad_total)
        if n_bad == 0:
            dropped = os.path.join(out_dir, f"{tgt}.dropped.txt")
            if os.path.exists(dropped):
                os.remove(dropped)

    if meter is not None:
        meter.done()

    import shutil
    shutil.rmtree(staging, ignore_errors=True)

    report = generate_report(
        ctx, driver_name=f"{dialect}-dump")
    with open(os.path.join(out_dir, "report.txt"), "w") as f:
        f.write(report)
    # refresh the session file with final stats
    with open(os.path.join(out_dir, "session.json"), "w") as f:
        f.write(ctx.to_json())
    return ctx


def main(argv: Optional[list[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="Migrate a pg_dump/mysqldump file to typed parquet "
                    "tables with a Spanner-style target schema.")
    p.add_argument("dump", nargs="+",
                   help="path(s) to the dump file(s); a table's rows "
                        "may span files (sharded dumps)")
    p.add_argument("--dialect", choices=["postgres", "mysql"],
                   default="postgres")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--target", choices=["parquet", "sqlite", "derby"],
                   default="parquet",
                   help="table sink: parquet files, or a sqlite / "
                        "embedded-Derby database through the batched "
                        "K1/K2 writer")
    p.add_argument("--progress", action="store_true",
                   help="render the percent progress meter (A8) over "
                        "the staged-bytes denominator")
    p.add_argument("--ingest", choices=["staged", "distributed"],
                   default="staged",
                   help="data pass: 'staged' splits rows on the "
                        "driver; 'distributed' reads executor-side — "
                        "COPY byte-range scans (postgres) or "
                        "statement-shard tokenization (mysql) — for "
                        "large dumps")
    p.add_argument("--cpus", default="8")
    p.add_argument("--session", help="resume from a session.json "
                   "(schema edits preserved; data-only mode)")
    args = p.parse_args(argv)

    spark = (apply_recommended(SparkSession.builder
             .master(f"local[{args.cpus}]")
             .appName("harbourbridge-spark-migrate")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             )
             .getOrCreate())
    ctx = None
    if args.session:
        with open(args.session) as f:
            ctx = MigrationContext.from_json(f.read())
    dumps = args.dump[0] if len(args.dump) == 1 else args.dump
    final = migrate_dump(spark, dumps, args.dialect, args.out, ctx,
                         target=args.target,
                         show_progress=args.progress,
                         ingest=args.ingest)
    print(open(os.path.join(args.out, "report.txt")).read()[:2000])
    spark.stop()
    return 0 if final.bad_rows() == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
