#!/usr/bin/env python
"""10 GB-class ingest rehearsal (VERDICT r9 ask 8): generate a
multi-GB multi-table pg dump, run the REAL distributed CLI path
end-to-end (schema pass -> distributed byte-range data pass -> typed
conversion -> parquet tables + report), and print measured
throughput + peak memory as one JSON line for SCALE.md.

Usage:  python tools/ingest_rehearsal.py
Env:    REHEARSAL_GB      target dump size in GB (default 10)
        REHEARSAL_TABLES  table count (default 8)
        REHEARSAL_FILES   dump shard files (default 8)
        REHEARSAL_KEEP    keep workdir (default: deleted)
        REHEARSAL_INTERLEAVED  1 = scatter the DDL BETWEEN data blocks
                          (each CREATE right before its table's first
                          data, post-data ALTERs at the tail — the
                          schema-pass worst case; default: DDL prefix)
        REHEARSAL_SCHEMA_AB    1 = additionally time the serial vs
                          distributed SCHEMA PASS alone on the same
                          dump (VERDICT r10 ask 1 evidence)
        REHEARSAL_MAX_RSS_GIB  hard peak-RSS gate (default 96; the
                          run FAILS if the sampled peak exceeds it —
                          VERDICT r10 ask 6)
        REHEARSAL_MAX_PSS_GIB  hard peak-PSS gate (default 48 — the
                          honest physical-occupancy metric a memcg
                          charges; VERDICT r12 ask 6)
        SPARK_GRAFT_CPUS  (default 32)

Memory is sampled by a 1 Hz thread summing VmRSS of this process and
every descendant (the py4j-launched JVM and its Python workers) from
/proc — the peak of that sum is what a container limit would see.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_MB = {"copy": None}  # computed from the actual emitted bytes


def _descendants(root_pid: int) -> list[int]:
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                stat = f.read()
            # comm (field 2) may contain spaces/parens: fields after
            # it start past the LAST ')'; ppid is the 2nd of those
            ppid = int(stat.rsplit(")", 1)[1].split()[1])
            kids.setdefault(ppid, []).append(int(pid))
        except (OSError, IndexError, ValueError):
            continue
    out, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        for c in kids.get(p, ()):
            out.append(c)
            stack.append(c)
    return out


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _pss_kb(pid: int) -> int:
    """Proportional set size: shared pages divided among sharers, so
    summing over a process tree counts each physical page once —
    the number a container memory limit actually enforces against.
    smaps_rollup is one kernel-aggregated read per process."""
    try:
        with open(f"/proc/{pid}/smaps_rollup") as f:
            for line in f:
                if line.startswith("Pss:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


class PeakSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.peak_kb = 0
        self.peak_pss_kb = 0
        self.stop = threading.Event()

    def run(self):
        me = os.getpid()
        while not self.stop.is_set():
            procs = [me] + _descendants(me)
            total = sum(_rss_kb(p) for p in procs)
            self.peak_kb = max(self.peak_kb, total)
            # PSS sums shared pages ONCE — forked Python workers
            # share COW pages with each other and the parent, so the
            # VmRSS SUM above double-counts them (and a container
            # memcg, charging each page to one cgroup member, sees
            # the PSS-like number, not the RSS sum).  The r11->r12
            # 26-78 GiB swing on identical 10 GiB runs was this
            # double-count moving with worker spawn patterns.
            pss = sum(_pss_kb(p) for p in procs)
            if pss:
                self.peak_pss_kb = max(self.peak_pss_kb, pss)
            self.stop.wait(1.0)


def build_dump(root: str, target_gb: float, n_tables: int,
               n_files: int, interleaved: bool = False,
               ) -> tuple[list[str], int]:
    """Multi-table mixed COPY/INSERT pg dump totalling ~target_gb.
    Returns (paths, total_rows).  Row payload ~115 bytes, varied
    width; every table gets a PK + a text + a numeric column (the
    D5/D7/D8 scalar paths) so conversion is exercised, not skipped.

    ``interleaved`` scatters the DDL through the data instead of a
    file-0 prefix: each CREATE TABLE is written immediately before
    its table's first data block (so CREATEs land mid-file, between
    other tables' data), PKs arrive as post-data ALTERs at the end of
    the last file, and a SET timezone sits between data blocks — the
    hand-assembled-dump worst case the distributed schema pass must
    handle without a serial driver walk."""
    target_bytes = int(target_gb * (1 << 30))
    paths = []
    total_rows = 0
    written = 0
    rid = 0
    created: set[int] = set()
    per_file = target_bytes // n_files
    for f in range(n_files):
        p = os.path.join(root, f"dump_{f}.sql")
        with open(p, "w", encoding="utf-8", newline="\n") as out:
            if f == 0 and not interleaved:
                for t in range(n_tables):
                    out.write(
                        f"CREATE TABLE public.t{t} (id bigint NOT "
                        "NULL, v text, x numeric(12,2), ts timestamp"
                        ", PRIMARY KEY (id));\n")
                created.update(range(n_tables))
            file_written = 0
            # alternate COPY blocks and INSERT runs across tables
            t = 0
            while file_written < per_file:
                ti = t % n_tables
                tbl = f"t{ti}"
                if interleaved and ti not in created:
                    # CREATE mid-stream, WITHOUT the PK (added as a
                    # post-data ALTER at the tail of the last file)
                    out.write(
                        f"CREATE TABLE public.t{ti} (id bigint NOT "
                        "NULL, v text, x numeric(12,2), ts "
                        "timestamp);\n")
                    if ti % 3 == 0:
                        out.write("SET timezone = 'UTC';\n")
                    created.add(ti)
                if t % 2 == 0:   # COPY block, ~200k rows
                    out.write(f"COPY public.{tbl} (id, v, x, ts) "
                              "FROM stdin;\n")
                    chunk = []
                    for k in range(200_000):
                        rid += 1
                        chunk.append(
                            f"{rid}\trow-{rid}-{'pad' * (rid % 9)}"
                            f"\t{rid % 100000}.25"
                            f"\t2024-03-{1 + rid % 28:02d} "
                            f"12:{rid % 60:02d}:00")
                        if len(chunk) == 50_000:
                            s = "\n".join(chunk) + "\n"
                            out.write(s)
                            file_written += len(s)
                            chunk = []
                    if chunk:
                        s = "\n".join(chunk) + "\n"
                        out.write(s)
                        file_written += len(s)
                    out.write("\\.\n")
                    total_rows += 200_000
                else:            # extended INSERTs, ~100k rows
                    for chunkbase in range(0, 100_000, 1000):
                        vals = []
                        for k in range(1000):
                            rid += 1
                            vals.append(
                                f"({rid}, 'ins-{rid}-{'x' * (rid % 23)}'"
                                f", {rid % 99991}.50, "
                                f"'2024-04-{1 + rid % 28:02d} "
                                f"07:{rid % 60:02d}:30')")
                        s = (f"INSERT INTO public.{tbl} VALUES "
                             + ",".join(vals) + ";\n")
                        out.write(s)
                        file_written += len(s)
                    total_rows += 100_000
                t += 1
            if interleaved and f == n_files - 1:
                for ti in sorted(created):
                    out.write(f"ALTER TABLE public.t{ti} ADD "
                              f"CONSTRAINT t{ti}_pk PRIMARY KEY "
                              "(id);\n")
        written += os.path.getsize(p)
        paths.append(p)
    return paths, total_rows


def main() -> int:
    from pyspark.sql import SparkSession

    from harbourbridge_spark.cli import migrate_dump

    gb = float(os.environ.get("REHEARSAL_GB", "10"))
    n_tables = int(os.environ.get("REHEARSAL_TABLES", "8"))
    n_files = int(os.environ.get("REHEARSAL_FILES", "8"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    interleaved = os.environ.get("REHEARSAL_INTERLEAVED") == "1"
    schema_ab = os.environ.get("REHEARSAL_SCHEMA_AB") == "1"
    max_rss_gib = float(os.environ.get("REHEARSAL_MAX_RSS_GIB", "96"))
    max_pss_gib = float(os.environ.get("REHEARSAL_MAX_PSS_GIB", "48"))
    work = tempfile.mkdtemp(prefix="ingest_rehearsal_",
                            dir=os.environ.get("REHEARSAL_TMP"))
    sampler = PeakSampler()
    sampler.start()
    try:
        t0 = time.time()
        paths, gen_rows = build_dump(work, gb, n_tables, n_files,
                                     interleaved=interleaved)
        dump_bytes = sum(os.path.getsize(p) for p in paths)
        gen_sec = round(time.time() - t0, 1)
        print(f"# generated {dump_bytes / (1 << 30):.2f} GiB, "
              f"{gen_rows:,} rows in {gen_sec}s", file=sys.stderr)

        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .config("spark.sql.shuffle.partitions", cpus)
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .config("spark.driver.memory", "16g")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        # worker-pool warmup (fixed per-session cost, amortized to
        # nothing by a real multi-TB ingest; the bench convention)
        spark.range(64).repartition(64).mapInPandas(
            lambda it: it, "id long").count()

        schema_times = {}
        if schema_ab:
            from harbourbridge_spark.context import MigrationContext
            from harbourbridge_spark.sources import pgdump as _pg
            t0 = time.time()
            ctx_s = MigrationContext()
            for p in paths:
                with open(p, encoding="utf-8", newline="\n") as fh:
                    _pg.process_pg_dump_schema(ctx_s, fh)
            schema_times["schema_serial_sec"] = round(
                time.time() - t0, 1)
            t0 = time.time()
            ctx_d = MigrationContext()
            _pg.process_pg_dump_schema_distributed(spark, ctx_d, paths)
            schema_times["schema_distributed_sec"] = round(
                time.time() - t0, 1)
            assert sorted(ctx_s.src_schema) == sorted(ctx_d.src_schema)
            assert {t: v.rows for t, v in ctx_s.table_stats.items()} \
                == {t: v.rows for t, v in ctx_d.table_stats.items()}
            print(f"# schema pass serial "
                  f"{schema_times['schema_serial_sec']}s vs "
                  f"distributed "
                  f"{schema_times['schema_distributed_sec']}s",
                  file=sys.stderr)

        out_dir = os.path.join(work, "migrated")
        t0 = time.time()
        ctx = migrate_dump(spark, paths, "postgres", out_dir,
                           ingest="distributed")
        migrate_sec = time.time() - t0
        # row accounting from the written parquet (end-to-end truth)
        import glob as _glob
        out_rows = 0
        for tdir in _glob.glob(os.path.join(out_dir, "t*.parquet")):
            out_rows += spark.read.parquet(tdir).count()
        bad = ctx.stats.get("bad_rows", 0) if hasattr(ctx, "stats") \
            else 0
        sampler.stop.set()
        peak_gib = round(sampler.peak_kb / (1 << 20), 2)
        peak_pss_gib = round(sampler.peak_pss_kb / (1 << 20), 2)
        print(json.dumps({
            "metric": "ingest_rehearsal_distributed_cli",
            "dump_gib": round(dump_bytes / (1 << 30), 2),
            "files": n_files, "tables": n_tables,
            "interleaved_ddl": interleaved,
            "rows": gen_rows, "rows_out": out_rows, "bad": bad,
            "migrate_sec": round(migrate_sec, 1),
            "rows_per_sec": int(gen_rows / migrate_sec),
            "mb_per_sec": round(dump_bytes / (1 << 20) / migrate_sec,
                                1),
            "peak_rss_gib": peak_gib,
            "peak_pss_gib": peak_pss_gib,
            "max_rss_gib": max_rss_gib,
            "max_pss_gib": max_pss_gib,
            "cpus": int(cpus),
            **schema_times,
        }))
        assert out_rows == gen_rows, (out_rows, gen_rows)
        # hard peak-RSS gate (VERDICT r10 ask 6): a breach FAILS the
        # rehearsal instead of merely documenting the curve
        assert peak_gib <= max_rss_gib, (
            f"peak RSS {peak_gib} GiB breached the "
            f"{max_rss_gib} GiB gate")
        # PSS gate (VERDICT r12 ask 6): the metric a container memcg
        # actually charges — pages counted once across the tree
        assert peak_pss_gib <= max_pss_gib, (
            f"peak PSS {peak_pss_gib} GiB breached the "
            f"{max_pss_gib} GiB gate")
        spark.stop()
        return 0
    finally:
        sampler.stop.set()
        if not os.environ.get("REHEARSAL_KEEP"):
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
