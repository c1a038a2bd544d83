#!/usr/bin/env python
"""Ingest-path benchmark: staged vs distributed migration of a
GENERATED dump (pg: mixed COPY + INSERT; mysql: extended INSERTs —
the only layout mysqldump emits), so the distributed-ingest speedup
is a measured, reproducible number instead of NOTES prose. Writes
one JSON line with the schema pass split out (both modes share it).

Usage:  python tools/ingest_bench.py
Env:    INGEST_ROWS    total rows (default 200_000)
        INGEST_FILES   dump files  (default 3)
        INGEST_MIX     copy | insert | mixed (default mixed; pg only —
                       mysql dumps are INSERT-only by format)
        INGEST_DIALECT postgres | mysql | mysql_tab (default
                       postgres; mysql_tab benches the --tab dir
                       path: serial vs file-parallel chunk scan)
        SPARK_GRAFT_CPUS (default 32)

The dump mixes the two data layouts ~50/50: COPY blocks (the
byte-range executor path) and multi-row INSERT statements (the shard
tokenizer path), sharded across files so the fork-pool scan and the
concurrent shard jobs both engage. Correctness is asserted (row
counts equal between modes) before timings are reported.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tab_dir(root: str, rows: int, files: int) -> str:
    """--tab directory: one table per file pair, OUTFILE escaping."""
    tab = os.path.join(root, "tabdir")
    os.makedirs(tab, exist_ok=True)
    per_file = rows // files
    for f in range(files):
        name = f"t{f}"
        with open(os.path.join(tab, f"{name}.sql"), "w",
                  encoding="utf-8", newline="\n") as out:
            out.write(f"CREATE TABLE `{name}` (`id` int NOT NULL, "
                      "`v` varchar(60), `x` decimal(12,2), "
                      "PRIMARY KEY (`id`));\n")
        with open(os.path.join(tab, f"{name}.txt"), "w",
                  encoding="utf-8", newline="\n") as out:
            for r in range(per_file):
                out.write(f"{r}\trow-{r}-{'pad' * (r % 7)}"
                          f"\t{r % 1000}.25\n")
    return tab


def bench_tab(spark, work: str, rows: int, files: int) -> None:
    """Time migrate_mysql_tab with the file-parallel scan vs the
    serial-driver scan (cutover forced each way)."""
    from harbourbridge_spark.sources import mysqldump as M
    tab = build_tab_dir(work, rows, files)
    out = {}
    counts = {}
    for label, floor in (("serial", 1 << 60), ("parallel", 0)):
        old = M._TAB_PARALLEL_MIN_BYTES
        M._TAB_PARALLEL_MIN_BYTES = floor
        try:
            t0 = time.time()
            _ctx, res = M.migrate_mysql_tab(spark, tab)
            t_driver = time.time() - t0
            counts[label] = {t: r.good.count() for t, r in res.items()}
            out[label] = {"driver_phase_sec": round(t_driver, 3),
                          "total_sec": round(time.time() - t0, 3)}
        finally:
            M._TAB_PARALLEL_MIN_BYTES = old
    assert counts["serial"] == counts["parallel"], counts
    print(json.dumps({
        "metric": "ingest_tab_serial_vs_parallel_scan",
        "dialect": "mysql_tab",
        "rows": sum(counts["serial"].values()),
        "files": files,
        "serial": out["serial"],
        "parallel": out["parallel"],
        "scan_phase_speedup": round(
            out["serial"]["driver_phase_sec"]
            / max(out["parallel"]["driver_phase_sec"], 0.001), 2),
        "total_speedup": round(
            out["serial"]["total_sec"]
            / max(out["parallel"]["total_sec"], 0.001), 2),
    }))


def build_mysql_dump(root: str, rows: int, files: int) -> list[str]:
    """Extended-INSERT mysql dump (the only layout mysqldump emits)."""
    paths = []
    per_file = rows // files
    for f in range(files):
        p = os.path.join(root, f"mdump_{f}.sql")
        with open(p, "w", encoding="utf-8", newline="\n") as out:
            if f == 0:
                out.write("CREATE TABLE `i` (`id` int NOT NULL, "
                          "`v` varchar(40), `x` decimal(12,2), "
                          "PRIMARY KEY (`id`));\n")
            base = f * per_file
            for chunk in range(0, per_file, 1000):
                n = min(1000, per_file - chunk)
                vals = ",".join(
                    f"({base + chunk + k}, 'ins-{base + chunk + k}', "
                    f"{(chunk + k) % 997}.50)" for k in range(n))
                out.write(f"INSERT INTO `i` VALUES {vals};\n")
        paths.append(p)
    return paths


def build_dump(root: str, rows: int, files: int,
               mix: str = "mixed") -> list[str]:
    """mix: 'mixed' (50/50 COPY/INSERT), 'copy', or 'insert'."""
    paths = []
    per_file = rows // files
    for f in range(files):
        p = os.path.join(root, f"dump_{f}.sql")
        with open(p, "w", encoding="utf-8", newline="\n") as out:
            if f == 0:
                out.write(
                    "CREATE TABLE public.c (id integer NOT NULL, "
                    "v text, x numeric(12,2), PRIMARY KEY (id));\n"
                    "CREATE TABLE public.i (id integer NOT NULL, "
                    "v text, x numeric(12,2), PRIMARY KEY (id));\n")
            base = f * per_file
            half = {"mixed": per_file // 2, "copy": per_file,
                    "insert": 0}[mix]
            semi = "; semi; txt" if os.environ.get("INGEST_SEMI") \
                else ""
            if half:
                out.write("COPY public.c (id, v, x) FROM stdin;\n")
                for r in range(half):
                    rid = base + r
                    out.write(f"{rid}\trow-{rid}-{'pad' * (rid % 7)}"
                              f"{semi}\t{rid % 1000}.25\n")
                out.write("\\.\n")
            for chunk in range(0, per_file - half, 1000):
                n = min(1000, per_file - half - chunk)
                vals = ",".join(
                    f"({base + half + chunk + k}, "
                    f"'ins-{base + half + chunk + k}', "
                    f"{(chunk + k) % 997}.50)"
                    for k in range(n))
                out.write(f"INSERT INTO public.i VALUES {vals};\n")
        paths.append(p)
    return paths


def main() -> int:
    from pyspark.sql import SparkSession

    from harbourbridge_spark.sources import mysqldump, pgdump

    dialect = os.environ.get("INGEST_DIALECT", "postgres")
    rows = int(os.environ.get("INGEST_ROWS", "200000"))
    files = int(os.environ.get("INGEST_FILES", "3"))
    mix = os.environ.get("INGEST_MIX", "mixed")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # Session warm-up, excluded from timings (the bench.py convention):
    # spawn the Python worker pool with a trivial mapInPandas job.
    # Worker spawn is a fixed PER-SESSION cost (~5s for 32 workers)
    # that a real multi-TB ingest amortizes to nothing; without this,
    # the first Arrow stage of whichever mode runs first absorbs it
    # and the staged/distributed comparison measures worker startup,
    # not ingest design.
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long").count()
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        if dialect == "mysql_tab":
            bench_tab(spark, work, rows, files)
            return 0
        if dialect == "mysql":
            paths = build_mysql_dump(work, rows, files)
            mix = "insert"
        else:
            paths = build_dump(work, rows, files, mix)
        # the schema pass is SHARED by both modes (serial by design:
        # DDL applies in dump order) — time it standalone so the
        # DATA-phase speedup, the thing distributed mode exists for,
        # is not diluted by a constant both modes pay
        from harbourbridge_spark.context import MigrationContext
        schema_fn = (mysqldump.process_mysql_dump_schema
                     if dialect == "mysql"
                     else pgdump.process_pg_dump_schema)
        t0 = time.time()
        ctx_probe = MigrationContext()
        for p in paths:
            with open(p, encoding="utf-8", newline="\n") as f:
                schema_fn(ctx_probe, f)
        schema_sec = round(time.time() - t0, 3)
        counts = {}
        timings = {}
        for mode in ("staged", "distributed"):
            out = os.path.join(work, mode)
            t0 = time.time()
            if dialect == "mysql":
                ctx, res = mysqldump.migrate_mysql_dump(
                    spark, paths, out, mode=mode)
            else:
                ctx, res = pgdump.migrate_pg_dump(spark, paths, out,
                                                  mode=mode)
            # migrate returns with conversion DataFrames still lazy:
            # everything EAGER up to here is the driver-side ingest
            # work (staged: parse + rewrite every row to TSV;
            # distributed: bulk byte scan + shard writes + count
            # jobs) — the phase the distributed mode exists to cut
            t_driver = time.time() - t0
            counts[mode] = {t: (r.good.count(), r.bad.count())
                            for t, r in res.items()}
            timings[mode] = {"driver_phase_sec": round(t_driver, 3),
                             "total_sec": round(time.time() - t0, 3)}
        assert counts["staged"] == counts["distributed"], counts
        total = sum(g for g, _ in counts["staged"].values())
        data_st = max(timings["staged"]["driver_phase_sec"]
                      - schema_sec, 0.001)
        data_di = max(timings["distributed"]["driver_phase_sec"]
                      - schema_sec, 0.001)
        print(json.dumps({
            "metric": "ingest_staged_vs_distributed",
            "dialect": dialect,
            "mix": mix,
            "rows": total,
            "files": files,
            "schema_pass_sec": schema_sec,
            "staged": timings["staged"],
            "distributed": timings["distributed"],
            "data_phase_speedup": round(data_st / data_di, 2),
            "total_speedup": round(
                timings["staged"]["total_sec"]
                / timings["distributed"]["total_sec"], 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
