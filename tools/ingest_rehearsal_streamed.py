#!/usr/bin/env python
"""100 GiB-class SHARD-STREAMED ingest rehearsal (VERDICT r13 ask 6).

The literal one-shot 100 GiB rehearsal is disk-blocked on this box
(80 GiB free must hold dump + 0.27x parquet output + Spark scratch;
the 56 GiB one-shot attempt ENOSPC'd in r13).  This variant streams
the same cumulative volume through the REAL distributed CLI path in
waves: generate a wave of dump shards -> migrate_dump(distributed)
-> verify row accounting -> DELETE the consumed shards -> next wave.
Peak disk is one wave of dump plus the growing parquet output
(~0.27x cumulative), which fits 100 GiB cumulative inside the
envelope.  This is also the shape a real lake ingest has: dumps
arrive, are consumed, and are reclaimed — nothing ever holds the
whole corpus as SQL text.

Each wave is a self-contained interleaved-DDL sub-dump with its OWN
tables (wave w owns t{w*T}..t{w*T+T-1}) so the output lake grows
monotonically and per-wave accounting is exact.  One long-lived
SparkSession serves every wave; the PSS/RSS sampler spans the WHOLE
run, so the flat-memory claim covers the cumulative volume, not a
single wave.

Usage:  python tools/ingest_rehearsal_streamed.py
Env:    STREAM_TOTAL_GB   cumulative dump volume (default 100)
        STREAM_WAVE_GB    per-wave dump size (default 10)
        REHEARSAL_TABLES  tables per wave (default 8)
        REHEARSAL_FILES   shard files per wave (default 8)
        REHEARSAL_MAX_RSS_GIB / REHEARSAL_MAX_PSS_GIB  gates
                          (defaults 96 / 48, as the one-shot tool)
        REHEARSAL_TMP     workdir root (default tempfile's)
        SPARK_GRAFT_CPUS  (default 32)

Prints one JSON line with cumulative + per-wave numbers for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ingest_rehearsal import PeakSampler, build_dump  # noqa: E402


def _free_gib(path: str) -> float:
    st = os.statvfs(path)
    return st.f_bavail * st.f_frsize / (1 << 30)


def main() -> int:
    from pyspark.sql import SparkSession

    from harbourbridge_spark.cli import migrate_dump

    total_gb = float(os.environ.get("STREAM_TOTAL_GB", "100"))
    wave_gb = float(os.environ.get("STREAM_WAVE_GB", "10"))
    n_tables = int(os.environ.get("REHEARSAL_TABLES", "8"))
    n_files = int(os.environ.get("REHEARSAL_FILES", "8"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    max_rss_gib = float(os.environ.get("REHEARSAL_MAX_RSS_GIB", "96"))
    max_pss_gib = float(os.environ.get("REHEARSAL_MAX_PSS_GIB", "48"))
    n_waves = int(round(total_gb / wave_gb))

    work = tempfile.mkdtemp(prefix="ingest_streamed_",
                            dir=os.environ.get("REHEARSAL_TMP"))
    out_dir = os.path.join(work, "lake")
    os.makedirs(out_dir, exist_ok=True)

    sampler = PeakSampler()
    sampler.start()
    waves = []
    try:
        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .config("spark.sql.shuffle.partitions", cpus)
                 .config("spark.ui.enabled", "false")
                 .config("spark.ui.showConsoleProgress", "false")
                 .config("spark.driver.memory", "16g")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(64).repartition(64).mapInPandas(
            lambda it: it, "id long").count()

        cum_bytes = 0
        cum_rows_in = 0
        cum_rows_out = 0
        t_run = time.time()
        for w in range(n_waves):
            wave_dir = os.path.join(work, f"wave_{w}")
            os.makedirs(wave_dir)
            t0 = time.time()
            paths, rows_in = build_dump(wave_dir, wave_gb, n_tables,
                                        n_files, interleaved=True)
            # distinct tables per wave: rewrite t{i} -> t{w*T + i}
            # in-place is wasteful at 10 GiB; instead tables are
            # disambiguated by the OUTPUT directory per wave (the
            # lake keeps wave_w/tN.parquet), which preserves the
            # exact generator and exact per-wave accounting
            gen_sec = time.time() - t0
            dump_bytes = sum(os.path.getsize(p) for p in paths)
            wave_out = os.path.join(out_dir, f"wave_{w}")
            t0 = time.time()
            migrate_dump(spark, paths, "postgres", wave_out,
                         ingest="distributed")
            mig_sec = time.time() - t0
            rows_out = 0
            import glob as _glob
            for tdir in _glob.glob(os.path.join(wave_out,
                                                "t*.parquet")):
                rows_out += spark.read.parquet(tdir).count()
            assert rows_out == rows_in, (w, rows_out, rows_in)
            # the point of the streamed variant: reclaim the shards
            shutil.rmtree(wave_dir)
            # staging TSVs under the wave's output are scratch too
            shutil.rmtree(os.path.join(wave_out, "_staging"),
                          ignore_errors=True)
            cum_bytes += dump_bytes
            cum_rows_in += rows_in
            cum_rows_out += rows_out
            waves.append({
                "wave": w,
                "dump_gib": round(dump_bytes / (1 << 30), 2),
                "rows": rows_in,
                "gen_sec": round(gen_sec, 1),
                "migrate_sec": round(mig_sec, 1),
                "rows_per_sec": int(rows_in / mig_sec),
                "peak_pss_gib_so_far": round(
                    sampler.peak_pss_kb / (1 << 20), 2),
                "free_disk_gib": round(_free_gib(work), 1),
            })
            print(f"# wave {w}: {waves[-1]}", file=sys.stderr)
        wall = time.time() - t_run
        sampler.stop.set()
        peak_gib = round(sampler.peak_kb / (1 << 20), 2)
        peak_pss_gib = round(sampler.peak_pss_kb / (1 << 20), 2)
        mig_total = sum(wv["migrate_sec"] for wv in waves)
        print(json.dumps({
            "metric": "ingest_rehearsal_shard_streamed",
            "cumulative_dump_gib": round(cum_bytes / (1 << 30), 2),
            "waves": n_waves,
            "tables_per_wave": n_tables,
            "files_per_wave": n_files,
            "interleaved_ddl": True,
            "rows": cum_rows_in, "rows_out": cum_rows_out,
            "migrate_sec_total": round(mig_total, 1),
            "rows_per_sec_migrate": int(cum_rows_in / mig_total),
            "mb_per_sec_migrate": round(
                cum_bytes / (1 << 20) / mig_total, 1),
            "wall_sec_including_generation": round(wall, 1),
            "peak_rss_gib": peak_gib,
            "peak_pss_gib": peak_pss_gib,
            "max_rss_gib": max_rss_gib,
            "max_pss_gib": max_pss_gib,
            "cpus": int(cpus),
            "per_wave": waves,
        }))
        assert cum_rows_out == cum_rows_in
        assert peak_gib <= max_rss_gib, (
            f"peak RSS {peak_gib} GiB breached {max_rss_gib} GiB")
        assert peak_pss_gib <= max_pss_gib, (
            f"peak PSS {peak_pss_gib} GiB breached {max_pss_gib} GiB")
        spark.stop()
        return 0
    finally:
        sampler.stop.set()
        if not os.environ.get("REHEARSAL_KEEP"):
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
