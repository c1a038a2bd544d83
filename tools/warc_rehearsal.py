#!/usr/bin/env python
"""GB-class WARC ingestion rehearsal: generate a Common Crawl-layout
archive set (record-per-member gzip), then measure the three read
paths end-to-end with exact row accounting:

1. file-parallel  — warc_records over (file_id, content) rows, the
   many-files crawl shape;
2. byte-range     — warc_records_distributed over ONE concatenated
   archive, the sub-file-split shape;
3. sequential     — single-process parse_warc, the baseline.

Usage:  python tools/warc_rehearsal.py [total_gib] [n_files]
Env:    WARC_REHEARSAL_DIR (default /tmp/warc_rehearsal)
        SPARK_GRAFT_CPUS   (default 32)
        REHEARSAL_MAX_RSS_GIB (default 96, hard assert)

Writes a JSON summary line; numbers land in SCALE.md.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harbourbridge_spark.pipeline.warc import (build_warc_file,  # noqa: E402
                                               parse_warc,
                                               warc_records,
                                               warc_records_distributed)

TEXT = ("the quick brown corpus fox jumps over the lazy training "
        "pipeline while tokenizers stream past ") * 20   # ~1.9 KB


def generate(out_dir: str, total_gib: float, n_files: int) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    per_file = int(total_gib * (1 << 30)) // n_files
    paths = []
    doc_id = 0
    for f in range(n_files):
        path = os.path.join(out_dir, f"crawl-{f:04d}.warc.gz")
        paths.append(path)
        if os.path.exists(path) and os.path.getsize(path) > 0:
            # resume: docs-per-file is deterministic, skip regen
            doc_id += max(1, per_file // (len(TEXT) + 400))
            continue
        n_docs = max(1, per_file // (len(TEXT) + 400))
        docs = [(doc_id + i, TEXT + str(doc_id + i))
                for i in range(n_docs)]
        with open(path, "wb") as fh:
            fh.write(build_warc_file(f, docs, gzip_members=True))
        doc_id += n_docs
    return paths


def main() -> int:
    total_gib = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_dir = os.environ.get("WARC_REHEARSAL_DIR",
                             "/tmp/warc_rehearsal")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    max_rss = float(os.environ.get("REHEARSAL_MAX_RSS_GIB", "96"))

    t0 = time.time()
    paths = generate(out_dir, total_gib, n_files)
    gen_sec = time.time() - t0
    raw_bytes = sum(os.path.getsize(p) for p in paths)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("warc-rehearsal")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # 1. file-parallel: binaryFile scan -> parse kernel -> count
    t0 = time.time()
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "crawl-*.warc.gz")
             .load(out_dir)
             .select(F.xxhash64("path").alias("file_id"), "content"))
    n_file_parallel = warc_records(files).count()
    t_files = time.time() - t0

    # 2. byte-range over ONE concatenated archive
    big = os.path.join(out_dir, "concat.warc.gz")
    if not os.path.exists(big) or os.path.getsize(big) != raw_bytes:
        # size mismatch = stale concat from an earlier config
        with open(big, "wb") as out:
            for p in paths:
                with open(p, "rb") as fh:
                    out.write(fh.read())
    t0 = time.time()
    n_ranges = warc_records_distributed(
        spark, big, n_splits=int(cpus) * 2).count()
    t_ranges = time.time() - t0

    # 3. sequential baseline on ONE file's share
    t0 = time.time()
    n_seq_one = len(parse_warc(open(paths[0], "rb").read()))
    t_seq_one = time.time() - t0
    t_seq_est = t_seq_one * len(paths)

    peak_gib = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    assert peak_gib < max_rss, \
        f"peak RSS {peak_gib:.1f} GiB breached the {max_rss} gate"
    assert n_file_parallel == n_ranges, \
        f"row accounting: files={n_file_parallel} ranges={n_ranges}"

    summary = {
        "raw_gib": round(raw_bytes / (1 << 30), 3),
        "n_files": len(paths),
        "n_records": n_file_parallel,
        "gen_sec": round(gen_sec, 1),
        "file_parallel_sec": round(t_files, 1),
        "byte_range_sec": round(t_ranges, 1),
        "seq_est_sec": round(t_seq_est, 1),
        "file_parallel_rows_per_sec": int(n_file_parallel / t_files),
        "byte_range_rows_per_sec": int(n_ranges / t_ranges),
        "speedup_files_vs_seq": round(t_seq_est / t_files, 2),
        "speedup_ranges_vs_seq": round(t_seq_est / t_ranges, 2),
        "peak_rss_gib": round(peak_gib, 1),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
