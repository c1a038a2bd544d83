#!/usr/bin/env python
"""Per-entry build-vs-execute split profiler (r16 optimization round,
guide §1): for each named registry entry (or the N slowest from a
detail file), time (a) fn() — driver-side plan building, including any
Python-side setup the entry does — and (b) the noop write — cluster
execution.  Entries whose cost is mostly (a) need driver-side fixes
(plan size, probes, per-call setup); entries dominated by (b) need
distributed-algorithm / kernel fixes.

Usage:
  python tools/profile_entries.py entry [entry ...]
  python tools/profile_entries.py --top N     (N slowest from newest BENCH detail)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from harbourbridge_spark import queries as Q  # noqa: E402
from harbourbridge_spark.confscope import apply_recommended  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--top"]:
        n = int(args[1])
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        import glob
        import re
        details = sorted(
            glob.glob(os.path.join(here, "BENCH_r*_detail.json")),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        qs = json.load(open(details[-1]))["queries"]
        names = [k for k, _ in
                 sorted(qs.items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (apply_recommended(SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("entry-profile")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up
    Q.REGISTRY["q1_pricing_summary"].fn(spark, SF).write.format(
        "noop").mode("overwrite").save()

    print(f"{'entry':42s} {'build':>7s} {'exec':>7s} {'total':>7s}"
          f"  (best of 3 each)")
    for name in names:
        if name not in Q.REGISTRY:
            print(f"{name:42s}  -- not in registry")
            continue
        bb = be = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = Q.REGISTRY[name].fn(spark, SF)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            bb = min(bb, t1 - t0)
            be = min(be, t2 - t1)
        print(f"{name:42s} {bb:7.3f} {be:7.3f} {bb + be:7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
