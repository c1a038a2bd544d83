#!/usr/bin/env python
"""Dump .explain("formatted") for named registry entries to
plans/r16/<name>_<tag>.txt (judge evidence for OPTIMIZATION_r16.md).

Usage: python tools/dump_plans.py <tag> <name> [name ...]
Env:   PLANS_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from harbourbridge_spark import queries as Q  # noqa: E402
from harbourbridge_spark.confscope import apply_recommended  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (apply_recommended(SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("plan-dump")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
