#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full
materialization, no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from harbourbridge_spark import queries as Q  # noqa: E402

# Headline set: migration surface + relational + (as added) pipeline ops.
BENCH_QUERIES = [
    "cast_projection_lineitem",
    "good_bad_split_events",
    "synthetic_pk_supplier",
    "uniqueness_validation",
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_share",
    "q18_large_orders",
    "q19_bracket_revenue",
    "rollup_region_revenue",
    "orphan_check_lineitem",
    "events_windowed_agg",
    "text_quality",
    "token_counts",
    "dedup_exact",
    "dedup_keep_first",
    "vocab_topk",
    "doc_chunks",
    "corpus_curation",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_embedding_lsh",
    "ann_bruteforce",
    "ann_lsh",
    # round 3 additions
    "event_funnel",
    "events_dedup",
    "sessionize_batch",
    "dedup_minhash_lsh_t35",
    "multimodal_decode_wav",
    "multimodal_decode_bmp",
    "ann_ivf",
    "doc_surprisal",
    "boilerplate_grams",
    # TPC-H access-pattern completion
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_shipping_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_inactive_customer_balance",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("harbourbridge-spark-bench")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in Q.REGISTRY]
    # warm-up: JVM + parquet footer cache, excluded from timings
    Q.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    # best-of-3 in fixed order: steady-state timing (first run pays
    # JIT/codegen cache; min isolates real plan cost from shared-JVM
    # noise that round-2 timings showed)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df = Q.REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
