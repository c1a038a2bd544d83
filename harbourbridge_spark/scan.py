"""Scale-adaptive scan spreading (r16 optimization round).

Every fixture table is a SINGLE parquet row group, and a parquet scan
cannot be split below row-group granularity — so every scan stage in
every query ran as ONE task regardless of cluster size, serializing
both JVM codegen work (600k-row lineitem aggregations) and every
downstream Python kernel chained into the scan stage (the
synth_media._spread_ids lesson, generalized).  ``read_spread``
repartitions a freshly-read table across the cluster ONLY when the
scan yields fewer partitions than cores AND the file is big enough
for the shuffle to pay for itself.

Scale behaviour: at real data sizes a table has many row groups, the
partition count exceeds ``defaultParallelism``, and this is a no-op —
the knob is derived from the input, not tuned to the bench box
(optimization guide §2: scale-adaptive partitioning, never a constant
for either local mode or the cluster).  Values are unaffected: the
library contains no partition-order-sensitive expression
(grep-verified: no monotonically_increasing_id / spark_partition_id /
input_file_name), float aggregation routes through order-independent
DECIMAL sums, and the oracle gate re-runs every entry at a second
partitioning.
"""

from __future__ import annotations

import os

# below this the single-task scan is cheaper than an exchange
# (region/nation/supplier-class dimension tables)
MIN_SPREAD_BYTES = 256 << 10


def spread_scan(df, size_hint: int | None = None):
    """Repartition a scan DataFrame to ``defaultParallelism`` when it
    would otherwise under-parallelize.  Call this only on plain scan
    plans (no AQE shuffle upstream): ``.rdd`` on a shuffle-bearing
    plan would materialize its query stages early."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if size_hint is not None and size_hint < MIN_SPREAD_BYTES:
        return df
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def read_spread(spark, path: str):
    """``spark.read.parquet(path)`` + spread_scan, with the file size
    as the pay-for-itself gate."""
    try:
        size = os.path.getsize(path)
    except OSError:
        size = None
    return spread_scan(spark.read.parquet(path), size)
