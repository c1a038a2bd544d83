"""Live DynamoDB readers (S19, S20, S24, S25) — boto3-gated.

The container has no boto3/AWS access, so every function degrades with
a clear ImportError; the logic is exercised through the injectable
client seam (mirroring the reference's client mocks,
dynamodb/schema_test.go:61-544). Inference and conversion over the
scanned items is sources/dynamo.py — this module only produces the
DataFrame of DynamoDB-JSON items.

Scale notes: a full table scan uses DynamoDB parallel scan
(TotalSegments = one segment per Spark partition) so read bandwidth
scales with executors; each executor scans its own segment directly
(no driver fan-in).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not installed in this container
    import boto3  # type: ignore
    HAS_BOTO3 = True
except ImportError:
    boto3 = None
    HAS_BOTO3 = False


def _client(client: Any = None):
    if client is not None:
        return client
    if not HAS_BOTO3:
        raise ImportError(
            "boto3 is not available; pass an injected client (the same "
            "seam the reference's tests use)")
    return boto3.client("dynamodb")


def list_tables(client: Any = None) -> list[str]:
    """S19 (dynamodb/schema.go:78-95): paginated ListTables."""
    c = _client(client)
    names: list[str] = []
    kwargs: dict = {}
    while True:
        resp = c.list_tables(**kwargs)
        names.extend(resp.get("TableNames", []))
        last = resp.get("LastEvaluatedTableName")
        if not last:
            return names
        kwargs = {"ExclusiveStartTableName": last}


def describe_table(table: str, client: Any = None) -> dict:
    """S20/S25 (dynamodb/schema.go:116-142, 330-357): key schema,
    GSIs, and the (<=6h stale) ItemCount progress denominator."""
    c = _client(client)
    t = c.describe_table(TableName=table)["Table"]
    return {
        "partition_keys": [k["AttributeName"]
                           for k in sorted(t.get("KeySchema", []),
                                           key=lambda k: k["KeyType"] != "HASH")],
        "indexes": [{"name": g["IndexName"],
                     "keys": [k["AttributeName"] for k in g["KeySchema"]]}
                    for g in t.get("GlobalSecondaryIndexes", [])],
        "approx_rows": t.get("ItemCount", 0),
    }


def scan_items(spark: SparkSession, table: str,
               num_segments: int = 32,
               limit: Optional[int] = None,
               client_factory: Any = None) -> DataFrame:
    """S21/S24: scan the table into a DataFrame of DynamoDB-JSON text.

    Distributed parallel scan: each Spark task owns one DynamoDB scan
    segment (TotalSegments=num_segments) and pages through it with its
    own client — the Spark-native replacement for the reference's
    single paginated Scan loop (dynamodb/data.go:64-91). For sampling
    (schema inference) pass ``limit``; the per-segment page loop stops
    once its share is reached.
    """
    if client_factory is None:
        if not HAS_BOTO3:
            raise ImportError("boto3 is not available; pass client_factory")

        def client_factory():  # pragma: no cover
            return boto3.client("dynamodb")

    per_segment = None if limit is None else max(1, limit // num_segments)

    def scan_segment(segment_iter):
        for (segment,) in segment_iter:
            c = client_factory()
            kwargs = {"TableName": table, "Segment": segment,
                      "TotalSegments": num_segments}
            n = 0
            while True:
                resp = c.scan(**kwargs)
                for item in resp.get("Items", []):
                    yield (json.dumps(item, sort_keys=True),)
                    n += 1
                    if per_segment is not None and n >= per_segment:
                        return
                last = resp.get("LastEvaluatedKey")
                if not last:
                    break
                kwargs["ExclusiveStartKey"] = last

    segments = spark.createDataFrame(
        [(i,) for i in range(num_segments)], "segment int")
    rdd = segments.rdd.repartition(num_segments).mapPartitions(scan_segment)
    return spark.createDataFrame(rdd, "item string")
