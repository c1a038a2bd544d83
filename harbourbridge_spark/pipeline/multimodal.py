"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; the
Spark-side machinery — schema, partitioning, Arrow-batched UDF
signature, batch shaping — is real and tested. The actual codec step
is STUBBED (``decode_stub``: this container has no image/audio
libraries) behind a deterministic fake so the pipeline shape can be
exercised end-to-end; swap ``DECODERS`` entries for real decoders
(PIL/librosa/pyav) in production.

Scale design: decode runs via ``mapInPandas`` — Arrow-batched, one
Python worker per partition, no per-row pickling. Media rows are
size-skewed, so ``repartition_for_media`` re-buckets by byte size
before decode to even out task duration (the media analogue of
skew-salting).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image|audio|video
    T.StructField("content", T.BinaryType(), True),    # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("content_sha", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_stub(kind: str, content: bytes) -> list[float]:
    """STUB decoder: a real deployment replaces this with PIL/librosa/
    pyav decode + feature extraction. Deterministic fake: 8 floats
    derived from the content digest, so tests can assert exact values.

    raise NotImplementedError here instead if silent fakes are a risk.
    """
    if content is None:
        return []
    d = hashlib.sha256(content).digest()
    return [b / 255.0 for b in d[:8]]


DECODERS: dict[str, Callable[[str, bytes], list[float]]] = {
    "image": decode_stub,   # -> PIL.Image.open + resize + embed
    "audio": decode_stub,   # -> librosa.load + mel features
    "video": decode_stub,   # -> pyav frame-sample + per-frame embed
}


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    The UDF receives pandas batches (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch), keeping peak memory
    at batch_size x max_media_size per worker.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0),
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                    if b is not None else None),
                "feature": [
                    DECODERS.get(k, decode_stub)(k, c)
                    for k, c in zip(pdf["kind"], pdf["content"])
                ],
            }
            yield pd.DataFrame(out)

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_size))
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def repartition_for_media(media: DataFrame,
                          target_partition_bytes: int = 128 << 20
                          ) -> DataFrame:
    """Size-aware re-bucketing before decode: media rows are heavily
    size-skewed (a 4K video next to an icon); range-partition on byte
    size so each decode task sees a comparable byte budget."""
    sized = media.withColumn(
        "_sz", F.when(F.col("content").isNull(), 0)
                .otherwise(F.length("content")))
    total = sized.agg(F.sum("_sz")).first()[0] or 0
    n = max(1, int(total / target_partition_bytes))
    return (sized.repartitionByRange(n, F.col("_sz"))
            .drop("_sz"))


def frame_sample_plan(video: DataFrame, every_n_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (the decode of each frame is the stubbed step). Pure
    JVM-side expansion — the heavy part stays columnar."""
    return (video
            .where(F.col("kind") == "video")
            .withColumn("frame_ts_ms", F.explode(F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_n_ms)))))
