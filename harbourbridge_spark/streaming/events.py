"""Streaming event aggregation: the readStream shape of
queries.events_windowed_agg, plus a custom stateful sessionizer.

The reference has no streaming surface (SURVEY §2.7) — its "stream" is
a single-pass file read — so this module is part of the pipeline
extension: the same tumbling-window aggregation expressed over
Structured Streaming with event-time watermarks for late data, and a
session-gap operator via applyInPandasWithState (the pattern for
operators Spark's built-ins can't express).

Scale notes: windowed counts shuffle on (window, event_type) with
state bounded by the watermark horizon; the sessionizer keys state by
user_id — state size is O(active users), and the GroupStateTimeout
evicts idle sessions.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def normalize_ts(df: DataFrame) -> DataFrame:
    """events.ts has shipped as both ns-since-epoch longs
    (TIMESTAMP(NANOS) parquet under spark.sql.legacy.parquet.nanosAsLong)
    and TIMESTAMP(MICROS); pin the ns-long contract here so every
    downstream operator sees one shape regardless of data generation."""
    if not isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


def event_time_col() -> F.Column:
    """ns-epoch long -> event-time timestamp, exactly: integer `div`
    to micros then timestamp_micros. Float `/ 1e9` would round ns
    values (~1.7e18 > 2^53) near boundaries."""
    return F.timestamp_micros(F.expr("ts div 1000"))


def with_event_time(df: DataFrame) -> DataFrame:
    """normalize_ts + an ``event_time`` timestamp column; idempotent."""
    df = normalize_ts(df)
    if "event_time" not in df.columns:
        df = df.withColumn("event_time", event_time_col())
    return df


# Fallback stream schema when the directory can't be sniffed (empty at
# stream start, or unreadable footer): the canonical events shape with
# ts as ns-epoch long.
EVENTS_NS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def event_stream(spark, events_dir: str, schema=None,
                 max_files_per_trigger: int = 1) -> DataFrame:
    """File-based event stream; ts is normalized to ns-epoch long and
    an event-time column added. With no explicit schema the parquet
    directory is sniffed once with a static read (file streams require
    a fixed schema up front); the sniff sets
    spark.sql.legacy.parquet.nanosAsLong so TIMESTAMP(NANOS) files
    read as longs, and an empty/unreadable directory falls back to the
    canonical ns-long schema instead of throwing at stream start."""
    reader = (spark.readStream
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if schema is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            schema = spark.read.parquet(events_dir).schema
        except Exception:
            schema = EVENTS_NS_SCHEMA
    df = reader.schema(schema).format("parquet").load(events_dir)
    return with_event_time(df)


def windowed_event_counts(stream: DataFrame,
                          window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time windows per event type with late-data
    handling — the streaming twin of queries.events_windowed_agg."""
    return (stream
            .withWatermark("event_time", watermark)
            .groupBy(F.window("event_time", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def dedup_events(stream: DataFrame, watermark: str = "10 minutes",
                 keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup: drop duplicate events within the
    watermark horizon (state bounded by the horizon, unlike a plain
    dropDuplicates whose state grows forever). The streaming twin of
    pipeline/dedup.exact_dedup_sql for at-least-once sources."""
    df = with_event_time(stream)
    return (df.withWatermark("event_time", watermark)
            .dropDuplicatesWithinWatermark(keys or ["event_id"]))


def correlate_events(stream: DataFrame, first_type: str = "click",
                     then_type: str = "purchase",
                     max_delay: str = "30 minutes",
                     watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream interval join (funnel attribution): each
    ``first_type`` event pairs with every ``then_type`` event of the
    same user that follows within ``max_delay``. Both sides carry
    watermarks and the join condition bounds event-time distance, so
    the state store evicts a buffered row as soon as the opposite
    stream's watermark passes its match horizon — state is
    O(events within the delay window), not unbounded.

    Batch twin: queries.event_funnel (oracle-checked)."""
    base = with_event_time(stream)
    a = (base.where(F.col("event_type") == first_type)
         .select(F.col("user_id").alias("a_user"),
                 F.col("event_id").alias("first_id"),
                 F.col("event_time").alias("first_time"))
         .withWatermark("first_time", watermark))
    b = (base.where(F.col("event_type") == then_type)
         .select(F.col("user_id").alias("b_user"),
                 F.col("event_id").alias("then_id"),
                 F.col("event_time").alias("then_time"))
         .withWatermark("then_time", watermark))
    return (a.join(
        b,
        F.expr(f"a_user = b_user AND then_time > first_time "
               f"AND then_time <= first_time + INTERVAL {max_delay}"),
        "inner")
        .select(F.col("a_user").alias("user_id"), "first_id", "then_id",
                "first_time", "then_time"))


EVENT_JSON_SCHEMA = ("event_id long, ts long, user_id long, "
                     "event_type string, value double, props string")


def kafka_event_stream(spark, bootstrap_servers: str, topic: str,
                       starting_offsets: str = "earliest") -> DataFrame:
    """Kafka-shaped event source: readStream.format('kafka') with the
    standard projection, decoded by decode_kafka_events. Requires the
    spark-sql-kafka package and a broker at runtime; the decode step
    is broker-independent and unit-tested via kafka-shaped frames."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return decode_kafka_events(raw)


def decode_kafka_events(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-shaped frame (key/value binary, topic, partition,
    offset, timestamp) into the events schema + event_time. JSON values
    parse with from_json (malformed values yield NULL columns rather
    than poisoning the stream — quarantine downstream via
    dedup_events/filters); the record key carries user_id for
    key-partitioned topics, used as a fallback when the payload omits
    it. Works identically on batch frames, so the decode is testable
    without a broker."""
    parsed = raw.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(F.col("value").cast("string"),
                    EVENT_JSON_SCHEMA).alias("e"),
        F.col("timestamp").alias("_kafka_ts"))
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.ts").alias("ts"),
        F.coalesce(F.col("e.user_id"),
                   F.col("_key").cast("long")).alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
        F.coalesce(
            F.timestamp_micros(F.expr("e.ts div 1000")),
            F.col("_kafka_ts")).alias("event_time"))


def correlate_events_outer(stream: DataFrame, first_type: str = "click",
                           then_type: str = "purchase",
                           max_delay: str = "30 minutes",
                           watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream LEFT OUTER interval join: like correlate_events,
    but a ``first_type`` event with no matching ``then_type`` within
    ``max_delay`` still emits (NULL then_id) once the opposite
    stream's watermark passes its horizon — the unconverted-clicks
    feed. State bounds are identical to the inner join; the outer rows
    are emitted at state eviction time.

    Batch twin: queries.event_funnel_unconverted (oracle-checked)."""
    base = with_event_time(stream)
    a = (base.where(F.col("event_type") == first_type)
         .select(F.col("user_id").alias("a_user"),
                 F.col("event_id").alias("first_id"),
                 F.col("event_time").alias("first_time"))
         .withWatermark("first_time", watermark))
    b = (base.where(F.col("event_type") == then_type)
         .select(F.col("user_id").alias("b_user"),
                 F.col("event_id").alias("then_id"),
                 F.col("event_time").alias("then_time"))
         .withWatermark("then_time", watermark))
    return (a.join(
        b,
        F.expr(f"a_user = b_user AND then_time > first_time "
               f"AND then_time <= first_time + INTERVAL {max_delay}"),
        "leftOuter")
        .select(F.col("a_user").alias("user_id"), "first_id", "then_id",
                "first_time", "then_time"))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.DoubleType()),
    T.StructField("session_end", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.LongType()),   # micros (exact)
    T.StructField("last", T.LongType()),    # micros (exact)
    T.StructField("n", T.LongType()),
])


def sessionize(stream: DataFrame, gap_seconds: float = 1800.0,
               watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful operator: session windows with an inactivity gap,
    via applyInPandasWithState (the escape hatch for semantics the
    built-in operators can't express). Emits a row per closed session —
    mid-batch when a later event closes it, or via event-time timeout
    once the watermark passes last_event + gap. Event-time timeouts are
    data-driven (no idle processing sweeps), so state work is bounded
    by actual progress.
    """
    # State and gap comparisons run in integer MICROSECONDS (exact for
    # any ns-epoch long: ts div 1000 never rounds, unlike float
    # `ts / 1e9` whose 2^53 mantissa flips values ~128 ns from second
    # boundaries). Seconds appear only in the emitted rows, where
    # double precision over micros is the output contract.
    gap_us = int(round(gap_seconds * 1_000_000))
    gap_ms = int(round(gap_seconds * 1000))

    def emit(user_id, sessions):
        return pd.DataFrame([
            {"user_id": user_id, "session_start": s / 1e6,
             "session_end": e / 1e6, "n_events": c}
            for s, e, c in sessions])

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield emit(user_id, [(start, last, n)])
            return
        ts = sorted(int(t) for pdf in pdfs for t in pdf["ts_us"].tolist())
        if not ts:
            return
        closed = []
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        for t in ts:
            if t - last > gap_us:
                closed.append((start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_ms)
        if closed:
            yield emit(user_id, closed)

    events = (with_event_time(stream)
              .withColumn("ts_us", F.expr("ts div 1000"))
              .withWatermark("event_time", watermark))
    return (events.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=SESSION_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))
