"""Streaming window operators over the events table (D17–D20 streaming
forms; A7 rate control).

Each builder returns an unstarted streaming DataFrame wired with the
SAME column expressions as its oracle-checked batch dual in
operators/windows.py — the tests run them with trigger(availableNow)
into a memory sink and diff against the batch result, which is exactly
the semantics Structured Streaming guarantees (incremental execution of
the same logical plan).

Rate control / backpressure (the reference's pull limiter,
`WorkerLogic.addPullLimiter` [C-high]): in Spark this is source-side —
`maxFilesPerTrigger` / `maxOffsetsPerTrigger` bound per-micro-batch
work; exercised in tests via maxFilesPerTrigger=1.
"""

from __future__ import annotations

import threading
import weakref
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# session -> {sf_dir: probed physical type of events.ts} (see
# stream_events; fixture files are static for a process's lifetime).
# Weakly keyed on the session (r16, ADVICE r15) so stopped test
# sessions don't pin cache entries for the process lifetime.
_TS_TYPE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def _events_schema(ts_type: str) -> StructType:
    # three-way on the probed dtype, mirroring sources/tables.py: int64
    # nanos (nanosAsLong read mode), UTC-adjusted micros ('timestamp'),
    # or NTZ micros ('timestamp_ntz'). The parquet reader refuses to read
    # an isAdjustedToUTC column as NTZ (and vice versa), so declaring the
    # wrong flavor breaks the streaming path while batch still works.
    if ts_type == "bigint":
        ts_field = LongType()
    elif ts_type == "timestamp":
        ts_field = TimestampType()
    else:
        ts_field = TimestampNTZType()
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_field),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """events as a file stream; ts normalized to TIMESTAMP like the batch
    loader so stream and batch plans share expressions. readStream needs
    the schema up front, so probe the parquet footer with a batch read
    (driver-only metadata, no data scan) to pick the ts physical type."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    # r15: memoize the footer probe like sources.tables._SCAN_CACHE —
    # a batch-read schema probe costs ~100 ms of driver listing per
    # stream construction and the fixture file is static per process
    per_session = _TS_TYPE_CACHE.setdefault(spark, {})
    key = os.path.abspath(sf_dir)
    ts_type = per_session.get(key)
    if ts_type is None:
        ts_type = dict(spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes)["ts"]
        per_session[key] = ts_type
    reader = spark.readStream.schema(_events_schema(ts_type)).option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_daily_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17 streaming: watermarked tumbling 1-day counts per event_type."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "event_type", "n")
    )


def session_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18 streaming: 30-min-gap session windows per user (same
    session_window expression as the oracle-checked batch dual)."""
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("dur_us"),
        )
        .select("user_id", "session_start_us", "n_events", "dur_us")
    )


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19/D20 streaming: watermark + dropDuplicatesWithinWatermark on
    (user_id, event_type) — keeps the first arrival per key, and the
    watermark EVICTS per-key state once event time passes it, so state
    stays bounded (plain dropDuplicates without the event-time column in
    the key set would keep every key forever)."""
    ev = stream_events(spark, sf_dir)
    return ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type", "event_id", "value")


# Refcounted clamp state per session id: {session_id: [depth, saved_value]}.
# spark.sql.shuffle.partitions is SESSION-global, and r15 runs two clamped
# stream runs on concurrent driver threads (streaming_sessions,
# streaming_agg_sinks). An unsynchronized save/restore pair interleaved
# A-set, B-save(clamped), A-restore, B-restore would leave the session
# permanently clamped for every later batch entry; the refcount makes the
# FIRST enter save+set and only the LAST exit restore, so concurrent
# streams share one clamp window and the original value always comes back.
_CLAMP_LOCK = threading.Lock()
_CLAMP_STATE: dict[int, list] = {}


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Temporarily clamp shuffle partitions for a finite test/driver
    stream run. Stateful streaming ops allocate one state store per
    shuffle partition with AQE disabled, so at tiny scale 32 stores are
    pure per-batch overhead; a production deployment sizes this to the
    cluster (it is baked into the checkpoint at first start).

    Concurrency-safe: nested/concurrent uses on one session refcount the
    clamp (first enter saves + sets, last exit restores). A concurrent
    enter with a DIFFERENT n keeps the first clamp value — all in-repo
    callers use the default."""
    key = id(spark)
    with _CLAMP_LOCK:
        state = _CLAMP_STATE.get(key)
        if state is None:
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            _CLAMP_STATE[key] = [1, old]
        else:
            state[0] += 1
    try:
        yield
    finally:
        with _CLAMP_LOCK:
            state = _CLAMP_STATE[key]
            state[0] -= 1
            if state[0] == 0:
                del _CLAMP_STATE[key]
                spark.conf.set("spark.sql.shuffle.partitions", state[1])


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Execute with availableNow trigger into a memory sink; return the
    materialized result table."""
    spark = stream_df.sparkSession
    with stream_shuffle_partitions(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete" if _has_aggregate(stream_df) else "append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _has_aggregate(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
