"""Parquet sources for the driver fixture tables (FIXTURES.md).

Reference analog: the example apps' Flink file/Kafka sources
(`src/main/scala/hu/sztaki/ilab/ps/...` example jobs [C-med], SURVEY.md §0
citation convention). Here the only source the harness needs is parquet;
``spark.read.parquet`` gives us the vectorized columnar reader, predicate
pushdown, and partition pruning for free — at 100 TB the same call reads a
partitioned/bucketed table layout with no code change.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# session -> {(sf_dir, table): lazy scan DataFrame}. Each load_table call
# used to re-run spark.read.parquet — a driver-side file listing plus a
# footer schema read, measured 100-160 ms/call at sf0.1 — and entries
# call their tables several times per plan construction. The memo
# returns the SAME lazy scan plan (guide §6: cached file listing);
# nothing about execution changes — every action still scans the
# parquet files. WeakKeyDictionary keyed on the session (r16, ADVICE
# r15): a stopped session's entries — and the py4j DataFrame handles
# they hold — are dropped when the session is garbage-collected, so
# multi-session test runs don't grow the cache unboundedly. Fixture
# files are static for a process's lifetime, which is the memo's
# contract.
_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # re-asserted on hits too: a conf reset elsewhere must be self-healed
    # by the next load_table call (ADVICE r15), and the setting governs
    # how the cached lazy scan READS, not how it was built.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    per_session = _SCAN_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The fixture generator has stored ts as TIMESTAMP_NS (read as
        # int64 nanos under nanosAsLong) in some rounds and TIMESTAMP
        # micros in others — normalize either physical type to a UTC
        # TIMESTAMP identical to DuckDB's read of the same file.
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # integer division: double division loses precision at 1.7e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":  # timestamp_ntz: same instant under UTC
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql use."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
