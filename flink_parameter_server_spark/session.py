"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the configs below are
chosen to also be the right defaults on a real multi-executor cluster at
100 TB scale:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy);
- shuffle partitions sized to the local core count (on a cluster this
  would be ``2-3 x total executor cores`` — documented, not hardcoded);
- Arrow enabled for the few Pandas-UDF paths (multimodal, streaming state);
- UTC session timezone so timestamp semantics agree with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def get_spark(app_name: str = "fps-engine", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # r16 (VERDICT r15): derive from the core count instead of a 32
        # literal, so the driver's lower-core scaling runs see a
        # consistently-sized shuffle (identical value at the default
        # CPUS=32; on a real cluster this is 2-3x total executor cores).
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects;
        # read as int64 nanos and convert in the loader (DuckDB-equivalent
        # truncation to microseconds).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
