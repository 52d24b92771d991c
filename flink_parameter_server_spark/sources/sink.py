"""Sinks (SURVEY.md §2 D2) — the write-side layout decisions that matter
at 100 TB.

Reference analog: the example jobs write collections/files via Flink
sinks [C-med]; model dump is `ParameterServerLogic.close -> output`
[C-med]. Here the model/state IS a DataFrame, so a sink is a layout
choice:

- `write_partitioned`: hive-style partition directories on a low-
  cardinality column (e.g. event date) -> static + dynamic partition
  pruning on read.
- `write_bucketed`: pre-shuffled bucket layout on a join/agg key ->
  repeated joins and aggregations on that key skip the shuffle entirely
  (the storage-level version of the reference's `paramId % N` sharding).
  Requires saveAsTable (bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
