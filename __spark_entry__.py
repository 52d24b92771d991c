"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``flink_parameter_server_spark`` (see SURVEY.md
§2 for the operator inventory and plans/registry.py for the surface).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_parameter_server_spark.plans import REGISTRY  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def _tune(spark: SparkSession) -> None:
    """Runtime configs the engine needs on ANY session (the driver
    supplies its own vanilla one): nanos-parquet compatibility, oracle
    timezone parity, and local-scale shuffle sizing — a vanilla session's
    200 shuffle partitions mean 200 state stores per stateful streaming
    query and 6x task overhead on a local[32] box (AQE coalesces batch
    exchanges but not the initial streaming state layout)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _tune(spark)
    return REGISTRY["copurchase_recommend_top5"].fn(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return spec.fn(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle is not None}
