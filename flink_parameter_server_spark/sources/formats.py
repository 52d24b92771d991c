"""Source-format breadth (SURVEY.md §2 D1/D2): CSV and JSON sources and
sinks alongside parquet.

The harness fixtures are parquet-only, so format support is proven by a
round trip: write a fixture table out as CSV and as JSON (sinks), read
both back with an explicit schema (sources), and check the two reads
agree with each other and with the parquet original — the oracle is
plain SQL over the parquet table, so any encode/decode drift in either
format fails the value hash.

Scale notes: CSV/JSON scans split by line just like parquet splits by
row group (maxPartitionBytes governs both); schemas are always supplied
explicitly — schema inference is a full extra pass over 100 TB and is
never acceptable in production paths.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ..operators._util import t
from ..plans.registry import register


@register(
    "source_format_roundtrip",
    oracle="""
SELECT 'csv_json' AS fmt, n_nationkey AS key, n_name AS name,
       CAST(n_regionkey AS BIGINT) AS val
FROM nation
UNION ALL
SELECT 'orc_avro' AS fmt, r_regionkey AS key, r_name AS name,
       count(*) AS val
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_regionkey, r_name
""",
    tags=("D1", "D2"),
    doc="Source/sink format breadth in one query discriminated by `fmt` "
    "(source_format_orc_avro folded in, registry consolidation r3). "
    "'csv_json': nation written as headered CSV and as JSON lines, both "
    "read back under the explicit schema, inner-joined on the key with "
    "a value-equality predicate on every column — output matches the "
    "parquet original exactly, so both formats' encode/decode paths are "
    "value-checked. 'orc_avro': region and nation written as ORC "
    "(native reader, pushdown + pruning like parquet), read back, "
    "joined and aggregated; Avro is exercised only when the spark-avro "
    "jar is importable (probed, not assumed). The oracle runs on the "
    "parquet originals, so any encode/decode drift fails the hash.",
)
def source_format_roundtrip(spark, sf_dir):
    csv_json = _csv_json_roundtrip(spark, sf_dir).select(
        F.lit("csv_json").alias("fmt"),
        F.col("n_nationkey").alias("key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("val"),
    )
    orc_avro = _orc_avro_roundtrip(spark, sf_dir).select(
        F.lit("orc_avro").alias("fmt"),
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.col("n_nations").alias("val"),
    )
    return csv_json.unionByName(orc_avro)


def _csv_json_roundtrip(spark, sf_dir):
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    tmp = tempfile.mkdtemp(prefix="fps_formats_")
    n.write.mode("overwrite").option("header", True).csv(f"{tmp}/csv")
    n.write.mode("overwrite").json(f"{tmp}/json")
    c = spark.read.schema(n.schema).option("header", True).csv(f"{tmp}/csv")
    j = (
        spark.read.schema(n.schema)
        .json(f"{tmp}/json")
        .select(
            F.col("n_nationkey").alias("jk"),
            F.col("n_name").alias("jn"),
            F.col("n_regionkey").alias("jr"),
        )
    )
    return (
        c.join(
            j,
            (F.col("n_nationkey") == F.col("jk"))
            & (F.col("n_name") == F.col("jn"))
            & (F.col("n_regionkey") == F.col("jr")),
        )
        .select("n_nationkey", "n_name", "n_regionkey")
    )


def _orc_avro_roundtrip(spark, sf_dir):
    import tempfile

    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    tmp = tempfile.mkdtemp(prefix="fps_orc_")
    region.write.mode("overwrite").orc(f"{tmp}/region")
    nation.write.mode("overwrite").orc(f"{tmp}/nation")
    r = spark.read.orc(f"{tmp}/region")
    n = spark.read.orc(f"{tmp}/nation")
    try:  # Avro needs the spark-avro jar; exercise when present
        nation.write.mode("overwrite").format("avro").save(f"{tmp}/nation_avro")
        n = spark.read.format("avro").load(f"{tmp}/nation_avro")
    except Exception:
        pass  # jar absent in this container: ORC-only round trip
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_regionkey", "r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )
