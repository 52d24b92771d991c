"""Built-in sketch surface (C4 production path, formerly the rows-only
registry entry sketch_builtins): HLL++/Datasketches distinct counts and
approx_percentile must bracket the exact answers, and the DataFrame-stat
bloom filter / count-min builtins must behave (no false negatives,
one-sided overestimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parameter_server_spark.operators._util import t
from flink_parameter_server_spark.operators.sketches import sketch_builtins
from tests.conftest import SF_SMALL


def test_sketch_builtins_bracket_exact(spark):
    rows = sketch_builtins(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        # HLL++ and Datasketches HLL: within 10% of exact at this scale
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.1 * r.exact_users)
        assert abs(r.hll_users - r.exact_users) <= max(2, 0.1 * r.exact_users)
        # approx_percentile returns an actual data value near the median
        assert r.p50_value is not None and r.p50_exact is not None


def test_jvm_stat_bloom_filter_no_false_negatives(spark):
    # PySpark doesn't surface Dataset.stat.bloomFilter; the JVM API does
    ev = t(spark, SF_SMALL, "events")
    bf = ev._jdf.stat().bloomFilter("user_id", 1000, 0.03)
    sample = [r.user_id for r in ev.select("user_id").distinct().limit(50).collect()]
    assert all(bf.mightContain(u) for u in sample)  # no false negatives


def test_jvm_stat_count_min_sketch_overestimates(spark):
    ev = t(spark, SF_SMALL, "events")
    cms = ev._jdf.stat().countMinSketch("event_type", 0.01, 0.95, 42)
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for k, n in exact.items():
        assert cms.estimateCount(k) >= n  # one-sided error


def test_sql_count_min_sketch_and_approx_top_k(spark):
    ev = t(spark, SF_SMALL, "events")
    row = ev.agg(
        F.expr("count_min_sketch(event_type, 0.01d, 0.95d, 42)").alias("cms"),
        F.expr("approx_top_k(event_type, 3)").alias("topk"),
    ).collect()[0]
    assert row.cms is not None and len(row.cms) > 0  # binary sketch blob
    top_items = {r["item"] for r in row.topk}
    exact_top = {
        r.event_type
        for r in ev.groupBy("event_type").count().orderBy(F.desc("count")).limit(3).collect()
    }
    assert top_items == exact_top  # small domain: approx == exact
