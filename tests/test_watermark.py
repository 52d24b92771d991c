"""D19: watermark semantics — late data beyond the watermark is dropped
across micro-batches (the one streaming behavior with no batch dual)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_parameter_server_spark.operators._util import t
from tests.conftest import SF_SMALL


def test_late_data_beyond_watermark_is_dropped(spark):
    ev = t(spark, SF_SMALL, "events").select("event_id", "ts", "event_type")
    recent = ev.where(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
    late = ev.where(F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    assert recent.count() > 0 and late.count() > 0

    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt, out = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/out"
        recent.coalesce(1).write.parquet(src)

        def run_batch():
            # file sink (D2): append mode + checkpoint recovery across runs
            stream = spark.readStream.schema(recent.schema).parquet(src)
            q = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "n")
                .writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_batch()  # phase 1: watermark advances to max(recent) - 1h
        late.coalesce(1).write.mode("append").parquet(src)
        run_batch()  # phase 2: late file arrives behind the watermark

        days = {r.day for r in spark.read.parquet(out).select("day").collect()}

    # every emitted window is from the recent range; the late (older)
    # days were dropped by the watermark, not aggregated
    assert days, "append mode should have finalized at least one window"
    assert all(d >= "2024-01-15" for d in days), f"late days leaked: {sorted(days)}"
