"""Structured Streaming twins: drive the real streaming engine over a
bounded parquet directory (availableNow + memory sink) and check the
results against the batch operators — same expressions, same answers.
"""

from __future__ import annotations

import pytest

from data_lake_with_spark_and_aws_s3_spark import REGISTRY
from data_lake_with_spark_and_aws_s3_spark.streaming import (
    run_to_memory,
    stream_events,
    streaming_dedup,
    streaming_tumbling,
)

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    agg = streaming_tumbling(stream_events(spark, SF))
    run_to_memory(agg, "t_tumbling", output_mode="append")
    got = {
        (r["hour_ts"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = {
        (r["hour_ts"], r["event_type"]): r["n_events"]
        for r in REGISTRY["q_events_tumbling"].fn(spark, SF).collect()
    }
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch answer exactly, and most windows of
    # this bounded input must have been emitted
    assert got, "no windows emitted"
    for k, v in got.items():
        assert batch[k] == v, k
    assert len(got) >= len(batch) - 10


def test_streaming_dedup(spark):
    dd = streaming_dedup(stream_events(spark, SF))
    run_to_memory(dd, "t_dedup", output_mode="append")
    n = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    n_batch = REGISTRY["q_stream_dedup"].fn(spark, SF).agg({"n_events": "sum"}).collect()[0][0]
    assert n == n_batch


def test_stream_stream_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from data_lake_with_spark_and_aws_s3_spark.sources.loader import load_table
    from data_lake_with_spark_and_aws_s3_spark.streaming.twins import (
        streaming_event_time_join,
    )

    joined = streaming_event_time_join(stream_events(spark, SF))
    run_to_memory(joined, "t_ss_join", output_mode="append")
    n_stream = spark.sql("SELECT count(*) AS n FROM t_ss_join").collect()[0]["n"]
    # batch equivalent over the same bounded source
    e = load_table(spark, SF, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("c_ts")
    )
    n_batch = p.join(
        c,
        (F.col("u") == F.col("u2"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 5 MINUTES")),
    ).count()
    assert n_stream == n_batch and n_batch > 0
