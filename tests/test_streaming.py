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
