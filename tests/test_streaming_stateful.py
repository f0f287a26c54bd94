"""applyInPandasWithState: the custom-stateful streaming operator
must, after consuming a bounded source, hold exactly the batch
aggregate per key."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark.sources.loader import load_table
from data_lake_with_spark_and_aws_s3_spark.streaming import stream_events
from data_lake_with_spark_and_aws_s3_spark.streaming.stateful import (
    streaming_user_profiles,
)
from data_lake_with_spark_and_aws_s3_spark.streaming.twins import run_to_memory

SF = "/root/testdata/sf0.001"


def _final_profiles(spark, table):
    got = {}
    for r in spark.sql(f"SELECT * FROM {table}").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], r["total_value"])
    return got


def _batch_profiles(spark):
    return {
        r["user_id"]: (r["n"], round(r["total"], 2))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }


def test_tws_profiles_match_batch(spark):
    """transformWithStateInPandas (4.x successor API) twin must reach
    the same final per-user state; requires the RocksDB state store
    AND the protobuf python package (Spark's TWS state-server protocol
    — not installable in this container, so skip without it)."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its state protocol",
    )
    from data_lake_with_spark_and_aws_s3_spark.streaming.stateful import (
        streaming_user_profiles_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        profiles = streaming_user_profiles_tws(stream_events(spark, SF))
        run_to_memory(profiles, "t_profiles_tws", output_mode="update")
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    got = _final_profiles(spark, "t_profiles_tws")
    batch = _batch_profiles(spark)
    assert set(got) == set(batch)
    for uid, (n, total) in batch.items():
        gn, gt = got[uid]
        assert gn == n, uid
        assert abs(gt - total) < 0.02, (uid, gt, total)


def test_stateful_profiles_match_batch(spark):
    profiles = streaming_user_profiles(stream_events(spark, SF))
    run_to_memory(profiles, "t_profiles", output_mode="update")
    # update mode re-emits per batch; the FINAL state is the emission
    # with the highest count (collect order isn't guaranteed)
    got = {}
    for r in spark.sql("SELECT * FROM t_profiles").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = {
        r["user_id"]: (r["n"], round(r["total"], 2))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, total) in batch.items():
        gn, gt = got[uid]
        assert gn == n, uid
        assert abs(gt - total) < 0.02, (uid, gt, total)  # float sum order differs


def test_stateful_interval_union_matches_batch(spark):
    """The incremental interval-union state machine must converge to
    the batch sweep's islands: per user, same total event count,
    island count, and total busy microseconds."""
    from data_lake_with_spark_and_aws_s3_spark.streaming.stateful import (
        streaming_interval_union,
    )
    from data_lake_with_spark_and_aws_s3_spark.registry import REGISTRY

    out = streaming_interval_union(stream_events(spark, SF))
    run_to_memory(out, "t_interval_union", output_mode="update")
    got = {}
    for r in spark.sql("SELECT * FROM t_interval_union").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], r["n_islands"], r["total_busy_us"])
    batch = {
        r["user_id"]: (r["n_events"], r["n_islands"], r["total_busy_us"])
        for r in REGISTRY["q_interval_union"]
        .fn(spark, SF)
        .groupBy("user_id")
        .agg(
            F.sum("n_merged").alias("n_events"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("busy_us").alias("total_busy_us"),
        )
        .collect()
    }
    assert set(got) == set(batch)
    for uid in batch:
        assert got[uid] == batch[uid], (uid, got[uid], batch[uid])
