"""End-to-end salting under a PLANTED skewed key (VERDICT r3 #6):
detector fires -> salt decision -> the salted physical distribution
bounds the hottest task, while the unsalted one provably doesn't —
plus semantic equality of the salted two-stage aggregate.

Measurement choice: the asserted quantity is ROWS PER SHUFFLE
PARTITION (via spark_partition_id after an explicit hash
repartitioning on the grouping columns — the same distribution a
groupBy exchange produces). Task wall-time on local[32] is noisy and
scheduler-dependent; partition row count is the deterministic driver
of task time for a non-combinable aggregate (collect_list: every raw
row must reach its reducer), so bounding max-partition share IS
bounding max task time, reproducibly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark.operators.skew import (
    key_max_share,
    salted_groupby_collect,
    should_salt,
)

N_HOT = 60_000       # one key holds 50% of all rows
N_BG_KEYS = 999      # the rest spread uniformly
N_BG = 60_000
N_PARTS = 32
SALT = 8


@pytest.fixture(scope="module")
def skewed(spark):
    """events-like frame: user_id 0 emits half the rows (the 'default
    id' pathology every 100 TB fact table has somewhere)."""
    hot = spark.range(N_HOT).select(
        F.lit(0).cast("long").alias("user_id"),
        F.col("id").cast("string").alias("payload"),
    )
    bg = spark.range(N_BG).select(
        (F.col("id") % N_BG_KEYS + 1).alias("user_id"),
        F.col("id").cast("string").alias("payload"),
    )
    df = hot.unionAll(bg)
    df.persist().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def uniform(spark):
    bg = spark.range(N_BG).select(
        (F.col("id") % N_BG_KEYS).alias("user_id"),
        F.col("id").cast("string").alias("payload"),
    )
    bg.persist().count()
    yield bg
    bg.unpersist()


def _max_partition_rows(df, *cols) -> int:
    parts = (
        df.repartition(N_PARTS, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    return max(r["count"] for r in parts)


def test_detector_fires_on_planted_skew_and_not_on_uniform(skewed, uniform):
    share = key_max_share(skewed, "user_id")
    assert share == pytest.approx(0.5), share
    assert should_salt(skewed, "user_id")
    assert key_max_share(uniform, "user_id") < 0.01
    assert not should_salt(uniform, "user_id")


def test_salted_distribution_bounds_max_task(skewed):
    """The full loop: detector fires -> decision says salt -> the
    salted exchange's hottest partition carries a bounded share of
    rows; the unsalted exchange provably concentrates the hot key."""
    assert should_salt(skewed, "user_id")  # decision gate

    unsalted_max = _max_partition_rows(skewed, "user_id")
    # the hot key's 60k rows all hash to one partition (plus whatever
    # background keys collide into it)
    assert unsalted_max >= N_HOT

    with_salt = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64("payload"), F.lit(SALT))
    )
    salted_max = _max_partition_rows(with_salt, "user_id", "_salt")
    # each (hot, salt) cell holds ~N_HOT/SALT rows; even with two cells
    # hash-colliding into one partition the max stays far below the
    # unsalted concentration
    assert salted_max * 3 < unsalted_max, (
        f"salting did not spread the hot key: {salted_max} vs {unsalted_max}"
    )
    # and the bound is the one that matters at scale: no partition
    # carries more than ~2/SALT of the hot key + background slack
    assert salted_max < (N_HOT // SALT) * 2 + (N_BG // N_PARTS) * 4


def test_salted_collect_semantics_identical(spark, skewed):
    """The salted two-stage collect_list returns the same multiset per
    key as the plain one-stage aggregate (order normalized — both
    list orders are shuffle-dependent)."""
    small = skewed.filter(
        (F.col("user_id") == 0) & (F.xxhash64("payload") % 100 == 0)
        | (F.col("user_id") % 97 == 1)
    )
    plain = {
        r["user_id"]: sorted(r["values"])
        for r in small.groupBy("user_id")
        .agg(F.collect_list("payload").alias("values"))
        .collect()
    }
    salted = {
        r["user_id"]: sorted(r["values"])
        for r in salted_groupby_collect(small, "user_id", "payload").collect()
    }
    assert salted == plain
