"""Unit tests for the two-phase distributed total-order helper
(operators/_twophase.py): output must be BIT-IDENTICAL to the
single-task `Window.orderBy(...)` reference at any partition count,
because range boundaries are sampled but the sort key is total.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark.operators._twophase import (
    global_order_stats,
)


def _reference(df, order_cols):
    w = Window.orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(wf).cast("long").alias("cum"),
    )


def test_matches_single_task_reference(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("key"),
        F.col("id").alias("uid"),
        (F.col("id") % 97).alias("v"),
    )
    order = [F.desc("key"), F.asc("uid")]
    got = global_order_stats(
        df, order, running_sums={"cum": F.col("v")}, rn_col="rn"
    )
    ref = _reference(df, order)
    sym = got.select("uid", "rn", "cum").exceptAll(
        ref.select("uid", "rn", "cum")
    )
    assert sym.count() == 0
    assert got.count() == 10_000


def test_partition_count_invariance(spark):
    """Different `parts` values must not change a single output row —
    the determinism claim the helper's docstring makes."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 321).alias("key"),
        F.col("id").alias("uid"),
        F.lit(1).alias("v"),
    )
    order = [F.asc("key"), F.asc("uid")]
    a = global_order_stats(
        df, order, running_sums={"cum": F.col("v")}, rn_col="rn", parts=4
    )
    b = global_order_stats(
        df, order, running_sums={"cum": F.col("v")}, rn_col="rn", parts=29
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rn_only_and_sums_only_modes(spark):
    df = spark.range(0, 1_000).select(
        F.col("id").alias("uid"), (F.col("id") % 7).alias("v")
    )
    order = [F.asc("uid")]
    rn_only = global_order_stats(df, order, rn_col="rn")
    assert rn_only.columns == ["uid", "v", "rn"]
    assert rn_only.agg(F.max("rn")).collect()[0][0] == 1_000
    sums_only = global_order_stats(
        df, order, running_sums={"cum": F.col("v")}, rn_col=None
    )
    assert sums_only.columns == ["uid", "v", "cum"]
    total = df.agg(F.sum("v")).collect()[0][0]
    assert sums_only.agg(F.max("cum")).collect()[0][0] == total
