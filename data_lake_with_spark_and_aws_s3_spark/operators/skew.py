"""Skew mitigation + co-location primitives (SURVEY.md §4.3 posture):
salted joins for hot keys, bucketed tables for shuffle-free joins.

These are library operators with equivalence/plan tests rather than
oracle queries — their OUTPUT equals a plain join's; what changes is
the physical distribution, which the driver's value-hash can't see
but a 1000-executor cluster certainly does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over `salt`
    sub-partitions and the RIGHT side replicated `salt` times.

    Use when one key dominates the left side (e.g. a null-ish default
    id holding 10% of a 100 TB fact): a plain shuffle join puts that
    whole key on one task; salting divides it by `salt` at the cost
    of replicating the right side's rows for that key.

    AQE's skew-join handles sort-merge skew automatically for many
    cases — reach for explicit salting when AQE can't (aggregations
    after the join keyed on the same column, or stubborn plans).
    Result is row-identical to left.join(right, key, how).
    """
    if how != "inner":
        raise ValueError("salted_join demonstrates the inner-join shape")
    lsalted = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    rrepl = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lsalted.join(rrepl, [key, "_salt"], "inner").drop("_salt")


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist as a bucketed external table: rows hash-distributed
    into `n_buckets` files by `key`, bucket metadata in the catalog.
    Two tables bucketed the same way join WITHOUT a shuffle — the
    single biggest lever for recurring fact-to-fact joins at 100 TB
    (pay the shuffle once at write, never at read)."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )
