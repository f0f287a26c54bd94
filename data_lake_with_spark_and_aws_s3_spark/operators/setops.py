"""Set operations (SURVEY.md §2.7): union all / union distinct /
intersect / except, plus schema-drift unionByName.

All north-star surface (the reference has no set ops). Set ops are
shuffle-on-all-columns when distinct semantics are involved; UNION ALL
is a zero-shuffle concatenation of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@query(
    "q_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n_parties FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    tags=("setop", "union-all"),
)
def q_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics): customers + suppliers per nation.
    Pure partition concatenation — no shuffle until the aggregate."""
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_parties"))


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "union"),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) = unionByName + distinct."""
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir)).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with BOTH customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_suppkey < 20
    """,
    tags=("setop", "except"),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but outside the first supplier group's
    nations (subtract = EXCEPT with set semantics). The subtracted set
    is capped at 20 suppliers so the difference is NON-EMPTY at every
    shipped SF — the original s_acctbal > 5000 predicate emptied out
    at sf0.1 (every nation grows a high-balance supplier), a vacuous
    parity the sf0.1 sweep caught."""
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 20)
    high = s.select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return _cust_nations(spark, sf_dir).distinct().subtract(high)


@query(
    "q_union_by_name_drift",
    oracle="""
    SELECT party, name, acctbal, mktsegment FROM (
      SELECT 'customer' AS party, c_name AS name, c_acctbal AS acctbal,
             c_mktsegment AS mktsegment
      FROM customer
      UNION ALL
      SELECT 'supplier' AS party, s_name AS name, s_acctbal AS acctbal,
             NULL AS mktsegment
      FROM supplier
    )
    """,
    tags=("setop", "schema-drift"),
)
def q_union_by_name_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): supplier rows lack
    mktsegment, surfaced as NULL — the schema-evolution-tolerant
    union for heterogeneous batches."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("party"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------
# q_setops_all (round 8)
# ---------------------------------------------------------------------


@query(
    "q_setops_all",
    oracle="""
    SELECT 'intersect_all' AS op,
           CAST((SELECT COUNT(*) FROM (
             SELECT c_nationkey FROM customer INTERSECT ALL
             SELECT s_nationkey FROM supplier)) AS BIGINT) AS n_rows,
           CAST((SELECT COALESCE(SUM(c_nationkey), 0) FROM (
             SELECT c_nationkey FROM customer INTERSECT ALL
             SELECT s_nationkey FROM supplier)) AS BIGINT) AS key_sum
    UNION ALL
    SELECT 'except_all',
           CAST((SELECT COUNT(*) FROM (
             SELECT c_nationkey FROM customer EXCEPT ALL
             SELECT s_nationkey FROM supplier)) AS BIGINT),
           CAST((SELECT COALESCE(SUM(c_nationkey), 0) FROM (
             SELECT c_nationkey FROM customer EXCEPT ALL
             SELECT s_nationkey FROM supplier)) AS BIGINT)
    UNION ALL
    SELECT 'except_all_rev',
           CAST((SELECT COUNT(*) FROM (
             SELECT s_nationkey FROM supplier EXCEPT ALL
             SELECT c_nationkey FROM customer)) AS BIGINT),
           CAST((SELECT COALESCE(SUM(s_nationkey), 0) FROM (
             SELECT s_nationkey FROM supplier EXCEPT ALL
             SELECT c_nationkey FROM customer)) AS BIGINT)
    """,
    tags=("setop", "intersect-all", "except-all", "bag-semantics"),
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — INTERSECT ALL (min of the two
    multiplicities per value) and EXCEPT ALL in both directions
    (multiplicity subtraction, floored at zero) over (customer
    nations, supplier nations) — the §2.7 rows q_setops_matrix's
    DISTINCT variants don't cover: with 25 nation values and thousands
    of rows the multiset answers differ from the set answers by
    construction. Reported as labeled (count, key checksum) pairs so
    the full multiset CONTENT is hashed, not just its size.

    Exactness: both engines implement ANSI bag semantics (Spark
    intersectAll/exceptAll plan as count-aggregate + Generate replays
    of min/difference multiplicities); counts and key sums are exact
    integers.

    Scale: each operator is ONE hash aggregate per side on the value
    key plus a generate — shuffle volume is |distinct values|, not
    |rows|; the three labeled reductions stitch 1-row frames."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("nationkey"), F.lit(0))
            .cast("long")
            .alias("key_sum"),
        ).select(F.lit(op).alias("op"), "n_rows", "key_sum")

    return (
        one("intersect_all", c.intersectAll(s))
        .unionByName(one("except_all", c.exceptAll(s)))
        .unionByName(one("except_all_rev", s.exceptAll(c)))
    )
