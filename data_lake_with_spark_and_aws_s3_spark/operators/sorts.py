"""Global sort via range partitioning (SURVEY.md §2.6).

A global ORDER BY range-partitions on the sort key (sampled
boundaries) then sorts within partitions — the only scalable total
order. The driver's value-hash is order-insensitive, so the oracle
checks CONTENT while the plan test (tests/test_plans.py) checks the
physical shape: RangePartitioning exchange + in-partition Sort, no
single-task collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


@query(
    "q_global_sort",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
    tags=("sort", "range-partition"),
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Totally-ordered open orders by (orderdate, orderkey). The sort
    is real work in the plan (range exchange + sort) even though the
    oracle hash can't observe row order — plan-shape asserted
    separately."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey")
    )
