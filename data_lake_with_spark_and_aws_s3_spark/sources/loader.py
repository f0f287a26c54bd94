"""Shared table loader for the driver-generated testdata (TESTDATA.md).

Reference parity: the reference reads schema-on-read JSON from S3 and
its own partitioned Parquet back (`etl.py:~33,~78,~130` reconstructed —
SURVEY.md §2.1; checkout empty, §0). Here the canonical inputs are the
driver's parquet tables; S3 access is the same `spark.read.parquet`
with an `s3a://` path, so nothing below is local-path-specific.

Scale notes (100 TB posture):
- Parquet scan goes through the DataSource V2 vectorized reader;
  filters/projections in downstream operators push into the scan
  (check with .explain: PushedFilters / ReadSchema).
- The events nanos fix is a column rewrite AFTER the scan — it does not
  break pushdown on other columns and keeps partition pruning intact.
- No .cache() here: at 100 TB you want the scan re-planned per query
  with that query's pruning, not a materialized generic copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _fix_events_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet INT64 TIMESTAMP(NANOS); with
    spark.sql.legacy.parquet.nanosAsLong=true it reads as long nanos.
    Convert to a microsecond timestamp with exact integer division
    (`div`, not `/` — float division loses sub-µs precision at 1e18 ns).
    DuckDB reads the same column natively as TIMESTAMP_NS; oracle SQL
    must CAST(ts AS TIMESTAMP) so both sides truncate ns -> µs
    identically.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)  # driver's session may lack the nanos flag
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _fix_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
