"""PySpark-native analytics engine with the capability surface of
``jkoth/Data-Lake-with-Spark-and-AWS-S3`` (see SURVEY.md).

The reference is a ~170-line PySpark ETL script (Udacity "Data Lake"
project template; checkout at /root/reference was empty at survey time,
so citations are to the canonical template per SURVEY.md §0). This
package re-expresses its capabilities — JSON/Parquet scans, star-schema
transforms, partitioned Parquet sinks — as an idiomatic
DataFrame/Catalyst engine, and extends them with the relational core,
streaming-shaped event operators, and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) mandated
by BASELINE.json.

Public surface:
    ``REGISTRY``        name -> QuerySpec (spark fn + DuckDB oracle SQL)
    ``all_queries()``   name -> callable(spark, sf_dir) -> DataFrame
    ``all_oracles()``   name -> ANSI SQL string (DuckDB-runnable)
    ``flagship(spark, sf_dir)`` -> DataFrame (driver smoke query)
"""

from __future__ import annotations

from .registry import REGISTRY, QuerySpec, query  # noqa: F401

# Importing the operator modules populates REGISTRY via the @query
# decorator.  Keep this import AFTER registry so decorators resolve.
from . import operators  # noqa: F401, E402


def all_queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def flagship(spark, sf_dir: str):
    """Multi-operator flagship query (scan -> filter -> 3-way join ->
    agg -> top-k). Used by the driver's t1 smoke via __spark_entry__."""
    return REGISTRY["q3_join_topk"].fn(spark, sf_dir)
