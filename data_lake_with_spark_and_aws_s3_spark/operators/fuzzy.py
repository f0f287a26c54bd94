"""Blocked fuzzy matching (record linkage): approximate string join
via blocking key + edit-distance verify — the entity-resolution
operator family, built like neardup.py's candidate/verify split:
never compare all pairs, only pairs sharing a cheap block key.

Block = the last token of the product name (p_name is "adjective
noun"); candidate pairs form inside each block via an equi-join the
planner shuffles on the block key, then levenshtein() verifies. Per
block the work is quadratic — same honesty as the exact-Jaccard
baseline in neardup.py:51: fine when blocks are bounded (product
vocabularies, normalized address fields), and the MinHash-LSH path in
neardup.py:97 is the blocking strategy when they aren't.

levenshtein() is an integer algorithm — identical in Spark and DuckDB
— and the similarity ratio is one int/int division (correctly rounded
double in both engines), so the whole operator is exactly
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

MAX_DIST = 3


@query(
    "q_fuzzy_join",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name AS name,
             string_split(p_name, ' ')[-1] AS block
      FROM part
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
           1.0 - levenshtein(a.name, b.name)
                 / CAST(greatest(len(a.name), len(b.name)) AS BIGINT)
             AS similarity
    FROM names a
    JOIN names b ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {MAX_DIST}
    """,
    tags=("join", "fuzzy", "record-linkage", "blocking"),
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-matching product-name pairs: block on the noun, verify
    with levenshtein <= 3, score with a normalized similarity ratio.
    The plan is an equi-join on the block key (shuffle-safe) with the
    edit-distance predicate evaluated post-join inside codegen."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(
        F.col("p_name").alias("name"),
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .filter(dist <= MAX_DIST)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("long").alias("dist"),
            (
                F.lit(1.0)
                - dist
                / F.greatest(F.length("a.name"), F.length("b.name")).cast("long")
            ).alias("similarity"),
        )
    )
