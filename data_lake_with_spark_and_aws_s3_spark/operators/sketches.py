"""Count-min sketch heavy hitters over the documents token stream —
the bounded-memory frequency-sketch class of operator (Cormode &
Muthukrishnan 2005), built the Spark way: the sketch is a tiny
(depth x width) counter TABLE produced by one hash aggregate, not a
custom accumulator. depth=4 seeded hash rows, width=256 buckets:

    sketch[s][h_s(tok)] += 1        (one groupBy over (seed, bucket))
    est(tok) = min_s sketch[s][h_s(tok)]

At 100 TB the token stream never materializes anywhere: the explode ->
(seed, bucket) projection partial-aggregates map-side down to at most
depth*width = 1024 rows per partition before the one negligible
shuffle — the sketch costs a constant 1024-row exchange regardless of
corpus size, which is the entire point of a sketch. The estimate step
broadcast-joins the 1024-row sketch to the candidate keys.

Unlike most sketches, CMS has NO randomness at query time — with
fixed seeds it is a pure function of the data, so the whole operator
is exactly oracle-checkable (not just twin-bounded like HLL in
aggregates.py): both engines compute identical md5-derived bucket
indexes ([[oracle-exactness-playbook]]'s hex-digit trick, shared with
llm_pipeline.py). The output also demonstrates the CMS guarantee
estimate >= exact on every row (overestimate column is never
negative — asserted in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table
from .llm_pipeline import _hex_val_sql

DEPTH = 4
WIDTH = 256
TOP_N = 20


def _bucket_sql(tok_expr: str, seed_expr: str, cast_str: str) -> str:
    """Bucket index in [0, WIDTH) — identical text works in both
    dialects except the string cast of the seed."""
    h = f"md5(concat({tok_expr}, '#', {cast_str}({seed_expr})))"
    return f"(({_hex_val_sql(h)}) % {WIDTH})"


_SPARK_BUCKET = _bucket_sql("tok", "seed", "string")


def _duck_bucket(tok: str, seed: str) -> str:
    h = f"md5({tok} || '#' || CAST({seed} AS VARCHAR))"
    return f"(({_hex_val_sql(h)}) % {WIDTH})"


_ORACLE = f"""
    WITH tok AS (
      SELECT t.tok FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) t WHERE t.tok <> ''
    ),
    seeds AS (SELECT unnest([{", ".join(str(i) for i in range(DEPTH))}]) AS seed),
    sketch AS (
      SELECT seed, {_duck_bucket("tok", "seed")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok CROSS JOIN seeds
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM tok GROUP BY tok
      QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) <= {TOP_N}
    )
    SELECT e.tok AS token, e.exact_cnt,
           CAST(MIN(s.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(s.cnt) - e.exact_cnt AS BIGINT) AS overestimate
    FROM exact e
    CROSS JOIN seeds sd
    JOIN sketch s
      ON s.seed = sd.seed AND s.bucket = {_duck_bucket("e.tok", "sd.seed")}
    GROUP BY e.tok, e.exact_cnt
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def cms_sketch(tokens: DataFrame) -> DataFrame:
    """(seed, bucket, cnt) counter table, at most DEPTH*WIDTH rows.
    Partial aggregation collapses each map task to <= 1024 rows before
    the shuffle — constant-size regardless of input."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(DEPTH)])).alias("seed")
    return (
        tokens.select("tok", seeds)
        .select("seed", F.expr(_SPARK_BUCKET).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_cms_heavy_hitters",
    oracle=_ORACLE,
    tags=("sketch", "count-min", "heavy-hitters", "llm-pipeline"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 exact heavy-hitter tokens with their count-min estimates.
    exact_cnt is the ground truth, cms_est the sketch answer, and
    overestimate (= cms_est - exact_cnt) is provably >= 0."""
    toks = _tokens(spark, sf_dir)
    sketch = cms_sketch(toks)

    from pyspark.sql import Window

    w = Window.orderBy(F.col("exact_cnt").desc(), F.col("tok"))
    exact = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_N)
        .drop("rn")
    )

    seeds = F.explode(F.array(*[F.lit(i) for i in range(DEPTH)])).alias("seed")
    probes = exact.select("tok", "exact_cnt", seeds).select(
        "tok", "exact_cnt", "seed", F.expr(_SPARK_BUCKET).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            F.col("tok").alias("token"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


_FH_DIM = 64  # hashing-trick feature dimension


@query(
    "q_feature_hash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) t WHERE t.tok <> ''
    )
    SELECT doc_id,
           ({_hex_val_sql("md5(tok)")}) % {_FH_DIM} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY 1, 2
    """,
    tags=("sketch", "feature-hashing", "llm-pipeline"),
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens hash into a fixed
    {_FH_DIM}-dimensional space (md5 -> first 4 hex digits -> mod), term
    frequencies per (doc, bucket). The sparse long-form output is the
    join-friendly layout (a dense vector column would be banned by the
    driver's canonicalizer anyway); collisions are the accepted price
    of a vocabulary-free, single-pass, bounded-width encoding — the
    standard trick when a 100 TB corpus's vocabulary won't fit a
    broadcast dictionary. Plan: explode -> project (codegen md5) ->
    one hash aggregate; output <= |docs| x dim rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = f"({_hex_val_sql('md5(tok)')}) % {_FH_DIM}"
    return (
        toks.select("doc_id", F.expr(bucket).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
