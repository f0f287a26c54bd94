"""Distributed k-means (Lloyd iterations) over the embedding corpus —
the iterative-refinement algorithm class (alongside graph.py's
connected components), built the way MLlib builds it: centroids live
on the driver as k x dim literals (k=8, dim=64 -> a few KB), the
ASSIGNMENT step is map-only (zero shuffle — every vector computes its
distances to the broadcast-literal centroids inside codegen), and the
UPDATE step posexplodes to (cluster, dim) cells whose partial
aggregation reduces each partition to <= k*dim rows before the one
negligible shuffle. Per iteration at 100 TB: one full map pass + a
k*dim-row exchange + a k*dim driver collect. Nothing else is moved.

Exactness (the reason this is oracle-checkable at all, see
[[oracle-exactness-playbook]] / functions/numeric.py):
  - float32 -> double widening is exact; all distance arithmetic is
    double with a FIXED fold order (Spark ``F.aggregate`` and DuckDB
    ``list_reduce`` both fold left, and the 0.0 init doesn't change
    bracketing), so every distance is bit-identical cross-engine.
  - centroid updates quantize each element to nano-unit INTEGERS
    (exact integer doubles < 2^53), sum exactly, then one IEEE
    division by (count * 1e9) — the q_embedding_centroids pattern.
    (The earlier DECIMAL(15,9) sum died at sf0.1: Spark's
    float->decimal and DuckDB's CAST(double AS DECIMAL) rounded a few
    elements differently, nudging one centroid by ~1e-9 and every
    distance to it by ~1e-13 — found by the round-3 sf0.1 sweep.)
  - argmin ties break toward the smallest cluster id in both engines
    (first-match CASE in Spark, ROW_NUMBER(dist, cid) in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

K = 8
DIM = 64
ITERS = 2


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, left-fold order."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _assign(e: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """Map-only cluster assignment: k distance columns, least-of-k,
    first-match argmin. No shuffle, no UDF — plain codegen."""
    cids = sorted(centroids)
    with_d = e.select(
        "vec_id", "v",
        *[_sqdist(F.col("v"), centroids[j]).alias(f"d{j}") for j in cids],
    )
    best = F.least(*[F.col(f"d{j}") for j in cids])
    cluster = F.when(F.col(f"d{cids[0]}") == best, F.lit(cids[0]))
    for j in cids[1:]:
        cluster = cluster.when(F.col(f"d{j}") == best, F.lit(j))
    return with_d.select(
        "vec_id", "v",
        cluster.cast("long").alias("cluster_id"),
        best.alias("dist"),
    )


def _update(assigned: DataFrame) -> dict[int, list[float]]:
    """New centroids: per-(cluster, dim) exact-decimal mean, collected
    to the driver (k*dim values — the broadcast-centroid pattern)."""
    scaled = F.round(F.col("val") * F.lit(1_000_000_000), 0).cast("long")
    cells = (
        assigned.select("cluster_id", F.posexplode("v").alias("dim", "val"))
        .groupBy("cluster_id", "dim")
        .agg(
            (
                F.sum(scaled).cast("double")
                / (F.count(F.lit(1)) * F.lit(1_000_000_000.0))
            ).alias("c")
        )
        .collect()
    )
    out: dict[int, list[float]] = {}
    for row in cells:
        out.setdefault(row.cluster_id, [0.0] * DIM)[row.dim] = row.c
    return out


def _kmeans_oracle() -> str:
    """The same ITERS Lloyd steps as chained CTEs: assign_i is the
    cross-join argmin (ROW_NUMBER ties to smallest cid), cent_i the
    per-(cluster, dim) decimal mean rebuilt into an ordered list."""
    dist = (
        "list_reduce(list_transform(range(1, 65),"
        " i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])), (a, b) -> a + b)"
    )
    sql = f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cent0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {K})
    """
    prev = "cent0"
    for it in range(1, ITERS + 1):
        sql += f"""
    , d{it} AS (
      SELECT e.vec_id, e.v, c.cid, {dist} AS dist,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {dist}, c.cid) AS rn
      FROM e, {prev} AS c
    ), a{it} AS (SELECT vec_id, v, cid, dist FROM d{it} WHERE rn = 1)
    , m{it} AS (
      SELECT cid, g.i,
             CAST(SUM(CAST(ROUND(v[g.i] * 1000000000, 0) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1000000000.0) AS c
      FROM a{it}, generate_series(1, {DIM}) AS g(i)
      GROUP BY cid, g.i
    ), cent{it} AS (SELECT cid, list(c ORDER BY i) AS c FROM m{it} GROUP BY cid)
    """
        prev = f"cent{it}"
    sql += f"""
    SELECT e.vec_id, CAST(c.cid AS BIGINT) AS cluster_id, {dist} AS dist
    FROM e, {prev} AS c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) = 1
    """
    return sql


@query("q_kmeans_lloyd", oracle=_kmeans_oracle(), tags=("clustering", "iterative"))
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over embeddings: k=8 seeded from vec_id < 8, ITERS=2
    Lloyd steps (assign -> exact-decimal centroid update), then the
    final assignment with per-vector squared distance. Every float is
    bit-identical to the SQL oracle's CTE chain — an oracle-checked
    ITERATIVE algorithm, not a rows-only one."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    init = e.filter(F.col("vec_id") < K).collect()
    centroids = {int(r.vec_id): list(r.v) for r in init}
    for _ in range(ITERS):
        centroids = _update(_assign(e, centroids))
    return _assign(e, centroids).select(
        "vec_id", "cluster_id", "dist"
    )
