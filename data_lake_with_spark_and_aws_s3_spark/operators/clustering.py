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
from ..sources.loader import fan_out, load_table

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
    # r8 note: fan_out was tried here and REJECTED by measurement
    # (3.51 s -> 3.79 s): the wall is the per-iteration collect jobs,
    # not the distance folds, so the extra exchange only added cost.
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


# --- k-center greedy (farthest-first) coreset selection ---------------
# The diversity-selection counterpart of Lloyd above: instead of
# refining k means, greedily pick the point FARTHEST from everything
# chosen so far (Gonzalez 1985, the 2-approximation for the k-center
# objective) — the standard "diverse subset / coreset" primitive in
# training-data curation. Same execution envelope as k-means: centers
# are O(K) driver literals, every corpus pass is map-only + one
# TakeOrdered argmax, nothing else moves.

_KC_K = 8
_KC_Q = 10_000  # float -> int grid (similarity.py convention)

_KC_QI = f"CAST(ROUND(CAST({{x}} AS DOUBLE) * {_KC_Q}, 0) AS BIGINT)"
_KC_D2_SQL = (
    "list_reduce(list_transform(range(1, 65), i -> "
    "({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (s, x) -> s + x)"
)


def _kc_d2(vec: Column, center: list[int]) -> Column:
    """Exact int64 squared L2 distance to a literal quantized center,
    left-fold order (mirrors list_reduce)."""
    c = F.array(*[F.lit(int(x)).cast("long") for x in center])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _kcenter_oracle() -> str:
    steps = []
    for k in range(2, _KC_K + 1):
        d2 = _KC_D2_SQL.format(a="d.q", b=f"c{k}.q")
        steps.append(
            f"""
    c{k} AS MATERIALIZED (
      SELECT vec_id AS cid, q FROM d{k - 1}
      ORDER BY md DESC, vec_id LIMIT 1
    ),
    d{k} AS MATERIALIZED (
      SELECT vec_id, label, q,
             CASE WHEN nd < md THEN nd ELSE md END AS md,
             CASE WHEN nd < md THEN cid ELSE ncid END AS ncid
      FROM (SELECT d.*, c{k}.cid, {d2} AS nd FROM d{k - 1} d, c{k})
    )"""
        )
    d2_first = _KC_D2_SQL.format(a="qe.q", b="c1.q")
    return f"""
    WITH qe AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> {_KC_QI.format(x="x")}) AS q
      FROM embeddings
    ),
    c1 AS MATERIALIZED (
      SELECT vec_id AS cid, q FROM qe ORDER BY vec_id LIMIT 1
    ),
    d1 AS MATERIALIZED (
      SELECT qe.vec_id, qe.label, qe.q,
             {d2_first} AS md, c1.cid AS ncid
      FROM qe, c1
    ),
    {",".join(steps)}
    SELECT vec_id, label, ncid AS center_id, md AS min_dist2
    FROM d{_KC_K}
    """


@query(
    "q_kcenter_select",
    oracle=_kcenter_oracle(),
    tags=("clustering", "coreset", "diversity", "iterative", "llm-pipeline"),
)
def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-first) selection of 8 maximally
    diverse embeddings, then every vector labeled with its nearest
    selected center and exact distance — the coverage assignment whose
    max is the k-center radius. Distances are exact int64 on the
    quantized grid, so the argmax at every greedy step is deterministic
    (DESC distance, then vec_id), and the final assignment breaks ties
    toward the EARLIEST-chosen center via the same strict-improvement
    chain in both engines.

    Scale: per greedy step one map-only corpus pass (distances to <=K
    broadcast-literal centers inside codegen) + a TakeOrdered argmax
    collecting ONE row; final assignment is another map-only pass.
    Driver state is O(K * dim) literals — the kmeans/clustering.py
    envelope; no pairwise joins anywhere."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, x -> {_KC_QI.format(x='x')})"
        ).alias("q"),
    )
    seed = e.orderBy("vec_id").limit(1).collect()[0]
    centers: list[tuple[int, list[int]]] = [
        (int(seed["vec_id"]), [int(x) for x in seed["q"]])
    ]
    for _ in range(2, _KC_K + 1):
        md = F.least(*[_kc_d2(F.col("q"), c[1]) for c in centers]) if len(
            centers
        ) > 1 else _kc_d2(F.col("q"), centers[0][1])
        nxt = (
            e.select("vec_id", "q", md.alias("md"))
            .orderBy(F.desc("md"), "vec_id")
            .limit(1)
            .collect()[0]
        )
        centers.append((int(nxt["vec_id"]), [int(x) for x in nxt["q"]]))

    # Final assignment: strict-improvement fold in selection order —
    # ties keep the earliest center, mirroring the oracle's CASE chain.
    md_col = _kc_d2(F.col("q"), centers[0][1])
    ncid_col = F.lit(centers[0][0]).cast("long")
    for cid, cq in centers[1:]:
        nd = _kc_d2(F.col("q"), cq)
        ncid_col = F.when(nd < md_col, F.lit(cid).cast("long")).otherwise(
            ncid_col
        )
        md_col = F.least(nd, md_col)
    return e.select(
        "vec_id",
        "label",
        ncid_col.alias("center_id"),
        md_col.alias("min_dist2"),
    )
