"""Principal-component analysis of the embedding corpus — the
classic "one distributed pass + tiny driver solve" decomposition.

At 100 TB the scalable core of PCA is NOT the eigen-solve — it is the
single pass that reduces n x D vectors to the D x D second-moment
matrix (D=64 here, so the matrix is 4096 numbers regardless of corpus
size). That pass is expressed as a map-side pair expansion (each row
emits its D^2 outer-product terms inside one HOF projection) feeding a
partial->final hash aggregate: the shuffle carries at most 4096 rows
per map partition, the result is O(D^2) = O(1) in the data. The
centered covariance comes from the computational identity
n*Sum(x_i x_j) - S_i S_j (exact int64 — no mean subtraction pass, no
float cancellation), and the O(D^2) driver-side collect + power
iteration mirrors the O(K) centroid pull precedent in clustering.py:
constant-size state, never data.

Cross-engine exactness: embeddings quantize to an int64 grid
(x -> round(x*1e4), the similarity.py convention), every downstream
product/sum/rescale is int64 arithmetic, and both engines' integer
division truncates toward zero (Spark `div`, DuckDB `//` — verified;
Python driver code uses a sign-corrected abs-division helper because
Python's `//` FLOORS, the scalars2.py EWMA lesson). Magnitude budget:
|val| <= 1e4, so raw moments <= n*1e8 and the centered entries
<= 2n^2*1e8 — rescaled to ~1e9 by a data-derived divisor before the
iteration, keeping every matvec term under ~2e15*64 << 2^63 at any
shipped SF (and to sf1+). The eigen-sign is pinned by the all-ones
start vector; 8 fixed iterations, no convergence test — both engines
run the identical recurrence, so parity is exact regardless of
spectral gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import SparkSession

from ..registry import query
from ..sources.loader import load_table

_QP = 10_000            # float -> int grid (similarity.py convention)
_VONE = 1_000_000       # eigenvector fixed-point scale
_GCAP = 1_000_000_000   # covariance rescale target magnitude
_SDIV = 1_000_000       # final score shrink
_ITERS = 8


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — matches Spark `div` and
    DuckDB `//` (Python's `//` floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _power_iterate(cov: dict[tuple[int, int], int], dim: int) -> list[int]:
    """Fixed-iteration power method on the rescaled covariance, exact
    int64-range arithmetic, _VONE-scaled vector. Deterministic: all-ones
    start, truncating rescale each step."""
    v = [_VONE] * dim
    for _ in range(_ITERS):
        w = [
            sum(cov.get((i, j), 0) * v[j - 1] for j in range(1, dim + 1))
            for i in range(1, dim + 1)
        ]
        m = max(max(abs(x) for x in w), 1)
        mdiv = max(_tdiv(m, _VONE), 1)
        v = [_tdiv(x, mdiv) for x in w]
    return v


def _oracle() -> str:
    # Mirror _power_iterate as a CTE chain: w{k} = C'.v{k-1}, then the
    # truncating max-abs rescale. Same arithmetic, same order of ops.
    # Every CTE is MATERIALIZED: without the hint DuckDB inlines the
    # chain, so step k re-expands steps 1..k-1 (and the 2M-row
    # outer-product self-join under them) — measured >115 s at sf0.01
    # inlined vs 0.1 s materialized.
    steps = []
    for k in range(1, _ITERS + 1):
        steps.append(
            f"""
    w{k} AS MATERIALIZED (
      SELECT cm.i AS pos, CAST(SUM(cm.c * v{k - 1}.vv) AS BIGINT) AS w
      FROM cm JOIN v{k - 1} ON v{k - 1}.pos = cm.j
      GROUP BY cm.i
    ),
    m{k} AS MATERIALIZED (
      SELECT GREATEST(
               (SELECT GREATEST(MAX(ABS(w)), 1) FROM w{k}) // {_VONE},
               CAST(1 AS BIGINT)) AS mdiv
    ),
    v{k} AS MATERIALIZED (
      SELECT pos, w // (SELECT mdiv FROM m{k}) AS vv FROM w{k}
    )"""
        )
    return f"""
    WITH ei AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {_QP}) AS BIGINT)) AS v
      FROM embeddings
    ),
    pos AS MATERIALIZED (
      SELECT vec_id, label, unnest(v) AS val,
             CAST(unnest(generate_series(1, len(v))) AS INTEGER) AS pos
      FROM ei
    ),
    nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ei),
    s AS MATERIALIZED (
      SELECT pos, CAST(SUM(val) AS BIGINT) AS s FROM pos GROUP BY pos
    ),
    g AS MATERIALIZED (
      SELECT a.pos AS i, b.pos AS j, CAST(SUM(a.val * b.val) AS BIGINT) AS g
      FROM pos a JOIN pos b USING (vec_id)
      GROUP BY a.pos, b.pos
    ),
    cov AS MATERIALIZED (
      SELECT g.i, g.j,
             (SELECT n FROM nn) * g.g - si.s * sj.s AS c
      FROM g JOIN s si ON si.pos = g.i JOIN s sj ON sj.pos = g.j
    ),
    gd AS MATERIALIZED (
      SELECT GREATEST(MAX(ABS(c)) // {_GCAP}, CAST(1 AS BIGINT)) AS gdiv
      FROM cov
    ),
    cm AS MATERIALIZED (
      SELECT i, j, c // (SELECT gdiv FROM gd) AS c FROM cov
    ),
    v0 AS MATERIALIZED (SELECT pos, CAST({_VONE} AS BIGINT) AS vv FROM s),
    {",".join(steps)}
    SELECT p.vec_id, p.label,
           CAST(SUM(v{_ITERS}.vv
                    * ((SELECT n FROM nn) * p.val - s.s)) // {_SDIV}
                AS BIGINT) AS pc1_score
    FROM pos p
    JOIN v{_ITERS} ON v{_ITERS}.pos = p.pos
    JOIN s ON s.pos = p.pos
    GROUP BY p.vec_id, p.label
    """


@query(
    "q_pca_power_iteration",
    oracle=_oracle(),
    tags=("decomposition", "pca", "iterative", "embeddings", "llm-pipeline"),
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PC1 score of every embedding: one distributed pass reduces the
    corpus to its exact-int D x D second moments (map-side outer-product
    HOF -> partial+final hash aggregate, <=4096 shuffled rows per map
    partition), the covariance solves by the n*G - S S^T identity, and
    a constant-size driver-side power iteration (clustering.py's O(K)
    collect precedent, here O(D^2)) yields the top eigenvector, which
    broadcasts back as a literal for a map-only projection scoring
    every vector against the centered data. The oracle replays the
    identical integer recurrence as a CTE chain."""
    ei = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {_QP})"
            " AS BIGINT))"
        ).alias("v"),
    )
    dim = 64

    # One pass: per-row outer-product terms generated map-side inside a
    # single HOF (no self-join of the exploded long form — that would
    # shuffle n*D rows to co-locate what each row already holds), then
    # a hash aggregate whose partial step caps the shuffle at D^2 rows
    # per map partition. The same scan also feeds the column sums.
    pairs = ei.select(
        F.explode(
            F.expr(
                "flatten(transform(v, (x, i) -> "
                "transform(v, (y, j) -> "
                "struct(i + 1 AS i, j + 1 AS j, x * y AS p))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")
    g_rows = pairs.groupBy("i", "j").agg(F.sum("p").alias("g")).collect()

    long = ei.select("vec_id", F.posexplode("v").alias("p0", "val")).select(
        "vec_id", (F.col("p0") + 1).alias("pos"), "val"
    )
    s_rows = long.groupBy("pos").agg(F.sum("val").alias("s")).collect()
    n = ei.count()

    s = {int(r["pos"]): int(r["s"]) for r in s_rows}
    cov = {
        (int(r["i"]), int(r["j"])): n * int(r["g"]) - s[int(r["i"])] * s[int(r["j"])]
        for r in g_rows
    }
    gdiv = max(_tdiv(max(abs(c) for c in cov.values()), _GCAP), 1)
    cov = {ij: _tdiv(c, gdiv) for ij, c in cov.items()}
    v = _power_iterate(cov, dim)

    # Broadcast-literal projection (kmeans centroid pattern): the
    # eigenvector and column sums are plan literals; scoring is a
    # map-only pass — zero shuffles, any corpus size.
    v_lit = "array(" + ",".join(f"{x}L" for x in v) + ")"
    s_lit = "array(" + ",".join(f"{s[p]}L" for p in range(1, dim + 1)) + ")"
    # Centered coordinate at position k is the n-scaled identity
    # n*x_k - S_k (no division until the final shrink).
    score = (
        f"aggregate(transform(v, (x, k) -> "
        f"element_at({v_lit}, k + 1) * ({n}L * x - element_at({s_lit}, k + 1))), "
        f"0L, (acc, t) -> acc + t) div {_SDIV}"
    )
    return ei.select(
        "vec_id", "label", F.expr(score).cast("long").alias("pc1_score")
    )
