"""Physical-design operators: greedy materialized-cuboid selection
over the aggregation lattice (Harinarayan, Rajaraman & Ullman,
"Implementing Data Cubes Efficiently", SIGMOD'96 — the classic
view-selection algorithm every OLAP engine's advisor descends from).

The lattice: 3 dimensions (lang, source, length bucket) give 2^3 = 8
cuboids, each identified by a bitmask (bit set = dimension present).
Cuboid sizes come from ONE cube pass (count of groups per grouping
id). The base cuboid (mask 7) is always materialized; the greedy then
picks K = 3 more, each round choosing the cuboid whose materialization
saves the most total scan cost, where a query against cuboid q costs
the size of its smallest materialized ancestor (m is an ancestor of q
iff q's dims are a subset of m's: qmask & mmask = qmask). HRU prove
this greedy is (1 - 1/e)-optimal — the same bound as
q_submodular_coverage, because benefit is submodular.

Everything is exact integers over an 8-row lattice table; the greedy
trajectory (round, cuboid, size, benefit) is deterministic with ties
broken by (benefit desc, size asc, mask asc) and hash-checked against
the identical chained computation in the oracle.

At 100 TB: the only data-sized work is the single cube pass that
measures group counts (map-side partial aggregation; output rows =
sum of cuboid sizes, itself bounded by 8x the base cuboid). The
lattice walk is 8-row metadata math — the 8x8 subset-grid joins are
on the reviewed NLJ allowlist. In production the same two stages
appear as "collect grouping statistics" then "run the advisor".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_K = 3  # cuboids materialized beyond the base


def _round_sql(prev: str, cur: str) -> str:
    """One oracle greedy round: benefit of each unchosen cuboid
    against current per-query costs, argmax selection, cost update."""
    return f"""
    ben{cur} AS (
      SELECT c.mask, c.sz,
             CAST(SUM(CASE WHEN cost{prev}.cost > c.sz
                           THEN cost{prev}.cost - c.sz ELSE 0 END)
                  AS BIGINT) AS benefit
      FROM lat c
      JOIN cost{prev} ON (cost{prev}.qmask & c.mask) = cost{prev}.qmask
      WHERE c.mask NOT IN (SELECT mask FROM chosen{prev})
      GROUP BY c.mask, c.sz
    ),
    sel{cur} AS MATERIALIZED (
      SELECT mask, sz, benefit FROM ben{cur}
      ORDER BY benefit DESC, sz ASC, mask ASC LIMIT 1
    ),
    chosen{cur} AS (
      SELECT mask FROM chosen{prev} UNION ALL SELECT mask FROM sel{cur}
    ),
    cost{cur} AS (
      SELECT c.qmask,
             CASE WHEN (c.qmask & s.mask) = c.qmask AND s.sz < c.cost
                  THEN s.sz ELSE c.cost END AS cost
      FROM cost{prev} c CROSS JOIN sel{cur} s
    )
    """


def _cuboid_oracle() -> str:
    rounds = ",".join(_round_sql(str(i), str(i + 1)) for i in range(_K))
    finals = "\n    UNION ALL\n".join(
        f"    SELECT CAST({i + 1} AS BIGINT) AS round, mask, sz, benefit"
        f" FROM sel{i + 1}"
        for i in range(_K)
    )
    return f"""
    WITH dims AS (
      SELECT lang, source, n_chars // 1000 AS lenb FROM documents
    ),
    groups AS (
      SELECT lang, source, lenb, GROUPING(lang, source, lenb) AS gid
      FROM dims GROUP BY CUBE(lang, source, lenb)
    ),
    lat AS MATERIALIZED (
      SELECT CAST(7 - gid AS BIGINT) AS mask, CAST(COUNT(*) AS BIGINT) AS sz
      FROM groups GROUP BY gid
    ),
    cost0 AS (
      SELECT l.mask AS qmask, b.sz AS cost
      FROM lat l CROSS JOIN (SELECT sz FROM lat WHERE mask = 7) b
    ),
    chosen0 AS (SELECT CAST(7 AS BIGINT) AS mask),
    {rounds}
{finals}
    """


@query(
    "q_cuboid_selection",
    oracle=_cuboid_oracle(),
    tags=("olap", "physical-design", "lattice", "materialized-views"),
)
def q_cuboid_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy materialized-cuboid selection (HRU SIGMOD'96) over the
    (lang, source, length-bucket) lattice of the documents table: one
    cube pass measures every cuboid's group count; starting from the
    base cuboid, 3 greedy rounds each materialize the cuboid with the
    largest total cost saving across all 8 query shapes. Returns the
    greedy trajectory (round, mask, sz, benefit) — module docstring
    has the cost model and the (1-1/e) bound."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "source", F.expr("n_chars div 1000").alias("lenb")
    )
    lat = (
        d.cube("lang", "source", "lenb")
        .agg(F.grouping_id().alias("gid"))
        .groupBy((7 - F.col("gid")).cast("long").alias("mask"))
        .agg(F.count(F.lit(1)).alias("sz"))
        .localCheckpoint(eager=True)  # 8 rows; root of every greedy round
    )
    base = lat.filter(F.col("mask") == 7).select(F.col("sz").alias("cost"))
    costs = lat.select(F.col("mask").alias("qmask")).crossJoin(
        F.broadcast(base)
    )
    chosen = lat.filter(F.col("mask") == 7).select("mask")
    out = []
    for rnd in range(1, _K + 1):
        cand = lat.join(chosen, "mask", "left_anti").select(
            F.col("mask").alias("cmask"), "sz"
        )
        ben = (
            cand.join(
                costs,
                F.expr("(qmask & cmask) = qmask"),
            )
            .groupBy("cmask", "sz")
            .agg(
                F.sum(
                    F.expr("CASE WHEN cost > sz THEN cost - sz ELSE 0 END")
                ).alias("benefit")
            )
        )
        sel = (
            ben.orderBy(F.desc("benefit"), F.asc("sz"), F.asc("cmask"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        chosen = chosen.unionAll(sel.select(F.col("cmask").alias("mask")))
        costs = costs.crossJoin(F.broadcast(sel)).select(
            "qmask",
            F.expr(
                "CASE WHEN (qmask & cmask) = qmask AND sz < cost"
                " THEN sz ELSE cost END"
            ).alias("cost"),
        )
        out.append(
            sel.select(
                F.lit(rnd).cast("long").alias("round"),
                F.col("cmask").alias("mask"),
                "sz",
                "benefit",
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionAll(df)
    return res
