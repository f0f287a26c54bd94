"""User-behavior Markov chain over the event stream: the empirical
event-type transition matrix and its stationary distribution — the
classic "where do users end up" model behind next-action prediction
and funnel leak analysis.

Exactness: transition counts are exact; row-normalized probabilities
are truncating integer ppm; and the stationary distribution comes from
a FIXED-iteration integer power method on the ppm matrix (v' [j] =
sum_i v[i] * p_ppm(i->j) div 1e6, all operands positive, truncation
identical in Spark/DuckDB/Python). The |states|^2 = 25-cell matrix is
an O(1) driver collect (the clustering.py / pca.py constant-state
precedent); the oracle replays the identical recurrence as a CTE
chain over the same 25-row table.

Scale: transitions come from ONE lag window per user (the shuffle is
the user_id keying, shared with every sessionize op); the matrix and
everything after it is constant-size regardless of corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_MK_ITERS = 10
_MK_ONE = 1_000_000


def _mk_oracle() -> str:
    steps = []
    for k in range(1, _MK_ITERS + 1):
        steps.append(
            f"""
    v{k} AS MATERIALIZED (
      SELECT p.next_st AS st,
             CAST(SUM(v.w * p.p_ppm) AS BIGINT) // {_MK_ONE} AS w
      FROM p JOIN v{k - 1} v ON v.st = p.prev_st
      GROUP BY p.next_st
    )"""
        )
    return f"""
    WITH tr AS MATERIALIZED (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    cm AS MATERIALIZED (
      SELECT prev AS prev_st, event_type AS next_st,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ),
    p AS MATERIALIZED (
      SELECT prev_st, next_st, n,
             CAST(({_MK_ONE} * n)
                  // (SUM(n) OVER (PARTITION BY prev_st)) AS BIGINT)
               AS p_ppm
      FROM cm
    ),
    v0 AS MATERIALIZED (
      SELECT DISTINCT prev_st AS st, CAST({_MK_ONE} AS BIGINT) AS w
      FROM cm
    ),
    {",".join(steps)}
    SELECT p.prev_st, p.next_st, p.n, p.p_ppm,
           CAST(v.w AS BIGINT) AS stat_next_w
    FROM p JOIN v{_MK_ITERS} v ON v.st = p.next_st
    """


@query(
    "q_markov_chain",
    oracle=_mk_oracle(),
    tags=("events", "markov", "stochastic", "iterative"),
)
def q_markov_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (per-row exact counts + truncating
    ppm probabilities) with each cell annotated by the stationary
    weight of its destination state after 10 fixed integer power
    iterations. The 25-cell matrix collects to the driver (O(1)
    state), iterates in exact integer arithmetic, and re-enters the
    plan as a broadcast literal map — the oracle runs the identical
    recurrence as a CTE chain."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cm = tr.groupBy(
        F.col("prev").alias("prev_st"),
        F.col("event_type").alias("next_st"),
    ).agg(F.count(F.lit(1)).alias("n"))
    p = cm.select(
        "prev_st",
        "next_st",
        "n",
        F.expr(
            f"CAST(({_MK_ONE} * n)"
            f" div (sum(n) OVER (PARTITION BY prev_st)) AS BIGINT)"
        ).alias("p_ppm"),
    )

    cells = p.collect()  # |states|^2 <= 25 rows — O(1) driver state
    states = sorted({r["prev_st"] for r in cells})
    pm = {(r["prev_st"], r["next_st"]): int(r["p_ppm"]) for r in cells}
    v = {s: _MK_ONE for s in states}
    for _ in range(_MK_ITERS):
        # all operands positive: Python // == Spark div == DuckDB //
        nxt: dict[str, int] = {}
        for (i, j), pp in pm.items():
            if i not in v:  # mirrors the oracle's inner-join drop
                continue
            nxt[j] = nxt.get(j, 0) + v[i] * pp
        v = {j: wsum // _MK_ONE for j, wsum in nxt.items()}

    stat = F.create_map(
        *[x for s, wv in sorted(v.items()) for x in (F.lit(s), F.lit(wv))]
    )
    return p.withColumn(
        "stat_next_w", F.element_at(stat, F.col("next_st")).cast("long")
    )


def _absorb_oracle() -> str:
    return f"""
    WITH tr AS MATERIALIZED (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    cm AS MATERIALIZED (
      SELECT prev AS prev_st, event_type AS next_st,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ),
    p0 AS (
      SELECT prev_st, next_st,
             CAST(({_MK_ONE} * n)
                  // (SUM(n) OVER (PARTITION BY prev_st)) AS BIGINT)
               AS p_ppm
      FROM cm
    ),
    p AS MATERIALIZED (
      SELECT prev_st, next_st, p_ppm FROM p0
      WHERE prev_st <> 'purchase'
      UNION ALL
      SELECT 'purchase', 'purchase', CAST({_MK_ONE} AS BIGINT)
    ),
    a2 AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM p a JOIN p b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),
    a4 AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM a2 a JOIN a2 b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),
    states AS (SELECT DISTINCT prev_st AS st FROM p)
    SELECT states.st AS start_state,
           CAST(COALESCE(t2.p_ppm, 0) AS BIGINT) AS absorb2_ppm,
           CAST(COALESCE(t4.p_ppm, 0) AS BIGINT) AS absorb4_ppm
    FROM states
    LEFT JOIN a2 t2 ON t2.prev_st = states.st AND t2.next_st = 'purchase'
    LEFT JOIN a4 t4 ON t4.prev_st = states.st AND t4.next_st = 'purchase'
    """


@query(
    "q_markov_absorption",
    oracle=_absorb_oracle(),
    tags=("events", "markov", "absorption", "iterative"),
)
def q_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorption probability into 'purchase' within 2 and 4 steps
    from every start state, with purchase made absorbing — the
    "how close is each behavior state to converting" read of the
    q_markov_chain matrix. A^2 and A^4 come from ppm matrix-matrix
    products (sum of ppm*ppm then one truncating div per cell), so
    every power is an exact integer matrix identical across engines
    — iterative linear algebra as two keyed self-joins of a
    |states|^2 table, the repeated-squaring trick that reaches step
    2^k in k joins.

    Scale: the only data pass is the lag-window transition count
    (user_id shuffle); every matrix op is constant-size."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cm = tr.groupBy(
        F.col("prev").alias("prev_st"),
        F.col("event_type").alias("next_st"),
    ).agg(F.count(F.lit(1)).alias("n"))
    p0 = cm.select(
        "prev_st",
        "next_st",
        F.expr(
            f"CAST(({_MK_ONE} * n)"
            " div (SUM(n) OVER (PARTITION BY prev_st)) AS BIGINT)"
        ).alias("p_ppm"),
    )
    ident = spark.createDataFrame(
        [("purchase", "purchase", _MK_ONE)],
        "prev_st string, next_st string, p_ppm long",
    )
    p = (
        p0.filter(F.col("prev_st") != "purchase")
        .unionAll(ident)
        .localCheckpoint()  # constant-size matrix reused by both squarings
    )

    def matmul(x: DataFrame, y: DataFrame) -> DataFrame:
        a, b = x.alias("a"), y.alias("b")
        return (
            a.join(b, F.col("b.prev_st") == F.col("a.next_st"))
            .groupBy(
                F.col("a.prev_st").alias("prev_st"),
                F.col("b.next_st").alias("next_st"),
            )
            .agg(
                F.expr(
                    f"CAST(SUM(a.p_ppm * b.p_ppm) div {_MK_ONE}"
                    " AS BIGINT)"
                ).alias("p_ppm")
            )
        )

    a2 = matmul(p, p).localCheckpoint()
    a4 = matmul(a2, a2)
    states = p.select(F.col("prev_st").alias("st")).distinct()
    t2 = a2.filter(F.col("next_st") == "purchase").select(
        F.col("prev_st").alias("st"), F.col("p_ppm").alias("p2")
    )
    t4 = a4.filter(F.col("next_st") == "purchase").select(
        F.col("prev_st").alias("st"), F.col("p_ppm").alias("p4")
    )
    return (
        states.join(t2, "st", "left")
        .join(t4, "st", "left")
        .select(
            F.col("st").alias("start_state"),
            F.coalesce(F.col("p2"), F.lit(0)).cast("long").alias(
                "absorb2_ppm"
            ),
            F.coalesce(F.col("p4"), F.lit(0)).cast("long").alias(
                "absorb4_ppm"
            ),
        )
    )


_MK_CHANNELS = ("click", "error", "signup", "view")


def _removal_oracle() -> str:
    """Per-channel removal-effect CTE chain: the baseline 4-step
    absorption matrix plus, for each removable channel, the same
    repeated-squaring over the matrix with that channel's node deleted
    (edges into AND out of it dropped WITHOUT renormalizing — the lost
    mass is exactly the traffic that needed the channel)."""
    per_channel_ctes = "".join(
        f"""
    p_{c} AS MATERIALIZED (
      SELECT prev_st, next_st, p_ppm FROM p
      WHERE prev_st <> '{c}' AND next_st <> '{c}'
    ),
    a2_{c} AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM p_{c} a JOIN p_{c} b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),
    a4_{c} AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM a2_{c} a JOIN a2_{c} b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),"""
        for c in _MK_CHANNELS
    )
    per_channel_rows = "\n      UNION ALL\n      ".join(
        f"""SELECT '{c}' AS removed_channel, s.prev_st AS start_state,
             CAST(COALESCE(r.p_ppm, 0) AS BIGINT) AS absorb4_ppm
      FROM (SELECT DISTINCT prev_st FROM p_{c}) s
      LEFT JOIN a4_{c} r ON r.prev_st = s.prev_st
                        AND r.next_st = 'purchase'"""
        for c in _MK_CHANNELS
    )
    return f"""
    WITH tr AS MATERIALIZED (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    cm AS MATERIALIZED (
      SELECT prev AS prev_st, event_type AS next_st,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM tr WHERE prev IS NOT NULL
      GROUP BY prev, event_type
    ),
    p0 AS (
      SELECT prev_st, next_st,
             CAST(({_MK_ONE} * n)
                  // (SUM(n) OVER (PARTITION BY prev_st)) AS BIGINT)
               AS p_ppm
      FROM cm
    ),
    p AS MATERIALIZED (
      SELECT prev_st, next_st, p_ppm FROM p0
      WHERE prev_st <> 'purchase'
      UNION ALL
      SELECT 'purchase', 'purchase', CAST({_MK_ONE} AS BIGINT)
    ),
    a2 AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM p a JOIN p b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),
    a4 AS MATERIALIZED (
      SELECT a.prev_st, b.next_st,
             CAST(SUM(a.p_ppm * b.p_ppm) // {_MK_ONE} AS BIGINT) AS p_ppm
      FROM a2 a JOIN a2 b ON b.prev_st = a.next_st
      GROUP BY a.prev_st, b.next_st
    ),{per_channel_ctes}
    removed AS (
      {per_channel_rows}
    )
    SELECT rm.removed_channel, rm.start_state, rm.absorb4_ppm,
           CAST(COALESCE(b.p_ppm, 0) AS BIGINT) AS base4_ppm,
           CAST(COALESCE(b.p_ppm, 0) - rm.absorb4_ppm AS BIGINT)
             AS removal_drop_ppm
    FROM removed rm
    LEFT JOIN a4 b ON b.prev_st = rm.start_state
                  AND b.next_st = 'purchase'
    """


@query(
    "q_markov_removal",
    oracle=_removal_oracle(),
    tags=("events", "markov", "attribution", "removal-effect", "iterative"),
)
def q_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven channel
    valuation that completes the attribution suite (first/last roles,
    exact Shapley on the presence game, and now path dynamics): delete
    one channel's node from the transition graph (edges in AND out,
    NOT renormalized — the lost probability mass is precisely the
    traffic that needed that channel) and re-measure 4-step absorption
    into 'purchase' from every surviving start state. removal_drop_ppm
    = baseline absorption - degraded absorption is the channel's
    removal effect. Same ppm matrix-power arithmetic as
    q_markov_absorption: every matrix is an exact integer table, every
    power two keyed self-joins via repeated squaring, bit-identical
    across engines.

    Scale: ONE user_id-keyed lag pass over events builds the
    transition counts; everything after — the baseline matrix, four
    channel-deleted variants, eight squarings — runs on |states|^2
    tables (at most ~36 rows each), data-size independent. This is
    the 100 TB shape for removal-effect attribution: the stream pays
    one shuffle, the counterfactuals are constant-size algebra."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cm = tr.groupBy(
        F.col("prev").alias("prev_st"),
        F.col("event_type").alias("next_st"),
    ).agg(F.count(F.lit(1)).alias("n"))
    p0 = cm.select(
        "prev_st",
        "next_st",
        F.expr(
            f"CAST(({_MK_ONE} * n)"
            " div (SUM(n) OVER (PARTITION BY prev_st)) AS BIGINT)"
        ).alias("p_ppm"),
    )
    ident = spark.createDataFrame(
        [("purchase", "purchase", _MK_ONE)],
        "prev_st string, next_st string, p_ppm long",
    )
    p = (
        p0.filter(F.col("prev_st") != "purchase")
        .unionAll(ident)
        .localCheckpoint()
    )

    def matmul(x: DataFrame, y: DataFrame) -> DataFrame:
        a, b = x.alias("a"), y.alias("b")
        return (
            a.join(b, F.col("b.prev_st") == F.col("a.next_st"))
            .groupBy(
                F.col("a.prev_st").alias("prev_st"),
                F.col("b.next_st").alias("next_st"),
            )
            .agg(
                F.expr(
                    f"CAST(SUM(a.p_ppm * b.p_ppm) div {_MK_ONE}"
                    " AS BIGINT)"
                ).alias("p_ppm")
            )
        )

    base = matmul(p, p).localCheckpoint()
    base4 = (
        matmul(base, base)
        .filter(F.col("next_st") == "purchase")
        .select(
            F.col("prev_st").alias("start_state"),
            F.col("p_ppm").alias("base4_ppm"),
        )
        .localCheckpoint()
    )
    branches = []
    for c in _MK_CHANNELS:
        pc = p.filter(
            (F.col("prev_st") != c) & (F.col("next_st") != c)
        ).localCheckpoint()
        a2c = matmul(pc, pc).localCheckpoint()
        reach = (
            matmul(a2c, a2c)
            .filter(F.col("next_st") == "purchase")
            .select(
                F.col("prev_st").alias("start_state"),
                F.col("p_ppm").alias("absorb4_ppm"),
            )
        )
        states = pc.select(F.col("prev_st").alias("start_state")).distinct()
        branches.append(
            states.join(reach, "start_state", "left").select(
                F.lit(c).alias("removed_channel"),
                "start_state",
                F.coalesce("absorb4_ppm", F.lit(0))
                .cast("bigint")
                .alias("absorb4_ppm"),
            )
        )
    removed = branches[0]
    for b in branches[1:]:
        removed = removed.unionAll(b)
    return removed.join(base4, "start_state", "left").select(
        "removed_channel",
        "start_state",
        "absorb4_ppm",
        F.coalesce("base4_ppm", F.lit(0)).cast("bigint").alias("base4_ppm"),
        (
            F.coalesce("base4_ppm", F.lit(0)) - F.col("absorb4_ppm")
        )
        .cast("bigint")
        .alias("removal_drop_ppm"),
    )
