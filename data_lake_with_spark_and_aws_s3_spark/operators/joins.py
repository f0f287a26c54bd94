"""Join family (SURVEY.md §2.3): outer / semi / anti / cross / theta /
range (interval) / as-of.

Reference parity: the reference's only join is the inner natural-key
equi-join building songplays (`etl.py:~135` canonical template;
checkout empty per SURVEY.md §0). Everything else here is north-star
surface mandated by BASELINE.json.

Scale posture:
- equi-joins: declared as plain `df.join` — Catalyst/AQE picks
  broadcast vs shuffled-hash vs sort-merge from runtime stats.
- theta join: broadcast-nested-loop with the SMALL side broadcast
  (explicit F.broadcast); at 100 TB you'd pre-sort + range-partition.
- range join: equi-bucket prejoin + residual filter — turns an O(n·m)
  NLJ into a co-partitioned hash join whose per-bucket fan-out is
  bounded by the window width. This is the shape that survives 100 TB.
- as-of join: union + last(ignorenulls) window — one shuffle on
  (key), no per-row Python, arbitrary key cardinality. The classic
  merge_asof-in-pandas alternative would serialize through Arrow and
  cap at per-group memory; the window form doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table


@query(
    "q_outer_join_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(19,2))), 0), 2)
                AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "outer"),
)
def q_outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (COUNT of the
    nullable side counts matches only)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "q_full_outer_join",
    oracle="""
    WITH u AS (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
               WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
         l AS (SELECT o_custkey, COUNT(*) AS n_low FROM orders
               WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey)
    SELECT COALESCE(u.o_custkey, l.o_custkey) AS custkey,
           CAST(COALESCE(u.n_urgent, 0) AS BIGINT) AS n_urgent,
           CAST(COALESCE(l.n_low, 0) AS BIGINT) AS n_low,
           CASE WHEN u.o_custkey IS NULL THEN 'low_only'
                WHEN l.o_custkey IS NULL THEN 'urgent_only'
                ELSE 'both' END AS side
    FROM u FULL JOIN l ON u.o_custkey = l.o_custkey
    """,
    tags=("join", "outer", "full"),
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with genuinely unmatched rows on BOTH sides:
    per-customer urgent-order counts vs low-order counts (customers
    having only one kind survive on one side with nulls on the other).
    COALESCE to 0 keeps the counts int64 (nullable ints would float)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("u_custkey"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    low = (
        o.filter(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.col("o_custkey").alias("l_custkey"))
        .agg(F.count(F.lit(1)).alias("n_low"))
    )
    j = urgent.join(low, urgent.u_custkey == low.l_custkey, "full")
    return j.select(
        F.coalesce("u_custkey", "l_custkey").alias("custkey"),
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
        F.coalesce("n_low", F.lit(0)).alias("n_low"),
        F.when(F.col("u_custkey").isNull(), "low_only")
        .when(F.col("l_custkey").isNull(), "urgent_only")
        .otherwise("both")
        .alias("side"),
    )


@query(
    "q_right_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_orderstatus
    FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
    RIGHT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
    tags=("join", "outer", "right"),
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every order kept, customer columns null when
    the (filtered) customer side has no match."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_name", "o_orderstatus"
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join", "semi"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one urgent order (left_semi = EXISTS:
    no row duplication, right side never materialized in output)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join", "anti"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order (left_anti = NOT EXISTS).
    The urgent filter keeps the result non-empty at every test sf —
    every customer has *some* order in this data."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("join", "cross"),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny sides (guarded: 5 x 3 rows).
    At scale cross joins only ever appear with a blocking key —
    see similarity ops (§2.10)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


_THETA_BANDS = 32


@query(
    "q_theta_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           COUNT(c.c_custkey) AS n_poorer_customers
    FROM supplier s
    LEFT JOIN customer c ON c.c_acctbal < s.s_acctbal
    GROUP BY s.s_suppkey, s.s_name
    """,
    tags=("join", "theta"),
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: per supplier, count customers with
    strictly smaller account balance — WITHOUT a nested-loop join.

    Scale-safe band/merge form (the NLJ compares O(|S|x|C|) pairs; this
    shuffles O(|S|+|C|) rows once):
      1. union both sides tagged (supplier tag=0, customer tag=1,
         is_cust 0/1); ordering key is (balance, tag) so equal-balance
         customers sort AFTER the supplier and are excluded (strict <).
      2. deterministic range bands from approxQuantile boundaries on
         the union (driver holds only the ~32 split points — this is
         exactly the two-pass distributed prefix-sum you'd run at
         100 TB; quantile banding keeps bands balanced under skew).
      3. per-band running customer count (window partitioned BY BAND —
         never a global single-partition window).
      4. band offsets = prefix sum over the tiny per-band totals,
         broadcast-joined back; final count = offset + local count.
    """
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_acctbal").alias("bal"), F.lit(0).alias("tag")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.lit(None).cast("long").alias("s_suppkey"),
        F.lit(None).cast("string").alias("s_name"),
        F.col("c_acctbal").alias("bal"),
        F.lit(1).alias("tag"),
    )
    u = s.unionByName(c)
    # deterministic value-based bands (approxQuantile is one cheap
    # 1-column pass; duplicate split points collapse harmlessly)
    splits = sorted(
        set(
            u.select("bal").approxQuantile(
                "bal", [i / _THETA_BANDS for i in range(1, _THETA_BANDS)], 0.01
            )
        )
    )
    band = F.lit(0)
    for b in splits:
        band = band + F.when(F.col("bal") >= F.lit(b), 1).otherwise(0)
    u = u.withColumn("band", band).withColumn("is_cust", F.col("tag"))
    w_local = (
        Window.partitionBy("band")
        .orderBy("bal", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("local_cnt", F.sum("is_cust").over(w_local))
    totals = u.groupBy("band").agg(F.sum("is_cust").alias("band_cust"))
    w_off = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("band_cust").over(w_off), F.lit(0))
    ).select("band", "offset")
    return (
        u.filter(F.col("tag") == 0)
        .join(F.broadcast(offsets), "band")
        .select(
            "s_suppkey",
            "s_name",
            (F.col("offset") + F.col("local_cnt")).alias("n_poorer_customers"),
        )
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Interval join: right rows with right_ts in (left_ts,
    left_ts + window_us], equi-keyed on `key`.

    Instead of key-equi-join + unbounded residual (which explodes on
    hot keys) we bucket time into window-width buckets and join on
    (key, bucket) with the left side exploded to its two covering
    buckets. The residual filter then runs on a co-partitioned,
    bounded candidate set — the per-task working set is O(rows in two
    buckets per key), independent of total data size. This is the
    100 TB-safe shape for event-to-event correlation.
    """
    lb = left.withColumn("_lus", F.unix_micros(F.col(left_ts)))
    rb = right.withColumn("_rus", F.unix_micros(F.col(right_ts))).withColumn(
        "_bucket", F.expr(f"unix_micros({right_ts}) div {window_us}")
    )
    probe = lb.withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.expr(f"unix_micros({left_ts}) div {window_us}"),
                F.expr(f"unix_micros({left_ts}) div {window_us} + 1"),
            )
        ),
    )
    joined = probe.join(rb, on=[key, "_bucket"])
    return joined.filter(
        (F.col("_rus") > F.col("_lus")) & (F.col("_rus") <= F.col("_lus") + window_us)
    ).drop("_bucket", "_lus", "_rus")


@query(
    "q_range_join_events",
    oracle="""
    SELECT e1.event_type AS type_a, e2.event_type AS type_b,
           COUNT(*) AS n_pairs
    FROM events e1
    JOIN events e2
      ON e2.user_id = e1.user_id
     AND CAST(e2.ts AS TIMESTAMP) > CAST(e1.ts AS TIMESTAMP)
     AND CAST(e2.ts AS TIMESTAMP) <= CAST(e1.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    GROUP BY e1.event_type, e2.event_type
    """,
    tags=("join", "range"),
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs of the same user within a 5-minute follow window,
    counted per (type_a -> type_b). Uses the bucketed range join
    (see bucketed_range_join) rather than an unbounded per-key
    residual join."""
    e = load_table(spark, sf_dir, "events")
    e1 = e.select("user_id", F.col("ts").alias("ts_a"), F.col("event_type").alias("type_a"))
    e2 = e.select("user_id", F.col("ts").alias("ts_b"), F.col("event_type").alias("type_b"))
    window_us = 5 * 60 * 1_000_000
    pairs = bucketed_range_join(e1, e2, "user_id", "ts_a", "ts_b", window_us)
    return pairs.groupBy("type_a", "type_b").agg(F.count(F.lit(1)).alias("n_pairs"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    forward: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts on the same key. No native Spark operator
    (SURVEY.md §2.3) — union both sides tagged, then
    last(value, ignorenulls=True) over (partition by key
    order by ts, side) carries the most recent right value forward.

    One shuffle, fully JVM-side, state bounded by the window sort —
    scales to arbitrary key cardinality and row counts (vs a
    merge_asof-per-group Pandas UDF, which caps at per-group memory
    and pays the Arrow hop).

    Right side must be unique per (key, right_ts) for deterministic
    results — pre-aggregate if needed.
    """
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.withColumnRenamed(right_ts, "_rts")
    rt = rt.select(
        F.col(key),
        F.col("_rts").alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    lcols = [c for c in lt.columns if c not in ("_ts", "_side")]
    unioned = lt.select(
        *[F.col(c) for c in lcols],
        F.col("_ts"),
        F.col("_side"),
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in value_cols],
    ).unionByName(
        rt.select(
            # the join key flows through from the right row; every other
            # left column is NULL on right-side rows
            *[
                (F.col(c) if c == key else F.lit(None).cast(lt.schema[c].dataType)).alias(c)
                for c in lcols
            ],
            F.col("_ts"),
            F.col("_side"),
            *[F.col(c) for c in value_cols],
        )
    )
    # right rows sort before left rows at equal ts (side 0 first), in
    # BOTH directions: ascending traversal carries the latest right_ts
    # <= left_ts ("backward", the default); descending traversal
    # carries the earliest right_ts >= left_ts ("forward").
    order = [F.col("_ts").desc() if forward else F.col("_ts").asc(), F.col("_side")]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_ts"),
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    # the left's own ts column is still present in lcols; _ts was only
    # the union-wide ordering column
    return carried.filter(F.col("_side") == 1).drop("_side", "_ts")


@query(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the value of the user's most recent click
    at-or-before it (NULL if none). DuckDB checks with its native
    ASOF JOIN; we use the union+window shape (see asof_join)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_value"],
    ).select("event_id", "user_id", "ts", "value", "click_value")


@query(
    "q_asof_join_forward",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    nxt AS (
      SELECT p.event_id, MIN(c.ts) AS next_ts
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id AND c.ts >= p.ts
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_value
    FROM purchases p
    LEFT JOIN nxt ON nxt.event_id = p.event_id
    LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.ts = nxt.next_ts
    """,
    tags=("join", "asof", "forward"),
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for every purchase, the value of the user's
    NEXT click at-or-after it (NULL if none) — the look-ahead twin of
    q_asof_join, used for time-to-next-action and label-horizon
    joins. Same union+window mechanics with the traversal reversed
    (see asof_join's `forward` flag); still one keyed shuffle,
    no per-group Pandas. The oracle takes the min-future-click route
    (DuckDB's native ASOF is backward-only)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_value"], forward=True,
    ).select("event_id", "user_id", "ts", "value", "click_value")


# ---------------------------------------------------------------------
# q_asof_join_nearest (round 8)
# ---------------------------------------------------------------------


@query(
    "q_asof_join_nearest",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ),
    back AS (
      SELECT p.event_id, c.ts AS prev_ts, c.click_value AS prev_value
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    nxt_key AS (
      SELECT p.event_id, MIN(c.ts) AS next_ts
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id AND c.ts >= p.ts
      GROUP BY p.event_id
    ),
    fwd AS (
      SELECT p.event_id, n.next_ts, c.click_value AS next_value
      FROM purchases p
      LEFT JOIN nxt_key n ON n.event_id = p.event_id
      LEFT JOIN clicks c
        ON c.user_id = p.user_id AND c.ts = n.next_ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           CASE
             WHEN b.prev_ts IS NULL AND f.next_ts IS NULL THEN NULL
             WHEN f.next_ts IS NULL THEN b.prev_value
             WHEN b.prev_ts IS NULL THEN f.next_value
             WHEN epoch_us(p.ts) - epoch_us(b.prev_ts)
                  <= epoch_us(f.next_ts) - epoch_us(p.ts)
               THEN b.prev_value
             ELSE f.next_value
           END AS nearest_value,
           CASE
             WHEN b.prev_ts IS NULL AND f.next_ts IS NULL THEN NULL
             WHEN f.next_ts IS NULL THEN 'backward'
             WHEN b.prev_ts IS NULL THEN 'forward'
             WHEN epoch_us(p.ts) - epoch_us(b.prev_ts)
                  <= epoch_us(f.next_ts) - epoch_us(p.ts)
               THEN 'backward'
             ELSE 'forward'
           END AS direction
    FROM purchases p
    LEFT JOIN back b USING (event_id)
    LEFT JOIN fwd f USING (event_id)
    """,
    tags=("join", "asof", "nearest"),
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: for every purchase, the user's click closest in
    time in EITHER direction (ties prefer the earlier/backward click —
    the at-or-before convention both sides share). Completes the as-of
    family: backward (q_asof_join), forward (q_asof_join_forward),
    nearest (this) — the variant sensor-fusion and feature-alignment
    pipelines ask for when the measurement can legitimately come from
    either side of the anchor.

    Exactness: both candidates come from the exact union+window
    backward and forward passes (the click ts rides along as a carried
    value column); the pick compares exact epoch-microsecond gaps —
    no float time arithmetic. The oracle derives backward via native
    ASOF and forward via the min-future route, then applies the same
    tie rule.

    Scale: two keyed union+window passes over the same (user_id)
    shuffle partitioning (Catalyst reuses the exchange) and one
    projection — still no per-group Pandas, no range explosion."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id", "ts", "click_value", F.col("ts").alias("click_ts")
        )
    )
    back = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_value", "click_ts"],
    ).select(
        "event_id",
        F.col("click_ts").alias("prev_ts"),
        F.col("click_value").alias("prev_value"),
    )
    fwd = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_value", "click_ts"], forward=True,
    ).select(
        "event_id",
        F.col("click_ts").alias("next_ts"),
        F.col("click_value").alias("next_value"),
    )
    pick_back = (
        "b_prev_ts IS NOT NULL AND (f_next_ts IS NULL"
        " OR unix_micros(ts) - unix_micros(b_prev_ts)"
        " <= unix_micros(f_next_ts) - unix_micros(ts))"
    )
    return (
        purchases.join(
            back.select(
                F.col("event_id"),
                F.col("prev_ts").alias("b_prev_ts"),
                F.col("prev_value").alias("b_prev_value"),
            ),
            "event_id",
            "left",
        )
        .join(
            fwd.select(
                F.col("event_id"),
                F.col("next_ts").alias("f_next_ts"),
                F.col("next_value").alias("f_next_value"),
            ),
            "event_id",
            "left",
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.expr(
                f"CASE WHEN b_prev_ts IS NULL AND f_next_ts IS NULL"
                f" THEN NULL WHEN {pick_back} THEN b_prev_value"
                f" ELSE f_next_value END"
            ).alias("nearest_value"),
            F.expr(
                f"CASE WHEN b_prev_ts IS NULL AND f_next_ts IS NULL"
                f" THEN NULL WHEN {pick_back} THEN 'backward'"
                f" ELSE 'forward' END"
            ).alias("direction"),
        )
    )


# ---------------------------------------------------------------------
# q_null_safe_join (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_null_safe_join",
    oracle="""
    WITH a AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL
                  ELSE CAST(FLOOR(c_acctbal / 1000) AS BIGINT) END AS k
      FROM customer
    ),
    b AS (
      SELECT o_custkey,
             CASE WHEN o_totalprice > 300000 THEN NULL
                  ELSE CAST(FLOOR(o_totalprice / 20000) AS BIGINT) END AS k
      FROM orders
    )
    SELECT
      CAST((SELECT COUNT(*) FROM a JOIN b ON a.k = b.k) AS BIGINT)
        AS eq_matches,
      CAST((SELECT COUNT(*) FROM a JOIN b
            ON a.k IS NOT DISTINCT FROM b.k) AS BIGINT)
        AS nullsafe_matches,
      CAST((SELECT COUNT(*) FROM a WHERE k IS NULL) AS BIGINT)
        AS null_left,
      CAST((SELECT COUNT(*) FROM b WHERE k IS NULL) AS BIGINT)
        AS null_right
    """,
    tags=("joins", "null-safe", "equi-join", "semantics"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) vs the
    standard equality join on a NULLABLE derived key — the §2.3
    semantics row: `=` silently drops every NULL-keyed row on both
    sides, `<=>` treats NULL as a joinable value. The report emits
    both match counts plus the per-side NULL populations, and the
    identity nullsafe = eq + null_left * null_right is the built-in
    cross-check (NULL becomes ONE join bucket).

    Scale: both joins stay hash-partitionable (EqualNullSafe is a
    valid equi-join key in Spark — no nested loop), but that single
    NULL bucket is a textbook skew cell: at 100 TB, null_left *
    null_right rows hit one reducer. The emitted null populations ARE
    the audit for that — route NULLs through q_salted_join_agg's
    salting or pre-filter them when the product is large."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.select(
        # FLOOR on the raw double, not CAST-to-BIGINT-then-divide:
        # DuckDB ROUNDS double->BIGINT casts while Spark truncates, a
        # divergence the sf0.1 parity sweep caught (boundary values
        # land in different buckets)
        F.expr(
            "CASE WHEN c_acctbal < 0 THEN NULL"
            " ELSE CAST(FLOOR(c_acctbal / 1000) AS BIGINT) END"
        ).alias("ka")
    )
    b = o.select(
        F.expr(
            "CASE WHEN o_totalprice > 300000 THEN NULL"
            " ELSE CAST(FLOOR(o_totalprice / 20000) AS BIGINT) END"
        ).alias("kb")
    )
    eq = a.join(b, F.col("ka") == F.col("kb")).agg(
        F.count(F.lit(1)).alias("eq_matches")
    )
    ns = a.join(b, F.col("ka").eqNullSafe(F.col("kb"))).agg(
        F.count(F.lit(1)).alias("nullsafe_matches")
    )
    nl = a.filter(F.col("ka").isNull()).agg(
        F.count(F.lit(1)).alias("null_left")
    )
    nr = b.filter(F.col("kb").isNull()).agg(
        F.count(F.lit(1)).alias("null_right")
    )
    return (
        eq.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(nr))
    )
