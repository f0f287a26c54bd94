"""CDC / slowly-changing-dimension patterns (no Delta/Iceberg jars in
this image, so MERGE is emulated with the classic anti-join + union —
the shape the lakehouse formats compile MERGE into anyway).

- SCD2 history build from an event log: collapse consecutive equal
  states per key into validity intervals (gaps-and-islands).
- Upsert (MERGE): delta rows replace matches, non-matches pass
  through: result = delta UNION ALL (target ANTI JOIN delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table


@query(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM ordered
    ), ranges AS (
      SELECT user_id, event_type, island,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM islands GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, island)
             AS valid_to,
           n_events,
           CAST(island AS BIGINT) AS version
    FROM ranges
    """,
    tags=("cdc", "scd2"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension built from a change log: per user, each
    run of consecutive identical event_types becomes one versioned
    row with [valid_from, valid_to) (open-ended for the current
    state). Pure windows + one aggregate — the streaming-safe way to
    build history tables without MERGE."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum(chg).over(wsum).alias("island"),
    )
    ranges = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    # island as tie-break: two islands of one user can share valid_from
    # (identical ns timestamps across a type flip) and lead() would
    # otherwise be order-nondeterministic between engines
    wv = Window.partitionBy("user_id").orderBy("valid_from", "island")
    return ranges.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.col("island").cast("long").alias("version"),
    )


def merge_upsert(target: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """MERGE emulation: delta wins on key match, target rows without a
    delta match pass through. Equivalent to Delta's
    `MERGE ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *`
    for whole-row updates. One shuffle on the key (the anti join);
    at scale, key-partitioned layouts turn this into a partition-
    overwrite pattern."""
    untouched = target.join(delta.select(key), key, "left_anti")
    return untouched.unionByName(delta)


@query(
    "q_merge_upsert",
    oracle="""
    WITH delta AS (
      SELECT c_custkey, c_name, 'PLATINUM' AS c_mktsegment,
             CAST(ROUND(CAST(c_acctbal AS DECIMAL(19,2)) * CAST(1.1 AS DECIMAL(2,1)), 2)
                  AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_acctbal > 9000
    )
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM delta
    UNION ALL
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
    """,
    tags=("cdc", "merge", "upsert"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert via merge_upsert(): high-balance customers get upgraded
    rows (new segment, +10% balance rounded to cents); everyone else
    passes through unchanged. The +10% runs in decimal — see the
    inline comment for why double rounding isn't cross-engine-safe."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    delta = (
        c.filter(F.col("c_acctbal") > 9000)
        .withColumn("c_mktsegment", F.lit("PLATINUM"))
        .withColumn(
            "c_acctbal",
            # decimal arithmetic: round(double*1.1, 2) lands on exact
            # .xx5 boundaries where the engines' double-round impls
            # disagree (observed at 10017.755) — decimals tie-break
            # identically (away from zero) in both
            F.round(
                F.col("c_acctbal").cast("decimal(19,2)") * F.lit("1.1").cast("decimal(2,1)"),
                2,
            ).cast("double"),
        )
    )
    return merge_upsert(c, delta, "c_custkey")


@query(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS yr,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))
                          * CAST(1 - CAST(l.l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6)))
                      FILTER (WHERE n.n_name = 'CHINA'), 2) AS DOUBLE)
             / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))
                          * CAST(1 - CAST(l.l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6))), 2) AS DOUBLE)
             AS china_share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY year(o.o_orderdate)
    """,
    tags=("join", "agg", "ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue per
    year — a conditional-aggregate / total-aggregate ratio. Both
    numerator and denominator are exact decimals reduced to doubles,
    so the single division is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from ..functions.numeric import dec

    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", "decimal(8,6)")).cast(
        "decimal(8,6)"
    )
    num = (
        F.sum(F.when(F.col("n_name") == "CHINA", rev)).cast("decimal(38,2)").cast("double")
    )
    den = F.sum(rev).cast("decimal(38,2)").cast("double")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg((num / den).alias("china_share"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q_merge_with_deletes",
    oracle="""
    WITH delta AS (
      SELECT c_custkey, 'U' AS op, c_name, 'PLATINUM' AS c_mktsegment,
             CAST(ROUND(CAST(c_acctbal AS DECIMAL(19,2))
                        * CAST('1.1' AS DECIMAL(2,1)), 2) AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_acctbal > 9000 AND c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey, 'D', NULL, NULL, NULL
      FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM delta WHERE op = 'U'
    UNION ALL
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
    """,
    tags=("cdc", "merge", "delete", "tombstone"),
)
def q_merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC MERGE semantics incl. the DELETE branch: the change
    feed carries updates AND tombstones (op = 'D'), i.e. Delta's
    WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT. Plan: ONE anti join removes every
    delta-touched key from the target (updates and deletes alike),
    then only the non-tombstone delta rows union back — deletes cost
    nothing extra over the upsert. Same single key-shuffle economics
    as merge_upsert; the balance bump reuses the decimal tie-break
    pattern documented in q_merge_upsert."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    updates = (
        c.filter((F.col("c_acctbal") > 9000) & (F.col("c_custkey") % 97 != 0))
        .withColumn("op", F.lit("U"))
        .withColumn("c_mktsegment", F.lit("PLATINUM"))
        .withColumn(
            "c_acctbal",
            F.round(
                F.col("c_acctbal").cast("decimal(19,2)")
                * F.lit("1.1").cast("decimal(2,1)"),
                2,
            ).cast("double"),
        )
    )
    tombstones = c.filter(F.col("c_custkey") % 97 == 0).select(
        "c_custkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("double").alias("c_acctbal"),
    )
    delta = updates.select("c_custkey", "op", "c_name", "c_mktsegment", "c_acctbal").unionByName(
        tombstones
    )
    untouched = c.join(delta.select("c_custkey"), "c_custkey", "left_anti")
    applied = delta.filter(F.col("op") == "U").drop("op")
    return untouched.unionByName(applied)


_SCD2_HIST_CTE = """
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM ordered
    ), hist AS (
      SELECT user_id, event_type, island,
             MIN(ts) AS valid_from,
             lead(MIN(ts)) OVER (PARTITION BY user_id
                                 ORDER BY MIN(ts), island) AS valid_to
      FROM islands GROUP BY user_id, event_type, island
    )
"""


@query(
    "q_scd2_pit_join",
    oracle=_SCD2_HIST_CTE
    + """
    SELECT p.event_id, p.user_id, p.ts,
           CAST(h.island AS BIGINT) AS version,
           h.event_type AS state_at_purchase
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    JOIN hist h
      ON h.user_id = p.user_id
     AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
    tags=("cdc", "scd2", "point-in-time", "asof"),
)
def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: join each purchase event to the SCD2
    dimension VERSION that was valid at the event's timestamp — the
    canonical lakehouse/feature-store lookup ("what was the user's
    state when they bought?"), and the join shape ML training-data
    builders need to avoid label leakage (never join future state).

    Plan: NOT an interval-containment theta join. Dimension versions
    and facts union into one stream (dim rows sorting before facts on
    ties via a kind flag), one window per user carries the last seen
    version forward (last_value ignorenulls) — the as-of trick from
    joins.py, ONE shuffle on user_id regardless of version counts.
    The oracle does the naive containment join; identical output
    proves the single-shuffle form implements the [from, to)
    semantics, including empty intervals from same-timestamp flips."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum(chg).over(wsum).alias("island"),
    )
    hist = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from")
    )
    dim = hist.select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(0).alias("kind"),
        F.col("island").alias("o"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("island").alias("d_version"),
        F.col("event_type").alias("d_state"),
    )
    fact = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("o"),
        "event_id",
        F.lit(None).cast("long").alias("d_version"),
        F.lit(None).cast("string").alias("d_state"),
    )
    wa = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = dim.unionByName(fact).select(
        "user_id", "t", "kind", "event_id",
        F.last("d_version", ignorenulls=True).over(wa).alias("version"),
        F.last("d_state", ignorenulls=True).over(wa).alias("state_at_purchase"),
    )
    return merged.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("ts"),
        F.col("version").cast("bigint").alias("version"),
        "state_at_purchase",
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH new_snap AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_acctbal > 9000 THEN 'PLATINUM' ELSE c_mktsegment END
               AS c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'New Customer', 'BUILDING'
      FROM customer WHERE c_custkey % 17 = 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.c_mktsegment AS old_segment,
           n.c_mktsegment AS new_segment
    FROM customer o FULL JOIN new_snap n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR (o.c_name, o.c_mktsegment) IS DISTINCT FROM (n.c_name, n.c_mktsegment)
    """,
    tags=("cdc", "snapshot-diff", "change-data-feed"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two table snapshots (the read side of
    CDC, where q_merge_upsert is the write side): full outer join on
    the key classifies every row as insert / delete / update,
    comparing the non-key payload with null-safe struct equality.
    The 'new' snapshot is derived deterministically from customer
    (drops custkey%13, upgrades high-balance segments, adds custkey%17
    clones) so both engines diff identical inputs.

    Scale: one shuffle on the key for the full join; at lakehouse
    scale the same diff runs partition-by-partition on a
    key-partitioned layout, and unchanged-row skipping via content
    hashes pushes the comparison into the scan."""
    c = load_table(spark, sf_dir, "customer")
    new_snap = (
        c.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_acctbal") > 9000, "PLATINUM")
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 17 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.lit("New Customer").alias("c_name"),
                F.lit("BUILDING").alias("c_mktsegment"),
            )
        )
    )
    o = c.select(
        F.col("c_custkey").alias("o_key"),
        F.col("c_name").alias("o_name"),
        F.col("c_mktsegment").alias("old_segment"),
    )
    n = new_snap.select(
        F.col("c_custkey").alias("n_key"),
        F.col("c_name").alias("n_name"),
        F.col("c_mktsegment").alias("new_segment"),
    )
    j = o.join(n, o.o_key == n.n_key, "full")
    changed = (
        F.col("o_key").isNull()
        | F.col("n_key").isNull()
        | ~F.struct("o_name", "old_segment").eqNullSafe(
            F.struct(
                F.col("n_name").alias("o_name"),
                F.col("new_segment").alias("old_segment"),
            )
        )
    )
    return j.filter(changed).select(
        F.coalesce("o_key", "n_key").alias("c_custkey"),
        F.when(F.col("o_key").isNull(), "insert")
        .when(F.col("n_key").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        "old_segment",
        "new_segment",
    )


@query(
    "q_late_arriving_dim",
    oracle="""
    WITH dim_v1 AS MATERIALIZED (
      SELECT c_custkey, c_nationkey FROM customer
      WHERE c_custkey % 10 <> 3
    ),
    facts AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    staged AS MATERIALIZED (
      SELECT f.o_orderkey, f.o_custkey, f.cents,
             d.c_custkey IS NOT NULL AS matched_v1
      FROM facts f LEFT JOIN dim_v1 d ON d.c_custkey = f.o_custkey
    ),
    resolved AS (
      SELECT s.*, c.c_custkey IS NOT NULL AS matched_v2
      FROM staged s LEFT JOIN customer c ON c.c_custkey = s.o_custkey
    )
    SELECT CASE WHEN matched_v1 THEN 'matched_initial'
                WHEN matched_v2 THEN 'inferred_then_resolved'
                ELSE 'still_unknown' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM resolved
    GROUP BY 1
    """,
    tags=("cdc", "late-arriving-dimension", "warehouse", "scd"),
)
def q_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension reconciliation — the warehouse pattern
    for facts that reference dimension members not yet loaded: join
    against the v1 dimension snapshot (simulated: every custkey % 10
    = 3 member is 'late'), stage unmatched facts as inferred members,
    then re-resolve against the complete dimension and report each
    fact's lifecycle (matched initially / inferred then resolved /
    still unknown) with exact order and revenue accounting. The
    inferred-member flow is the MERGE-family complement of
    q_merge_upsert: never drop a fact, never double-count one.

    Scale: two broadcast dimension probes against the fact scan and
    one status aggregate — the fact table is read once, dimensions
    are the small side both times."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dim_v1 = c.filter(F.col("c_custkey") % 10 != 3).select(
        "c_custkey", "c_nationkey"
    )
    facts = o.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    staged = facts.join(
        F.broadcast(dim_v1), F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.col("c_custkey").isNotNull().alias("matched_v1"),
    )
    resolved = staged.join(
        F.broadcast(c.select("c_custkey")),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    ).select(
        "o_custkey",
        "cents",
        "matched_v1",
        F.col("c_custkey").isNotNull().alias("matched_v2"),
    )
    return (
        resolved.select(
            F.when(F.col("matched_v1"), "matched_initial")
            .when(F.col("matched_v2"), "inferred_then_resolved")
            .otherwise("still_unknown")
            .alias("status"),
            "o_custkey",
            "cents",
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("cents").alias("rev_cents"),
        )
    )


@query(
    "q_accumulating_snapshot",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          MIN(CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS days_to_first_ship,
           CAST(date_diff('day', MIN(CAST(l.l_shipdate AS DATE)),
                          MAX(CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS ship_span_days,
           CAST(SUM(CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_final,
           COUNT(*) = SUM(CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0
                          END) AS fully_final
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    tags=("cdc", "accumulating-snapshot", "warehouse", "milestones"),
)
def q_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact build: one row per order carrying
    its milestone lags — days from order to first shipment, the
    shipping span across lines, and line-status completeness — the
    Kimball pattern for processes with multiple dated milestones
    (each reload UPDATES the row as milestones land; q_merge_upsert
    is the reload mechanism, this is the fact shape). Day lags are
    integer date arithmetic, identical in both engines.

    Scale: one orderkey-keyed join + aggregate — the natural
    co-partitioned pair (same key both sides), so AQE plans a single
    shuffle each; no windows, no second pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.datediff(
                F.min(F.col("l_shipdate").cast("date")),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("days_to_first_ship"),
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("l_shipdate").cast("date")),
            )
            .cast("long")
            .alias("ship_span_days"),
            F.sum(
                F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
            ).alias("n_final"),
            (
                F.count(F.lit(1))
                == F.sum(
                    F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
                )
            ).alias("fully_final"),
        )
        .drop("o_orderdate")
    )


@query(
    "q_incremental_agg_merge",
    oracle="""
    WITH full_agg AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(19,2))), 2) AS DOUBLE)
               AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n, n_users, sum_value,
           day = (SELECT MAX(CAST(date_trunc('day', ts) AS TIMESTAMP))
                  FROM events) AS from_delta
    FROM full_agg
    """,
    tags=("cdc", "incremental", "aggregation", "maintenance"),
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the pattern that makes a
    100 TB daily rollup affordable: NEVER re-scan history. The stored
    state (per-day aggregates over all closed days) is combined with
    the newest day's partial aggregate by a key-aligned merge; because
    the measures are decomposable (COUNT/SUM merge by addition,
    COUNT DISTINCT stays exact here because the merge key CONTAINS the
    day — cross-day distincts would need a sketch or a re-agg, which is
    precisely why this rollup is keyed (type, day)), the merged table
    is bit-identical to the full recompute the oracle runs.

    Spark side simulates the two sides honestly from the one events
    table: history = scan WHERE day < max_day (in production: the
    stored parquet state, zero scan), delta = scan WHERE day = max_day
    (the new partition), then unionByName — no shuffle beyond each
    side's own aggregate, and the from_delta flag shows the merge
    provenance. The day boundary comes from one O(1) max() collect.

    Scale: the daily increment costs O(new partition); partition
    pruning (events stored day-partitioned, q_parquet_sink_roundtrip's
    layout) makes the delta scan touch ONE partition. Pairs with
    q_incremental_dedup (state-vs-new exact dedup) and the foreachBatch
    upsert twin (streaming maintenance of the same state)."""
    # day stays a TIMESTAMP (midnight), not a DATE: Spark DATE columns
    # arrive in pandas as object-dtype datetime.date while DuckDB DATE
    # arrives as datetime64 — a dtype-kind mismatch the driver's value
    # hash distinguishes (tests/parity.py); timestamps agree.
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
        dec("value").alias("v"),
    )
    max_day = e.agg(F.max("day")).collect()[0][0]

    def day_agg(df: DataFrame, from_delta: bool) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            money_sum(F.col("v"), "sum_value"),
        ).withColumn("from_delta", F.lit(from_delta))

    history = day_agg(e.filter(F.col("day") < F.lit(max_day)), False)
    delta = day_agg(e.filter(F.col("day") == F.lit(max_day)), True)
    return history.unionByName(delta)
