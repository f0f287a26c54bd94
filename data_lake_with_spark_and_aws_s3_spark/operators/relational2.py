"""Second relational batch: correlated subquery (TPC-H Q17 shape),
5-way star join (TPC-H Q5 shape), date formatting, approximate
percentiles, Python UDTF — rounding out SURVEY.md §2.3/§2.4/§2.8/§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec, money_sum
from ..registry import query
from ..sources.loader import load_table, register_views

RATE = "decimal(8,6)"


@query(
    "q17_correlated_subquery",
    oracle="""
    SELECT l.l_partkey,
           COUNT(*) AS n_small_orders,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE)
             AS small_order_revenue
    FROM lineitem l
    JOIN (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(19,2))) AS DOUBLE) / COUNT(*))
               AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE l.l_quantity < t.qty_threshold
    GROUP BY l.l_partkey
    """,
    tags=("join", "subquery", "decorrelated"),
)
def q17_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below 20% of their part's average
    quantity — the classic correlated scalar subquery, written (as
    Catalyst itself rewrites it) as an aggregate + self-join. The
    threshold double is derived from an exact decimal sum, so both
    engines compare against bit-identical values. Self-join shuffles
    once on l_partkey; the aggregate side is tiny (|parts|)."""
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        (
            0.2
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small_orders"),
            money_sum(dec("l_extendedprice"), "small_order_revenue"),
        )
    )


@query(
    "q5_star_join",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))
                * CAST(1 - CAST(l.l_discount AS DECIMAL(8,6)) AS DECIMAL(8,6))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "star", "headline-adjacent"),
)
def q5_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a local-supplier
    condition (supplier in the customer's nation). region/nation/
    supplier broadcast; customer joins orders joins lineitem shuffle
    on their keys; the extra s_nationkey = c_nationkey residual rides
    the supplier join. Region filter prunes before any join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", RATE)).cast(RATE)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum(revenue, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           strftime(o_orderdate, '%a') AS weekday_name,
           strftime(o_orderdate, '%B') AS month_name,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS unix_sec,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date_floor
    FROM orders
    """,
    tags=("scalar", "date-format"),
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format / unix_timestamp / to_date (the reference derives
    its weekday with date_format(...,'E'), template ~101). Format
    tokens normalized: Spark 'E'->EEE abbrev == strftime %a,
    'MMMM' == %B (English month names, both engines)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
        F.date_format(d, "E").alias("weekday_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.unix_timestamp(d).alias("unix_sec"),
        F.to_date(d).cast("timestamp").alias("date_floor"),
    )


@query(
    "q_approx_percentiles",
    # With accuracy >= group size the GK sketch never compresses and
    # percentile_approx is exact: the smallest value at rank ceil(p*n),
    # which is DuckDB's quantile_disc (verified value-identical on this
    # data). At 100 TB you'd lower accuracy and accept the error bound;
    # the correctness gate runs in the exact regime.
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS price_p25,
           quantile_disc(l_extendedprice, 0.5)  AS price_p50,
           quantile_disc(l_extendedprice, 0.75) AS price_p75,
           quantile_disc(l_quantity, 0.5) AS median_qty_approx
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (SURVEY.md §2.4). The 100 TB path for
    quantiles — single pass, bounded sketch memory; accuracy knob =
    max relative error via `accuracy` (set to exact-regime here so the
    sketch is value-checkable; production would use ~10k)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Scalar columns, not array<double>: the driver's canonicalizer
    # (pandas sort_values + hash) cannot handle ndarray cells.
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 1_000_000)
    return li.groupBy("l_returnflag").agg(
        q.getItem(0).alias("price_p25"),
        q.getItem(1).alias("price_p50"),
        q.getItem(2).alias("price_p75"),
        F.percentile_approx("l_quantity", 0.5, 1_000_000).alias("median_qty_approx"),
    )


@query(
    "q_python_udtf",
    # No WITH ORDINALITY in DuckDB — zip two unnests of equal-length
    # lists (token list + generate_series of its indices). The regex
    # split + empty-filter matches Python str.split() whitespace
    # semantics exactly.
    oracle=r"""
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(toks))) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 20
    )
    """,
    tags=("udf", "udtf"),
)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (SURVEY.md §2.11): one input row ->
    many output rows from Python. Tokenizes a 20-doc sample into
    (doc_id, pos, token) rows. For anything explode() can express,
    explode wins (JVM-side); a real UDTF earns its cost only for
    logic that's genuinely Python (parsers, model calls)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id, text):
            for i, tok in enumerate(text.split()):
                yield doc_id, i, tok

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token FROM _udtf_docs, "
        "LATERAL tokenize_udtf(doc_id, text) t"
    )


@query(
    "q_python_udtf_analyze",
    oracle="""
    SELECT doc_id,
           'n_tokens' AS stat, CAST(len(string_split(text, ' ')) AS BIGINT) AS value
    FROM documents WHERE doc_id < 20
    UNION ALL
    SELECT doc_id, 'n_chars', CAST(length(text) AS BIGINT)
    FROM documents WHERE doc_id < 20
    UNION ALL
    SELECT doc_id, 'n_uniq', CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
    FROM documents WHERE doc_id < 20
    """,
    tags=("python", "udtf", "polymorphic", "spark4"),
)
def q_python_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is decided
    at plan time by the class's static analyze() from the call's
    literal argument — here a stat list "n_tokens,n_chars,n_uniq"
    chooses which per-document stats to emit, and analyze() both
    validates it and fixes the (doc_id, stat, value) schema. This is
    the 4.x contract for schema-flexible table functions (parsers that
    emit different shapes per config) that q_python_udtf's static
    returnType can't express.

    The stats themselves are exact integers (token/char/distinct
    counts), so the full fan-out is hashed against plain SQL. Same
    performance rule as every UDTF: explode/HOFs win when they can
    express it; the Python hop earns its cost only for genuinely
    Python logic — the polymorphism is what's being exercised here."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class DocStats:
        @staticmethod
        def analyze(doc_id: AnalyzeArgument, text: AnalyzeArgument,
                    stats: AnalyzeArgument) -> AnalyzeResult:
            allowed = {"n_tokens", "n_chars", "n_uniq"}
            wanted = [s.strip() for s in str(stats.value).split(",")]
            if not wanted or not set(wanted) <= allowed:
                raise ValueError(f"stats must be a comma list from {sorted(allowed)}")
            return AnalyzeResult(
                StructType(
                    [
                        StructField("doc_id", LongType()),
                        StructField("stat", StringType()),
                        StructField("value", LongType()),
                    ]
                )
            )

        def eval(self, doc_id, text, stats):
            toks = text.split(" ")
            table = {
                "n_tokens": len(toks),
                "n_chars": len(text),
                "n_uniq": len(set(toks)),
            }
            for s in stats.split(","):
                yield doc_id, s.strip(), table[s.strip()]

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs_poly")
    spark.udtf.register("doc_stats_udtf", udtf(DocStats))
    return spark.sql(
        "SELECT t.doc_id, t.stat, t.value FROM _udtf_docs_poly, "
        "LATERAL doc_stats_udtf(doc_id, text, 'n_tokens,n_chars,n_uniq') t"
    )


@query(
    "q_udtf_table_argument",
    oracle="""
    WITH src AS (
      SELECT event_type, ts, event_id FROM events WHERE user_id < 40
    ), g AS (
      SELECT event_type, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM src
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(MAX(np) AS BIGINT) AS n_events,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(MIN(CASE WHEN rn = 1 THEN event_id END) AS BIGINT)
             AS first_event_id,
           CAST(MIN(CASE WHEN rn = np THEN event_id END) AS BIGINT)
             AS last_event_id
    FROM g GROUP BY event_type
    """,
    tags=("python", "udtf", "table-argument", "spark4"),
)
def q_udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE ARGUMENT (Spark 4): the function
    consumes a whole RELATION — `gap_udtf(TABLE(src) PARTITION BY
    event_type ORDER BY ts, event_id)` — with the engine guaranteeing
    each partition arrives intact and ordered at one UDTF instance,
    which accumulates state across eval() calls and emits its summary
    from terminate(). This is the 4.x contract for per-group
    sequential Python logic (legacy parsers, protocol replays) that
    the scalar-argument UDTFs above can't see (they get one row at a
    time with no partition boundary), and the imperative sibling of
    applyInPandas (which hands the group over as one DataFrame;
    the UDTF streams it row-by-row in bounded memory).

    Computed here: per event type over a bounded user slice, the
    event count, the MAX inter-arrival gap (exact integer
    microseconds from timedelta fields — never float seconds), and
    the first/last event ids under the total (ts, event_id) order.
    The oracle replays it with lag() over the same window — exact
    ints both sides.

    Scale: one shuffle on the PARTITION BY key (identical to the
    window plan); per-task memory is O(1) — the UDTF streams its
    partition. Same rule as every Python boundary: a built-in window
    wins when it can express the logic; the table-arg UDTF earns the
    hop when the per-partition logic is genuinely imperative."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "event_type string, n_events bigint, max_gap_us bigint,"
            " first_event_id bigint, last_event_id bigint"
        )
    )
    class GapStats:
        def __init__(self):
            self.event_type = None
            self.n = 0
            self.max_gap_us = None
            self.first_id = None
            self.last_id = None
            self.prev_ts = None

        def eval(self, row):
            self.event_type = row.event_type
            self.n += 1
            if self.first_id is None:
                self.first_id = row.event_id
            self.last_id = row.event_id
            if self.prev_ts is not None:
                d = row.ts - self.prev_ts
                gap = (d.days * 86_400_000_000
                       + d.seconds * 1_000_000 + d.microseconds)
                if self.max_gap_us is None or gap > self.max_gap_us:
                    self.max_gap_us = gap
            self.prev_ts = row.ts

        def terminate(self):
            if self.n:
                yield (self.event_type, self.n, self.max_gap_us,
                       self.first_id, self.last_id)

    spark.udtf.register("gap_udtf", GapStats)
    load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40).select(
        "event_type", "ts", "event_id"
    ).createOrReplaceTempView("_udtf_gap_src")
    # multi-expression ORDER BY inside a table argument needs the
    # parenthesized form (Spark parser requirement)
    return spark.sql(
        "SELECT * FROM gap_udtf(TABLE(_udtf_gap_src)"
        " PARTITION BY event_type ORDER BY (ts, event_id))"
    )
