"""Spark 4.x API surface (SURVEY.md §2 extensions): lateral joins and
the VARIANT semi-structured type — the two headline additions a user
migrating from the reference's era of Spark would reach for next.

- ``DataFrame.lateralJoin`` (4.0+): correlated subquery per outer row,
  the SQL LATERAL equivalent — here the canonical per-key top-k.
- ``parse_json`` -> VARIANT + ``variant_get`` (4.0+): schema-flexible
  ingestion without schema inference passes; typed extraction happens
  at read time per path, an order of magnitude faster than
  ``get_json_object`` string re-parsing when a document is touched
  more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table, register_views


@query(
    "q_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    """,
    tags=("join", "lateral", "topk"),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via DataFrame.lateralJoin — the
    correlated-subquery form of per-group top-k (same answer as the
    window row_number form in q_window_rank, different API surface).
    Catalyst decorrelates the LIMIT-per-outer-row into a single
    ranked join, so this does NOT execute one subquery per customer;
    determinism comes from the (o_totalprice DESC, o_orderkey)
    tie-broken ordering on both engines. Customers without orders
    drop (inner lateral), matching the comma-LATERAL oracle."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    sub = (
        o.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )
    return c.lateralJoin(sub)


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.k') AS k_str,
           json_extract(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    """,
    tags=("scalar", "variant", "json"),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access: parse the JSON props
    column ONCE into a variant, then do typed path extraction
    (bigint + string views of the same path, existence probe for an
    absent path) and a pushable predicate on the extracted value.
    Versus get_json_object, the parse cost is paid once per document
    instead of once per path — the difference that matters when a
    100 TB event stream has 20 extracted fields. The variant itself
    never leaves the plan (binary cells would crash the driver's
    canonicalizer); only typed scalars are returned."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_id", "event_type", F.parse_json("props").alias("v")
    )
    k_num = F.variant_get("v", "$.k", "bigint")
    return (
        v.select(
            "event_id",
            "event_type",
            k_num.alias("k_num"),
            F.variant_get("v", "$.k", "string").alias("k_str"),
            F.variant_get("v", "$.missing", "string").isNotNull().alias("has_missing"),
        )
        .where(F.col("k_num") >= 50)
    )


# One SQL text, two engines: the query below is deliberately written in
# the ANSI subset both Spark SQL and DuckDB parse IDENTICALLY — the
# oracle is the very same string the Spark side executes.
_PORTABLE_SQL = """
    SELECT n_name,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(19,2))), 2) AS DOUBLE)
             AS revenue,
           CASE WHEN COUNT(*) >= 20 THEN 'major' ELSE 'minor' END AS tier
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY n_name, year(o_orderdate)
    HAVING COUNT(*) > 5
"""


@query("q_sql_frontend", oracle=_PORTABLE_SQL, tags=("sql", "frontend"))
def q_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end surface: temp views + ``spark.sql`` running
    the EXACT text the DuckDB oracle runs — no DataFrame translation
    layer at all. Proves the engine speaks portable ANSI (joins,
    year(), DECIMAL casts, HAVING, CASE) with hash-identical results,
    which is what lets a reference user bring their SQL unchanged.
    Catalyst treats the parsed plan like any DataFrame plan: same
    pushdown, same broadcast of the dimension sides."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PORTABLE_SQL)


@query(
    "q_python_datasource",
    oracle=f"""
    SELECT i AS id,
           md5(CAST(i AS VARCHAR)) AS h,
           CAST({{hexval}} AS BIGINT) AS bucket
    FROM range(0, 500) t(i)
    """.format(hexval=(
        "((((0) * 16 + instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 1, 1)) - 1)"
        " * 16 + instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 2, 1)) - 1)"
        " * 16 + instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 3, 1)) - 1)"
        " * 16 + instr('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 4, 1)) - 1"
    )),
    tags=("source", "python-datasource"),
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource scan (sources/pysource.py): a
    partition-planned synthetic feed read through the Spark 4.x
    ``pyspark.sql.datasource`` extension API — 8 InputPartitions read
    in parallel on executors, exactly like file splits. Deterministic
    md5 content makes a CUSTOM source oracle-checkable: DuckDB
    regenerates the identical feed from range(). The sf_dir is unused
    by construction (the source is synthetic at every scale)."""
    from ..sources.pysource import register

    register(spark)
    return (
        spark.read.format("synth_docs")
        .option("n", 500)
        .option("parts", 8)
        .load()
    )


from ..registry import REGISTRY as _REGISTRY  # noqa: E402


@query(
    "q_python_datasource_arrow",
    oracle=_REGISTRY["q_python_datasource"].oracle,  # identical feed, bulk wire format
    tags=("source", "python-datasource", "arrow"),
)
def q_python_datasource_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same custom source, Arrow-batch wire format: read() yields ONE
    pyarrow.RecordBatch per partition instead of pickled tuples — the
    bulk-transfer path whose absence the tuple variant's docstring
    warns about. Content is bit-identical (same oracle), so the two
    registered queries pin both wire formats to the same truth."""
    from ..sources.pysource import register

    register(spark)
    return (
        spark.read.format("synth_docs")
        .option("n", 500)
        .option("parts", 8)
        .option("arrow", "true")
        .load()
    )


@query(
    "q_pandas_api",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("api", "pandas-on-spark"),
)
def q_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark (``pyspark.pandas``): the dataframe dialect
    a pandas user brings unchanged — groupby/agg compiled by the same
    Catalyst pipeline as the native API (this is a PLAN translation
    layer, not a driver-side pandas: the aggregate is the usual
    distributed partial+final HashAggregate). Output chosen
    parquet-exact (count/max/min — no float summation) so the API
    round-trip itself is what the oracle hashes."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as pss

        psdf = pss.DataFrame(load_table(spark, sf_dir, "orders"))
        out = (
            psdf.groupby("o_orderstatus")
            .agg(
                n_orders=("o_orderkey", "count"),
                max_price=("o_totalprice", "max"),
                min_price=("o_totalprice", "min"),
            )
            .reset_index()
        )
        return out.to_spark()


@query(
    "q_try_safe_math",
    oracle="""
    SELECT event_id,
           CASE WHEN CAST(user_id % 5 AS DOUBLE) = 0 THEN NULL
                ELSE value / CAST(user_id % 5 AS DOUBLE) END AS rate,
           COALESCE(TRY_CAST(event_type AS BIGINT), -1) AS parsed_type,
           COALESCE(TRY_CAST(substr(event_type, 1, 1) AS BIGINT), -1) AS parsed_first,
           CASE WHEN CAST(event_id AS HUGEINT) * 4611686018427387904
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN CAST(event_id * 4611686018427387904 AS BIGINT)
                ELSE -1 END AS scaled_or_sentinel
    FROM events
    """,
    tags=("scalar", "ansi", "try"),
)
def q_try_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safe arithmetic: Spark 4 runs ANSI by default (a
    divide-by-zero or overflow FAILS the job — correct for a lake,
    unlike silent NULLs), and the try_* family is the per-expression
    opt-out: try_divide -> NULL on zero denominators, try_cast -> NULL
    on malformed input, try_multiply -> NULL on int64 overflow
    (event_id >= 2 here, sentinel proves the NULL path). The oracle
    expresses each contract arithmetically (DuckDB 1.0 has TRY_CAST
    but no TRY() expression — overflow is checked via HUGEINT
    widening). Sentinels keep integer columns non-null so both
    engines materialize int64, not float64."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.try_divide("value", (F.col("user_id") % 5).cast("double")).alias("rate"),
        F.coalesce(F.col("event_type").try_cast("bigint"), F.lit(-1)).alias("parsed_type"),
        F.coalesce(
            F.substring("event_type", 1, 1).try_cast("bigint"), F.lit(-1)
        ).alias("parsed_first"),
        F.coalesce(
            F.try_multiply(F.col("event_id"), F.lit(4611686018427387904)),
            F.lit(-1),
        ).alias("scaled_or_sentinel"),
    )


_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate >= DATE '1997-01-01'
    |> AGGREGATE COUNT(*) AS n_items,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,2)))
                      AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
       GROUP BY l_returnflag, l_linestatus
    |> WHERE n_items > 0
    |> SELECT l_returnflag, l_linestatus, n_items, sum_qty
"""

_PIPE_ORACLE = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,2)))
                AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 0
"""


@query("q_sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "pipe-syntax", "spark4"))
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4.x `|>`, SQL:202x pipe-operator
    proposal a la GoogleSQL): the linear FROM -> WHERE -> AGGREGATE ->
    WHERE -> SELECT chain parses to the identical Catalyst plan as the
    nested ANSI form the oracle runs — same pushdown, same partial
    aggregation; the surface is sugar, the plan is not. Registered so
    a user migrating pipe-syntax queries has the front-end covered."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PIPE_SQL)


_REC_SPARK_SQL = """
    WITH RECURSIVE spans AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS m,
             date_trunc('month', MAX(o_orderdate)) AS last_m
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT o_custkey, m + INTERVAL '1' MONTH, last_m
      FROM spans WHERE m < last_m
    )
    SELECT date_format(m, 'yyyy-MM') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM spans GROUP BY date_format(m, 'yyyy-MM')
"""

_REC_ORACLE = """
    WITH RECURSIVE spans AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS m,
             date_trunc('month', MAX(o_orderdate)) AS last_m
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT o_custkey, m + INTERVAL 1 MONTH, last_m
      FROM spans WHERE m < last_m
    )
    SELECT strftime(m, '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM spans GROUP BY 1
"""


@query(
    "q_recursive_cte",
    oracle=_REC_ORACLE,
    tags=("sql", "recursive-cte", "spark4", "scaffold"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (Spark 4.x): expand each customer's
    [first order month, last order month] span into one row per month
    — the calendar-scaffold pattern behind cohort/retention and
    gap-fill analyses — then count active-span customers per month.
    DuckDB runs the same recursion; months render as strings because
    the two engines materialize DATE differently in pandas (object vs
    datetime64), a hash-kind mismatch strftime sidesteps.

    Iteration-vs-recursion in this repo: the hand-driven loops
    (q_bfs_hops, q_pagerank, connected components) exist because
    arbitrary-depth recursion over BIG fan-out graphs needs per-round
    lineage control (localCheckpoint) and dedup; the engine's
    recursive CTE is the right tool when depth is bounded and row
    multiplicity is linear, as here (span months per customer, depth
    <= ~84 < spark.sql.cteRecursionLevelLimit's default 100). Each
    recursion step is one filter+projection over the previous step's
    rows — no joins, no explosion; the final aggregate is exact ints.
    Measured cost note: wall (~5.5s at BOTH sf0.01 and sf0.1) is
    recursion-STEP scheduling (one stage per month of depth), not
    data — the engine loop, not the operator, is the overhead; the
    hand-driven iterative ops amortize this by doing work per round."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_REC_SPARK_SQL)


@query(
    "q_arrow_scalar_udf",
    oracle="""
    SELECT p_partkey,
           CAST(
             CASE
               WHEN p_size % 2 = 0 THEN CAST(ROUND(p_retailprice * 100) AS BIGINT) * 3
               ELSE CAST(ROUND(p_retailprice * 100) AS BIGINT) + 1000000
             END AS BIGINT) AS adjusted_cents
    FROM part
    WHERE p_size >= 25
    """,
    tags=("python", "udf", "arrow"),
)
def q_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (4.x ``udf(..., useArrow=True)``)
    — the modern replacement for pickled row-at-a-time UDFs: inputs
    arrive as Arrow batches materialized to pandas Series, so the
    Python boundary is paid per-BATCH, not per-row (the plan shows
    ArrowEvalPython, never BatchEvalPython — asserted in
    tests/test_plans.py). The UDF body is pure integer arithmetic on
    pre-computed cents, so the oracle is an exact CASE expression.

    Scale: still the slow path versus built-ins (data crosses the JVM
    <-> Python boundary), but ~10-100x over pickled UDFs; use for
    logic F.* genuinely can't express. The filter on p_size is applied
    BEFORE the UDF column is consumed so pushdown still reaches the
    scan — putting a UDF in the WHERE clause would fence it off."""
    from pyspark.sql.types import LongType

    @F.udf(LongType(), useArrow=True)
    def adjust(cents, size):
        # even sizes: bulk-rate triple; odd: flat 10k surcharge
        return int(cents * 3) if size % 2 == 0 else int(cents + 1_000_000)

    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return p.select(
        "p_partkey",
        adjust(
            F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)"), F.col("p_size")
        ).alias("adjusted_cents"),
    )


@query(
    "q_parameterized_sql",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_high_value,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    WHERE o_totalprice > 400000.0
      AND o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "parameterized", "modern-api"),
)
def q_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL with DataFrame template references (Spark
    3.4+/4.x `spark.sql(query, args=..., **dfs)`): the injection-safe
    front door for user-supplied thresholds — `:cut` and `:since`
    bind as typed literals server-side (never string-spliced), and
    `{orders}` references a DataFrame without registering a temp
    view, so the same parameterized report runs against any loaded
    snapshot. Semantics: high-value order counts and exact cent
    revenue per priority.

    Scale: the bound literals fold into the scan predicate exactly
    like hand-written constants — pushdown and partition pruning see
    `o_totalprice > 400000.0`, so parameterization costs nothing at
    plan time."""
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_high_value,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS revenue_cents
        FROM {orders}
        WHERE o_totalprice > :cut AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        args={"cut": 400000.0, "since": "1995-01-01 00:00:00"},
        orders=o,
    )


@query(
    "q_group_order_all",
    oracle="""
    SELECT * EXCLUDE (sum_price_cents)
    FROM (
      SELECT l_returnflag, l_linestatus,
             EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS ship_year,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS avg_price_cents
      FROM lineitem
      GROUP BY ALL
    )
    ORDER BY ALL
    """,
    tags=("modern", "sql-surface", "group-by-all"),
)
def q_group_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL surface in one query: GROUP BY ALL (keys inferred
    from the non-aggregate select list), ORDER BY ALL (deterministic
    full ordering without naming columns), and star-EXCEPT projection
    (`* EXCEPT (col)` in Spark, `* EXCLUDE (col)` in DuckDB) to drop a
    helper column after it has fed a derived one. These are the
    ergonomics users coming from DuckDB/BigQuery expect; semantically
    the query is still one hash aggregate, so Catalyst plans it
    exactly like its fully-spelled twin — same partial/final pair,
    same pushdown.

    ship_year keeps the key space ~84 groups; the sum is exact cents
    and the average one floor division of non-negative integers."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "eng_lineitem_gba"
    )
    return spark.sql(
        """
        SELECT * EXCEPT (sum_price_cents)
        FROM (
          SELECT l_returnflag, l_linestatus,
                 year(CAST(l_shipdate AS DATE)) AS ship_year,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS sum_price_cents,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      div COUNT(*) AS BIGINT) AS avg_price_cents
          FROM eng_lineitem_gba
          GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


@query(
    "q_sql_scripting",
    oracle="""
    WITH t AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS avg_cents
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           t.avg_cents AS threshold_cents
    FROM orders CROSS JOIN t
    WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > t.avg_cents
    GROUP BY o_orderpriority, t.avg_cents
    """,
    tags=("modern", "sql-scripting", "variables", "spark4"),
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING surface: a BEGIN ... END compound
    statement DECLAREs a variable, SETs it from a scalar subquery
    (the corpus-average order price in exact cents), and the script's
    final SELECT — which becomes the statement's result — filters and
    groups against the variable. Procedural control flow without
    leaving SQL is the migration path for stored-procedure workloads;
    semantically the variable is a 1-row scalar the oracle expresses
    as a CTE cross join, so the script output stays exactly
    hash-checkable.

    Scale: two scans of orders (the scalar pass and the filtered
    aggregate); the variable is driver-held, equivalent to the 1-row
    broadcast stitch pattern."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "eng_orders_script"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE avg_cents BIGINT DEFAULT 0;
          SET avg_cents = (
            SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        div COUNT(*) AS BIGINT)
            FROM eng_orders_script
          );
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_above,
                 avg_cents AS threshold_cents
          FROM eng_orders_script
          WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > avg_cents
          GROUP BY o_orderpriority;
        END
        """
    )


@query(
    "q_collation_lcase",
    oracle="""
    WITH mixed AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN o_orderpriority
               WHEN 1 THEN lower(o_orderpriority)
               WHEN 2 THEN upper(o_orderpriority)
               ELSE lower(o_orderpriority) END AS pri
      FROM orders
    )
    SELECT lower(pri) AS pri_norm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_raw_variants
    FROM mixed GROUP BY lower(pri)
    """,
    tags=("modern", "collation", "spark4", "string-semantics"),
)
def q_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: a deliberately case-mangled
    priority column (deterministic per orderkey) is grouped under the
    UTF8_LCASE collation — comparisons, GROUP BY, and COUNT(DISTINCT)
    all become case-insensitive at the TYPE level, no lower() calls
    sprinkled through the query. The oracle expresses the identical
    semantics the pre-collation way (explicit lower() for grouping,
    raw-variant counting kept case-SENSITIVE on the uncollated
    column), which is exactly the migration this feature kills. The
    output normalizes the key with lower() so both engines emit
    identical strings.

    Scale: collation is a per-comparison property — the plan is the
    same single hash aggregate; collation keys hash their
    case-folded form, so partial aggregation still applies."""
    o = load_table(spark, sf_dir, "orders")
    mixed = o.select(
        "o_orderkey",
        F.expr(
            "CASE o_orderkey % 4"
            " WHEN 0 THEN o_orderpriority"
            " WHEN 1 THEN lower(o_orderpriority)"
            " WHEN 2 THEN upper(o_orderpriority)"
            " ELSE lower(o_orderpriority) END"
        ).alias("pri_raw"),
    )
    collated = mixed.select(
        "pri_raw",
        F.expr("pri_raw COLLATE UTF8_LCASE").alias("pri"),
    )
    return collated.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pri_raw").alias("n_raw_variants"),
    ).select(
        F.lower(F.col("pri")).alias("pri_norm"), "n", "n_raw_variants"
    )


@query(
    "q_null_semantics",
    oracle="""
    WITH n AS (  -- manufacture NULLs deterministically: F-status -> NULL
      SELECT o_orderkey,
             NULLIF(o_orderstatus, 'F') AS st,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(st) AS BIGINT) AS count_col_skips_nulls,
           CAST(COUNT(DISTINCT st) AS BIGINT) AS distinct_skips_nulls,
           CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS null_safe_eq_null,
           CAST(SUM(CASE WHEN st IS DISTINCT FROM 'O'
                    THEN 1 ELSE 0 END) AS BIGINT) AS distinct_from_o,
           CAST(SUM(cents) AS BIGINT) AS sum_skips_nulls,
           CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_cents,
           CAST(COALESCE(MIN(CASE WHEN st IS NULL THEN cents END), -1)
                AS BIGINT) AS min_cents_of_null_status
    FROM n
    """,
    tags=("modern", "null-semantics", "three-valued-logic"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics conformance surface, on NULLs manufactured
    deterministically from clean fixture data (NULLIF on the order
    status, modulo-keyed NULL cents): COUNT(*) vs COUNT(col) vs
    COUNT(DISTINCT col) null-skipping, null-safe equality (Spark <=>
    is exactly IS NOT DISTINCT FROM; the portable spelling is used in
    both engines), IS DISTINCT FROM's three-valued-logic escape
    (NULL rows COUNT as distinct-from-'O' — the trap WHERE st <> 'O'
    silently drops), aggregate null-skipping in SUM/MIN, and a
    guarded MIN over a NULL-keyed slice. One row of integers, every
    cell pinning one rule of the NULL contract — the regression
    canary for any engine or dialect migration.

    Scale: single scan, one conditional-aggregate reduction."""
    o = load_table(spark, sf_dir, "orders")
    n = o.select(
        F.expr("NULLIF(o_orderstatus, 'F')").alias("st"),
        F.expr(
            "CASE WHEN o_orderkey % 3 = 0 THEN NULL"
            " ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END"
        ).alias("cents"),
    )
    return n.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("st").alias("count_col_skips_nulls"),
        F.countDistinct("st").alias("distinct_skips_nulls"),
        F.sum(
            F.expr(
                "CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END"
            )
        ).alias("null_safe_eq_null"),
        F.sum(
            F.expr("CASE WHEN st IS DISTINCT FROM 'O' THEN 1 ELSE 0 END")
        ).alias("distinct_from_o"),
        F.sum("cents").alias("sum_skips_nulls"),
        F.sum(
            F.expr("CASE WHEN cents IS NULL THEN 1 ELSE 0 END")
        ).alias("n_null_cents"),
        F.expr(
            "CAST(COALESCE(MIN(CASE WHEN st IS NULL THEN cents END), -1)"
            " AS BIGINT)"
        ).alias("min_cents_of_null_status"),
    )


@query(
    "q_sql_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("sql", "sql-udf", "spark4", "modern-api"),
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF (Spark 4, SPARK-46246): CREATE TEMPORARY
    FUNCTION whose body is a SQL EXPRESSION, not Python — the function
    is INLINED into the calling plan by Catalyst, so unlike every
    Python UDF it costs nothing: no serialization boundary, full
    predicate pushdown and codegen through the call site. This is the
    right tool for shared business definitions ("what counts as a big
    order") that teams otherwise copy-paste or, worse, ship as Python
    UDFs. The oracle states the inlined expression directly — the
    whole point is that the two are the same plan.

    Scale: zero marginal cost by construction; the check asserts the
    semantic contract, and the plan-lint suite keeps row-Python out of
    hot paths repo-wide."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION is_big_order(price DOUBLE)"
        " RETURNS INT RETURN CASE WHEN price >= 150000 THEN 1 ELSE 0 END"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(is_big_order(o_totalprice)) AS BIGINT) AS n_big
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_session_variables",
    oracle="""
    WITH cut AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  // COUNT(*) AS BIGINT) AS avg_cents
      FROM orders
    )
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_above_avg,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o CROSS JOIN cut
    WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > cut.avg_cents
    GROUP BY o.o_orderstatus
    """,
    tags=("sql", "session-variables", "modern-api"),
)
def q_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 DECLARE VARIABLE / SET VAR) —
    the scripting surface for multi-statement SQL workflows: a
    computed scalar (corpus-average order value, exact cents) is
    stored in a typed session variable by one statement and consumed
    by the next, replacing the temp-view-for-a-scalar dance. The
    oracle inlines the same scalar via a CTE — parity proves the
    variable carried the exact value between statements.

    Scale: SET VAR runs the scalar aggregate once and the main query
    sees a folded constant — the predicate reaches the scan as a
    literal comparison, exactly like a hand-written threshold."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sv_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE avg_cents BIGINT")
    # Exact integer mean (sum of exact cents div count), matching
    # q_sql_scripting: a double AVG is summation-order-dependent, so
    # the rounded threshold could flip by one cent across engines or
    # partition counts and change the boundary rows.
    spark.sql(
        "SET VAR avg_cents = (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100)"
        " AS BIGINT)) div COUNT(*) AS BIGINT) FROM sv_orders)"
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_above_avg,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS revenue_cents
        FROM sv_orders
        WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > avg_cents
        GROUP BY o_orderstatus
        """
    )


@query(
    "q_identifier_clause",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "identifier-clause", "modern-api"),
)
def q_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 4) — injection-safe DYNAMIC
    identifiers: the table and grouping-column names arrive as bound
    string parameters and are resolved as identifiers (not spliced as
    text), the supported way to template "same report, different
    table/column" jobs without SQL-injection surface or f-string
    plans. The oracle states the resolved query directly.

    Scale: identifier binding happens at analysis time; the optimized
    plan is byte-identical to the hand-written query — zero runtime
    cost."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.createOrReplaceTempView("idc_customer")
    n.createOrReplaceTempView("idc_nation")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS n_name,
               COUNT(*) AS n_customers
        FROM IDENTIFIER(:fact) c
        JOIN IDENTIFIER(:dim) n ON n.n_nationkey = c.c_nationkey
        GROUP BY IDENTIFIER(:grp)
        """,
        args={"fact": "idc_customer", "dim": "idc_nation", "grp": "n_name"},
    )


@query(
    "q_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(extract(year FROM CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)
               AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("modern-sql", "group-by-all", "sql-surface"),
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 3.4+/4.x GROUP BY ALL + ORDER BY ALL SQL surface: every
    non-aggregate select item becomes a grouping key and the output
    orders by all columns left-to-right — the de-boilerplated
    exploratory aggregation both modern engines converged on (DuckDB
    pioneered it; the oracle uses the IDENTICAL statement text, which
    is itself the point: the same SQL runs unmodified on both).

    Semantics note: ORDER BY ALL makes the result total-order
    deterministic, and the driver compare is order-insensitive anyway;
    the grouping keys Catalyst infers here are exactly
    (l_returnflag, l_linestatus, ship_year) — asserted equal to the
    explicit GROUP BY in tests.

    Scale: identical plan to the explicit form — one partial->final
    hash aggregate; the sort is |groups| rows."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "eng_lineitem_gba"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(extract(year FROM CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)
               AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM eng_lineitem_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------
# q_observation_metrics (round 8)
# ---------------------------------------------------------------------


@query(
    "q_observation_metrics",
    oracle="""
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_total,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases
    FROM events
    """,
    tags=("modern", "observation", "metrics", "api-surface"),
)
def q_observation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark Observation API (pyspark.sql.Observation): named
    metrics ATTACHED to a DataFrame with df.observe() are harvested as
    a side effect of the job that was running anyway — the
    production pattern for pipeline health counters (row counts,
    money totals, gate rates) WITHOUT a second scan. Here the 'real'
    job is a per-type aggregate; the observed metrics ride it and are
    emitted alongside the job's own output cardinality to prove the
    single pass.

    Exactness: every observed metric is an exact integer aggregate
    (count / cents sum / conditional count).

    Scale: observe() adds a CollectMetrics node — map-side accumulator
    semantics, zero extra shuffle and zero extra scan; the harvesting
    collect() is the |event_types|-row job output (dim-bounded, the
    documented O(1)-collect class)."""
    from pyspark.sql import Observation

    e = load_table(spark, sf_dir, "events")
    obs = Observation("pipeline_metrics")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "cents_total"
        ),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
    )
    per_type = observed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_types = len(per_type.collect())  # triggers the job; metrics land
    m = obs.get
    return spark.createDataFrame(
        [
            (
                n_types,
                int(m["n_rows"]),
                int(m["cents_total"]),
                int(m["n_purchases"]),
            )
        ],
        "n_event_types long, n_rows long, cents_total long, n_purchases long",
    )


# ---------------------------------------------------------------------
# q_transpose (round 8)
# ---------------------------------------------------------------------

_TRANSPOSE_TYPES = ("click", "error", "purchase", "signup", "view")
_TRANSPOSE_METRICS = ("n_rows", "n_users", "cents_total")


def _transpose_oracle() -> str:
    rows = []
    for metric in _TRANSPOSE_METRICS:
        cols = ", ".join(
            f"(SELECT {metric} FROM m WHERE event_type = '{t}') AS {t}"
            for t in _TRANSPOSE_TYPES
        )
        rows.append(f"SELECT '{metric}' AS key, {cols}")
    union = "\n      UNION ALL ".join(rows)
    return f"""
    WITH m AS MATERIALIZED (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_total
      FROM events GROUP BY event_type
    )
    {union}
    """


@query(
    "q_transpose",
    oracle=_transpose_oracle(),
    tags=("modern-api", "transpose", "reshape"),
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0): a per-type metric summary
    (rows = event types, columns = metrics) flipped so metrics become
    rows and event types become columns — the report-orientation
    reshape analysts otherwise hand-roll with unpivot + pivot.
    Complements q_pivot / q_unpivot: transpose is the composition of
    both with the schema derived from the data (column names come from
    the index column's values, here the five stable event types).

    Exactness: counts and cent sums are exact integers; transpose
    itself moves values without arithmetic. The oracle spells out the
    same reshape as one scalar-subquery row per metric.

    Scale: the input to transpose is the |types| x |metrics| summary —
    transpose is a DRIVER-SIDE reshape of an already-reduced frame
    (it collects the index column to name the output columns), so it
    is only ever legal after the aggregate, never on raw data; the
    heavy lifting stays in the one hash aggregate before it."""
    e = load_table(spark, sf_dir, "events")
    m = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias(
                "cents_total"
            ),
        )
        .orderBy("event_type")
    )
    return m.transpose("event_type")
