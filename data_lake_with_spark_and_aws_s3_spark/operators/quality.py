"""Data-quality operators: column profiling and declarative constraint
checks (the Deequ/"expectations" family) plus incremental
materialized-view maintenance — the governance layer a 100 TB lake
runs nightly, expressed as single-pass aggregates.

Profiling: one scan of orders computes null counts, distinct counts,
and min/max per profiled column; the per-column rows come from
unpivoting AFTER aggregation (aggregate first into one wide row, then
stack k columns into k rows), so the table is read ONCE and the
unpivot touches k rows, not n. Everything is count/min/max — exact,
order-independent, cross-engine identical.

Constraints: primary-key uniqueness, non-null, foreign-key coverage,
and domain checks — each a boolean derived from counts in the same
style. The output row is the "quality report" a pipeline gates on.

MV maintenance: the partial-aggregate merge identity
  agg(base UNION delta) == merge(agg(base), agg(delta))
for sum/count (and any commutative monoid). The query splits orders
at a date cutoff into a "yesterday's MV" half and a "new data" half,
aggregates each independently, merges with a second aggregate over
the union of partials, and the oracle computes the full aggregate
directly — parity IS the correctness proof of the maintenance
identity. At 100 TB this is the difference between re-scanning the
table nightly and touching only the new partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")
_MV_CUTOFF = "1999-01-01"


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
    tags=("quality", "profiling"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profile of orders. One wide aggregate row ->
    unpivoted to one row per column; numeric min/max rendered through
    the same VARCHAR cast the oracle uses (DuckDB and Spark print
    doubles/longs identically for these exact values — asserted by
    parity)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stacked}) "
        "AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"
    )


@query(
    "q_dq_constraints",
    oracle=f"""
    SELECT
      CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows,
      (SELECT COUNT(*) = COUNT(DISTINCT o_orderkey) FROM orders) AS pk_unique,
      (SELECT COUNT(*) - COUNT(o_custkey) FROM orders) = 0 AS custkey_complete,
      CAST((SELECT COUNT(*) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL) AS BIGINT) AS fk_orphans,
      (SELECT COUNT(*) FROM orders
       WHERE o_totalprice <= 0 OR o_totalprice > 1000000) = 0 AS price_in_range,
      (SELECT COUNT(*) FROM orders
       WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0 AS status_in_domain
    """,
    tags=("quality", "constraints"),
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint report over orders: PK uniqueness,
    completeness, FK coverage against customer (broadcast anti-join),
    numeric range and categorical domain checks. Each check reduces to
    counts in one pass + one tiny join; the single output row is what
    a pipeline's quality gate asserts on."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    orphans = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    checks = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) == F.countDistinct("o_orderkey")).alias("pk_unique"),
        ((F.count(F.lit(1)) - F.count("o_custkey")) == 0).alias("custkey_complete"),
        (
            F.sum(
                F.when(
                    (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 1_000_000),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("price_in_range"),
        (
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            )
            == 0
        ).alias("status_in_domain"),
    )
    return checks.crossJoin(orphans).select(
        "n_rows", "pk_unique", "custkey_complete", "fk_orphans",
        "price_in_range", "status_in_domain",
    )


@query(
    "q_mv_incremental",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("quality", "materialized-view", "incremental"),
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MV maintenance: base (before {_MV_CUTOFF}) and
    delta (after) are aggregated INDEPENDENTLY, then their partials
    merge with a second aggregate — sum-of-sums, sum-of-counts. The
    oracle aggregates the full table directly, so parity proves the
    merge identity. Decimal sums keep the merge exact regardless of
    partial order ([[oracle-exactness-playbook]])."""
    o = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.col("o_orderstatus").alias("status"),
        ).agg(
            F.count(F.lit(1)).alias("pc"),
            F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("ps"),
        )

    cutoff = F.lit(_MV_CUTOFF).cast("timestamp")
    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("yr", "status")
        .agg(
            F.sum("pc").alias("n_orders"),
            F.sum("ps").cast("decimal(38,2)").cast("double").alias("revenue"),
        )
    )


@query(
    "q_winsorize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS r,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM documents
    ), cuts AS (
      SELECT lang,
             MIN(CASE WHEN r = (5 * n + 99) // 100 THEN n_chars END) AS p05,
             MIN(CASE WHEN r = (95 * n + 99) // 100 THEN n_chars END) AS p95
      FROM ranked GROUP BY lang
    )
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           c.p05, c.p95,
           CAST(least(greatest(d.n_chars, c.p05), c.p95) AS BIGINT) AS w_chars,
           d.n_chars < c.p05 AS clipped_low,
           d.n_chars > c.p95 AS clipped_high
    FROM documents d JOIN cuts c USING (lang)
    """,
    tags=("quality", "winsorize", "robust-stats", "llm-pipeline"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each document's length at its language's
    exact [p05, p95] percentiles (percentile_disc semantics — the
    value at rank ceil(q*n), computed with INTEGER ceiling arithmetic
    (q*n + 99) div 100 so both engines pick the identical rank; no
    float percentile estimation anywhere). The cutoffs reduce to
    |langs| rows and broadcast back onto the corpus — the standard
    outlier-robust preprocessing gate before length-sensitive
    training-data statistics."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    w_rank = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_all = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w_rank).cast("long").alias("r"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    cuts = ranked.groupBy("lang").agg(
        F.min(
            F.when(
                F.col("r") == F.expr("(5 * n + 99) div 100"), F.col("n_chars")
            )
        ).alias("p05"),
        F.min(
            F.when(
                F.col("r") == F.expr("(95 * n + 99) div 100"), F.col("n_chars")
            )
        ).alias("p95"),
    )
    return d.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        "p05",
        "p95",
        F.least(F.greatest(F.col("n_chars"), F.col("p05")), F.col("p95")).alias(
            "w_chars"
        ),
        (F.col("n_chars") < F.col("p05")).alias("clipped_low"),
        (F.col("n_chars") > F.col("p95")).alias("clipped_high"),
    )


@query(
    "q_table_checksums",
    oracle="""
    WITH rowh AS (
      SELECT c_custkey // 100 AS bucket,
             (
               (CAST(0 AS BIGINT) * 16 + instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
               + instr('0123456789abcdef', substr(h, 2, 1)) - 1
             ) * 16 + instr('0123456789abcdef', substr(h, 3, 1)) - 1 AS hv
      FROM (
        SELECT c_custkey,
               md5(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
                   c_mktsegment || '|' ||
                   CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR)) AS h
        FROM customer
      )
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(CAST(hv AS BIGINT)) AS BIGINT) AS xor_checksum,
           CAST(SUM(hv) AS BIGINT) AS sum_checksum
    FROM rowh GROUP BY bucket
    """,
    tags=("quality", "checksum", "anti-entropy", "governance"),
)
def q_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key-range table checksums — the anti-entropy pattern for
    validating replicated/migrated tables WITHOUT moving the data:
    each side computes (bucket, row count, order-independent XOR and
    SUM of a canonical row digest) and only the tiny checksum tables
    cross the wire; a mismatched bucket pinpoints which key range to
    re-sync. XOR catches any single-row difference, SUM catches the
    XOR blind spot (duplicated-row pairs); count catches cardinality.
    The row digest canonicalizes floats to cent-integers first (the
    same rule any cross-engine comparison needs).

    Scale: one scan, map-side partial aggregation collapses each task
    to <= n_buckets rows — the shuffle is the checksum table, not the
    data. The md5-hex-digit integer math is the engine-portable hash
    from [[oracle-exactness-playbook]] (llm_pipeline._hex_val_sql,
    3 digits here so SUM stays far from BIGINT bounds at any sf)."""
    from .llm_pipeline import _hex_val_sql

    c = load_table(spark, sf_dir, "customer")
    digest = (
        "md5(CAST(c_custkey AS STRING) || '|' || c_name || '|' || "
        "c_mktsegment || '|' || "
        "CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS STRING))"
    )
    rowh = c.select(
        F.expr("c_custkey div 100").alias("bucket"),
        F.expr(_hex_val_sql(digest, 3)).alias("hv"),
    )
    return rowh.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("hv").alias("xor_checksum"),
        F.sum("hv").alias("sum_checksum"),
    )


@query(
    "q_entropy_profile",
    oracle="""
    WITH cv AS (
      SELECT 'lang' AS col_name, lang AS value FROM documents
      UNION ALL
      SELECT 'source' AS col_name, source AS value FROM documents
    ),
    counts AS (
      SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS c
      FROM cv GROUP BY 1, 2
    ),
    prof AS (
      SELECT col_name,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS max_c,
             CAST(SUM(c * c) AS BIGINT) AS sum_c2,
             CAST(SUM(CAST(ROUND(c * ln(c) * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_clnc_mnats
      FROM counts GROUP BY 1
    )
    SELECT col_name,
           n_rows,
           n_distinct,
           CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
           CAST(n_rows * n_rows - sum_c2 AS DOUBLE)
             / CAST(n_rows * n_rows AS DOUBLE) AS gini_impurity,
           CAST(ROUND(ln(n_rows) * 1000000) AS BIGINT)
             - sum_clnc_mnats // n_rows AS entropy_mnats
    FROM prof
    """,
    tags=("quality", "profiling", "entropy", "llm-pipeline"),
)
def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy / concentration profile of the categorical
    columns a curation pipeline balances on (documents.lang,
    documents.source): per column, row count, distinct count, top
    value share, Gini impurity, and entropy in integer micro-nats.

    Cross-engine exactness (see [[oracle-exactness-playbook]]): counts
    are exact ints; max_share and gini_impurity are a SINGLE IEEE
    division of exactly-representable integers (identical on any IEEE
    engine, no sum-order dependence). Entropy needs ln, whose libm may
    differ by an ulp between the JVM and DuckDB, and a double SUM of
    ln-terms would also be order-dependent — so each value's c*ln(c)
    term is quantized to micro-nats (an exactly-representable integer
    double < 2^53) BEFORE an exact integer sum, and the identity
    H = ln(n) - (1/n)*sum(c*ln c) is finished in integer micro-nat
    arithmetic (truncating div; operands non-negative so Spark `div`
    == DuckDB `//`). Residual risk is a per-term half-ulp rounding
    boundary, probability ~1e-10 per distinct value.

    Scale: ONE scan of documents — the k profiled columns are stacked
    map-side via explode(array(struct...)), so the plan is
    scan -> explode (k×n rows) -> two hash aggregates whose outputs
    are |values| then k rows. Entropy/gini per partition-key is the
    standard skew detector before a big join: a column with max_share
    near 1 at 100 TB is a salting candidate."""
    docs = load_table(spark, sf_dir, "documents")
    cv = docs.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lang").alias("col_name"), F.col("lang").alias("value")
                ),
                F.struct(
                    F.lit("source").alias("col_name"), F.col("source").alias("value")
                ),
            )
        ).alias("cv")
    ).select("cv.*")
    counts = cv.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("c"))
    prof = counts.groupBy("col_name").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_c"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")) * F.lit(1_000_000)).cast("long")
        ).alias("sum_clnc_mnats"),
    )
    return prof.select(
        "col_name",
        "n_rows",
        "n_distinct",
        (F.col("max_c").cast("double") / F.col("n_rows").cast("double")).alias(
            "max_share"
        ),
        (
            (F.col("n_rows") * F.col("n_rows") - F.col("sum_c2")).cast("double")
            / (F.col("n_rows") * F.col("n_rows")).cast("double")
        ).alias("gini_impurity"),
        (
            F.round(F.log(F.col("n_rows")) * F.lit(1_000_000)).cast("long")
            - F.expr("sum_clnc_mnats div n_rows")
        ).alias("entropy_mnats"),
    )


_PSI_BAND = 20000  # price band width (dollars) for the drift buckets


@query(
    "q_psi_drift",
    oracle=f"""
    WITH a AS (
      SELECT CAST(FLOOR(o_totalprice / {_PSI_BAND}.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_a
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
    ),
    b AS (
      SELECT CAST(FLOOR(o_totalprice / {_PSI_BAND}.0) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM orders WHERE year(o_orderdate) = 1998 GROUP BY 1
    ),
    t AS (
      SELECT (SELECT SUM(n_a) FROM a) AS tot_a, (SELECT SUM(n_b) FROM b) AS tot_b
    )
    SELECT a.bucket, a.n_a, b.n_b,
           CAST(ROUND(1000000
                * (CAST(a.n_a AS DOUBLE) / CAST(t.tot_a AS DOUBLE)
                   - CAST(b.n_b AS DOUBLE) / CAST(t.tot_b AS DOUBLE))
                * ln((CAST(a.n_a AS DOUBLE) * CAST(t.tot_b AS DOUBLE))
                     / (CAST(b.n_b AS DOUBLE) * CAST(t.tot_a AS DOUBLE))))
             AS BIGINT) AS contrib_micro
    FROM a JOIN b USING (bucket) CROSS JOIN t
    """,
    tags=("quality", "drift", "psi", "monitoring"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two periods' order-price
    distributions (1997 vs 1998) — the standard data-drift monitor a
    production pipeline runs before trusting a new batch: per price
    band, contribution (p_a - p_b) * ln(p_a / p_b), in integer MICRO
    units. PSI > 0.25 conventionally flags a shifted distribution;
    buckets observed in only one period are excluded by the inner join
    (the caller sees them as missing bucket rows — at 100 TB you'd
    smooth instead, same plan shape).

    Exactness: shares are single IEEE divisions of exact counts; the
    ln argument is arranged as ONE division of exact integer products
    (n_a * tot_b) / (n_b * tot_a) — all < 2^53 at every shipped SF —
    and each bucket's term is micro-quantized before any reader sums
    them ([[oracle-exactness-playbook]]).

    Scale: two filtered aggregates over the same scan + a tiny bucket
    join; totals broadcast. Cost is one pass over each period
    partition — the cheapest possible drift check."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.expr(f"CAST(FLOOR(o_totalprice / {_PSI_BAND}.0) AS BIGINT)").alias("bucket")
    a = (
        o.filter(F.year("o_orderdate") == 1997)
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        o.filter(F.year("o_orderdate") == 1998)
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    tot = (
        a.agg(F.sum("n_a").alias("tot_a"))
        .crossJoin(b.agg(F.sum("n_b").alias("tot_b")))
    )
    contrib = (
        "CAST(ROUND(1000000"
        " * (CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE)"
        "    - CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE))"
        " * ln((CAST(n_a AS DOUBLE) * CAST(tot_b AS DOUBLE))"
        "      / (CAST(n_b AS DOUBLE) * CAST(tot_a AS DOUBLE))))"
        " AS BIGINT)"
    )
    return (
        a.join(b, "bucket")
        .crossJoin(F.broadcast(tot))
        .select("bucket", "n_a", "n_b", F.expr(contrib).alias("contrib_micro"))
    )


@query(
    "q_benford_digits",
    oracle="""
    WITH obs AS (
      SELECT CAST(LEFT(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                            AS VARCHAR), 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT digit, obs,
             CAST(SUM(obs) OVER () AS BIGINT) AS n,
             CAST(ROUND(1000000 * ln(1.0 + 1.0 / digit) / ln(10.0))
                  AS BIGINT) AS exp_ppm
      FROM obs
    )
    SELECT digit, obs, exp_ppm,
           CAST((1000000 * obs) // n AS BIGINT) AS obs_ppm,
           CAST((CAST(1000000 * obs - exp_ppm * n AS HUGEINT)
                 * (1000000 * obs - exp_ppm * n))
                // (CAST(exp_ppm AS HUGEINT) * n * 1000000)
                AS BIGINT) AS chi_term_micro
    FROM g
    """,
    tags=("quality", "benford", "distribution-test", "dq"),
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic fabricated-data / unit-mixup detector: observed leading-
    digit counts vs the log-law expectation P(d) = log10(1 + 1/d),
    with a per-digit Pearson chi-square contribution. The digit comes
    from the cent-scaled integer's decimal string (identical in both
    engines — no float log tricks), the expectation is quantized once
    to ppm, and the chi term is cross-multiplied into exact integers:
    (1e6*obs - exp_ppm*n)^2 / (exp_ppm * n * 1e6) in truncating
    micro-counts.

    Scale: one 9-row hash aggregate over the scan; everything after
    is per-digit scalar arithmetic and a window over 9 rows."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.expr(
            "CAST(LEFT(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            " AS STRING), 1) AS BIGINT)"
        ).alias("digit")
    ).agg(F.count(F.lit(1)).alias("obs"))
    g = obs.select(
        "digit",
        "obs",
        F.expr("CAST(SUM(obs) OVER () AS BIGINT)").alias("n"),
        F.expr(
            "CAST(ROUND(1000000 * ln(1.0 + 1.0 / digit) / ln(10.0))"
            " AS BIGINT)"
        ).alias("exp_ppm"),
    )
    return g.select(
        "digit",
        "obs",
        "exp_ppm",
        F.expr("CAST((1000000 * obs) div n AS BIGINT)").alias("obs_ppm"),
        F.expr(
            "CAST((CAST(1000000 * obs - exp_ppm * n AS DECIMAL(38,0))"
            " * (1000000 * obs - exp_ppm * n))"
            " div (CAST(exp_ppm AS DECIMAL(38,0)) * n * 1000000)"
            " AS BIGINT)"
        ).alias("chi_term_micro"),
    )


@query(
    "q_equi_depth_stats",
    oracle="""
    WITH h AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY cents
    ),
    cum AS MATERIALIZED (
      SELECT cents, cnt,
             CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS cw,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tw
      FROM h
    ),
    bounds AS (
      SELECT pct AS bucket,
             MIN(CASE WHEN 8 * cw >= pct * tw THEN cents END) AS upper_cents
      FROM cum
      CROSS JOIN (SELECT CAST(unnest([1,2,3,4,5,6,7,8]) AS BIGINT) AS pct)
      GROUP BY pct
    ),
    assigned AS (
      SELECT c.cents, MAX(c.cnt) AS cnt, MIN(b.bucket) AS bucket
      FROM cum c JOIN bounds b ON c.cents <= b.upper_cents
      GROUP BY c.cents
    )
    SELECT a.bucket,
           CAST(b.upper_cents AS BIGINT) AS upper_cents,
           CAST(SUM(a.cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS ndv
    FROM assigned a JOIN bounds b ON b.bucket = a.bucket
    GROUP BY a.bucket, b.upper_cents
    """,
    tags=("quality", "cbo-stats", "equi-depth-histogram", "profiling"),
)
def q_equi_depth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of o_totalprice — what ANALYZE TABLE ...
    COMPUTE STATISTICS FOR COLUMNS builds for the cost-based
    optimizer: 8 buckets whose upper boundaries are exact order
    statistics from the cent-histogram rank trick (no sort of raw
    rows), with per-bucket row count and NDV. Equi-depth (not
    equi-width, q_histogram) is what selectivity estimation needs:
    every bucket carries ~1/8 of the mass, so a range predicate's
    selectivity reads off bucket fractions.

    Scale: the rank trick runs on the |distinct cents| histogram,
    not the raw table; the boundary grid is a constant 8-row
    broadcast (allowlisted). The one running-sum window over the
    value histogram is the same shape every CBO stats build pays;
    at 100 TB you'd pre-shard it two-level (per-range partials, then
    merge), which composes from this exact plan."""
    o = load_table(spark, sf_dir, "orders")
    h = (
        o.select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            )
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = h.select(
        "cents",
        "cnt",
        F.expr("CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT)").alias("cw"),
        F.expr("CAST(SUM(cnt) OVER () AS BIGINT)").alias("tw"),
    ).localCheckpoint()
    grid = spark.createDataFrame([(i,) for i in range(1, 9)], "bucket long")
    bounds = (
        cum.crossJoin(F.broadcast(grid))
        .groupBy("bucket")
        .agg(
            F.expr(
                "MIN(CASE WHEN 8 * cw >= bucket * tw THEN cents END)"
            ).alias("upper_cents")
        )
    )
    assigned = (
        cum.join(
            F.broadcast(bounds),
            F.col("cents") <= F.col("upper_cents"),
        )
        .groupBy("cents")
        .agg(F.max("cnt").alias("cnt"), F.min("bucket").alias("bucket"))
    )
    return (
        assigned.join(F.broadcast(bounds), "bucket")
        .groupBy("bucket", "upper_cents")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("ndv"),
        )
        .select("bucket", "upper_cents", "n_rows", "ndv")
    )


@query(
    "q_merkle_diff",
    oracle="""
    WITH rows_ab AS (
      SELECT o_orderkey AS k,
             o_orderkey // 1000 AS leaf,
             o_orderkey // 32000 AS super,
             CASE WHEN o_orderkey = 4967 THEN 1 ELSE 0 END AS deleted,
             md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR))
               AS ha,
             md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      + CASE WHEN o_orderkey % 1931 = 0 AND o_orderkey < 6000
                             THEN 1 ELSE 0 END
                      AS VARCHAR)) AS hb
      FROM orders
    ),
    hv AS (
      SELECT leaf, super, deleted,
             ((CAST(0 AS BIGINT) * 16 + instr('0123456789abcdef', substr(ha, 1, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(ha, 2, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(ha, 3, 1)) - 1 AS hva,
             ((CAST(0 AS BIGINT) * 16 + instr('0123456789abcdef', substr(hb, 1, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(hb, 2, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(hb, 3, 1)) - 1 AS hvb
      FROM rows_ab
    ),
    leaves AS (
      SELECT leaf, super,
             CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(COALESCE(bit_xor(hva), 0) AS BIGINT) AS xor_a,
             CAST(SUM(1 - deleted) AS BIGINT) AS n_b,
             CAST(COALESCE(bit_xor(CASE WHEN deleted = 0 THEN hvb END), 0)
                  AS BIGINT) AS xor_b
      FROM hv GROUP BY leaf, super
    ),
    supers AS (
      SELECT super,
             CAST(bit_xor(xor_a) AS BIGINT) AS sx_a,
             CAST(bit_xor(xor_b) AS BIGINT) AS sx_b,
             CAST(SUM(n_a) AS BIGINT) AS sn_a,
             CAST(SUM(n_b) AS BIGINT) AS sn_b,
             CAST(COUNT(*) AS BIGINT) AS n_leaves
      FROM leaves GROUP BY super
    ),
    dirty_supers AS (
      SELECT * FROM supers WHERE sx_a <> sx_b OR sn_a <> sn_b
    ),
    probed AS (  -- round 2 of the protocol: leaves under dirty supers
      SELECT l.* FROM leaves l JOIN dirty_supers d ON d.super = l.super
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM supers) AS total_supers,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM dirty_supers) AS dirty_supers,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM leaves) AS total_leaves,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM probed) AS leaves_probed
    )
    SELECT p.leaf, p.super, p.n_a, p.n_b, p.xor_a, p.xor_b,
           s.total_supers, s.dirty_supers, s.total_leaves, s.leaves_probed,
           CAST((1000000 * s.leaves_probed) // s.total_leaves AS BIGINT)
             AS probe_ppm
    FROM probed p CROSS JOIN stats s
    WHERE p.xor_a <> p.xor_b OR p.n_a <> p.n_b
    """,
    tags=("quality", "merkle", "anti-entropy", "replication"),
)
def q_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level Merkle anti-entropy diff between a table and a
    deliberately diverged replica (orderkeys 0/1931/3862/5793 have
    their price off by one cent; orderkey 4967 is missing — a FIXED absolute
    divergence set, present at every scale factor, so localization
    stays sparse as the tree grows —
    the mutation is an expression, so one scan feeds both sides):
    leaf = 1000-key range with (count, XOR-of-row-digests), super =
    32 leaves with XORed leaf hashes. The protocol compares the super
    level first, probes leaves ONLY under dirty supers, and returns
    the dirty leaves plus the localization stats — probe_ppm is the
    fraction of leaf hashes that had to cross the wire, the number
    that makes hierarchical anti-entropy worth its tree (Cassandra /
    Dynamo repair, DVC/lakeFS content trees).

    Extends q_table_checksums (flat buckets): same portable md5-digit
    row digest, plus the hierarchy and the simulated divergence.

    Scale: one scan -> leaf aggregate (map-side partials, output =
    |leaves| rows) -> super aggregate over |leaves| rows; the dirty
    join is leaf-metadata x dirty-super-metadata. Data never moves."""
    from .llm_pipeline import _hex_val_sql

    o = load_table(spark, sf_dir, "orders")
    ha = (
        "md5(CAST(o_orderkey AS STRING) || '|' || "
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING))"
    )
    hb = (
        "md5(CAST(o_orderkey AS STRING) || '|' || "
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
        " + CASE WHEN o_orderkey % 1931 = 0 AND o_orderkey < 6000"
        " THEN 1 ELSE 0 END AS STRING))"
    )
    hv = o.select(
        F.expr("o_orderkey div 1000").alias("leaf"),
        F.expr("o_orderkey div 32000").alias("super"),
        F.expr("CASE WHEN o_orderkey = 4967 THEN 1 ELSE 0 END").alias(
            "deleted"
        ),
        F.expr(_hex_val_sql(ha, 3)).alias("hva"),
        F.expr(_hex_val_sql(hb, 3)).alias("hvb"),
    )
    leaves = hv.groupBy("leaf", "super").agg(
        F.count(F.lit(1)).alias("n_a"),
        F.coalesce(F.bit_xor("hva"), F.lit(0)).alias("xor_a"),
        F.sum(1 - F.col("deleted")).alias("n_b"),
        F.coalesce(
            F.bit_xor(F.expr("CASE WHEN deleted = 0 THEN hvb END")), F.lit(0)
        ).alias("xor_b"),
    ).localCheckpoint(eager=True)  # both tree levels read this
    supers = leaves.groupBy("super").agg(
        F.bit_xor("xor_a").alias("sx_a"),
        F.bit_xor("xor_b").alias("sx_b"),
        F.sum("n_a").alias("sn_a"),
        F.sum("n_b").alias("sn_b"),
        F.count(F.lit(1)).alias("n_leaves"),
    )
    dirty_supers = supers.filter(
        (F.col("sx_a") != F.col("sx_b")) | (F.col("sn_a") != F.col("sn_b"))
    )
    probed = leaves.join(
        F.broadcast(dirty_supers.select("super")), "super"
    )
    stats = (
        supers.agg(
            F.count(F.lit(1)).alias("total_supers"),
            F.sum(
                F.expr(
                    "CASE WHEN sx_a <> sx_b OR sn_a <> sn_b THEN 1 ELSE 0 END"
                )
            ).alias("dirty_supers"),
        )
        .crossJoin(leaves.agg(F.count(F.lit(1)).alias("total_leaves")))
        .crossJoin(probed.agg(F.count(F.lit(1)).alias("leaves_probed")))
    )
    return (
        probed.filter(
            (F.col("xor_a") != F.col("xor_b")) | (F.col("n_a") != F.col("n_b"))
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "leaf",
            "super",
            "n_a",
            "n_b",
            "xor_a",
            "xor_b",
            "total_supers",
            "dirty_supers",
            "total_leaves",
            "leaves_probed",
            F.expr(
                "CAST((1000000 * leaves_probed) div total_leaves AS BIGINT)"
            ).alias("probe_ppm"),
        )
    )


@query(
    "q_freshness_sla",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS watermark FROM events),
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(ts) AS last_ts
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, last_ts,
           CAST(date_diff('second', last_ts, watermark) AS BIGINT)
             AS lag_seconds,
           date_diff('second', last_ts, watermark) <= 86400 AS within_sla
    FROM per_type CROSS JOIN mx
    """,
    tags=("quality", "freshness", "sla", "monitoring"),
)
def q_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-freshness audit: each event type's last-seen
    timestamp against the table-wide high watermark, with the lag in
    whole seconds and a 24h SLA verdict — the staleness monitor every
    ingestion pipeline pages on (a stream that silently stops emits
    no errors, only growing lag; this query is how you notice).
    Second-truncated lag keeps the surface integer-exact across
    engines regardless of sub-second timestamp encoding.

    Scale: one aggregate to |types| rows; the watermark is a 1-row
    broadcast stitch (allowlisted). At 100 TB the same query runs on
    partition-level max(ts) from table-format manifests instead of a
    scan — the shape is identical."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("watermark"))
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    return per_type.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "n_events",
        "last_ts",
        F.expr(
            "CAST(unix_seconds(CAST(watermark AS TIMESTAMP))"
            " - unix_seconds(CAST(last_ts AS TIMESTAMP)) AS BIGINT)"
        ).alias("lag_seconds"),
        F.expr(
            "(unix_seconds(CAST(watermark AS TIMESTAMP))"
            " - unix_seconds(CAST(last_ts AS TIMESTAMP))) <= 86400"
        ).alias("within_sla"),
    )


@query(
    "q_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (  -- exact LOWER median by rank (no interpolation anywhere)
      SELECT event_type, n AS med_n
      FROM (
        SELECT event_type, n,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM daily
      ) WHERE rn = (cnt + 1) // 2
    ),
    dev AS (
      SELECT d.event_type, d.d, d.n, m.med_n,
             ABS(d.n - m.med_n) AS adev
      FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    mad AS (
      SELECT event_type, adev AS mad_n
      FROM (
        SELECT event_type, adev, d,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY adev, d) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM dev
      ) WHERE rn = (cnt + 1) // 2
    )
    SELECT dev.event_type, CAST(dev.d AS TIMESTAMP) AS day, dev.n,
           dev.med_n, mad.mad_n,
           CAST(CASE WHEN mad.mad_n > 0
                THEN (1000 * ABS(dev.n - dev.med_n)) // mad.mad_n
                ELSE 0 END AS BIGINT) AS robust_z_milli,
           CASE WHEN mad.mad_n > 0
                THEN (1000 * ABS(dev.n - dev.med_n)) // mad.mad_n > 5000
                ELSE FALSE END AS anomalous
    FROM dev JOIN mad ON mad.event_type = dev.event_type
    """,
    tags=("quality", "anomaly", "volume", "monitoring"),
)
def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-volume anomaly screen: each (event_type, day) row
    count is scored by its robust z — |n - median| / MAD in exact
    milli-units — against a 5.0 threshold. Median/MAD instead of
    mean/stddev so one crazy day cannot hide itself by inflating its
    own baseline (the classic failure of z-score volume alerts).
    Complements q_freshness_sla: freshness catches the stream that
    stops, this catches the stream that triples. Both medians are the
    exact LOWER order statistic via a rank window with a (value, day)
    tiebreak — engine MEDIAN interpolates even-count middles and the
    two engines round the .5 differently, so interpolation is banned
    from the hashed surface; the guard returns 0 / FALSE when MAD is
    0.

    Scale: one (type, day) hash aggregate (map-side partials);
    medians/MADs run over |types| x |days| metadata rows; the score
    join is metadata-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)

    def lower_median(df, val, order_tiebreak, out):
        w = Window.partitionBy("event_type").orderBy(val, order_tiebreak)
        wc = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(wc))
            .filter(F.expr("rn = (cnt + 1) div 2"))
            .select("event_type", F.col(val).alias(out))
        )

    med = lower_median(daily, "n", "d", "med_n")
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "d",
        "n",
        "med_n",
        F.abs(F.col("n") - F.col("med_n")).alias("adev"),
    )
    mad = lower_median(dev, "adev", "d", "mad_n")
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.col("d").cast("timestamp").alias("day"),
        "n",
        "med_n",
        "mad_n",
        F.expr(
            "CAST(CASE WHEN mad_n > 0"
            " THEN (1000 * ABS(n - med_n)) div mad_n ELSE 0 END AS BIGINT)"
        ).alias("robust_z_milli"),
        F.expr(
            "CASE WHEN mad_n > 0"
            " THEN (1000 * ABS(n - med_n)) div mad_n > 5000"
            " ELSE FALSE END"
        ).alias("anomalous"),
    )


@query(
    "q_ivm_join_delta",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           CAST(month(o.o_orderdate) AS BIGINT) AS mo,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2)))
                     AS DECIMAL(38,2)) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    tags=("quality", "materialized-view", "incremental", "ivm", "join"),
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN — the delta algebra
    q_mv_incremental's aggregate-merge does not cover: with both
    sides receiving deltas (orders split on o_orderdate, lineitem on
    l_shipdate at the same cutoff), the view delta is EXACTLY
    dQ = (dA join B_old) U (A_old join dB) U (dA join dB),
    so the maintained view is the old materialization unioned with
    three delta joins — never a full re-join. The Spark side BUILDS
    the view that way (the old half is localCheckpoint-materialized,
    standing in for the stored MV) and the oracle recomputes the full
    join from scratch: hash equality IS the proof that the delta
    algebra loses and double-counts nothing. Decimal revenue keeps
    the union-of-partials exact regardless of order.

    Scale: each delta join shuffles only its delta side against the
    (bucketed, in production) other side — the point of IVM at 100 TB
    is that daily maintenance pays O(|delta| join) not O(|view|);
    the three delta joins all key on orderkey, so one partitioning
    serves all of them."""
    cutoff = "1997-01-01"
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_old = o.filter(F.col("o_orderdate") < cutoff)
    o_new = o.filter(F.col("o_orderdate") >= cutoff)
    l_old = li.filter(F.col("l_shipdate") < cutoff)
    l_new = li.filter(F.col("l_shipdate") >= cutoff)
    cols = [
        "o_orderdate",
        "l_extendedprice",
    ]

    def j(a: DataFrame, b: DataFrame) -> DataFrame:
        return a.join(b, a["o_orderkey"] == b["l_orderkey"]).select(*cols)

    # the stored view: materialized once (stands in for the MV table)
    view_old = j(o_old, l_old).localCheckpoint(eager=False)
    delta = (
        j(o_new, l_old)
        .unionAll(j(o_old, l_new))
        .unionAll(j(o_new, l_new))
    )
    maintained = view_old.unionAll(delta)
    return maintained.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2)))"
            " AS DECIMAL(38,2)) AS DOUBLE)"
        ).alias("revenue"),
    )
