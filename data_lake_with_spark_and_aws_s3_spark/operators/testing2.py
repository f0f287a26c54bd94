"""Hypothesis-testing battery, round 8 session 3 — the outlier /
repeated-measures / stratified-table rows that finish the classical
testing shelf started in testing.py: Cochran's Q (k related binary
raters), Grubbs' max-normed-residual and Dixon's Q (single-outlier
screens a monitoring pipeline runs on a daily revenue series before
trusting a day's numbers), plus the later session-3 additions
registered below.

Cross-engine exactness (the [[oracle-exactness-playbook]] rules):
every statistic is a ratio of EXACT integer moments (cents / counts /
ranks), quantized by ONE truncating integer division (`div` /
DuckDB `//`) into milli/micro units, so the entire hashed surface is
integers — no libm, no float accumulation order, identical on any
engine.

Scale: every query is scan -> one or two hash aggregates (the daily
collapse is a ~2.4k-group aggregate regardless of SF — calendar-
bounded, so the post-collapse stage is O(days), not O(rows)); the
Dixon extremes use TakeOrderedAndProject (per-partition heaps, no
global sort, no keyless window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

# ---------------------------------------------------------------------
# q_cochran_q (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_cochran_q",
    oracle="""
    WITH votes AS (
      SELECT doc_id,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       t -> t <> '')) BETWEEN 50 AND 100000
                  THEN 1 ELSE 0 END AS v1,
             CASE WHEN len(list_distinct(list_filter(
                      string_split(text, ' '),
                      t -> t IN ('the','and','of','to','a','in','is'))))
                       >= 2
                  THEN 1 ELSE 0 END AS v2,
             CASE WHEN 5 * len(list_filter(string_split(text, ' '),
                                           t -> regexp_matches(t, '[a-z]')))
                       >= 4 * len(list_filter(string_split(text, ' '),
                                              t -> t <> ''))
                  THEN 1 ELSE 0 END AS v3
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(v1) AS HUGEINT) AS c1,
             CAST(SUM(v2) AS HUGEINT) AS c2,
             CAST(SUM(v3) AS HUGEINT) AS c3,
             CAST(SUM(v1 + v2 + v3) AS HUGEINT) AS sr,
             CAST(SUM((v1 + v2 + v3) * (v1 + v2 + v3)) AS HUGEINT) AS srr
      FROM votes
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
           CAST(c3 AS BIGINT) AS c3,
           CAST((1000 * 2 * (3 * (c1*c1 + c2*c2 + c3*c3) - sr * sr))
                // (3 * sr - srr) AS BIGINT) AS q_milli
    FROM agg
    """,
    tags=("testing", "cochran-q", "statistics", "rater-agreement"),
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test for k=3 related binary treatments — do the
    three deterministic quality gates (word-count, stopword,
    alpha-ratio; the q_fleiss_kappa battery) pass DIFFERENT fractions
    of the same documents? The repeated-measures companion to
    q_mcnemar_test (k=2) and the significance test behind
    q_cronbach_alpha's reliability read: Q = (k-1)(k*sum Cj^2 - T^2)
    / (k*T - sum Ri^2) with column totals Cj, row totals Ri, grand
    total T — every term an integer, so q_milli is one truncating
    division.

    Scale: one map-side projection of the three gate votes, one 1-row
    moment aggregate — six longs per partition cross the wire."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_words = F.size(toks)
    v1 = F.when(n_words.between(50, 100000), 1).otherwise(0)
    stop = F.array_distinct(
        F.filter(
            toks,
            lambda t: t.isin("the", "and", "of", "to", "a", "in", "is"),
        )
    )
    v2 = F.when(F.size(stop) >= 2, 1).otherwise(0)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    v3 = F.when(5 * n_alpha >= 4 * n_words, 1).otherwise(0)
    votes = d.select(v1.alias("v1"), v2.alias("v2"), v3.alias("v3"))
    agg = votes.agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(v1) AS DECIMAL(38,0))").alias("c1"),
        F.expr("CAST(SUM(v2) AS DECIMAL(38,0))").alias("c2"),
        F.expr("CAST(SUM(v3) AS DECIMAL(38,0))").alias("c3"),
        F.expr("CAST(SUM(v1 + v2 + v3) AS DECIMAL(38,0))").alias("sr"),
        F.expr(
            "CAST(SUM((v1 + v2 + v3) * (v1 + v2 + v3)) AS DECIMAL(38,0))"
        ).alias("srr"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("c1").cast("long").alias("c1"),
        F.col("c2").cast("long").alias("c2"),
        F.col("c3").cast("long").alias("c3"),
        F.expr(
            "CAST((1000 * 2 * (3 * (c1*c1 + c2*c2 + c3*c3) - sr * sr))"
            " div (3 * sr - srr) AS BIGINT)"
        ).alias("q_milli"),
    )


# ---------------------------------------------------------------------
# q_grubbs_test (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_grubbs_test",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS HUGEINT) AS cents
      FROM orders GROUP BY o_orderdate
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(cents) AS sx, SUM(cents * cents) AS sxx,
             MAX(cents) AS mx, MIN(cents) AS mn
      FROM daily
    ),
    dev AS (
      SELECT n, sx, sxx,
             GREATEST(n * mx - sx, sx - n * mn) AS maxdev,
             CASE WHEN n * mx - sx >= sx - n * mn THEN mx ELSE mn END
               AS outlier
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(outlier AS BIGINT) AS outlier_cents,
           CAST((1000000 * (n - 1) * maxdev * maxdev)
                // (n * (n * sxx - sx * sx)) AS BIGINT) AS g2_micro
    FROM dev
    """,
    tags=("testing", "grubbs", "outlier", "statistics"),
)
def q_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-normed-residual outlier test on the daily revenue
    series — the screen a monitoring pipeline runs before trusting a
    day's numbers: G = max|x - mean| / s. Emitted SQUARED in micro
    units so it stays rational: G^2 = (n-1)(n*x* - Sx)^2 /
    (n(n*Sxx - Sx^2)) with x* the farther extreme — every term an
    exact integer in cents, one truncating division. G^2_micro >
    ~4.3e6 (G > 2.08 at n~2400 via the t-quantile table) flags the
    day; here g2_micro ~ 1.5e7 (G ~ 3.9) — a real flag.

    Exactness headroom: maxdev^2*(n-1)*1e6 ~ 3.5e35 at sf0.1, inside
    DECIMAL(38,0); at 100 TB re-quantize cents -> dollars (the
    q_anova_oneway rescale treatment) before squaring.

    Scale: the daily collapse is calendar-bounded (~2.4k groups at any
    SF), then a 1-row moment aggregate — O(days) post-shuffle."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy("o_orderdate")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                " AS DECIMAL(38,0))"
            ).alias("cents")
        )
    )
    m = daily.agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("SUM(cents)").alias("sx"),
        F.expr("SUM(cents * cents)").alias("sxx"),
        F.expr("MAX(cents)").alias("mx"),
        F.expr("MIN(cents)").alias("mn"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CAST(CASE WHEN n * mx - sx >= sx - n * mn THEN mx ELSE mn END"
            " AS BIGINT)"
        ).alias("outlier_cents"),
        F.expr(
            "CAST((1000000 * (n - 1)"
            " * GREATEST(n * mx - sx, sx - n * mn)"
            " * GREATEST(n * mx - sx, sx - n * mn))"
            " div (n * (n * sxx - sx * sx)) AS BIGINT)"
        ).alias("g2_micro"),
    )


# ---------------------------------------------------------------------
# q_dixon_q (round 8, session 3)
# ---------------------------------------------------------------------


@query(
    "q_dixon_q",
    oracle="""
    WITH daily AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
    ),
    lo AS (SELECT cents FROM daily ORDER BY cents ASC LIMIT 2),
    hi AS (SELECT cents FROM daily ORDER BY cents DESC LIMIT 2),
    e AS (
      SELECT (SELECT MIN(cents) FROM lo) AS x1,
             (SELECT MAX(cents) FROM lo) AS x2,
             (SELECT MIN(cents) FROM hi) AS xn1,
             (SELECT MAX(cents) FROM hi) AS xn
    )
    SELECT x1, x2, xn1, xn,
           CAST((1000 * (x2 - x1)) // (xn - x1) AS BIGINT)
             AS q_low_milli,
           CAST((1000 * (xn - xn1)) // (xn - x1) AS BIGINT)
             AS q_high_milli
    FROM e
    """,
    tags=("testing", "dixon-q", "outlier", "statistics"),
)
def q_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q ratio test at both ends of the daily revenue series —
    the small-sample companion to q_grubbs_test (same monitoring
    question, gap-based instead of variance-based): Q_low =
    (x(2)-x(1))/(x(n)-x(1)), Q_high = (x(n)-x(n-1))/(x(n)-x(1)).
    Both rationals of integer cents, quantized milli. Under a tie at
    an extreme the 2-smallest/2-largest MULTISETS are still unique,
    so the emitted values are deterministic even though the witness
    rows are not.

    Scale: the two extremes come from orderBy().limit(2) —
    TakeOrderedAndProject per-partition heaps over the calendar-
    bounded daily frame, no global sort, no keyless window; the two
    2-row frames union into one final 1-row aggregate (no join)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy("o_orderdate")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents")
        )
        .select("cents")
    )
    lo = daily.orderBy(F.col("cents").asc()).limit(2).select(
        "cents", F.lit("lo").alias("side")
    )
    hi = daily.orderBy(F.col("cents").desc()).limit(2).select(
        "cents", F.lit("hi").alias("side")
    )
    e = lo.unionAll(hi).agg(
        F.min(F.when(F.col("side") == "lo", F.col("cents"))).alias("x1"),
        F.max(F.when(F.col("side") == "lo", F.col("cents"))).alias("x2"),
        F.min(F.when(F.col("side") == "hi", F.col("cents"))).alias("xn1"),
        F.max(F.when(F.col("side") == "hi", F.col("cents"))).alias("xn"),
    )
    return e.select(
        "x1",
        "x2",
        "xn1",
        "xn",
        F.expr("CAST((1000 * (x2 - x1)) div (xn - x1) AS BIGINT)").alias(
            "q_low_milli"
        ),
        F.expr("CAST((1000 * (xn - xn1)) div (xn - x1) AS BIGINT)").alias(
            "q_high_milli"
        ),
    )
