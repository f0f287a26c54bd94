"""Estimation under selection bias and uncertainty: inverse-propensity
weighting (IPW / Horvitz-Thompson) for observational treatment effects,
and split-conformal prediction intervals with a finite-sample coverage
audit.

Both are the serving-side statistical layer a training-data platform
needs once models leave the lab: IPW corrects "the treated group chose
itself" bias with nothing but group frequencies, and split conformal
wraps ANY point predictor in a distribution-free interval whose
coverage is guaranteed by a rank statistic — no parametric assumption,
no refitting.

Exactness policy (cross-engine): everything is integer cents and exact
ranks. Horvitz-Thompson terms multiply BEFORE dividing (sum_cents *
n_stratum * 1000 div n_arm), so each stratum pays exactly one
floor-division — deterministic and identical in Spark (`div`) and
DuckDB (`//`) because every operand is non-negative. The conformal
quantile is the ceil((n_cal+1)(1-alpha))-th order statistic of absolute
residuals — a row_number lookup, never an interpolated percentile.

Scale notes (100 TB):
- IPW is two hash aggregates: customer-grain spend rollup (map-side
  combine on o_custkey), then a ~25-row stratum rollup. The join of
  customers to their spend is key-partitioned; no broadcast needed on
  the fact side, and the stratum table is metadata-sized.
- Conformal is one grouped aggregate for the per-segment model, one
  broadcast of the tiny model table back onto both splits, and one
  rank window PER SEGMENT (partitioned — no global sort). Calibration
  and test are disjoint hash-splits of the same scan, so the fact
  table is read once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


@query(
    "q_ipw_ate",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    pop AS (
      SELECT c_nationkey AS nationkey,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
             COALESCE(s.cents, 0) AS cents
      FROM customer LEFT JOIN spend s ON o_custkey = c_custkey
    ),
    strata AS (
      SELECT nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(treated) AS BIGINT) AS n_treated,
             CAST(SUM(CASE WHEN treated = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS sum_treated_cents,
             CAST(SUM(CASE WHEN treated = 0 THEN cents ELSE 0 END) AS BIGINT)
               AS sum_control_cents
      FROM pop GROUP BY nationkey
    )
    SELECT nationkey, n, n_treated, sum_treated_cents, sum_control_cents,
           CAST(CASE WHEN n_treated > 0
                THEN (sum_treated_cents * n * 1000) // n_treated END
                AS BIGINT) AS ht_treated_millicents,
           CAST(CASE WHEN n - n_treated > 0
                THEN (sum_control_cents * n * 1000) // (n - n_treated) END
                AS BIGINT) AS ht_control_millicents
    FROM strata
    """,
    tags=("stats", "causal", "ipw", "horvitz-thompson"),
)
def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted treatment effect, stratified by
    nation: treatment = customer sits in the BUILDING market segment,
    outcome = lifetime spend in cents, confounder = nation. The
    propensity within a stratum is the observed treatment share
    n_treated/n, so the Horvitz-Thompson mean of each arm is
    sum_cents / p = sum_cents * n / n_arm — computed per stratum in
    exact int64 (max ~9e8 cents x 1.5e4 x 1e3 < 2^63 at sf0.1), one
    floor division per stratum, NULL-guarded for empty arms. The
    difference of the two HT columns is the per-stratum ATE; summing
    them over strata and dividing by total N (one more exact step the
    reader can do) is the textbook IPW estimator.

    Scale: spend rollup is a map-side-combinable hash agg on
    o_custkey; the customer join is an equi-join on the same key; the
    stratum rollup emits ~25 rows. No broadcast of anything
    data-sized, no window, no Python."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("cents")
    )
    pop = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.expr(
                "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END"
            ).alias("treated"),
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    strata = pop.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("treated").alias("n_treated"),
        F.sum(F.expr("CASE WHEN treated = 1 THEN cents ELSE 0 END")).alias(
            "sum_treated_cents"
        ),
        F.sum(F.expr("CASE WHEN treated = 0 THEN cents ELSE 0 END")).alias(
            "sum_control_cents"
        ),
    )
    return strata.select(
        "nationkey",
        "n",
        "n_treated",
        "sum_treated_cents",
        "sum_control_cents",
        F.expr(
            "CAST(CASE WHEN n_treated > 0"
            " THEN (sum_treated_cents * n * 1000) div n_treated END"
            " AS BIGINT)"
        ).alias("ht_treated_millicents"),
        F.expr(
            "CAST(CASE WHEN n - n_treated > 0"
            " THEN (sum_control_cents * n * 1000) div (n - n_treated) END"
            " AS BIGINT)"
        ).alias("ht_control_millicents"),
    )


@query(
    "q_conformal_interval",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus AS seg,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey % 2 AS fold
      FROM orders
    ),
    model AS (  -- point predictor fit on calibration only (fold 1)
      SELECT seg,
             CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred_cents,
             CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM base WHERE fold = 1 GROUP BY seg
    ),
    resid AS (
      SELECT b.seg, ABS(b.cents - m.pred_cents) AS r,
             ROW_NUMBER() OVER (
               PARTITION BY b.seg
               ORDER BY ABS(b.cents - m.pred_cents), b.cents) AS rk,
             m.n_cal
      FROM base b JOIN model m ON b.seg = m.seg WHERE b.fold = 1
    ),
    qhat AS (  -- ceil((n_cal+1)*0.9)-th smallest calibration residual
      SELECT seg, n_cal, CAST(r AS BIGINT) AS qhat_cents
      FROM resid
      WHERE rk = CAST(((n_cal + 1) * 9 + 9) // 10 AS BIGINT)
    )
    SELECT b.seg,
           MAX(q.n_cal) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           MAX(m.pred_cents) AS pred_cents,
           MAX(q.qhat_cents) AS qhat_cents,
           CAST(SUM(CASE WHEN ABS(b.cents - m.pred_cents) <= q.qhat_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS covered,
           CAST((1000000 * SUM(CASE WHEN ABS(b.cents - m.pred_cents)
                                         <= q.qhat_cents
                               THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
             AS coverage_ppm
    FROM base b JOIN model m ON b.seg = m.seg JOIN qhat q ON b.seg = q.seg
    WHERE b.fold = 0
    GROUP BY b.seg
    """,
    tags=("stats", "conformal", "uncertainty", "serving"),
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with a coverage audit.
    Orders are hash-split into calibration (odd orderkey) and test
    (even); the point model is the per-orderstatus mean price on
    calibration (one exact integer division); the conformal radius
    qhat is the ceil((n_cal+1)(1-alpha))-th smallest absolute
    calibration residual at alpha=0.1 — found by a rank window with a
    deterministic tiebreak, never an interpolated percentile. The test
    side then reports empirical coverage of pred +/- qhat in ppm;
    conformal theory guarantees >= 90% in expectation regardless of
    the price distribution, and the audit shows it.

    The ceil is integer-exact: ceil(0.9 * (n+1)) == ((n+1)*9 + 9) div
    10 for non-negative n — identical floor-division semantics in both
    engines.

    Scale: the model and qhat tables are |segments|-sized and
    broadcast back onto the scan; residual ranking is windowed PER
    SEGMENT (no global sort); calibration and test are disjoint
    predicates over one table read. At 100 TB the only O(data) work
    is the residual window within each segment — shard it further by
    any high-cardinality key folded into the segment if a single
    segment outgrows a partition."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderstatus").alias("seg"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (F.col("o_orderkey") % 2).alias("fold"),
    )
    cal = base.filter(F.col("fold") == 1)
    model = cal.groupBy("seg").agg(
        F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias("pred_cents"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    resid = cal.join(F.broadcast(model), "seg").select(
        "seg",
        "n_cal",
        F.abs(F.col("cents") - F.col("pred_cents")).alias("r"),
        "cents",
    )
    w = Window.partitionBy("seg").orderBy("r", "cents")
    qhat = (
        resid.withColumn("rk", F.row_number().over(w))
        .filter(F.expr("rk = CAST(((n_cal + 1) * 9 + 9) div 10 AS BIGINT)"))
        .select("seg", "n_cal", F.col("r").cast("long").alias("qhat_cents"))
    )
    test = base.filter(F.col("fold") == 0)
    joined = test.join(
        F.broadcast(model.select("seg", "pred_cents")), "seg"
    ).join(F.broadcast(qhat), "seg")
    return joined.groupBy("seg").agg(
        F.max("n_cal").alias("n_cal"),
        F.count(F.lit(1)).alias("n_test"),
        F.max("pred_cents").alias("pred_cents"),
        F.max("qhat_cents").alias("qhat_cents"),
        F.sum(
            F.expr(
                "CASE WHEN ABS(cents - pred_cents) <= qhat_cents"
                " THEN 1 ELSE 0 END"
            )
        ).alias("covered"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN ABS(cents - pred_cents)"
            " <= qhat_cents THEN 1 ELSE 0 END)) div COUNT(*) AS BIGINT)"
        ).alias("coverage_ppm"),
    )


# ---------------------------------------------------------------------
# q_nn_matching_att (round 6)
# ---------------------------------------------------------------------

_NN_CALIPER_DAYS = 7  # widest admissible date distance for a match


@query(
    "q_nn_matching_att",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus AS stratum,
             CAST(o_orderpriority = '1-URGENT' AS INTEGER) AS treated,
             CAST(o_orderdate AS DATE) AS d,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    t AS (SELECT * FROM base WHERE treated = 1),
    c AS (SELECT * FROM base WHERE treated = 0),
    cand AS (
      SELECT t.o_orderkey AS t_key, t.stratum, t.cents AS t_cents,
             c.cents AS c_cents,
             abs(datediff('day', c.d, t.d)) AS dist,
             c.d AS c_d, c.o_orderkey AS c_key
      FROM t JOIN c
        ON c.stratum = t.stratum
       AND abs(datediff('day', c.d, t.d)) <= {_NN_CALIPER_DAYS}
    ),
    matched AS (
      SELECT t_key, stratum, t_cents, c_cents
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY t_key
                 ORDER BY dist, c_d, c_key) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n_matched,
             CAST(SUM(t_cents - c_cents) AS BIGINT) AS diff_cents
      FROM matched GROUP BY stratum
    ),
    tn AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_treated
      FROM t GROUP BY stratum
    )
    SELECT tn.stratum, tn.n_treated, agg.n_matched,
           CAST(tn.n_treated - agg.n_matched AS BIGINT) AS n_unmatched,
           CAST(agg.diff_cents AS DOUBLE)
             / CAST(agg.n_matched AS DOUBLE) AS att_cents
    FROM tn JOIN agg ON agg.stratum = tn.stratum
    """,
    tags=("estimation", "matching", "causal", "att"),
)
def q_nn_matching_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor matching ATT estimator — the causal-inference
    companion to q_ipw_ate: each treated order (1-URGENT priority)
    matches the nearest control order in calendar time within the same
    status stratum and a ±7-day caliper (with replacement, 1-NN), and
    the effect is the mean matched outcome difference per stratum.
    Matching is what an IPW skeptic runs to check weighting bias; both
    estimators sharing one surface is the point.

    Determinism: distance is integer days; ties break on (distance,
    control date, control key) — a total order. The ATT is one division
    of exact cent sums.

    Scale: the candidate stage is a band join (stratum equi-key +
    bounded date distance) — the same bucket-prejoin currency as
    q_range_join_events, with per-treated candidates bounded by the
    caliper window's order density, never |T|x|C|; the 1-NN pick is a
    per-treated-key window over those bounded candidates."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("stratum"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("treated"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = base.filter(F.col("treated") == 1).select(
        F.col("o_orderkey").alias("t_key"),
        "stratum",
        F.col("d").alias("t_d"),
        F.col("cents").alias("t_cents"),
    )
    c = base.filter(F.col("treated") == 0).select(
        F.col("o_orderkey").alias("c_key"),
        "stratum",
        F.col("d").alias("c_d"),
        F.col("cents").alias("c_cents"),
    )
    # bucket prejoin (the q_range_join_events recipe): day buckets of
    # caliper+1 width; a treated order probes its own and both adjacent
    # buckets, so the equi-join carries (stratum, bucket) keys and the
    # residual distance filter sees only ~3-bucket-local candidates —
    # never the |T| x |C| per-stratum cross product a bare stratum join
    # would materialize.
    bwidth = _NN_CALIPER_DAYS + 1
    t_b = t.withColumn(
        "bucket",
        F.explode(
            F.array(
                *[
                    F.floor(F.datediff("t_d", F.lit("1970-01-01")) / bwidth).cast(
                        "long"
                    )
                    + off
                    for off in (-1, 0, 1)
                ]
            )
        ),
    )
    c_b = c.withColumn(
        "bucket",
        F.floor(F.datediff("c_d", F.lit("1970-01-01")) / bwidth).cast("long"),
    )
    dist = F.abs(F.datediff("t_d", "c_d"))
    cand = (
        t_b.join(c_b, ["stratum", "bucket"])
        .filter(dist <= _NN_CALIPER_DAYS)
        .select(
            "t_key",
            "stratum",
            "t_cents",
            "c_cents",
            dist.alias("dist"),
            "c_d",
            "c_key",
        )
    )
    w_nn = Window.partitionBy("t_key").orderBy("dist", "c_d", "c_key")
    matched = (
        cand.withColumn("rn", F.row_number().over(w_nn))
        .filter(F.col("rn") == 1)
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(F.col("t_cents") - F.col("c_cents")).alias("diff_cents"),
        )
    )
    tn = t.groupBy("stratum").agg(F.count(F.lit(1)).alias("n_treated"))
    return tn.join(matched, "stratum").select(
        "stratum",
        "n_treated",
        F.col("n_matched").cast("long").alias("n_matched"),
        (F.col("n_treated") - F.col("n_matched")).cast("long").alias("n_unmatched"),
        (
            F.col("diff_cents").cast("double") / F.col("n_matched").cast("double")
        ).alias("att_cents"),
    )


# ---------------------------------------------------------------------
# q_rdd_sharp (round 7)
# ---------------------------------------------------------------------

_RDD_CUT = 30_000_00  # cutoff on order value, in cents ($30,000)
_RDD_BW = 15_000_00  # local-linear bandwidth: +- $15,000 around the cut


@query(
    "q_rdd_sharp",
    oracle=f"""
    WITH base AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) - {_RDD_CUT} AS x,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
      FROM orders
      WHERE ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT) - {_RDD_CUT})
              < {_RDD_BW}
    ),
    g AS (
      SELECT CASE WHEN x >= 0 THEN 'right' ELSE 'left' END AS side,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM base GROUP BY 1
    ),
    a AS (
      SELECT side, n, sx, sy,
             CASE WHEN sy * sxx - sx * sxy >= 0 THEN 1 ELSE -1 END
               * ((1000000 * ABS(sy * sxx - sx * sxy))
                  // (n * sxx - sx * sx)) AS alpha_ppm
      FROM g
    )
    SELECT a.side, CAST(a.n AS BIGINT) AS n, CAST(a.sx AS BIGINT) AS sx,
           CAST(a.sy AS BIGINT) AS sy,
           CAST(a.alpha_ppm AS BIGINT) AS alpha_ppm,
           CAST((SELECT MAX(CASE WHEN side = 'right' THEN alpha_ppm END)
                   - MAX(CASE WHEN side = 'left' THEN alpha_ppm END)
                 FROM a) AS BIGINT) AS jump_ppm
    FROM a
    """,
    tags=("estimation", "rdd", "causal", "regression-discontinuity"),
)
def q_rdd_sharp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate of the "finished" rate
    jump at a $30k order-value cutoff: separate local-linear fits on
    each side of the cut (bandwidth +-$15k), each evaluated AT the
    boundary, and the causal jump = alpha_right - alpha_left. The
    design that identifies a treatment effect from a deterministic
    assignment rule — here illustrative (TPC-H has no real cutoff; a
    near-zero jump is the expected answer and the honest placebo
    check).

    Exactness: the OLS intercept at x=0 is alpha = (Σy·Σx² − Σx·Σxy) /
    (n·Σx² − (Σx)²) — a ratio of exact integer moment products (x in
    cents, y in {{0,1}}), accumulated in DECIMAL(38,0)/HUGEINT and
    resolved with ONE truncating division per side, sign split out so
    both engines truncate identically (the q_zipf_slope precedent).

    Scale: the bandwidth filter pushes to the scan; one hash aggregate
    to a 2-row side table; 1-row stitch for the jump. Nothing after
    the scan is data-sized."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long") - F.lit(_RDD_CUT)
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            cents.alias("x"),
            (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        )
        .filter(F.abs(F.col("x")) < _RDD_BW)
    )
    g = base.groupBy(
        F.when(F.col("x") >= 0, F.lit("right")).otherwise(F.lit("left")).alias(
            "side"
        )
    ).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    a = g.select(
        "side",
        "n",
        "sx",
        "sy",
        F.expr(
            "CASE WHEN sy * sxx - sx * sxy >= 0 THEN 1 ELSE -1 END"
            " * ((CAST(1000000 AS DECIMAL(38,0)) * abs(sy * sxx - sx * sxy))"
            "    div (n * sxx - sx * sx))"
        ).alias("alpha_ppm"),
    )
    jump = a.agg(
        (
            F.max(F.when(F.col("side") == "right", F.col("alpha_ppm")))
            - F.max(F.when(F.col("side") == "left", F.col("alpha_ppm")))
        ).alias("jump_ppm")
    )
    return a.crossJoin(F.broadcast(jump)).select(
        "side",
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("alpha_ppm").cast("long").alias("alpha_ppm"),
        F.col("jump_ppm").cast("long").alias("jump_ppm"),
    )


# ---------------------------------------------------------------------
# q_iv_wald (round 7)
# ---------------------------------------------------------------------

_IV_ERA = "1995-01-01"  # instrument: order placed before the 1995 era split


@query(
    "q_iv_wald",
    oracle=f"""
    WITH base AS (
      SELECT CAST(o_orderdate < DATE '{_IV_ERA}' AS BIGINT) AS z,
             CAST(o_orderstatus = 'F' AS BIGINT) AS t,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    g AS (
      SELECT z,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(t) AS HUGEINT) AS st,
             CAST(SUM(y) AS HUGEINT) AS sy
      FROM base GROUP BY z
    ),
    w AS (
      SELECT MAX(CASE WHEN z = 1 THEN n END) AS n1,
             MAX(CASE WHEN z = 0 THEN n END) AS n0,
             MAX(CASE WHEN z = 1 THEN st END) AS st1,
             MAX(CASE WHEN z = 0 THEN st END) AS st0,
             MAX(CASE WHEN z = 1 THEN sy END) AS sy1,
             MAX(CASE WHEN z = 0 THEN sy END) AS sy0
      FROM g
    )
    SELECT g.z, CAST(g.n AS BIGINT) AS n, CAST(g.st AS BIGINT) AS n_treated,
           CAST(g.sy AS BIGINT) AS sum_cents,
           CAST(CASE WHEN (w.sy1 * w.n0 - w.sy0 * w.n1) >= 0
                     THEN 1 ELSE -1 END
                * ((1000 * ABS(w.sy1 * w.n0 - w.sy0 * w.n1))
                   // ABS(w.st1 * w.n0 - w.st0 * w.n1))
                * (CASE WHEN (w.st1 * w.n0 - w.st0 * w.n1) >= 0
                        THEN 1 ELSE -1 END)
                AS BIGINT) AS wald_milli_cents
    FROM g, w
    """,
    tags=("estimation", "instrumental-variable", "wald", "causal"),
)
def q_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald instrumental-variable estimator: effect of order COMPLETION
    (t = status F) on order value (y, cents), instrumented by the 1995
    era split (z = ordered before 1995 — strongly predictive of t
    because old orders have all finished, plausibly unrelated to y's
    other drivers). Wald = (E[y|z=1]−E[y|z=0]) / (E[t|z=1]−E[t|z=0]) —
    the 2-group IV special case, and the core of every encouragement-
    design readout.

    Exactness: both difference-of-means are assembled as cross-
    multiplied exact integer products over DECIMAL(38,0)/HUGEINT —
    (Σy₁n₀ − Σy₀n₁) / (Σt₁n₀ − Σt₀n₁) after the common 1/(n₁n₀)
    cancels — with signs split out so the single truncating division
    is over positive operands on both engines.

    Scale: one hash aggregate to a 2-row arm table; 1-row stitch. The
    scan is the only data-sized stage."""
    base = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderdate") < F.lit(_IV_ERA).cast("date"))
        .cast("long")
        .alias("z"),
        (F.col("o_orderstatus") == "F").cast("long").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    g = base.groupBy("z").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("t").cast("decimal(38,0)").alias("st"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
    )
    w = g.agg(
        F.max(F.when(F.col("z") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("z") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("z") == 1, F.col("st"))).alias("st1"),
        F.max(F.when(F.col("z") == 0, F.col("st"))).alias("st0"),
        F.max(F.when(F.col("z") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("z") == 0, F.col("sy"))).alias("sy0"),
    )
    return g.crossJoin(F.broadcast(w)).select(
        "z",
        F.col("n").cast("long").alias("n"),
        F.col("st").cast("long").alias("n_treated"),
        F.col("sy").cast("long").alias("sum_cents"),
        F.expr(
            "CAST(CASE WHEN (sy1 * n0 - sy0 * n1) >= 0 THEN 1 ELSE -1 END"
            " * ((CAST(1000 AS DECIMAL(38,0)) * abs(sy1 * n0 - sy0 * n1))"
            "    div abs(st1 * n0 - st0 * n1))"
            " * (CASE WHEN (st1 * n0 - st0 * n1) >= 0 THEN 1 ELSE -1 END)"
            " AS BIGINT)"
        ).alias("wald_milli_cents"),
    )


# ---------------------------------------------------------------------
# q_did_estimator (round 8)
# ---------------------------------------------------------------------

_DID_ERA = "1995-01-01"  # pre/post split (the q_iv_wald era boundary)
_DID_SEGMENT = "BUILDING"  # "treated" customer segment


@query(
    "q_did_estimator",
    oracle=f"""
    WITH cells AS (
      SELECT (c.c_mktsegment = '{_DID_SEGMENT}') AS treated,
             (o.o_orderdate >= DATE '{_DID_ERA}') AS post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    means AS (
      SELECT treated, post, n, cents,
             CAST(ROUND(1000000.0 * CAST(cents AS DOUBLE)
                        / CAST(n AS DOUBLE)) AS BIGINT) AS mean_micro
      FROM cells
    )
    SELECT
      CAST((SELECT n FROM means WHERE treated AND post) AS BIGINT)
        AS n_treated_post,
      CAST((SELECT n FROM means WHERE treated AND NOT post) AS BIGINT)
        AS n_treated_pre,
      CAST((SELECT n FROM means WHERE NOT treated AND post) AS BIGINT)
        AS n_control_post,
      CAST((SELECT n FROM means WHERE NOT treated AND NOT post) AS BIGINT)
        AS n_control_pre,
      CAST((SELECT mean_micro FROM means WHERE treated AND post) AS BIGINT)
        AS mean_treated_post_micro,
      CAST((SELECT mean_micro FROM means WHERE treated AND NOT post)
        AS BIGINT) AS mean_treated_pre_micro,
      CAST((SELECT mean_micro FROM means WHERE NOT treated AND post)
        AS BIGINT) AS mean_control_post_micro,
      CAST((SELECT mean_micro FROM means WHERE NOT treated AND NOT post)
        AS BIGINT) AS mean_control_pre_micro,
      CAST(((SELECT mean_micro FROM means WHERE treated AND post)
            - (SELECT mean_micro FROM means WHERE treated AND NOT post))
           - ((SELECT mean_micro FROM means WHERE NOT treated AND post)
              - (SELECT mean_micro FROM means WHERE NOT treated AND NOT post))
        AS BIGINT) AS did_micro
    """,
    tags=("estimation", "causal", "did", "difference-in-differences"),
)
def q_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the change in mean order value across
    the {_DID_ERA} era boundary for '{_DID_SEGMENT}'-segment customers
    (treated) MINUS the same change for everyone else (control) — the
    parallel-trends causal design that completes the estimation family
    (IPW / sharp RDD / IV-Wald / 1-NN matching). On TPC-H this is a
    placebo (no real intervention — the estimate should hover near
    zero), exactly like q_rdd_sharp's documented placebo posture.

    Exactness: cell counts and cents are exact; each cell mean is ONE
    IEEE division of exactly-representable integers quantized to
    integer MICRO-cents, and the DiD contrast is pure integer
    arithmetic over those four quantized means — deterministic on both
    engines at any scale.

    Scale: one fact-dim equi-join (customer side broadcastable), one
    4-cell hash aggregate with map-side partials, then a 4-row stitch.
    The scan is the only data-sized stage."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            (F.col("c_mktsegment") == _DID_SEGMENT).alias("treated"),
            (F.col("o_orderdate") >= F.lit(_DID_ERA).cast("date")).alias(
                "post"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .select(
            "treated",
            "post",
            "n",
            "cents",
            F.round(
                1000000.0 * F.col("cents").cast("double")
                / F.col("n").cast("double")
            )
            .cast("long")
            .alias("mean_micro"),
        )
    )

    def cell(tr: bool, po: bool, col: str, alias: str):
        return F.max(
            F.when((F.col("treated") == tr) & (F.col("post") == po), F.col(col))
        ).alias(alias)

    wide = cells.agg(
        cell(True, True, "n", "n_treated_post"),
        cell(True, False, "n", "n_treated_pre"),
        cell(False, True, "n", "n_control_post"),
        cell(False, False, "n", "n_control_pre"),
        cell(True, True, "mean_micro", "mean_treated_post_micro"),
        cell(True, False, "mean_micro", "mean_treated_pre_micro"),
        cell(False, True, "mean_micro", "mean_control_post_micro"),
        cell(False, False, "mean_micro", "mean_control_pre_micro"),
    )
    return wide.select(
        "*",
        (
            (
                F.col("mean_treated_post_micro")
                - F.col("mean_treated_pre_micro")
            )
            - (
                F.col("mean_control_post_micro")
                - F.col("mean_control_pre_micro")
            )
        ).alias("did_micro"),
    )
