"""Statistical aggregate family — regr_* / corr / covar / variance
(SURVEY.md §2.4 stats row, widened): per-group simple linear
regression of line-item price on quantity, validated two ways at once.

Oracle-exactness design: floating-point regression outputs can NEVER
be hash-compared across engines (accumulation order differs), so the
hashed surface is (a) the EXACT integer moment sums — n, Σx, Σy, Σxx,
Σxy as BIGINTs over cent-scaled prices, identical math in both
dialects — and (b) self-check BOOLEANS where each engine compares its
OWN builtin (regr_slope/regr_intercept/regr_r2/corr/var_pop/covar_pop)
against the closed-form value derived from those exact moments, to
1e-9 relative tolerance. Both engines independently prove their
builtin agrees with the same exactly-checked moments; the hash then
agrees because the booleans are all true. Σyy alone would overflow
BIGINT at sf0.1 (price_cents² ~ 1e14 × 2e5 rows), so it accumulates in
DECIMAL(38,0) internally and only feeds the booleans, never the hash.

Scale shape: one partial->final hash aggregate per group computes all
moments AND all builtins in a single pass over the scan (one
exchange); the closed-form comparisons are per-group scalar math on
the already-aggregated rows. Moment sums are the textbook
map-side-combinable form — this is exactly how the builtins themselves
distribute, made visible and exactly checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_TOL = 1e-9

# Shared closed-form SQL (valid in both dialects) over the moment
# columns n/sx/sy/sxx/sxy/syy — all referenced as doubles named *_d.
_SLOPE = "((n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d))"
_INTERCEPT = f"((sy_d - {_SLOPE} * sx_d) / n_d)"
_CORR = (
    "((n_d * sxy_d - sx_d * sy_d) / "
    "sqrt((n_d * sxx_d - sx_d * sx_d) * (n_d * syy_d - sy_d * sy_d)))"
)
_VARX = "((n_d * sxx_d - sx_d * sx_d) / (n_d * n_d))"
_COVAR = "((n_d * sxy_d - sx_d * sy_d) / (n_d * n_d))"


def _ok(builtin: str, closed: str) -> str:
    """Relative-tolerance agreement predicate (dialect-shared)."""
    return f"(abs(({builtin}) - ({closed})) <= {_TOL} * (1.0 + abs({closed})))"


_MOMENTS_DUCK = """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_qty,
             CAST(SUM(y) AS BIGINT) AS sum_price_cents,
             CAST(SUM(x * x) AS BIGINT) AS sum_xx,
             CAST(SUM(x * y) AS BIGINT) AS sum_xy,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy_dec,
             regr_slope(yd, xd) AS b_slope,
             regr_intercept(yd, xd) AS b_intercept,
             regr_r2(yd, xd) AS b_r2,
             corr(yd, xd) AS b_corr,
             var_pop(xd) AS b_varx,
             covar_pop(yd, xd) AS b_covar
      FROM (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
               CAST(l_quantity AS DOUBLE) AS xd,
               CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS DOUBLE) AS yd
        FROM lineitem
      )
      GROUP BY l_returnflag
"""

_CHECKS = f"""
    SELECT l_returnflag, n, sum_qty, sum_price_cents, sum_xx, sum_xy,
           {_ok("b_slope", _SLOPE)} AS slope_ok,
           {_ok("b_intercept", _INTERCEPT)} AS intercept_ok,
           {_ok("b_r2", f"({_CORR}) * ({_CORR})")} AS r2_ok,
           {_ok("b_corr", _CORR)} AS corr_ok,
           {_ok("b_varx", _VARX)} AS varx_ok,
           {_ok("b_covar", _COVAR)} AS covar_ok
    FROM (
      SELECT *,
             CAST(n AS DOUBLE) AS n_d,
             CAST(sum_qty AS DOUBLE) AS sx_d,
             CAST(sum_price_cents AS DOUBLE) AS sy_d,
             CAST(sum_xx AS DOUBLE) AS sxx_d,
             CAST(sum_xy AS DOUBLE) AS sxy_d,
             CAST(syy_dec AS DOUBLE) AS syy_d
      FROM m
    )
"""


@query(
    "q_regr_diagnostics",
    oracle=f"WITH m AS ({_MOMENTS_DUCK})\n{_CHECKS}",
    tags=("agg", "stats", "regression", "exact-moments"),
)
def q_regr_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS fit of cent-scaled price on quantity: exact
    BIGINT moment sums (hashed) + six booleans proving Spark's
    regr_slope/regr_intercept/regr_r2/corr/var_pop/covar_pop each
    match the closed-form value from those moments (the oracle proves
    the same for DuckDB's builtins). See module docstring for why
    floats themselves stay out of the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("y"),
    ).withColumns(
        {"xd": F.col("x").cast("double"), "yd": F.col("y").cast("double")}
    )
    moments = src.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_qty"),
        F.sum("y").alias("sum_price_cents"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy_dec"),
        F.regr_slope("yd", "xd").alias("b_slope"),
        F.regr_intercept("yd", "xd").alias("b_intercept"),
        F.regr_r2("yd", "xd").alias("b_r2"),
        F.corr("yd", "xd").alias("b_corr"),
        F.var_pop("xd").alias("b_varx"),
        F.covar_pop("yd", "xd").alias("b_covar"),
    )
    md = moments.withColumns(
        {
            "n_d": F.col("n").cast("double"),
            "sx_d": F.col("sum_qty").cast("double"),
            "sy_d": F.col("sum_price_cents").cast("double"),
            "sxx_d": F.col("sum_xx").cast("double"),
            "sxy_d": F.col("sum_xy").cast("double"),
            "syy_d": F.col("syy_dec").cast("double"),
        }
    )
    return md.selectExpr(
        "l_returnflag",
        "n",
        "sum_qty",
        "sum_price_cents",
        "sum_xx",
        "sum_xy",
        f"{_ok('b_slope', _SLOPE)} AS slope_ok",
        f"{_ok('b_intercept', _INTERCEPT)} AS intercept_ok",
        f"{_ok('b_r2', f'({_CORR}) * ({_CORR})')} AS r2_ok",
        f"{_ok('b_corr', _CORR)} AS corr_ok",
        f"{_ok('b_varx', _VARX)} AS varx_ok",
        f"{_ok('b_covar', _COVAR)} AS covar_ok",
    )
