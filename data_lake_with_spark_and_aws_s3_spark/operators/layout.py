"""Table-maintenance / data-layout operators: Z-order clustering with
zone-map manifests, and prefix-sum compaction binning — the "keep a
100 TB table scannable" family (Delta OPTIMIZE ZORDER / Iceberg
rewrite_data_files territory, expressed as plain DataFrame ops).

Z-ordering maps the 2-D predicate space (order date, total price)
onto a 1-D curve by bit-interleaving two 8-bit coordinates; sorting /
bucketing by the curve value gives files whose per-file min/max
ranges (the zone map) are TIGHT in BOTH dimensions, so a reader with
a date or price predicate can skip most files. The whole computation
is integer bit math — shiftright/&/floor-div agree across engines for
non-negative inputs, and the price bucket divides by a POWER OF TWO
(2048) so the double division is exact (mantissa untouched) before
the floor ([[oracle-exactness-playbook]]).

At 100 TB: computing z is a map-only projection; the physical
rewrite is one range-partitioned sort on z (the same shuffle a global
sort costs — sorts.py); the manifest aggregate below is a hash agg on
file_id with map-side partials. Nothing is quadratic, nothing is
collected.

Compaction binning: the small-files problem (sinks.py's
q_small_files_control shows coalesce-on-write; this shows the
after-the-fact plan): treat each (year, month) partition as a file
with a known row count, order them, and assign each to the bin its
PREFIX SUM starts in — `(running_total - cnt) // target` — a
single-window greedy first-fit that never moves data twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

BITS = 8
ANCHOR = "1995-01-01"
DAY_BUCKET = 16
PRICE_BUCKET = 2048  # power of two: double division stays exact
FILE_SPAN = 1024  # z-values per synthetic file -> up to 64 files
BIN_TARGET = 2500  # rows per compaction bin


def _interleave(x: str, shift_fmt: str) -> list[str]:
    """Per-bit terms placing bit i of `x` at even curve positions when
    shift_fmt shifts x, odd when it shifts y (caller offsets)."""
    return [f"(({shift_fmt.format(x=x, i=i)}) & 1) * {4 ** i}" for i in range(BITS)]


def _z_sql(xcol: str, ycol: str, dialect: str) -> str:
    fmt = "shiftright({x}, {i})" if dialect == "spark" else "({x} >> {i})"
    xs = _interleave(xcol, fmt)
    ys = [f"({t}) * 2" for t in _interleave(ycol, fmt)]
    return "(" + " + ".join(xs + ys) + ")"


_DUCK_COORDS = f"""
      SELECT o_orderkey,
             date_diff('day', DATE '{ANCHOR}', CAST(o_orderdate AS DATE))
               // {DAY_BUCKET} AS xd,
             CAST(floor(o_totalprice / {PRICE_BUCKET}.0) AS BIGINT) AS yp,
             o_totalprice
      FROM orders
"""


@query(
    "q_zorder_zonemap",
    oracle=f"""
    WITH coords AS ({_DUCK_COORDS}),
    z AS (
      SELECT o_orderkey, xd, yp, o_totalprice,
             {_z_sql("xd", "yp", "duck")} AS zval
      FROM coords
    )
    SELECT CAST(zval // {FILE_SPAN} AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(xd) AS BIGINT) AS date_bucket_min,
           CAST(MAX(xd) AS BIGINT) AS date_bucket_max,
           MIN(o_totalprice) AS price_min,
           MAX(o_totalprice) AS price_max,
           CAST(MIN(zval) AS BIGINT) AS z_min,
           CAST(MAX(zval) AS BIGINT) AS z_max
    FROM z
    GROUP BY 1
    """,
    tags=("layout", "zorder", "zone-map", "data-skipping"),
)
def q_zorder_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map manifest of orders Z-ordered on (date, price): per
    synthetic file, row count and min/max of both dimensions. Tight
    per-file ranges in BOTH columns are the data-skipping win a
    single-column sort can't give."""
    o = load_table(spark, sf_dir, "orders")
    coords = o.select(
        "o_orderkey",
        "o_totalprice",
        F.expr(
            f"datediff(o_orderdate, date'{ANCHOR}') div {DAY_BUCKET}"
        ).alias("xd"),
        F.floor(F.col("o_totalprice") / PRICE_BUCKET).alias("yp"),
    )
    z = coords.withColumn("zval", F.expr(_z_sql("xd", "yp", "spark")))
    return (
        z.groupBy(F.expr(f"zval div {FILE_SPAN}").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xd").alias("date_bucket_min"),
            F.max("xd").alias("date_bucket_max"),
            F.min("o_totalprice").alias("price_min"),
            F.max("o_totalprice").alias("price_max"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


@query(
    "q_compaction_bins",
    oracle=f"""
    WITH parts AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    binned AS (
      SELECT y, m, cnt,
             (SUM(cnt) OVER (ORDER BY y, m) - cnt) // {BIN_TARGET} AS bin_id
      FROM parts
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cnt) AS BIGINT) AS rows_total,
           CAST(MIN(y * 100 + m) AS BIGINT) AS first_part,
           CAST(MAX(y * 100 + m) AS BIGINT) AS last_part
    FROM binned
    GROUP BY 1
    """,
    tags=("layout", "compaction", "small-files"),
)
def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit compaction plan over monthly partitions: each
    partition lands in the bin where its prefix sum starts. One window
    + one agg; contiguous months stay together (bins are mergeable
    ranges, not arbitrary sets)."""
    o = load_table(spark, sf_dir, "orders")
    parts = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    binned = parts.withColumn(
        "bin_id", F.expr(f"(sum(cnt) over (order by y, m) - cnt) div {BIN_TARGET}")
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cnt").alias("rows_total"),
        F.min(F.col("y") * 100 + F.col("m")).alias("first_part"),
        F.max(F.col("y") * 100 + F.col("m")).alias("last_part"),
    )
