"""Sink operators surfaced as queries (SURVEY.md §2.1): partitioned
parquet and CSV write + re-read round-trips. Writes aren't
oracle-hashable directly, so each query RETURNS THE RE-READ DataFrame
— the oracle then checks the round-tripped content, which is the
stronger property anyway (what you wrote is what readers get).

Writes go to a per-process temp dir (never the read-only testdata).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.formats import write_csv, write_partitioned_parquet
from ..sources.loader import load_table

# one scratch root per process, removed at interpreter exit — repeated
# test/bench/driver runs no longer accumulate orphan temp dirs
_SCRATCH = tempfile.mkdtemp(prefix="engine_sinks_")
atexit.register(shutil.rmtree, _SCRATCH, True)


def _tmp(name: str) -> str:
    return os.path.join(tempfile.mkdtemp(dir=_SCRATCH, prefix=f"{name}_"), name)


@query(
    "q_parquet_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus, year(o_orderdate) AS yr, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus, year(o_orderdate)
    """,
    tags=("sink", "parquet"),
)
def q_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-partition parquet sink proven by content: aggregate ->
    write partitioned by (yr) -> re-read -> re-aggregate. If
    partitioning dropped/duplicated/mistyped rows, the oracle hash
    catches it. Partition column type survives as int (written as
    directory values, read back via partition discovery)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(
        "o_orderstatus", F.year("o_orderdate").alias("yr")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    path = _tmp("orders_agg")
    write_partitioned_parquet(agg, path, ["yr"])
    back = spark.read.parquet(path)
    return back.select(
        "o_orderstatus", F.col("yr").cast("long").alias("yr"), "n_orders"
    ).groupBy("o_orderstatus", "yr").agg(F.sum("n_orders").alias("n_orders"))


@query(
    "q_csv_sink_roundtrip",
    oracle="""
    SELECT n_name, n_regionkey FROM nation
    """,
    tags=("sink", "csv"),
)
def q_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema-given re-read round-trip (header on). CSV is
    the landing/export format — typed content must survive the
    string round-trip exactly."""
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    path = _tmp("nation_csv")
    write_csv(n, path)
    back = spark.read.option("header", True).schema("n_name string, n_regionkey int").csv(path)
    return back


@query(
    "q_json_sink_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    """,
    tags=("sink", "json", "scan"),
)
def q_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON sink + schema-on-read scan (the reference's ingest
    format, template etl.py:~33). Inference is exercised deliberately
    here — 5 rows — to cover the schema-inferred read path."""
    r = load_table(spark, sf_dir, "region")
    path = _tmp("region_json")
    r.write.mode("overwrite").json(path)
    back = spark.read.json(path)  # inferred schema
    return back.select(F.col("r_regionkey").cast("int"), "r_name")


@query(
    "q_orc_sink_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(19,2))), 2) AS DOUBLE)
             AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("sink", "orc"),
)
def q_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + re-read round-trip (Spark's second native columnar
    format — the warehouse-interchange path next to parquet). Typed
    content (string / bigint / double) must survive the ORC round-trip
    bit-exactly; the balance sum is decimal-exact before the write so
    the hash checks real content, not float luck."""
    c = load_table(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(19,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_balance"),
    )
    path = _tmp("customer_orc")
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "q_text_sink_roundtrip",
    oracle="""
    SELECT concat(n_name, '|', CAST(n_regionkey AS VARCHAR)) AS value
    FROM nation
    """,
    tags=("sink", "text"),
)
def q_text_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + re-read (the log/landing format:
    one string column, one line per row). Structured content packed
    into the line must survive the round-trip byte-for-byte."""
    n = load_table(spark, sf_dir, "nation").select(
        F.concat_ws("|", "n_name", F.col("n_regionkey").cast("string")).alias("value")
    )
    path = _tmp("nation_text")
    n.write.mode("overwrite").text(path)
    return spark.read.text(path)


@query(
    "q_schema_evolution_read",
    oracle="""
    SELECT o_orderstatus,
           CASE WHEN year(o_orderdate) >= 1998
                THEN o_orderpriority ELSE '<pre-evolution>' END AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE year(o_orderdate) IN (1997, 1998)
    GROUP BY 1, 2
    """,
    tags=("source", "parquet", "schema-evolution"),
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the READER (§2.1): an old parquet batch
    (1997, without o_orderpriority) and a new batch (1998, with the
    added column) land in the same dataset directory; a single
    mergeSchema=true read reconciles them, with the old rows surfacing
    NULL for the added column. The oracle recomputes the same answer
    from the unevolved source table, so dropped/duplicated/misaligned
    rows OR a wrong null-fill show up as a hash mismatch.

    Scale: mergeSchema's cost is footer reconciliation at planning
    time (per-file, driver-side) — row data is never rewritten; this
    is exactly how a 100 TB append-only lake absorbs additive schema
    change without a backfill. Writers that RENAME or RETYPE columns
    still need a rewrite — mergeSchema only reconciles additive drift."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    root = _tmp("orders_evolving")
    old = o.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey", "o_orderstatus", "cents"
    )
    new = o.filter(F.year("o_orderdate") == 1998).select(
        "o_orderkey", "o_orderstatus", "cents", "o_orderpriority"
    )
    old.write.mode("overwrite").parquet(f"{root}/batch=1997")
    new.write.mode("overwrite").parquet(f"{root}/batch=1998")
    back = spark.read.option("mergeSchema", "true").parquet(root)
    return back.groupBy(
        "o_orderstatus",
        F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "q_small_files_control",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("sink", "parquet", "small-files"),
)
def q_small_files_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files control at WRITE time: upstream processing (here a
    keyed 32-way repartition standing in for any shuffle stage) leaves
    32 partitions, so a naive write emits 32 tiny files; coalesce(4)
    merges them WITHOUT a new shuffle (coalesce only unions partitions;
    repartition would pay a second full exchange to do the same). The
    content round-trip is oracle-hashed and the file count is asserted
    in tests/test_etl.py — both halves of "fewer files, same rows".

    At 100 TB the knobs compose: coalesce-on-write bounds file COUNT,
    spark.sql.files.maxRecordsPerFile bounds file SIZE, and the
    after-the-fact compactor (q_compaction_bins) fixes tables that
    were already written badly. Small files are a metadata-plane
    killer at scale: a 100k-file table spends longer listing than
    scanning."""
    o = load_table(spark, sf_dir, "orders")
    path = _tmp("orders_coalesced")
    (
        o.select("o_orderkey", "o_custkey", "o_orderstatus")
        .repartition(32, "o_custkey")
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "q_insert_overwrite_dynamic",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus AS st,
             EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS yr,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    correction AS (  -- recompute ONE partition: 1995, URGENT only
      SELECT o_orderstatus AS st, 1995 AS yr,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) = 1995
        AND o_orderpriority = '1-URGENT'
      GROUP BY 1
    )
    SELECT st, CAST(yr AS BIGINT) AS yr, n_orders FROM base WHERE yr <> 1995
    UNION ALL
    SELECT st, CAST(yr AS BIGINT) AS yr, n_orders FROM correction
    """,
    tags=("sink", "insert-overwrite", "dynamic-partition", "lakehouse"),
)
def q_insert_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse backfill
    primitive: a year-partitioned aggregate table is written, then a
    CORRECTION batch (the 1995 partition recomputed under a stricter
    filter) is written with mode=overwrite under
    partitionOverwriteMode=dynamic, which must replace ONLY the
    partitions present in the batch and leave every other year's
    files untouched (STATIC mode would silently truncate the whole
    table — the classic backfill disaster). The re-read table is the
    proof: 1995 carries the correction's counts, all other years the
    original ones, and the oracle states that expected end state
    directly.

    The conf is flipped on a newSession() clone so no other query's
    writes are affected (the q_agg_pushdown_stats isolation pattern).

    Scale: overwrite granularity = partition directories; the write
    shuffles only the correction batch, and at 100 TB this is the
    difference between rewriting one day and rewriting the table."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    o = load_table(s2, sf_dir, "orders")
    base = o.groupBy(
        F.col("o_orderstatus").alias("st"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    path = _tmp("orders_backfill")
    base.write.partitionBy("yr").parquet(path)
    correction = (
        o.filter(
            (F.year("o_orderdate") == 1995)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy(F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select("st", "n_orders", F.lit(1995).alias("yr"))
    )
    correction.write.mode("overwrite").partitionBy("yr").parquet(path)
    back = s2.read.parquet(path)
    return back.select(
        "st", F.col("yr").cast("long").alias("yr"), "n_orders"
    )


@query(
    "q_xml_sink_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    tags=("sink", "xml", "scan", "spark4"),
)
def q_xml_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE XML sink + schema-given re-read round-trip — the data
    source Spark 4 absorbed from spark-xml (SPARK-44265): no external
    jar, `format("xml")` with rowTag both ways. XML is the format
    enterprise feeds still arrive in; the check is the same contract as
    the CSV/JSON/ORC/text round-trips — typed content survives the
    markup round-trip exactly (ints re-read by explicit schema, so
    nothing depends on inference).

    Scale: XML is a LANDING format, never a processing format — one
    pass to parquet and everything downstream reads columnar. The scan
    is splittable per file (rowTag framing), so ingest parallelism
    comes from file count, exactly like the reference's JSON layout."""
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = _tmp("nation_xml")
    n.write.mode("overwrite").option("rowTag", "nation").format("xml").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .load(path)
    )
    return back
