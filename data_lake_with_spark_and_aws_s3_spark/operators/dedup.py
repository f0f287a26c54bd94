"""Exact deduplication family (SURVEY.md §2.4, §2.10 exact paths).

Reference parity: `dropDuplicates()` on songs/artists/users dims
(`etl.py:~37,~86` canonical template — SURVEY.md §0) and the
latest-row-per-key window variant. Near-dup (MinHash/SimHash) lives in
operators/neardup.py; these are the exact paths.

Scale posture: exact dedup = hash shuffle on the dedup key; hashing
first (md5) turns wide-text dedup into a fixed-width key shuffle —
at 100 TB you dedup on the digest, never shuffle full documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


@query(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year
    FROM lineitem
    """,
    tags=("dedup", "distinct"),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row dedup (dropDuplicates == SELECT DISTINCT): the
    reference's dimension-building primitive."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").alias("ship_year"),
    ).dropDuplicates()


@query(
    "q_latest_per_user",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
      SELECT event_id, user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    tags=("dedup", "latest-per-key"),
)
def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup (the template-variant shape for the
    users dim): row_number desc over (ts, event_id) == 1."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type")
    )


@query(
    "q_dedup_md5",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup", "exact-text"),
)
def q_dedup_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup via content digest: group on md5(text), keep
    the smallest doc_id. The digest (16 bytes) is what shuffles —
    not the document bodies — which is what makes this the 100 TB
    exact-dedup shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "q_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, lang, md5(text) AS fingerprint FROM documents
    ), hist AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 0
    ), batch AS (
      SELECT doc_id, lang, fingerprint, 'fresh' AS arrival
      FROM fp WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, lang, fingerprint, 'recrawl' AS arrival
      FROM fp WHERE doc_id % 7 = 0
    ), inc AS (
      SELECT b.*, (h.fingerprint IS NOT NULL) AS seen_before,
             ROW_NUMBER() OVER (PARTITION BY b.fingerprint
                                ORDER BY b.arrival, b.doc_id) AS rn
      FROM batch b LEFT JOIN hist h ON h.fingerprint = b.fingerprint
    )
    SELECT doc_id, lang, arrival,
           (NOT seen_before AND rn = 1) AS keep,
           CASE WHEN seen_before THEN 'dup_of_corpus'
                WHEN rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS reason
    FROM inc
    """,
    tags=("dedup", "incremental", "llm-pipeline"),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the PRODUCTION dedup shape: today's batch
    (fresh docs = doc_id%5==0, plus verbatim re-crawls of doc_id%7==0
    — the crawler re-fetch case) dedups against (a) the historical
    corpus's fingerprint index and (b) itself, with a per-arrival
    keep/reason audit. All three outcomes occur: re-crawls of
    historical docs -> dup_of_corpus; a fresh doc re-delivered in the
    same batch (doc_id%35==0) -> dup_in_batch for the later arrival;
    the rest -> new. Batch-vs-corpus is a probe of the digest INDEX,
    not a re-dedup of the corpus — at 100 TB the daily cost is
    O(batch + index-probe), never O(corpus); the index itself is
    maintained incrementally (q_merge_upsert is the write side).

    Plan: map-side md5 fingerprints; corpus index = one distinct over
    the digest column; batch-internal dedup is a window on the
    fingerprint with deterministic (arrival, doc_id) order."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5("text").alias("fingerprint")
    )
    hist = d.filter(F.col("doc_id") % 5 != 0).select("fingerprint").distinct()
    batch = (
        d.filter(F.col("doc_id") % 5 == 0)
        .withColumn("arrival", F.lit("fresh"))
        .unionByName(
            d.filter(F.col("doc_id") % 7 == 0).withColumn("arrival", F.lit("recrawl"))
        )
    )
    inc = batch.join(
        hist.withColumn("seen_before", F.lit(True)), "fingerprint", "left"
    ).fillna(False, ["seen_before"])

    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("arrival", "doc_id")
    inc = inc.withColumn("rn", F.row_number().over(w))
    return inc.select(
        "doc_id",
        "lang",
        "arrival",
        (~F.col("seen_before") & (F.col("rn") == 1)).alias("keep"),
        F.when(F.col("seen_before"), "dup_of_corpus")
        .when(F.col("rn") > 1, "dup_in_batch")
        .otherwise("new")
        .alias("reason"),
    )
