"""Cross-module capstones: queries COMPOSED from other registered
queries (imported last so every component is already in the registry —
both the Spark plans and the oracle SQL nest the component versions,
keeping composed truth synchronized with component truth)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from .llm_pipeline import _hex_val_sql

def _training_corpus_oracle() -> str:
    from ..registry import REGISTRY

    curation = REGISTRY["q_curation_pipeline"].oracle
    split_expr = _hex_val_sql("md5(CAST(doc_id AS VARCHAR))") + " % 100"
    return f"""
    WITH base AS ({curation}),
    kept AS (
      SELECT doc_id, lang, n_tokens,
             CASE WHEN ({split_expr}) < 80 THEN 'train'
                  WHEN ({split_expr}) < 90 THEN 'val' ELSE 'test' END AS split,
             md5(CAST(doc_id AS VARCHAR)) AS pri
      FROM base WHERE keep
    )
    SELECT doc_id, lang, split, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY split, lang ORDER BY pri, doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS start_token,
           CAST((SUM(n_tokens) OVER (PARTITION BY split, lang ORDER BY pri, doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens) // 256
                AS BIGINT) AS pack_id
    FROM kept
    """


@query(
    "q_training_corpus",
    oracle=_training_corpus_oracle(),
    tags=("pipeline", "capstone", "composition"),
)
def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build, composed from the engine's own
    operators (composition IS the test here): curation keep-set
    (fingerprint dedup + quality floor + language allowlist,
    q_curation_pipeline) -> deterministic md5 train/val/test split
    (q_hash_split's bucketing) -> per-(split, lang) sequence-packing
    offsets (q_pack_sequences' stratified cumulative sum). The Spark
    side literally calls the registered curation query and builds on
    its DataFrame — one plan, and the oracle nests the curation
    oracle as a subquery, so the composed truth stays synchronized
    with the component truth by construction.

    Scale: adds ONE stratified window to the curation plan (whose
    only shuffle is fingerprint-keyed); integer token counts keep
    every offset exact."""
    from ..registry import REGISTRY

    base = REGISTRY["q_curation_pipeline"].fn(spark, sf_dir)
    bucket = F.expr(_hex_val_sql("md5(CAST(doc_id AS STRING))")) % 100
    kept = base.filter("keep").select(
        "doc_id", "lang", "n_tokens",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = (
        Window.partitionBy("split", "lang")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return kept.select(
        "doc_id", "lang", "split", "n_tokens",
        start.cast("long").alias("start_token"),
        F.floor(start / 256).cast("long").alias("pack_id"),
    )


@query(
    "q_data_card",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    doc AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(len(toks)) AS DOUBLE) AS n_tokens,
             CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) AS distinct_texts,
             CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) AS n_en
      FROM t
    ),
    wd AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(toks) AS tok FROM t)
    )
    SELECT 'n_docs' AS metric, n_docs AS value FROM doc
    UNION ALL SELECT 'n_tokens', n_tokens FROM doc
    UNION ALL SELECT 'exact_dup_docs', n_docs - distinct_texts FROM doc
    UNION ALL SELECT 'n_sources', n_sources FROM doc
    UNION ALL SELECT 'mean_tokens_per_doc', ROUND(n_tokens / n_docs, 9) FROM doc
    UNION ALL SELECT 'pct_lang_en', ROUND(n_en / n_docs, 9) FROM doc
    UNION ALL SELECT 'distinct_words', v FROM wd
    """,
    tags=("pipeline", "capstone", "data-card"),
)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATA CARD — the summary table a dataset release
    publishes, computed as two aggregate passes over the documents
    table: one doc-grain aggregate (counts, token totals, exact-dup
    count via md5 distinct, source/language mix) stacked into long
    (metric, value) form, plus one token-grain distinct count. Every
    value is an exact integer (or one IEEE division of two exact
    integers), so the card is hash-stable cross-engine.

    Scale: the doc-grain pass is a single full scan collapsing to ONE
    row (all partial-aggregated map-side — count distinct md5 keeps
    only distinct digests per partition before the exchange); the
    vocabulary distinct is the only token-grain shuffle, bounded by
    |vocab|. At 100 TB, swap exact COUNT(DISTINCT md5) for the HLL
    sketch rollup (q_hll_mergeable) if 1%% error is acceptable —
    same card, constant-size exchange."""
    from ..sources.loader import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    doc = d.select(
        "lang", "source", "text", F.size(toks).alias("n_toks")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_toks").cast("double").alias("n_tokens"),
        F.countDistinct(F.md5(F.col("text"))).cast("double").alias("distinct_texts"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("n_en"),
    )
    stacked = doc.select(
        F.expr(
            "stack(6,"
            " 'n_docs', n_docs,"
            " 'n_tokens', n_tokens,"
            " 'exact_dup_docs', n_docs - distinct_texts,"
            " 'n_sources', n_sources,"
            " 'mean_tokens_per_doc', round(n_tokens / n_docs, 9),"
            " 'pct_lang_en', round(n_en / n_docs, 9)"
            ") AS (metric, value)"
        )
    )
    words = (
        d.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("value"))
        .select(F.lit("distinct_words").alias("metric"), "value")
    )
    return stacked.unionAll(words)
