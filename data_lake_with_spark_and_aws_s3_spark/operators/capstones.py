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
