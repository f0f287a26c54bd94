"""Distributed Naive Bayes language identification — the fastText-/
langid-style "train on the corpus, classify the corpus" loop expressed
as pure relational algebra, with the whole trained model living in
keyed tables instead of driver memory.

Add-one-smoothed multinomial NB: score(doc, L) =
    ln P(L) + sum over tokens t of ln((c(L,t)+1) / (T_L + V))
The unseen-token mass is factored out so the scoring join is INNER on
the observed (term, lang) counts only:
    score = prior(L) + n_tokens(doc) * unseen(L)
            + sum over matched t of [logp(L,t) - unseen(L)]
— no |docs| x |vocab| grid ever materializes; each token fans out to
at most |langs| model rows in a term-keyed join.

Cross-engine exactness: every ln is quantized to integer micro-nats at
MODEL granularity (once per (lang, term) / per lang — the BM25 idf
precedent), so per-document scores are exact BIGINT sums, argmax is
deterministic under (score DESC, lang) ordering, and the confusion
matrix hashes exactly.

Scale: the model build is two hash aggregates over the token scan
(map-side partials); the scoring join is keyed on term (shuffle ~
token occurrences x langs-per-term); the per-(doc, lang) reduction and
the argmax window share the doc_id key; the vocabulary-size scalar and
5-row per-lang tables broadcast. Works unchanged when "lang" is any
label column and "term" any feature extractor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table

_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "q_naive_bayes_langid",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, lang AS lang_true, t AS term
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    lt AS MATERIALIZED (
      SELECT lang_true AS lang, CAST(COUNT(*) AS BIGINT) AS t_total
      FROM tok GROUP BY lang_true
    ),
    vv AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tok
    ),
    u AS MATERIALIZED (
      SELECT lang, t_total,
             CAST(ROUND(ln(1.0 / CAST(t_total + (SELECT v FROM vv)
                                      AS DOUBLE)) * 1000000) AS BIGINT)
               AS u_mnats
      FROM lt
    ),
    cnts AS MATERIALIZED (
      SELECT lang_true AS lang, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang_true, term
    ),
    delta AS MATERIALIZED (
      SELECT cnts.lang, cnts.term,
             CAST(ROUND(ln((CAST(c AS DOUBLE) + 1.0)
                           / CAST(u.t_total + (SELECT v FROM vv)
                                  AS DOUBLE)) * 1000000) AS BIGINT)
               - u.u_mnats AS d
      FROM cnts JOIN u USING (lang)
    ),
    nd AS MATERIALIZED (
      SELECT doc_id, MIN(lang_true) AS lang_true,
             CAST(COUNT(*) AS BIGINT) AS ntok
      FROM tok GROUP BY doc_id
    ),
    pri AS MATERIALIZED (
      SELECT lang_true AS lang,
             CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                           / CAST(SUM(COUNT(*)) OVER () AS DOUBLE))
                        * 1000000) AS BIGINT) AS p_mnats
      FROM nd GROUP BY lang_true
    ),
    grid AS MATERIALIZED (
      SELECT nd.doc_id, nd.lang_true, nd.ntok, l.lang
      FROM nd CROSS JOIN (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh'))
                           l(lang)
    ),
    matched AS MATERIALIZED (
      SELECT tok.doc_id, delta.lang, CAST(SUM(delta.d) AS BIGINT) AS dsum
      FROM tok JOIN delta ON delta.term = tok.term
      GROUP BY tok.doc_id, delta.lang
    ),
    scores AS MATERIALIZED (
      SELECT g.doc_id, g.lang_true, g.lang,
             pri.p_mnats + g.ntok * u.u_mnats + COALESCE(m.dsum, 0)
               AS score
      FROM grid g
      JOIN pri USING (lang)
      JOIN u USING (lang)
      LEFT JOIN matched m ON m.doc_id = g.doc_id AND m.lang = g.lang
    ),
    pred AS (
      SELECT lang_true, lang AS lang_pred, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS r
      FROM scores
    )
    SELECT lang_true, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score) AS BIGINT) AS sum_score
    FROM pred WHERE r = 1
    GROUP BY lang_true, lang_pred
    """,
    tags=("classify", "naive-bayes", "language-id", "text", "llm-pipeline"),
)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train an add-one-smoothed multinomial Naive Bayes language model
    on the corpus tokens and classify every document, reporting the
    true-vs-predicted confusion matrix with each cell's exact integer
    score mass. The unseen-token mass is factored out so scoring is an
    INNER term-keyed join against the observed model rows (see module
    docstring); candidate languages attach by exploding a literal
    array (map-side — no doc x lang join). The only nested-loop is the
    broadcast 1-row vocabulary-size scalar stitched onto the 5-row
    per-language totals."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.col("lang").alias("lang_true"),
            F.explode(F.split("text", " ")).alias("term"),
        ).filter(F.col("term") != "")
    )
    lt = tok.groupBy(F.col("lang_true").alias("lang")).agg(
        F.count(F.lit(1)).alias("t_total")
    )
    vv = tok.agg(F.countDistinct("term").alias("v"))
    u = lt.crossJoin(F.broadcast(vv)).select(
        "lang",
        "t_total",
        "v",
        F.expr(
            "CAST(ROUND(ln(1.0 / CAST(t_total + v AS DOUBLE)) * 1000000)"
            " AS BIGINT)"
        ).alias("u_mnats"),
    )
    cnts = tok.groupBy(F.col("lang_true").alias("lang"), "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    delta = cnts.join(F.broadcast(u), "lang").select(
        "lang",
        "term",
        (
            F.expr(
                "CAST(ROUND(ln((CAST(c AS DOUBLE) + 1.0)"
                " / CAST(t_total + v AS DOUBLE)) * 1000000) AS BIGINT)"
            )
            - F.col("u_mnats")
        ).alias("d"),
    )
    nd = tok.groupBy("doc_id").agg(
        F.min("lang_true").alias("lang_true"),
        F.count(F.lit(1)).alias("ntok"),
    )
    pri = nd.groupBy(F.col("lang_true").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs_lang")
    ).select(
        "lang",
        F.expr(
            "CAST(ROUND(ln(CAST(n_docs_lang AS DOUBLE)"
            " / CAST(sum(n_docs_lang) OVER () AS DOUBLE)) * 1000000)"
            " AS BIGINT)"
        ).alias("p_mnats"),
    )
    grid = nd.select(
        "doc_id",
        "lang_true",
        "ntok",
        F.explode(F.array(*[F.lit(x) for x in _LANGS])).alias("lang"),
    )
    matched = (
        tok.join(delta, "term")
        .groupBy("doc_id", "lang")
        .agg(F.sum("d").alias("dsum"))
    )
    scores = (
        grid.join(F.broadcast(pri), "lang")
        .join(F.broadcast(u.select("lang", "u_mnats")), "lang")
        .join(matched, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang_true",
            "lang",
            (
                F.col("p_mnats")
                + F.col("ntok") * F.col("u_mnats")
                + F.coalesce(F.col("dsum"), F.lit(0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "lang")
    pred = scores.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") == 1
    )
    return pred.groupBy(
        "lang_true", F.col("lang").alias("lang_pred")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score").alias("sum_score"),
    )
