"""Data valuation & supervised featurization (round 6): KNN-Shapley
point valuation over the embedding corpus (Jia et al., PVLDB 2019 —
the closed-form Shapley value of each training point under a KNN
surrogate utility), leave-one-out target encoding with prior smoothing,
a confident-learning-style label-noise matrix (Northcutt et al. 2021,
simplified to a deterministic per-language token-profile classifier),
and weight-of-evidence / information-value binning.

These are the "which training rows are worth keeping / which labels are
wrong / how do I encode this key" operators of a training-data
pipeline, placed beside the dedup/curation families.

Cross-engine exactness: distances and counts are exact scaled-integer
arithmetic (the similarity.py quantization grid); every per-rank
Shapley increment is a ROUND-quantized integer nano-unit BEFORE any
cumulative or cross-row sum (the q_entropy_profile treatment), so the
running Shapley recursion — normally a float cumsum, which DuckDB
evaluates with a segment tree and Spark sequentially, in DIFFERENT
addition orders — becomes order-free integer addition. WOE's ln is
quantized to micro-nats per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table
from .similarity import _DOT_SQL, _NORM2_SQL, cosine_expr, dot_int, qint

# ---------------------------------------------------------------------
# q_knn_shapley
# ---------------------------------------------------------------------

_KS_K = 5  # KNN classifier size
_KS_NTEST = 30  # test points: vec_id < 30
_KS_TOPK = 100  # emit the 100 most valuable training points
_KS_SCALE = 1_000_000_000  # nano-unit quantization of Shapley terms


@query(
    "q_knn_shapley",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding,
             {_NORM2_SQL.format(a="embedding")} AS norm2
      FROM embeddings
    ),
    t AS (SELECT * FROM v WHERE vec_id < {_KS_NTEST}),
    r AS (SELECT * FROM v WHERE vec_id >= {_KS_NTEST}),
    pairs AS (
      SELECT t.vec_id AS test_id, r.vec_id AS train_id, r.label,
             CAST(t.label = r.label AS INTEGER) AS ind,
             CAST({_DOT_SQL.format(a="t.embedding", b="r.embedding")} AS DOUBLE)
               / (sqrt(CAST(t.norm2 AS DOUBLE)) * sqrt(CAST(r.norm2 AS DOUBLE)))
               AS cosine
      FROM t, r
    ),
    ranked AS (
      SELECT test_id, train_id, label, ind,
             CAST(ROW_NUMBER() OVER (PARTITION BY test_id
                                     ORDER BY cosine DESC, train_id)
                  AS BIGINT) AS pos,
             CAST(COUNT(*) OVER (PARTITION BY test_id) AS BIGINT) AS n
      FROM pairs
    ),
    terms AS (
      SELECT test_id, train_id, label, pos, n, ind,
             CAST(ROUND(CAST((ind - lead(ind) OVER w) AS DOUBLE)
                        * {_KS_SCALE}
                        / CAST(greatest({_KS_K}, pos) AS DOUBLE))
                  AS BIGINT) AS term_nano
      FROM ranked
      WINDOW w AS (PARTITION BY test_id ORDER BY pos)
    ),
    shap AS (
      SELECT test_id, train_id, label,
             CAST(ROUND(CAST(first_value(ind) OVER wd AS DOUBLE)
                        * {_KS_SCALE} / CAST(n AS DOUBLE)) AS BIGINT)
             + CAST(SUM(COALESCE(term_nano, 0)) OVER wd AS BIGINT)
               AS s_nano
      FROM terms
      WINDOW wd AS (PARTITION BY test_id ORDER BY pos DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    total AS (
      SELECT train_id AS vec_id, label,
             CAST(SUM(s_nano) AS BIGINT) AS shapley_nano,
             CAST(COUNT(*) AS BIGINT) AS n_test
      FROM shap GROUP BY 1, 2
    )
    SELECT vec_id, label, shapley_nano, n_test
    FROM total
    QUALIFY ROW_NUMBER() OVER (ORDER BY shapley_nano DESC, vec_id)
            <= {_KS_TOPK}
    """,
    tags=("valuation", "knn-shapley", "similarity", "llm-pipeline"),
)
def q_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al. 2019, Thm 1): the
    Shapley value of every training vector under a K=5 nearest-neighbor
    classifier utility over 30 held-out test vectors, in closed form —
    sort train points by distance to each test point, then the
    recursion s_N = 1[y_N=y]/N, s_i = s_{i+1} +
    (1[y_i=y] − 1[y_{i+1}=y]) / max(K, i). Emits the 100 most valuable
    points: the "which rows actually help the model" operator that
    dedup/quality filters don't answer.

    Exactness: cosine ordering uses the exact scaled-int dot/norms
    (identical doubles both engines; row_number ties broken by
    train_id). Each recursion increment is quantized to integer
    NANO-units per row BEFORE the running sum — a float cumsum would be
    engine-divergent because DuckDB's windowed SUM uses a segment tree
    (different addition order than Spark's sequential accumulator); the
    integer form is order-free. Per-test quantization error is
    ≤ 0.5e-9 × N, far below any ranking boundary.

    Scale: |test| is a fixed audit panel, so the pair stage is
    O(|test| × |train|) with the test side broadcast — the same cost
    class as the brute-force arm of q_cosine_topk; at 100 TB swap the
    brute pair stage for the IVF cells of q_ann_ivf_* and keep the
    rank/recursion stages unchanged (they see |test| × k' rows).
    Shapley totals are one exact-integer hash aggregate keyed by
    train_id."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", qint).alias("q"),
        dot_int(F.col("embedding"), F.col("embedding")).alias("norm2"),
    )
    t = v.filter(F.col("vec_id") < _KS_NTEST).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("test_label"),
        F.col("q").alias("qt"),
        F.col("norm2").alias("n2t"),
    )
    r = v.filter(F.col("vec_id") >= _KS_NTEST).select(
        F.col("vec_id").alias("train_id"),
        F.col("label").alias("label"),
        F.col("q").alias("qr"),
        F.col("norm2").alias("n2r"),
    )
    dot = F.aggregate(
        F.zip_with("qt", "qr", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    pairs = r.crossJoin(F.broadcast(t)).select(
        "test_id",
        "train_id",
        "label",
        (F.col("test_label") == F.col("label")).cast("int").alias("ind"),
        cosine_expr(dot, F.col("n2t"), F.col("n2r")).alias("cosine"),
    )
    w_rank = Window.partitionBy("test_id").orderBy(
        F.desc("cosine"), F.asc("train_id")
    )
    ranked = pairs.select(
        "test_id",
        "train_id",
        "label",
        "ind",
        F.row_number().over(w_rank).cast("long").alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("test_id")).cast("long").alias("n"),
    )
    w_asc = Window.partitionBy("test_id").orderBy("pos")
    terms = ranked.withColumn(
        "term_nano",
        F.round(
            (F.col("ind") - F.lead("ind").over(w_asc)).cast("double")
            * _KS_SCALE
            / F.greatest(F.lit(_KS_K), F.col("pos")).cast("double")
        ).cast("long"),
    )
    w_desc = (
        Window.partitionBy("test_id")
        .orderBy(F.desc("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shap = terms.select(
        "test_id",
        "train_id",
        "label",
        (
            F.round(
                F.first("ind").over(w_desc).cast("double")
                * _KS_SCALE
                / F.col("n").cast("double")
            ).cast("long")
            + F.sum(F.coalesce(F.col("term_nano"), F.lit(0))).over(w_desc)
        ).alias("s_nano"),
    )
    total = shap.groupBy(F.col("train_id").alias("vec_id"), "label").agg(
        F.sum("s_nano").alias("shapley_nano"),
        F.count(F.lit(1)).alias("n_test"),
    )
    w_top = Window.orderBy(F.desc("shapley_nano"), F.asc("vec_id"))
    return (
        total.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _KS_TOPK)
        .select("vec_id", "label", "shapley_nano", "n_test")
    )


# ---------------------------------------------------------------------
# q_target_encoding_loo
# ---------------------------------------------------------------------

_TE_M = 10  # prior pseudo-count (smoothing strength)


@query(
    "q_target_encoding_loo",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey, CAST(o_orderstatus = 'F' AS INTEGER) AS y
      FROM orders
    ),
    g AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(y) AS BIGINT) AS n_f
      FROM base GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
             CAST(SUM(n_f) AS BIGINT) AS ss
      FROM g
    )
    SELECT g.o_custkey, g.n_orders, g.n_f,
           CAST(tot.ss AS DOUBLE) / CAST(tot.nn AS DOUBLE) AS prior,
           CAST((g.n_f - 1) * tot.nn + {_TE_M} * tot.ss AS DOUBLE)
             / CAST((g.n_orders - 1 + {_TE_M}) * tot.nn AS DOUBLE)
             AS enc_if_f,
           CAST(g.n_f * tot.nn + {_TE_M} * tot.ss AS DOUBLE)
             / CAST((g.n_orders - 1 + {_TE_M}) * tot.nn AS DOUBLE)
             AS enc_if_o
    FROM g, tot
    """,
    tags=("valuation", "target-encoding", "featurization"),
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of customer key against the
    "order finished" label with m=10 prior smoothing: for a row with
    label y the encoding is (sum_key − y + m·prior) / (n_key − 1 + m).
    Within a key the LOO encoding takes exactly TWO values (y=1 / y=0),
    so the operator emits one row per key with both — the leak-free
    encoder table a feature pipeline joins back on (key, y).

    Exactness: multiplying through by the global count N turns the
    smoothed ratio into one division of exact BIGINT products —
    enc = ((s_k − y)·N + m·S) / ((n_k − 1 + m)·N) — no float prior in
    any intermediate.

    Scale: one hash aggregate keyed by the encode key, a 1-row global,
    and a broadcast cross join — the standard mean-encoding shuffle
    shape; the fold/noise variants change the key, not the shape."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_custkey", (F.col("o_orderstatus") == "F").cast("int").alias("y")
    )
    g = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("y").alias("n_f")
    )
    tot = g.agg(F.sum("n_orders").alias("nn"), F.sum("n_f").alias("ss"))
    j = g.crossJoin(F.broadcast(tot))
    denom = ((F.col("n_orders") - 1 + _TE_M) * F.col("nn")).cast("double")
    return j.select(
        "o_custkey",
        "n_orders",
        F.col("n_f").cast("long").alias("n_f"),
        (F.col("ss").cast("double") / F.col("nn").cast("double")).alias("prior"),
        (
            ((F.col("n_f") - 1) * F.col("nn") + _TE_M * F.col("ss")).cast("double")
            / denom
        ).alias("enc_if_f"),
        (
            (F.col("n_f") * F.col("nn") + _TE_M * F.col("ss")).cast("double") / denom
        ).alias("enc_if_o"),
    )


# ---------------------------------------------------------------------
# q_confident_label_noise
# ---------------------------------------------------------------------

_CL_PROF = 20  # tokens per language profile
_CL_MINHITS = 2  # confidence threshold: abstain below this


@query(
    "q_confident_label_noise",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(list_distinct(
               list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
      FROM documents
    ),
    prof AS (
      SELECT lang AS plang, tok FROM (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY COUNT(*) DESC, tok) AS rn
        FROM toks GROUP BY lang, tok
      ) WHERE rn <= {_CL_PROF}
    ),
    hits AS (
      SELECT t.doc_id, t.lang AS given_lang, p.plang,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM toks t JOIN prof p ON p.tok = t.tok
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, given_lang,
             CASE WHEN max(n_hits) >= {_CL_MINHITS}
                  THEN arg_min(plang, CONCAT(
                         lpad(CAST(100000 - n_hits AS VARCHAR), 6, '0'),
                         plang))
                  ELSE 'abstain' END AS pred_lang
      FROM hits GROUP BY 1, 2
    )
    SELECT given_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CASE WHEN SUM(CASE WHEN pred_lang <> 'abstain'
                              THEN COUNT(*) ELSE 0 END)
                     OVER (PARTITION BY given_lang) > 0 THEN
             CAST(SUM(CASE WHEN pred_lang <> given_lang
                            AND pred_lang <> 'abstain'
                           THEN COUNT(*) ELSE 0 END)
                  OVER (PARTITION BY given_lang) AS DOUBLE)
               / CAST(SUM(CASE WHEN pred_lang <> 'abstain'
                               THEN COUNT(*) ELSE 0 END)
                      OVER (PARTITION BY given_lang) AS DOUBLE)
           END AS noise_rate
    FROM pred GROUP BY given_lang, pred_lang
    """,
    tags=("valuation", "label-noise", "confident-learning", "llm-pipeline"),
)
def q_confident_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning-style label-noise matrix for the language
    labels: build a 20-token profile per language from the corpus
    itself, predict each document's language as the profile with the
    most distinct-token hits (abstaining below 2 hits — the
    "confident" part of Northcutt's confident joint), and emit the
    given × predicted count matrix with the per-given-label noise rate
    (share of confident predictions that disagree). The operator that
    estimates HOW DIRTY the labels are before anyone trains on them.

    Determinism: profiles and hit counts are exact; argmax ties break
    by (hits desc, language asc) — encoded in the oracle as an arg_min
    over a zero-padded sort key so both engines pick the same language;
    the noise rate is one division of exact window sums.

    Scale: profile table is |langs| × 20 rows — broadcast; doc tokens
    explode map-side and collapse in one (doc, lang) aggregate.
    The matrix is |langs|² + abstain rows."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
        ).alias("tok"),
    )
    w_prof = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    prof = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w_prof))
        .filter(F.col("rn") <= _CL_PROF)
        .select(F.col("lang").alias("plang"), "tok")
    )
    hits = (
        toks.join(F.broadcast(prof), "tok")
        .groupBy("doc_id", F.col("lang").alias("given_lang"), "plang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w_best = Window.partitionBy("doc_id", "given_lang").orderBy(
        F.desc("n_hits"), F.asc("plang")
    )
    pred = (
        hits.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "given_lang",
            F.when(F.col("n_hits") >= _CL_MINHITS, F.col("plang"))
            .otherwise(F.lit("abstain"))
            .alias("pred_lang"),
        )
    )
    mat = pred.groupBy("given_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wg = Window.partitionBy("given_lang")
    wrong = F.sum(
        F.when(
            (F.col("pred_lang") != F.col("given_lang"))
            & (F.col("pred_lang") != "abstain"),
            F.col("n_docs"),
        ).otherwise(0)
    ).over(wg)
    confident = F.sum(
        F.when(F.col("pred_lang") != "abstain", F.col("n_docs")).otherwise(0)
    ).over(wg)
    # all-abstain guard: a language whose every doc abstains must emit
    # a defined NULL rate on both engines, not a divergent 0/0
    return mat.select(
        "given_lang",
        "pred_lang",
        "n_docs",
        F.when(
            confident > 0, wrong.cast("double") / confident.cast("double")
        ).alias("noise_rate"),
    )


# ---------------------------------------------------------------------
# q_woe_iv
# ---------------------------------------------------------------------


@query(
    "q_woe_iv",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS bin,
             CAST(COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS BIGINT)
               AS goods,
             CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS bads
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(goods) AS BIGINT) AS gg,
             CAST(SUM(bads) AS BIGINT) AS bb
      FROM b
    ),
    woe AS (
      SELECT b.bin, b.goods, b.bads,
             CASE WHEN b.goods > 0 AND b.bads > 0 THEN
               CAST(ROUND(ln(CAST(b.goods * tot.bb AS DOUBLE)
                             / CAST(b.bads * tot.gg AS DOUBLE)) * 1000000)
                    AS BIGINT)
             END AS woe_mnats,
             CASE WHEN b.goods > 0 AND b.bads > 0 THEN
               CAST(ROUND((CAST(b.goods AS DOUBLE) / CAST(tot.gg AS DOUBLE)
                           - CAST(b.bads AS DOUBLE) / CAST(tot.bb AS DOUBLE))
                          * ROUND(ln(CAST(b.goods * tot.bb AS DOUBLE)
                                     / CAST(b.bads * tot.gg AS DOUBLE))
                                  * 1000000)) AS BIGINT)
             END AS iv_micro
      FROM b, tot
    )
    SELECT bin, goods, bads, woe_mnats, iv_micro,
           CAST(SUM(iv_micro) OVER () AS BIGINT) AS iv_total_micro
    FROM woe
    """,
    tags=("valuation", "woe", "information-value", "featurization"),
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning of order priority
    against the "order finished" outcome — the credit-scoring
    featurization that ranks how separative a categorical is before
    encoding it: WOE_b = ln(good-share / bad-share), IV = Σ_b
    (gshare − bshare)·WOE_b.

    Exactness: the WOE argument is ONE division of exact integer
    products (goods·B)/(bads·G); ln is quantized to integer micro-nats
    per bin (the q_entropy_profile libm treatment), the IV term is
    ROUND-quantized per bin from identically-derived doubles, and the
    total IV is an exact integer window sum. Bins with zero goods or
    bads would need the usual ±0.5 adjustment; the priority × status
    grid is dense at every SF, and an explicit CASE guard on BOTH
    sides pins the latent empty-cell path to NULL (unguarded it would
    diverge: Spark ln(0) is NULL, DuckDB ln(0) is -inf).

    Scale: one hash aggregate to |bins| rows; everything after is
    constant-size."""
    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(F.col("o_orderpriority").alias("bin")).agg(
        F.sum((F.col("o_orderstatus") != "F").cast("int")).alias("goods"),
        F.sum((F.col("o_orderstatus") == "F").cast("int")).alias("bads"),
    )
    tot = b.agg(F.sum("goods").alias("gg"), F.sum("bads").alias("bb"))
    j = b.crossJoin(F.broadcast(tot))
    # empty-cell guard: a bin with zero goods or zero bads gets a
    # defined NULL WOE on both engines (Spark ln(0) -> NULL but DuckDB
    # ln(0) -> -inf — the CASE keeps the latent path engine-agreed);
    # the usual +-0.5 adjustment is the caller's modeling choice
    nonempty = (F.col("goods") > 0) & (F.col("bads") > 0)
    woe_mnats = F.when(
        nonempty,
        F.round(
            F.log(
                (F.col("goods") * F.col("bb")).cast("double")
                / (F.col("bads") * F.col("gg")).cast("double")
            )
            * 1_000_000
        ).cast("long"),
    )
    iv_micro = F.when(
        nonempty,
        F.round(
            (
                F.col("goods").cast("double") / F.col("gg").cast("double")
                - F.col("bads").cast("double") / F.col("bb").cast("double")
            )
            * woe_mnats.cast("double")
        ).cast("long"),
    )
    woe = j.select(
        "bin",
        F.col("goods").cast("long").alias("goods"),
        F.col("bads").cast("long").alias("bads"),
        woe_mnats.alias("woe_mnats"),
        iv_micro.alias("iv_micro"),
    )
    return woe.withColumn(
        "iv_total_micro",
        F.sum("iv_micro").over(Window.partitionBy()).cast("long"),
    )
