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
    # top-K over the train-corpus-sized valuation table: plain
    # orderBy().limit() -> TakeOrderedAndProject (per-partition heaps
    # + driver merge), not a global-rank window that would hold the
    # whole table in one task (VERDICT r6 #3 fix). The ordering is
    # total (shapley_nano desc, vec_id asc), so output is identical.
    return (
        total.orderBy(F.desc("shapley_nano"), F.asc("vec_id"))
        .limit(_KS_TOPK)
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
    ),
    pred_all AS (
      SELECT d.doc_id, d.lang AS given_lang,
             COALESCE(p.pred_lang, 'abstain') AS pred_lang
      FROM documents d LEFT JOIN pred p
        ON p.doc_id = d.doc_id AND p.given_lang = d.lang
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
    FROM pred_all GROUP BY given_lang, pred_lang
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
    explode map-side and collapse in one (doc, lang) aggregate; a
    left join against the full doc population folds zero-hit docs
    into 'abstain' so every given-label count is complete. The matrix
    is |langs|² + abstain rows."""
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
    # Docs with ZERO profile hits never reach `hits` (inner join) —
    # left-join the full doc population back so they count as
    # 'abstain' rows instead of silently vanishing from the matrix
    # (ADVICE r6). Narrow 2-column re-scan; pred is doc-keyed so the
    # join adds no skew.
    pred_all = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("lang").alias("given_lang"))
        .join(pred, ["doc_id", "given_lang"], "left")
        .select(
            "doc_id",
            "given_lang",
            F.coalesce("pred_lang", F.lit("abstain")).alias("pred_lang"),
        )
    )
    mat = pred_all.groupBy("given_lang", "pred_lang").agg(
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


# ---------------------------------------------------------------------
# q_bradley_terry (round 6)
# ---------------------------------------------------------------------

_BT_ITEMS = 12  # rating pool: top parts by comparison volume
_BT_ITERS = 3  # fixed MM iterations (Hunter 2004), statically unrolled
_BT_R0 = 1_000_000  # initial rating, micro-units


def _bt_iter_sql(prev: str, out: str) -> str:
    """One integer-quantized MM update as a pair of CTE blocks:
    t_ij = ROUND(1e12 * n_ij / (r_i + r_j)) summed exactly per i,
    r_raw_i = ROUND(1e12 * (2*W_i + 1) / (2*D_i)) (half-win prior),
    then renormalized so ratings sum to K * 1e6."""
    return f"""
    d_{out} AS (
      SELECT dp.i,
             CAST(SUM(CAST(ROUND(1e12 * CAST(dp.n AS DOUBLE)
                                 / CAST(ri.r + rj.r AS DOUBLE))
                           AS BIGINT)) AS BIGINT) AS dsum
      FROM dpairs dp
      JOIN {prev} ri ON ri.part = dp.i
      JOIN {prev} rj ON rj.part = dp.j
      GROUP BY dp.i
    ),
    raw_{out} AS (
      SELECT w.part,
             CAST(ROUND(1e12 * (2.0 * CAST(w.wins AS DOUBLE) + 1.0)
                        / (2.0 * CAST(d.dsum AS DOUBLE))) AS BIGINT) AS rr
      FROM wins w JOIN d_{out} d ON d.i = w.part
    ),
    {out} AS (
      SELECT part,
             CAST(ROUND(CAST({_BT_ITEMS} AS DOUBLE) * 1e6 * CAST(rr AS DOUBLE)
                        / CAST((SELECT SUM(rr) FROM raw_{out}) AS DOUBLE))
                  AS BIGINT) AS r
      FROM raw_{out}
    )"""


_BT_ORACLE_HEAD = f"""
    WITH cmp AS (
      SELECT a.l_partkey AS pw, b.l_partkey AS pl
      FROM lineitem a JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey
       AND a.l_partkey <> b.l_partkey
       AND a.l_quantity > b.l_quantity
    ),
    vol AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_cmp FROM (
        SELECT pw AS part FROM cmp UNION ALL SELECT pl AS part FROM cmp
      ) GROUP BY part
    ),
    items AS (
      SELECT part FROM vol
      QUALIFY ROW_NUMBER() OVER (ORDER BY n_cmp DESC, part) <= {_BT_ITEMS}
    ),
    kept AS (
      SELECT pw, pl FROM cmp
      WHERE pw IN (SELECT part FROM items)
        AND pl IN (SELECT part FROM items)
    ),
    upairs AS (
      SELECT LEAST(pw, pl) AS a, GREATEST(pw, pl) AS b,
             CAST(SUM(CASE WHEN pw < pl THEN 1 ELSE 0 END) AS BIGINT) AS wa,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM kept GROUP BY 1, 2
    ),
    dpairs AS (
      SELECT a AS i, b AS j, n FROM upairs
      UNION ALL
      SELECT b AS i, a AS j, n FROM upairs
    ),
    wins AS (
      SELECT i.part,
             CAST(COALESCE(SUM(k.won), 0) AS BIGINT) AS wins,
             CAST(COALESCE(SUM(k.cnt), 0) AS BIGINT) AS n_comparisons
      FROM items i LEFT JOIN (
        SELECT pw AS part, 1 AS won, 1 AS cnt FROM kept
        UNION ALL
        SELECT pl AS part, 0 AS won, 1 AS cnt FROM kept
      ) k ON k.part = i.part
      GROUP BY i.part
    ),
    r0 AS (SELECT part, CAST({_BT_R0} AS BIGINT) AS r FROM items),"""


@query(
    "q_bradley_terry",
    oracle=_BT_ORACLE_HEAD
    + ",".join(
        _bt_iter_sql(f"r{k}", f"r{k + 1}") for k in range(_BT_ITERS)
    )
    + f"""
    SELECT w.part, w.wins, w.n_comparisons,
           r.r AS rating_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY r.r DESC, w.part) AS BIGINT)
             AS rank
    FROM wins w JOIN r{_BT_ITERS} r ON r.part = w.part
    """,
    tags=("valuation", "bradley-terry", "preference-model", "llm-pipeline"),
)
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference ratings via Hunter's MM algorithm — the
    model behind RLHF reward-model preference data and chat-arena
    leaderboards, run on derived pairwise preferences (within an order,
    the part with the larger quantity "wins"). Top-12 parts by
    comparison volume are rated with 3 statically-unrolled MM updates
    r_i <- (W_i + 1/2) / Σ_j n_ij/(r_i + r_j), half-a-win regularized
    (so an all-losses item keeps a positive rating), renormalized each
    step so ratings sum to K·1e6.

    Exactness: every MM update is division of exact operands quantized
    back to integer micro-units BEFORE any cross-row sum — ratings stay
    exact integers between iterations, so both engines run the
    identical integer dynamical system (the float fixpoint would
    diverge engine-to-engine in summation order). Fixed iteration
    count, not convergence-tested: determinism over MLE polish.

    Scale: the comparison derivation is the co-purchase self-join
    (order-size-bounded, linear in lineitem); everything after operates
    on a K-item pool — constant-size rating table per iteration, the
    same driver-loop shape as PageRank/Lloyd with broadcastable state.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pw"),
        F.col("l_quantity").alias("qw"),
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pl"),
        F.col("l_quantity").alias("ql"),
    )
    cmp_ = (
        a.join(b, "ok")
        .filter((F.col("pw") != F.col("pl")) & (F.col("qw") > F.col("ql")))
        .select("pw", "pl")
    )
    vol = (
        cmp_.select(F.col("pw").alias("part"))
        .unionAll(cmp_.select(F.col("pl").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_cmp"))
    )
    w_items = Window.orderBy(F.desc("n_cmp"), F.asc("part"))
    items = (
        vol.withColumn("rn", F.row_number().over(w_items))
        .filter(F.col("rn") <= _BT_ITEMS)
        .select("part")
    )
    kept = cmp_.join(
        F.broadcast(items.select(F.col("part").alias("pw"))), "pw", "left_semi"
    ).join(
        F.broadcast(items.select(F.col("part").alias("pl"))), "pl", "left_semi"
    )
    upairs = kept.groupBy(
        F.least("pw", "pl").alias("a"), F.greatest("pw", "pl").alias("b")
    ).agg(
        F.sum(F.when(F.col("pw") < F.col("pl"), 1).otherwise(0)).alias("wa"),
        F.count(F.lit(1)).alias("n"),
    )
    dpairs = upairs.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "n"
    ).unionAll(upairs.select(F.col("b").alias("i"), F.col("a").alias("j"), "n"))
    outcomes = kept.select(
        F.col("pw").alias("part"), F.lit(1).alias("won")
    ).unionAll(kept.select(F.col("pl").alias("part"), F.lit(0).alias("won")))
    wins = (
        items.join(outcomes, "part", "left")
        .groupBy("part")
        .agg(
            F.coalesce(F.sum("won"), F.lit(0)).alias("wins"),
            F.count(F.col("won")).alias("n_comparisons"),
        )
    )
    # the K-item rating state and pair matrix are tiny — materialize
    # once, iterate as broadcast joins (the PageRank driver-loop shape)
    dpairs = dpairs.localCheckpoint(eager=True)
    wins = wins.localCheckpoint(eager=True)
    # seed ratings from the CHECKPOINTED wins table (same 12 parts) —
    # seeding from `items` would re-derive the whole lineitem
    # self-join pipeline once per iteration (round-7 fix: this plus
    # the per-iteration checkpoint below cut the warm sf0.01 wall
    # ~17s -> ~2s; the old chained plan re-ran the comparison build
    # inside every broadcast)
    r = wins.select("part", F.lit(_BT_R0).cast("long").alias("r"))
    for _ in range(_BT_ITERS):
        ri = r.select(F.col("part").alias("i"), F.col("r").alias("r_i"))
        rj = r.select(F.col("part").alias("j"), F.col("r").alias("r_j"))
        d = (
            dpairs.join(F.broadcast(ri), "i")
            .join(F.broadcast(rj), "j")
            .select(
                "i",
                F.round(
                    F.lit(1e12)
                    * F.col("n").cast("double")
                    / (F.col("r_i") + F.col("r_j")).cast("double")
                ).cast("long").alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").alias("dsum"))
        )
        raw = wins.join(d, wins["part"] == d["i"]).select(
            "part",
            F.round(
                F.lit(1e12)
                * (2.0 * F.col("wins").cast("double") + 1.0)
                / (2.0 * F.col("dsum").cast("double"))
            ).cast("long").alias("rr"),
        )
        s = raw.agg(F.sum("rr").alias("s"))
        r = (
            raw.crossJoin(F.broadcast(s))
            .select(
                "part",
                F.round(
                    F.lit(float(_BT_ITEMS))
                    * 1e6
                    * F.col("rr").cast("double")
                    / F.col("s").cast("double")
                ).cast("long").alias("r"),
            )
            # 12-row state: checkpoint per step so iteration plans stay
            # flat instead of nesting every prior step's windows
            .localCheckpoint(eager=True)
        )
    w_rank = Window.orderBy(F.desc("r"), F.asc("part"))
    return (
        wins.join(r, "part")
        .select(
            "part",
            F.col("wins").cast("long").alias("wins"),
            F.col("n_comparisons").cast("long").alias("n_comparisons"),
            F.col("r").alias("rating_micro"),
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
    )
