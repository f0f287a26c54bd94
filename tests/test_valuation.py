"""Semantic invariants for the round-6 valuation/testing operators —
checks the oracle-parity harness can't express (cross-query identities
and axioms), same spirit as test_trend_attribution.py for round 5."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark import REGISTRY
from data_lake_with_spark_and_aws_s3_spark.operators.valuation import (
    _KS_K,
    _KS_NTEST,
    _KS_SCALE,
)
from data_lake_with_spark_and_aws_s3_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def test_knn_shapley_efficiency_axiom(spark):
    """Shapley efficiency: for each test point the values over ALL
    training points sum to v(full set) = (#label matches among the K
    nearest)/K. The registered query truncates to top-100, so rebuild
    the untruncated per-(test, train) table by re-running the internal
    pipeline via the module (import-free check: recompute KNN utility
    directly and compare against the sum of the full per-test Shapley
    column)."""
    # Re-run the query's own pipeline unfiltered by monkey-patching the
    # top-k to cover every train point, then undo.
    import data_lake_with_spark_and_aws_s3_spark.operators.valuation as mod

    emb = load_table(spark, SF, "embeddings")
    n_train = emb.filter(F.col("vec_id") >= _KS_NTEST).count()
    old = mod._KS_TOPK
    try:
        mod._KS_TOPK = n_train  # emit every training point
        full = REGISTRY["q_knn_shapley"].fn(spark, SF)
        total_nano = full.agg(F.sum("shapley_nano")).collect()[0][0]
    finally:
        mod._KS_TOPK = old

    # Ground-truth utility: per test point, the share of its K nearest
    # training points (exact-int cosine, train_id tie-break) whose
    # label matches; summed over test points.
    from data_lake_with_spark_and_aws_s3_spark.operators.similarity import (
        cosine_expr,
        dot_int,
        qint,
    )
    from pyspark.sql import Window

    v = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", qint).alias("q"),
        dot_int(F.col("embedding"), F.col("embedding")).alias("n2"),
    )
    t = v.filter(F.col("vec_id") < _KS_NTEST).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("tl"),
        F.col("q").alias("qt"),
        F.col("n2").alias("n2t"),
    )
    r = v.filter(F.col("vec_id") >= _KS_NTEST).select(
        F.col("vec_id").alias("train_id"),
        F.col("label").alias("rl"),
        F.col("q").alias("qr"),
        F.col("n2").alias("n2r"),
    )
    dot = F.aggregate(
        F.zip_with("qt", "qr", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    w = Window.partitionBy("test_id").orderBy(
        F.desc("cosine"), F.asc("train_id")
    )
    topk = (
        r.crossJoin(F.broadcast(t))
        .select(
            "test_id",
            "train_id",
            (F.col("tl") == F.col("rl")).cast("int").alias("ind"),
            cosine_expr(dot, F.col("n2t"), F.col("n2r")).alias("cosine"),
        )
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= _KS_K)
    )
    matches = topk.agg(F.sum("ind")).collect()[0][0]
    expected_nano = round(matches * _KS_SCALE / _KS_K)
    # per-term quantization error is <= 0.5e-9 per rank step, N steps
    # per test point -> generous tolerance in nano units
    n_total = emb.count()
    tol = _KS_NTEST * n_total  # 30 * 500 nano = 1.5e-5 absolute
    assert abs(total_nano - expected_nano) <= tol, (
        total_nano,
        expected_nano,
    )


def test_sprt_llr_monotone_in_hits(spark):
    """The LLR trajectory must move +L1 per purchase and +L0 per
    non-purchase: check llr = k*L1 + (n-k)*L0 exactly on every emitted
    checkpoint (an arithmetic identity the hash already pins, restated
    here as a readable invariant)."""
    from data_lake_with_spark_and_aws_s3_spark.operators.testing import (
        _SPRT_L0,
        _SPRT_L1,
    )

    rows = REGISTRY["q_sprt_boundary"].fn(spark, SF).collect()
    assert rows, "no checkpoints emitted"
    for row in rows:
        assert row["llr_mnats"] == row["k"] * _SPRT_L1 + (
            row["n_seen"] - row["k"]
        ) * _SPRT_L0


def test_anova_components_nonnegative_and_consistent(spark):
    """SSB and SSW are sums of squares: both non-negative, and the
    per-group means must bracket the grand mean (min <= grand <= max)."""
    rows = REGISTRY["q_anova_oneway"].fn(spark, SF).collect()
    assert len(rows) == 5
    ssb = {r["ssb_scaled"] for r in rows}
    ssw = {r["ssw_scaled"] for r in rows}
    assert len(ssb) == 1 and len(ssw) == 1  # global columns identical
    assert ssb.pop() >= 0 and ssw.pop() >= 0
    means = [r["mean_cents"] for r in rows]
    grand = sum(r["sum_cents"] for r in rows) / sum(r["n"] for r in rows)
    assert min(means) <= grand <= max(means)


def test_spacesaving_bounds_hold(spark):
    """Every merged estimate must bracket the exact count — the
    mergeable-summary guarantee the query also emits as a boolean."""
    rows = REGISTRY["q_spacesaving_merge"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["within_bounds"]
        assert r["lower_bound"] <= r["exact_count"] <= r["upper_bound"]


def test_rbo_bounds_and_monotone_terms(spark):
    """RBO_min must land in [0, 1e9] nano-units and X_d must be
    non-decreasing in depth (prefix overlap can only grow)."""
    rows = sorted(
        REGISTRY["q_rank_biased_overlap"].fn(spark, SF).collect(),
        key=lambda r: r["d"],
    )
    assert [r["d"] for r in rows] == list(range(1, 11))
    xs = [r["x_d"] for r in rows]
    assert all(b >= a for a, b in zip(xs, xs[1:]))
    assert all(0 <= r["x_d"] <= r["d"] for r in rows)
    assert 0 <= rows[0]["rbo_min_nano"] <= 1_000_000_000
