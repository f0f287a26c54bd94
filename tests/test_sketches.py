"""Count-min sketch properties beyond oracle parity: the one-sided
error guarantee and the constant sketch size that makes it a
100 TB-safe aggregate."""

from __future__ import annotations

from data_lake_with_spark_and_aws_s3_spark.operators import sketches

from .conftest import SF_DIR


def test_cms_never_underestimates(spark):
    rows = sketches.q_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == sketches.TOP_N
    for r in rows:
        assert r.overestimate >= 0, f"CMS underestimated {r.token}"
        assert r.cms_est >= r.exact_cnt


def test_cms_sketch_is_constant_size(spark):
    toks = sketches._tokens(spark, SF_DIR)
    sketch = sketches.cms_sketch(toks)
    assert sketch.count() <= sketches.DEPTH * sketches.WIDTH
    # partial aggregation must be present: the plan's pre-shuffle
    # HashAggregate caps per-task output at DEPTH*WIDTH rows
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan


def test_bitmap_overlap_equals_row_level_twin(spark):
    """The bit-packed overlap must reproduce the row-level
    q_audience_overlap table EXACTLY — same pairs, same counts, same
    ppm ratios — while joining 62x fewer rows."""
    from data_lake_with_spark_and_aws_s3_spark import REGISTRY

    sf = "/root/testdata/sf0.01"
    bm = sorted(
        map(tuple, REGISTRY["q_bitmap_overlap"].fn(spark, sf).collect())
    )
    rows = sorted(
        map(tuple, REGISTRY["q_audience_overlap"].fn(spark, sf).collect())
    )
    assert bm == rows


def test_kmv_estimate_within_sketch_error(spark):
    """KMV with K=64 has relative standard error ~1/sqrt(K-2) ~ 13%;
    assert every per-type estimate lands within 4 sigma (52%) of the
    exact count — a loose, SF-independent sanity band (exactness is
    already hash-checked; this guards against a broken estimator that
    still matches its oracle)."""
    from data_lake_with_spark_and_aws_s3_spark import REGISTRY

    sf = "/root/testdata/sf0.01"
    for r in REGISTRY["q_kmv_sketch"].fn(spark, sf).collect():
        assert abs(r.est_a - r.n_a_exact) <= max(4, 0.52 * r.n_a_exact), r
        assert abs(r.est_b - r.n_b_exact) <= max(4, 0.52 * r.n_b_exact), r


def test_hll_error_curve_headroom(spark):
    """q_hll_error_curve's oracle hardcodes TRUE for within_4_rsd, so a
    bound breach would otherwise surface as an opaque parity hash
    mismatch (ADVICE r7). Assert the RAW |err|/rsd ratio here with a
    readable message: measured worst across all SFs/dials is 1.33, the
    driver-facing bound is 4.0 — this canary fires first (at 3.0) and
    names the dial."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = e.select(F.countDistinct("user_id")).first()[0]
    from data_lake_with_spark_and_aws_s3_spark.operators.aggregates import (
        _HLL_RSDS,
    )

    for rsd in (float(r) for r in _HLL_RSDS):
        est = e.select(F.approx_count_distinct("user_id", rsd=rsd)).first()[0]
        ratio = abs(est - exact) / (rsd * exact)
        assert ratio < 3.0, (
            f"HLL estimate at rsd={rsd} drifted to {ratio:.2f}x rsd "
            f"(est {est} vs exact {exact}); q_hll_error_curve's 4x-rsd "
            "oracle bound is about to breach — re-measure and re-justify"
        )
