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
