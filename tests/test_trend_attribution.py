"""Semantic invariants for the round-5 inference queries, beyond the
value-level DuckDB parity that tests/test_parity.py already runs:

- Shapley efficiency axiom: sum(phi_x24) == 24 * (v(full) - v(empty)).
  The lattice enumeration can be value-parity-green yet still wrong
  against the AXIOMS if a coefficient or subset edge were dropped —
  efficiency pins the whole lattice's bookkeeping with one equation.
- BH step-up shape: the rejected set is exactly ranks 1..k (a step-up
  procedure can never reject rank r while accepting some r' < r).
- Mann-Kendall internal consistency: |S| <= n(n-1)/2 and the variance
  term is nonnegative (tie correction can't exceed the untied
  variance); trend_sign matches sign(S).
- Theil-Sen: the reported median is an actual element of the pairwise
  slope multiset (the lower-median contract), verified independently
  by recomputing the slopes in pandas.
"""

from __future__ import annotations

import pandas as pd

from data_lake_with_spark_and_aws_s3_spark import REGISTRY

SF = "/root/testdata/sf0.01"


def test_shapley_efficiency_axiom(spark):
    phi = (
        REGISTRY["q_shapley_attribution"].fn(spark, SF).toPandas()
    )
    assert set(phi["channel"]) == {"click", "error", "signup", "view"}
    # recompute v(full) and v(empty) from first principles: converting
    # users (any purchase) split by whether they had ANY prior touch
    e = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    pts = (
        e[e.event_type == "purchase"].groupby("user_id")["ts"].min()
    )
    touched = set()
    for uid, first_p in pts.items():
        ue = e[(e.user_id == uid) & (e.event_type != "purchase")]
        if (ue.ts < first_p).any():
            touched.add(uid)
    v_full = len(pts)  # every converting user's set is <= full set
    v_empty = len(pts) - len(touched)  # empty-set users only
    assert phi["phi_x24"].sum() == 24 * (v_full - v_empty)


def test_bh_rejections_are_a_rank_prefix(spark):
    r = REGISTRY["q_bh_fdr"].fn(spark, SF).toPandas().sort_values("rnk")
    rejected = r[r.rejected]["rnk"].tolist()
    assert rejected == list(range(1, len(rejected) + 1))
    # p_ppm must be nonincreasing in significance order (ranks ascend p)
    assert (r["p_ppm"].diff().dropna() >= 0).all()


def test_mann_kendall_bounds(spark):
    mk = REGISTRY["q_mann_kendall"].fn(spark, SF).toPandas()
    for _, row in mk.iterrows():
        n = row["n_days"]
        assert abs(row["s_stat"]) <= n * (n - 1) // 2
        assert 0 <= row["var_s_x18"] <= n * (n - 1) * (2 * n + 5)
        expect = 0 if row["s_stat"] == 0 else (1 if row["s_stat"] > 0 else -1)
        assert row["trend_sign"] == expect


def test_theil_sen_median_is_an_actual_slope(spark):
    ts = REGISTRY["q_theil_sen"].fn(spark, SF).toPandas()
    e = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    e["day"] = pd.to_datetime(e.ts).dt.normalize()
    daily = e.groupby(["event_type", "day"]).size().reset_index(name="y")
    for _, row in ts.iterrows():
        g = daily[daily.event_type == row["event_type"]].sort_values("day")
        ys = g["y"].tolist()
        ds = g["day"].tolist()
        slopes = []
        for i in range(len(ys)):
            for j in range(i + 1, len(ys)):
                dd = (ds[j] - ds[i]).days
                num = ys[j] - ys[i]
                q = (1_000_000 * abs(num)) // dd
                slopes.append(q if num >= 0 else -q)
        slopes.sort()
        assert row["n_pairs"] == len(slopes)
        assert row["median_slope_micro"] == slopes[(len(slopes) + 1) // 2 - 1]
