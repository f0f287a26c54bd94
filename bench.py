"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: wall-clock to full collect(), one warm-up
run per query (JVM/codegen warm), then median of 3 timed runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from data_lake_with_spark_and_aws_s3_spark import REGISTRY  # noqa: E402
from data_lake_with_spark_and_aws_s3_spark.session import get_spark  # noqa: E402

# The first five mirror BASELINE.md exactly; `value` sums ONLY these so
# the headline total stays apples-to-apples round over round.
HEADLINE = [
    "q1_pricing_summary",
    "q3_join_topk",
    "q_window_rank",
    "q_events_tumbling",
    "q_distinct_users",
]

# LLM-data-pipeline operators where the real cost lives at 100 TB —
# timed and reported per-query (not folded into the headline total).
EXTENDED = [
    "q_minhash_lsh",
    "q_dedup_clusters",
    "q_cosine_topk",
    "q_curation_pipeline",
    "q_decontaminate",
    "q_repetition_signals",
    # round 2: heaviest new TPC-H shapes + the iterative clusterer
    "q9_product_profit",
    "q18_large_volume_customers",
    "q_kmeans_lloyd",
    # round 2, session 3: time-series sweeps (window-heavy shapes)
    "q_gap_fill",
    "q_interval_union",
    # round 2, session 4: exact-complete near-dup candidate generation
    "q_prefix_filter_pairs",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="engine-bench")
    names = [n for n in HEADLINE + EXTENDED if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).collect()  # warm-up: codegen + file listing
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
    total = round(sum(timings[n] for n in HEADLINE if n in timings), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
