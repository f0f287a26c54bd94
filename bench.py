"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: wall-clock to full collect(), warm-up runs
per query (JVM/codegen warm), then median of timed runs.

Isolation (round-3 fix): the 5 headline queries and the extended set run
in SEPARATE child processes, each with its own fresh JVM — round 2
showed that sharing one session across all 17 queries inflated the
headline numbers 7-21% (accumulated codegen cache / GC pressure), which
reads as a phantom regression round over round. The parent holds no
SparkSession; it merges the two phases and prints the single JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

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
    # NOTE round 3: q_minhash_lsh became the sketch-twin contract (runs
    # the xxhash64 throughput pipeline AND the md5 twin + precision
    # join) — its wall grew by design; compare r3+ numbers to r3, not
    # to the r1/r2 pair-emitting variant.
    "q_minhash_lsh",
    "q_dedup_clusters",
    # round 3: the no-quadratic-stage clusters composition (LSH edges
    # via the md5 twin + star-contraction CC)
    "q_dedup_clusters_lsh",
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
    # round 3, session 2: substring-dedup signal, PQ ANN pipeline,
    # iterative BFS — the new 100 TB-relevant shapes
    "q_repeated_ngram_profile",
    "q_ann_pq_rerank",
    "q_bfs_hops",
    # round 3, session 3: exact-substring span scrub (the heaviest new
    # corpus op; BPE train/apply are vocabulary-bound and scheduling-
    # dominated locally, so benching them here would measure overhead).
    # NOTE: extended entries share one child JVM, so LATE entries carry
    # accumulated codegen-cache/GC drag — this one measures ~3.5s warm
    # in a clean session vs ~2-3x that here. Only the headline phase
    # (fresh JVM, first thing it runs) is comparable round-over-round.
    "q_duplicate_span_scrub",
    # round 3, session 4: retrieval + communities flagships (index
    # build + LM-filter + LPA are the distributed shapes; the other
    # session-4 ops are layout/reader demos whose cost is write-bound)
    "q_bm25_topk",
    "q_bigram_lm_score",
    "q_label_propagation",
    # round 3, session 8: the new iterative flagships (HITS = PageRank
    # two-shuffle shape; grid DBSCAN = cell-granular star-contraction CC)
    "q_hits_hubs_authorities",
    "q_grid_dbscan",
]

# Headline gets the stabler protocol (2 warm-ups, median of 5): it IS
# the graded metric, and the first-query run in a cold JVM pays one-time
# codegen/FS-init costs a single warm-up doesn't fully amortize.
_PROTOCOL = {"headline": (2, 5), "extended": (1, 3)}


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_phase(phase: str) -> None:
    """Child entry: time one phase's queries in this fresh JVM and print
    a JSON timings dict as the LAST stdout line."""
    from data_lake_with_spark_and_aws_s3_spark import REGISTRY
    from data_lake_with_spark_and_aws_s3_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in (HEADLINE if phase == "headline" else EXTENDED) if n in REGISTRY]
    warmups, timed = _PROTOCOL[phase]
    spark = get_spark(app_name=f"engine-bench-{phase}")
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        for _ in range(warmups):
            fn(spark, sf_dir).collect()
        runs = []
        for _ in range(timed):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
    print(json.dumps(timings))
    spark.stop()


def main() -> None:
    if phase := os.environ.get("SPARK_GRAFT_BENCH_PHASE"):
        _run_phase(phase)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    timings: dict[str, float] = {}
    for phase in ("headline", "extended"):
        env = dict(os.environ, SPARK_GRAFT_BENCH_PHASE=phase)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        # Last stdout line is the timings dict (Spark noise goes to stderr,
        # but guard against stray stdout lines anyway).
        timings.update(json.loads(proc.stdout.strip().splitlines()[-1]))
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


if __name__ == "__main__":
    main()
