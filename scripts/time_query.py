"""Time one or more registered queries in THIS fresh JVM with the bench
protocol (default: 1 warm-up, median of 3, wall to collect()) — the
isolation tool behind the round-8 optimization experiments: run it once
per variant, in a fresh process per run, so numbers are comparable to
bench.py's extended-family children.

Usage: python scripts/time_query.py [-w W] [-n N] name [name ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_lake_with_spark_and_aws_s3_spark import REGISTRY  # noqa: E402
from data_lake_with_spark_and_aws_s3_spark.session import get_spark  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-w", dest="warmups", type=int, default=1)
    ap.add_argument("-n", dest="timed", type=int, default=3)
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()
    warmups, timed = ns.warmups, ns.timed
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-query")
    out = {}
    for name in ns.names:
        if name not in REGISTRY:
            print(f"skip (not registered): {name}", file=sys.stderr)
            continue
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"warmup {name}")
        for _ in range(warmups):
            fn(spark, sf_dir).collect()
        runs = []
        for k in range(timed):
            spark.sparkContext.setJobDescription(f"timed {name} #{k}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"median": round(statistics.median(runs), 4), "runs": runs}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
