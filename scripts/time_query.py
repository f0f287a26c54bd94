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
    args = sys.argv[1:]
    warmups, timed = 1, 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "-w":
            warmups = int(args[i + 1]); i += 2
        elif args[i] == "-n":
            timed = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-query")
    out = {}
    for name in names:
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
