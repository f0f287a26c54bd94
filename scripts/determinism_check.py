"""Registry-wide cross-JVM determinism check: run every registered
query in TWO fresh Spark JVMs and compare canonical value hashes.

Why this matters: the driver's correctness gate value-hashes each
query ONCE per round in a fresh JVM — a query whose output depends on
partition order / timestamps / RNG would flap round-over-round even
though any single parity run looks green. The repo's design rules
(exact decimal/int aggregation, total-order rankings, no
monotonically_increasing_id) exist precisely so this holds; this
script MEASURES it.

Usage: python scripts/determinism_check.py          # ~2x suite scan cost
       (child mode: --child <sf_dir>, prints one JSON line)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


def _child(sf_dir: str) -> None:
    import pandas as pd  # noqa: F401

    from pyspark.sql import SparkSession

    from data_lake_with_spark_and_aws_s3_spark import REGISTRY
    from tests.parity import _canon

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        pdf = _canon(spec.fn(spark, sf_dir).toPandas())
        csv = pdf.to_csv(index=False, float_format="%.17g")
        out[name] = hashlib.md5(csv.encode()).hexdigest()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    runs = []
    for i in range(2):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", SF_DIR],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        runs.append(json.loads(p.stdout.strip().splitlines()[-1]))
        print(f"run {i + 1}: {len(runs[-1])} queries hashed", file=sys.stderr)
    diff = {k for k in runs[0] if runs[0][k] != runs[1][k]}
    if diff:
        print(f"NON-DETERMINISTIC across JVMs: {sorted(diff)}")
        sys.exit(1)
    print(f"DETERMINISTIC: {len(runs[0])} queries hash-identical across fresh JVMs at {SF_DIR}")


if __name__ == "__main__":
    main()
