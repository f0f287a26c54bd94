"""bench.py contract guards (no Spark session needed).

bench._run_phase silently filters its name lists through REGISTRY —
defensive at runtime, but it means a renamed query would silently
vanish from BENCH_r{N}.json and read as a coverage regression only a
human diff would catch (exactly the q_dedup_clusters_lsh ->
q_dedup_clusters rename hazard from round 4). These tests make a
stale name a loud failure instead.
"""

from __future__ import annotations

import bench
from data_lake_with_spark_and_aws_s3_spark import REGISTRY


def test_headline_names_resolve():
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench HEADLINE names not in REGISTRY: {missing}"


def test_extended_family_names_resolve():
    missing = [
        (fam, n)
        for fam, names in bench.EXTENDED_FAMILIES.items()
        for n in names
        if n not in REGISTRY
    ]
    assert not missing, f"bench EXTENDED names not in REGISTRY: {missing}"


def test_no_duplicate_bench_entries():
    names = bench.HEADLINE + bench.EXTENDED
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"query benched twice (double-counted wall): {dupes}"


def test_protocol_covers_both_phases():
    assert set(bench._PROTOCOL) == {"headline", "extended"}
    for warmups, timed in bench._PROTOCOL.values():
        assert warmups >= 1 and timed >= 1 and timed % 2 == 1, (
            "timed runs must be odd so the median is a real sample"
        )
