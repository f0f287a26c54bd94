"""Connected components cross-checked against an independent
union-find over the same edge set (third algorithm, zero shared code
with either the Spark iteration or the DuckDB recursive CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark import REGISTRY
from data_lake_with_spark_and_aws_s3_spark.operators.graph import connected_components
from data_lake_with_spark_and_aws_s3_spark.sources.loader import load_table

SF = "/root/testdata/sf0.01"


def _union_find(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for v in vertices:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def test_components_match_union_find(spark):
    out = {r["doc_id"]: r["cluster_id"] for r in REGISTRY["q_dedup_clusters"].fn(spark, SF).collect()}
    # rebuild the same edge set independently
    d = load_table(spark, SF, "documents")
    toks = F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    t = d.select("doc_id", "lang", "source", toks.alias("ts")).collect()
    docs = {}
    for r in t:
        docs[r["doc_id"]] = (r["lang"], r["source"], set(r["ts"]))
    ids = sorted(docs)
    edges = []
    for i, a in enumerate(ids):
        la, sa, ta = docs[a]
        for b in ids[i + 1 :]:
            lb, sb, tb = docs[b]
            if (la, sa) != (lb, sb):
                continue
            inter = len(ta & tb)
            if inter and inter / (len(ta) + len(tb) - inter) >= 0.8:
                edges.append((a, b))
    expected = _union_find(edges, ids)
    assert out == expected


def test_components_handle_isolated_and_chain(spark):
    """Synthetic topology: a 3-chain (a-b, b-c), a pair, an isolated
    vertex — transitivity and isolation both exercised."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    vertices = spark.createDataFrame([(v,) for v in [1, 2, 3, 10, 11, 99]], "id long")
    got = {r["id"]: r["component"] for r in connected_components(edges, vertices).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
