"""Spark-vs-Spark cross-checks tying the pyspark.ml feature classes
(operators/ml_parity.py) to this repo's exactly-oracle-checked
hand-rolled equivalents.

The registered queries hash only engine-portable surfaces (token
counts, twin pair sets, invariant booleans) because murmur3 buckets
and seeded minhash coefficients can't be replayed in DuckDB. These
tests close the remaining gap INSIDE Spark: the ml vectors are checked
bucket-for-bucket against an independent recomputation, the IDF
weights against the closed form, and the MinHashLSH pair set against
the md5-portable twin.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_and_aws_s3_spark.operators.ml_parity import (
    _token_df,
    ml_hashing_tfidf,
    ml_minhash_pairs,
)
from data_lake_with_spark_and_aws_s3_spark.operators.neardup import _ml_exact_pairs

SF = "/root/testdata/sf0.01"


def _bucket_map(spark, toks_df):
    """token -> HashingTF bucket, extracted THROUGH the ml path itself:
    each distinct token becomes a one-token probe document whose single
    nonzero vector index is that token's bucket. Collision-proof — the
    mapping is whatever HashingTF actually computes."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    from data_lake_with_spark_and_aws_s3_spark.operators.ml_parity import _TFIDF_DIM

    vocab = toks_df.select(F.explode("toks").alias("tok")).distinct()
    probe = vocab.select("tok", F.array("tok").alias("toks"))
    tf = HashingTF(inputCol="toks", outputCol="vec", numFeatures=_TFIDF_DIM)
    arr = vector_to_array(F.col("vec"))
    # the probe vector has exactly one nonzero entry; its index is the bucket
    return tf.transform(probe).select(
        "tok",
        F.array_position(arr, 1.0).cast("bigint").alias("bucket_1based"),
    )


def test_hashingtf_counts_match_independent_recomputation(spark):
    """For every (doc, bucket): the HashingTF vector count equals the
    explode->map->groupBy recomputation through the extracted bucket
    mapping. Exact equality, collisions included — mass can merge
    across tokens but never drift."""
    from pyspark.ml.functions import vector_to_array

    toks = _token_df(spark, SF)
    bmap = _bucket_map(spark, toks)

    expected = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .join(F.broadcast(bmap), "tok")
        .groupBy("doc_id", (F.col("bucket_1based") - 1).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )

    out = ml_hashing_tfidf(spark, SF)
    arr = vector_to_array(F.col("tf_vec"))
    actual = (
        out.select(
            "doc_id",
            F.posexplode(arr).alias("bucket", "cnt"),
        )
        .filter(F.col("cnt") != 0)
    )
    mism = (
        actual.exceptAll(expected.select("doc_id", "bucket", "cnt")).count()
        + expected.select("doc_id", "bucket", "cnt").exceptAll(actual).count()
    )
    assert mism == 0, f"HashingTF vectors drift from recomputation ({mism} rows)"


def test_ml_idf_matches_closed_form(spark):
    """Implied IDF weight (tfidf/tf on any nonzero entry) equals
    ln((N+1)/(df+1)) with df counted from the vectors themselves."""
    from pyspark.ml.functions import vector_to_array

    out = ml_hashing_tfidf(spark, SF).cache()
    n_docs = out.count()
    tf_arr = vector_to_array(F.col("tf_vec"))
    idf_arr = vector_to_array(F.col("tfidf_vec"))
    entries = (
        out.select("doc_id", F.posexplode(tf_arr).alias("bucket", "tf"))
        .filter(F.col("tf") != 0)
        .join(
            out.select(
                "doc_id", F.posexplode(idf_arr).alias("bucket", "tfidf")
            ),
            ["doc_id", "bucket"],
        )
    )
    df_per_bucket = entries.groupBy("bucket").agg(
        F.countDistinct("doc_id").alias("df"),
        F.max(F.col("tfidf") / F.col("tf")).alias("idf_hi"),
        F.min(F.col("tfidf") / F.col("tf")).alias("idf_lo"),
    )
    rows = df_per_bucket.collect()  # <= vocabulary size (~tens of buckets)
    assert rows, "no active buckets"
    for r in rows:
        want = math.log((n_docs + 1) / (r.df + 1))
        assert abs(r.idf_hi - want) < 1e-9 and abs(r.idf_lo - want) < 1e-9, (
            f"bucket {r.bucket}: implied idf [{r.idf_lo}, {r.idf_hi}] "
            f"!= ln(({n_docs}+1)/({r.df}+1)) = {want}"
        )
    out.unpersist()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", SF])
def test_ml_minhash_recovers_twin_pairs(spark, sf_dir):
    """approxSimilarityJoin at Jaccard distance 0.5 must recover the
    md5-portable twin's near-dup pairs (>= 90% contract floor; expected
    100% — P(miss) <= 0.5^16 per pair)."""
    twin = _ml_exact_pairs(spark, sf_dir).select("doc_a", "doc_b")
    n_twin = twin.count()
    if n_twin == 0:
        pytest.skip("no twin pairs at this sf")
    ml = ml_minhash_pairs(spark, sf_dir)
    n_common = twin.join(ml, ["doc_a", "doc_b"]).count()
    assert n_common * 10 >= n_twin * 9, (
        f"ml MinHashLSH recall {n_common}/{n_twin} below the 90% floor"
    )
