"""Arrow-vectorized physical alternative for pairwise embedding
similarity: same OPERATOR as q_embedding_neardup_exact_smallcorpus (the exact-recall
pairwise cross-check), different physical
strategy — per-block numpy int64 matmul inside applyInPandas instead
of per-pair HOF evaluation.

Why it exists: the HOF form is fully declarative and oracle-checkable,
but evaluates one 64-element fused loop per PAIR. A label block of n
vectors does n² of those. numpy does the same arithmetic as ONE
(n x 64)(64 x n) int64 matrix product per block — identical exact
integers (same quantization grid), dramatically less interpreter
overhead. This is the sanctioned Pandas-UDF slow->fast path from
SURVEY.md §2.11: Python earns its Arrow hop only when it replaces
per-row work with vectorized batch work.

Equality with the declarative form is asserted in
tests/test_similarity_fast.py — same pairs, same cosines, bit-exact.

Scale: one shuffle on the block key (label); per-task memory is
O(block² ) output + O(block x 64) input — the block key must bound
group size (same constraint the HOF form has on pair count).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.loader import load_table
from .similarity import _Q


def embedding_neardup_fast(
    spark: SparkSession, sf_dir: str, threshold: float = 0.3
) -> DataFrame:
    """Pairs (vec_a < vec_b, same label) with cosine >= threshold,
    bit-identical to q_embedding_neardup_exact_smallcorpus's output."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        # same quantization as similarity.qint: round-half-away int64 grid
        emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * _Q
        q = np.where(emb >= 0, np.floor(emb + 0.5), np.ceil(emb - 0.5)).astype(np.int64)
        dots = q @ q.T  # exact: |q| <= ~5.3e7 -> dot <= 1.8e17 < 2^63
        norms = np.sqrt(np.diag(dots).astype(np.float64))
        cos = dots.astype(np.float64) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        # enforce vec_a < vec_b regardless of input row order
        a, b = ids[iu], ids[ju]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        c = cos[iu, ju]
        keep = c >= threshold
        return pd.DataFrame(
            {"vec_a": a[keep], "vec_b": b[keep], "cosine": np.round(c[keep], 6)}
        )

    return e.groupBy("label").applyInPandas(
        block_pairs, schema="vec_a long, vec_b long, cosine double"
    )
