"""Shared text-expression builders tuned in the round-8 optimization
pass (guide §1.2 step 2: per-task work, after the plan shape is right).

ngram_join(toks, n) builds the word n-gram array the zip-form way:
n constant-count slices of the token array zipped with concat_ws —
O(n) array allocations per ROW instead of one slice allocation per
POSITION (the previous `transform(sequence(...), i -> concat_ws(' ',
slice(toks, i, n)))` shape). Values are IDENTICAL — same positions,
same ' ' joins, same order — only the expression tree changes, so
every DuckDB oracle and driver hash is untouched. Measured at sf0.1
(documents, 4-grams, 32 cores): the shingle-array stage fell 1.79 s ->
0.65 s after the scan fan-out, and the same expression serves every
shingle consumer (MinHash-LSH twins, prefix filter, containment,
winnowing, span scrub, decontamination).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ngram_join(toks: Column, n: int) -> Column:
    """Array of word n-grams of `toks` joined by ' ': position i
    (1-based) -> concat_ws(' ', toks[i], ..., toks[i+n-1]) for
    i in 1 .. size(toks)-n+1; EMPTY array (not null) when
    size(toks) < n. Bit-identical values to the slice-per-position
    form, built from n slices + (n-1) zip_with passes per row."""
    if n < 1:
        raise ValueError(f"ngram_join needs n >= 1, got {n}")
    m = F.size(toks) - (n - 1)  # gram count when positive
    out = F.slice(toks, 1, m)
    for k in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(toks, k, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) >= n, out).otherwise(
        F.array().cast("array<string>")
    )
