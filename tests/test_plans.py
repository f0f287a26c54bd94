"""Plan-shape regression tests (SURVEY.md §4): correctness tests prove
the answers are right; these prove the PLANS stay right — pushdown,
pruning, broadcast, TakeOrdered — the properties that decide whether a
query survives a 100x scale-up."""

from __future__ import annotations

from data_lake_with_spark_and_aws_s3_spark import REGISTRY
from data_lake_with_spark_and_aws_s3_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    read_schema_columns,
)

SF = "/root/testdata/sf0.01"


def test_q1_filter_pushdown_and_pruning(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF)
    assert has_pushed_filter(df, "l_shipdate"), "date filter must reach the scan"
    (cols,) = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        f"scan reads unprojected columns: {cols}"
    )
    assert count_exchanges(df) == 1  # partial->final agg only


def test_q3_broadcasts_dimensions(spark):
    df = REGISTRY["q3_join_topk"].fn(spark, SF)
    assert has_broadcast_join(df), "customer/orders side should broadcast at this scale"
    assert has_take_ordered(df), "top-10 must plan TakeOrderedAndProject, not global sort"


def test_global_topk_avoids_full_sort(spark):
    df = REGISTRY["q_global_topk"].fn(spark, SF)
    assert has_take_ordered(df)
    assert count_exchanges(df) == 0  # per-partition heaps + driver merge


def test_tumbling_single_shuffle(spark):
    df = REGISTRY["q_events_tumbling"].fn(spark, SF)
    assert count_exchanges(df) == 1


def test_semi_join_prunes_right_columns(spark):
    df = REGISTRY["q_semi_join"].fn(spark, SF)
    schemas = read_schema_columns(df)
    orders_scan = [s for s in schemas if any(c.startswith("o_") for c in s)]
    assert orders_scan and all(
        s <= {"o_custkey", "o_orderpriority"} for s in orders_scan
    ), f"semi join should read only join+filter columns from orders: {orders_scan}"


def test_theta_join_avoids_nested_loop(spark):
    from data_lake_with_spark_and_aws_s3_spark.plans import formatted_plan

    df = REGISTRY["q_theta_join"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, (
        "theta join must use the band/prefix-sum form, not an O(S*C) nested loop"
    )
    assert has_broadcast_join(df), "band-offset join should broadcast the tiny offsets side"


def test_curation_single_fingerprint_scan(spark):
    """Canonical-doc selection must not recompute the md5-shingle scan:
    one documents scan, one fingerprint-keyed exchange."""
    from data_lake_with_spark_and_aws_s3_spark.plans import count_scans

    df = REGISTRY["q_curation_pipeline"].fn(spark, SF)
    assert count_scans(df) == 1, "fingerprint stage scanned documents twice"
    assert count_exchanges(df) == 1


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval-set shingle table must broadcast — a shuffled join here
    would re-shuffle the whole training corpus at 100 TB."""
    df = REGISTRY["q_decontaminate"].fn(spark, SF)
    assert has_broadcast_join(df)


def test_mapside_pipeline_ops_have_no_shuffle(spark):
    """hash split / repetition signals / PII redaction / chunking are
    per-row transforms: any Exchange in these plans is a bug."""
    for name in ("q_hash_split", "q_repetition_signals", "q_pii_redact", "q_doc_chunks"):
        df = REGISTRY[name].fn(spark, SF)
        assert count_exchanges(df) == 0, f"{name} plans a shuffle"


def test_simhash_single_shuffle(spark):
    df = REGISTRY["q_simhash"].fn(spark, SF)
    assert count_exchanges(df) == 1  # explode is map-side; one doc_id agg


def test_global_sort_range_partitions(spark):
    from data_lake_with_spark_and_aws_s3_spark.plans import formatted_plan

    df = REGISTRY["q_global_sort"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "Sort" in plan
    assert "rangepartitioning" in plan.lower() or "RangePartitioning" in plan, (
        "global sort must range-partition, not single-task sort"
    )
