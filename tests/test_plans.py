"""Plan-shape regression tests: the scale properties the engine claims are
asserted on real physical plans at sf0.001 (plan shape is sf-independent)."""

from __future__ import annotations

import pytest

from hbase_taggregator_spark import plans as P
from hbase_taggregator_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return QUERIES[name](spark, SF)

    return run


def test_ts_agg_is_partial_final_no_python(q):
    df = q("ts_max_900")
    assert P.has_partial_final_agg(df)
    assert P.python_eval_count(df) == 0


def test_rowkey_decode_stays_jvm_side(q):
    """Mask decode is hex/conv expressions — no Python in the scan path."""
    assert P.python_eval_count(q("ts_rowkey_mode_3600")) == 0


def test_q1_filter_pushdown_and_pruning(q):
    df = q("q1_pricing_summary")
    pushed = " ".join(P.pushed_filters(df))
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed!r}"
    schema = " ".join(P.scan_schemas(df))
    assert "l_comment" not in schema  # nonexistent anyway, but…
    # only needed columns read: no l_orderkey/l_partkey in the q1 scan
    assert "l_partkey" not in schema


def test_q3_q5_broadcast_dimensions(q):
    assert P.broadcast_join_count(q("q3_shipping_priority")) >= 1
    assert P.broadcast_join_count(q("q5_local_supplier")) >= 3


def test_events_time_range_pushdown(spark):
    """With a raw-column time range, the predicate reaches the nanos scan."""
    from hbase_taggregator_spark.queries import T0, T_WEEK, US
    from hbase_taggregator_spark.sources.parquet import load_table

    df = load_table(spark, SF, "events", time_range=(T0 * US, T_WEEK * US))
    pushed = " ".join(P.pushed_filters(df))
    assert "ts" in pushed and "GreaterThanOrEqual" in pushed


@pytest.mark.parametrize(
    "name",
    [
        "ts_max_900",
        "ts_avg_900_odd_start",
        "ts_max_28800_compat",
        "ts_multi_verb_28800",
        "ts_grouped_by_type_86400",
        "ts_rowkey_mode_3600",
        "decoder_registry_long_be",
        "rowkey_range_scan",
    ],
)
def test_gated_ts_queries_prune_the_scan(q, name):
    """The GATED queries themselves (not just the loader) must push the time
    range to the parquet scan — the reference's whole point is scan-range
    pruning (TimeseriesAggregationClient.java:576-581). Round-1 regression:
    the catalog full-scanned events and filtered post-scan."""
    pushed = " ".join(P.pushed_filters(q(name)))
    assert "ts" in pushed and "GreaterThanOrEqual" in pushed, f"{name}: {pushed!r}"


def test_dedup_and_similarity_no_python(q):
    for name in (
        "dedup_exact",
        "dedup_minhash_lsh_candidates",
        "dedup_simhash_signatures",
        "similarity_cosine_topk",
        "text_quality_features",
    ):
        assert P.python_eval_count(q(name)) == 0, name


def test_multimodal_is_the_only_python_path(q):
    assert P.python_eval_count(q("multimodal_binary_features")) == 1


def test_topk_has_no_global_sort_before_limit(q):
    """Window top-k shuffles by group key; the only global sort allowed is
    the final presentation orderBy (none in this query)."""
    df = q("window_topk_parts_per_brand")
    # row_number needs one sort within partitions, not a global range sort
    assert P.count_nodes(df, "Exchange rangepartitioning") == 0


def test_round3_late_wave_no_python_hot_paths(q):
    """The late-wave operators are JVM-expression plans except the UDTF
    (Python by definition) and the materializing sink gates."""
    for name in (
        "ts_ewma_smoothed_3600",
        "ts_largest_gaps_per_type",
        "scd2_user_event_history",
        "profile_documents_columns",
        "sketch_kmv_distinct_users",
        "text_feature_hashing_64",
        "fuzzy_customer_name_candidates",
        "interval_overlap_regimes_sessions",
        "window_rank_functions_showcase",
    ):
        assert P.python_eval_count(q(name)) == 0, name


def test_ewma_lag_chain_reuses_agg_partitioning(q):
    """The EWMA lag window partitions on the same key the bucket agg
    grouped by — no extra Exchange between aggregation and window."""
    df = q("ts_ewma_smoothed_3600")
    # bucket agg + final orderBy = 2 exchanges; the window must not add one
    assert P.count_nodes(df, "Exchange hashpartitioning") <= 2


def test_profile_is_single_scan(q):
    """One scan feeds every per-column aggregate (no per-column rescans)."""
    df = q("profile_documents_columns")
    assert len(P.scan_schemas(df)) == 1
