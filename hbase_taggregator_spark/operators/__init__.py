"""Operators: the reference-parity time-series core plus the generalized
relational / window / dedup / similarity / text / multimodal surface
(SURVEY.md §2)."""

from hbase_taggregator_spark.operators.asof import asof_join
from hbase_taggregator_spark.operators.dedup import (
    contamination_overlap,
    decontaminate,
    exact_dedup,
    fuzzy_match_candidates,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_pairs,
    simhash_table,
    word_shingles,
)
from hbase_taggregator_spark.operators.multimodal import (
    extract_binary_features,
    with_binary_payload,
)
from hbase_taggregator_spark.operators.profile import (
    parse_json_quarantine,
    profile_columns,
)
from hbase_taggregator_spark.operators.relational import (
    anti_join,
    interval_overlap_join,
    scd2_from_events,
    table_diff,
    grouping_cube,
    grouping_rollup,
    latest_versions,
    semi_join,
    top_k_per_group,
)
from hbase_taggregator_spark.operators.similarity import (
    ann_lsh_topk,
    cosine,
    cosine_topk,
    lsh_bucket,
    neardup_pairs,
    semdedup,
)
from hbase_taggregator_spark.operators.sketch import (
    bloom_filter_semi,
    count_min_lookup,
    count_min_sketch,
    kmv_distinct,
    kmv_grouped_distinct,
    kmv_set_ops,
)
from hbase_taggregator_spark.operators.text import (
    deterministic_sample,
    feature_hash_counts,
    global_shuffle,
    fingerprint,
    rare_token_ratio,
    language_id,
    quality_features,
    token_count,
)
from hbase_taggregator_spark.operators.timeseries import (
    TimeseriesAggregator,
    TimeseriesQuery,
    ewma_truncated,
    fill_gaps,
    largest_gaps,
    mad_outliers,
)
from hbase_taggregator_spark.operators.windows import session_agg, sliding_bucket_agg

__all__ = [
    "TimeseriesAggregator",
    "TimeseriesQuery",
    "fill_gaps",
    "asof_join",
    "top_k_per_group",
    "latest_versions",
    "semi_join",
    "anti_join",
    "grouping_rollup",
    "grouping_cube",
    "sliding_bucket_agg",
    "session_agg",
    "exact_dedup",
    "word_shingles",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "jaccard_pairs",
    "simhash_table",
    "cosine",
    "cosine_topk",
    "neardup_pairs",
    "lsh_bucket",
    "ann_lsh_topk",
    "fingerprint",
    "language_id",
    "quality_features",
    "token_count",
    "extract_binary_features",
    "with_binary_payload",
    "bloom_filter_semi",
    "contamination_overlap",
    "count_min_lookup",
    "count_min_sketch",
    "ewma_truncated",
    "feature_hash_counts",
    "fuzzy_match_candidates",
    "interval_overlap_join",
    "kmv_distinct",
    "kmv_grouped_distinct",
    "kmv_set_ops",
    "largest_gaps",
    "mad_outliers",
    "profile_columns",
    "rare_token_ratio",
    "scd2_from_events",
    "table_diff",
    "semdedup",
    "simhash_pairs",
    "decontaminate",
    "deterministic_sample",
    "global_shuffle",
    "parse_json_quarantine",
]
