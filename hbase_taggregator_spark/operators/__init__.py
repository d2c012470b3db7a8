"""Operators: the reference-parity time-series core plus the generalized
relational / window / dedup / similarity / text / multimodal surface
(SURVEY.md §2)."""

from hbase_taggregator_spark.operators.asof import asof_join
from hbase_taggregator_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_table,
    word_shingles,
)
from hbase_taggregator_spark.operators.multimodal import (
    extract_binary_features,
    with_binary_payload,
)
from hbase_taggregator_spark.operators.relational import (
    anti_join,
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
)
from hbase_taggregator_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    token_count,
)
from hbase_taggregator_spark.operators.timeseries import (
    TimeseriesAggregator,
    TimeseriesQuery,
    fill_gaps,
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
]
