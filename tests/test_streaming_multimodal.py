"""Streaming-vs-batch equivalence (SURVEY.md §5 strategy #4) and the
multimodal binary plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hbase_taggregator_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
    sample_frames,
    with_binary_payload,
)
from hbase_taggregator_spark.operators.timeseries import TimeseriesAggregator
from hbase_taggregator_spark.sources.parquet import load_table
from hbase_taggregator_spark.streaming.timeseries_stream import (
    bucketed_stream_agg,
    replay_parquet_stream,
    run_to_memory,
)

SF = "/root/testdata/sf0.001"
T0 = 1_704_067_200
T_END = T0 + 7 * 86400


def test_stream_equals_batch(spark):
    """Replaying the same parquet through Structured Streaming must produce
    the identical bucket map as the batch engine."""
    stream = replay_parquet_stream(spark, f"{SF}/events.parquet").filter(
        F.unix_micros("ts") < T_END * 1_000_000
    )
    agg = bucketed_stream_agg(stream, T0, 3600, {"count": "c", "sum": "s"})
    streamed = {
        r["bucket_start_us"]: (r["c"], r["s"])
        for r in run_to_memory(spark, agg, "equiv_test").collect()
    }

    q = (
        TimeseriesAggregator(spark)
        .table(load_table(spark, SF, "events"))
        .range(T0, T_END)
        .interval(3600)
    )
    batch = {
        r["bucket_start_us"]: (r["c"], r["s"])
        for r in q.agg(count="c", sum="s").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_binary_features_match_python(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    feats = {
        r["doc_id"]: r
        for r in extract_binary_features(with_binary_payload(docs)).collect()
    }
    for row in docs.collect():
        b = row["text"].encode("utf-8")
        f = feats[row["doc_id"]]
        assert f["n_bytes"] == len(b)
        assert f["payload_md5"] == hashlib.md5(b).hexdigest()
        assert f["first_byte"] == b[0]
        assert 0 <= f["entropy_bucket"] <= 8


def test_media_decode_stubs_raise(spark):
    docs = with_binary_payload(load_table(spark, SF, "documents").limit(1))
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(docs)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(docs)
