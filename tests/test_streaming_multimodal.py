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
    """decode_image is real as of round 3 (pure-Python header parse — text
    payloads classify as 'unknown'), and frame sampling is a real demux
    (it REJECTS foreign payloads rather than stubbing out); only pixel
    decode remains the env-gated codec seam."""
    from hbase_taggregator_spark.operators.multimodal import decode_pixels

    docs = with_binary_payload(load_table(spark, SF, "documents").limit(1))
    meta = decode_image(docs).collect()
    assert len(meta) == 1 and meta[0]["fmt"] == "unknown"
    with pytest.raises(NotImplementedError, match="codec"):
        decode_pixels(docs)
    with pytest.raises(Exception, match="magic"):
        sample_frames(docs).collect()


def test_watermark_drops_late_data(spark):
    """Append-mode watermark semantics: an event arriving after its bucket
    was emitted is dropped (the documented late-data policy —
    timeseries_stream.py module docstring). Forced microbatch order via
    file mtimes; note Spark's late filter uses the previous batch's
    watermark, so the drop takes effect for rows arriving at least one
    batch after the bucket's emission — the late row here lands two
    batches after its bucket closed and must not appear anywhere."""
    import datetime as dt
    import glob as g
    import os
    import shutil
    import tempfile

    from hbase_taggregator_spark.streaming.timeseries_stream import (
        bucketed_stream_agg,
        replay_parquet_stream,
    )

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    t0 = int(dt.datetime(2024, 1, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp())
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    batches = [
        ("a", [(1, ts(10, 0), 1.0), (1, ts(10, 5), 2.0), (1, ts(13, 0), 3.0)]),
        ("b", [(1, ts(14, 0), 4.0)]),
        ("c", [(1, ts(10, 10), 100.0), (1, ts(18, 0), 5.0)]),  # 10:10 late
        ("d", [(1, ts(19, 0), 6.0)]),
    ]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        for i, (name, rows) in enumerate(batches):
            tmp = os.path.join(d, f"tmp_{name}")
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
            dst = os.path.join(src, f"{name}.parquet")
            shutil.copy(g.glob(f"{tmp}/*.parquet")[0], dst)
            os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

        stream = replay_parquet_stream(spark, src, max_files_per_trigger=1)
        agg = bucketed_stream_agg(
            stream, t0, 3600, {"count": "n", "sum": "s"},
            watermark="30 minutes",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("late_drop")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        assert not q.isActive
        got = {
            r["bucket_start_us"]: (r["n"], r["s"])
            for r in spark.table("late_drop").collect()
        }
    b0 = t0 * 1_000_000
    # bucket 10:00 closed before the late 10:10 row arrived → it holds only
    # the two on-time rows; the late value 100.0 is absent everywhere
    assert got[b0] == (2, 3.0)
    assert all(abs(s - 100.0) > 1e-9 and s < 100.0 for (_, s) in got.values())
