"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `BinaryType` columns; feature extraction
runs as Arrow-batched `mapInPandas` (one Python worker per partition,
columnar transfer — the sanctioned slow path for logic Spark can't express
in the JVM). The *plumbing* — schema contract, batch iteration, partition
parallelism — is real and tested; the actual media decoding is stubbed
behind an import gate because codec libraries (PIL/ffmpeg/torchaudio) are
not in this environment. Swap `_decode_image_stub` for a real decoder and
nothing else changes.

At scale: mapInPandas keeps batches bounded
(`spark.sql.execution.arrow.maxRecordsPerBatch`); payload bytes never hit
the driver; per-partition workers scale with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from hbase_taggregator_spark.util import ensure_parallelism

#: output schema of extract_binary_features (kept flat for sink-friendliness)
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, first_byte int, entropy_bucket int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text stand in
    for an image/audio blob in tests — same BinaryType plumbing)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def extract_binary_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched per-payload feature extraction via mapInPandas.

    Deterministic byte-level features (size, md5, first byte, a coarse
    byte-entropy bucket) — the shape a real decode-then-featurize pipeline
    has, minus the codec.
    """
    import hashlib
    import math

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            rows = {
                "doc_id": pdf[id_col],
                "n_bytes": payloads.map(len),
                "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "entropy_bucket": payloads.map(_entropy_bucket),
            }
            yield pd.DataFrame(rows)

    def _entropy_bucket(b: bytes) -> int:
        if not b:
            return 0
        counts: dict[int, int] = {}
        for byte in b:
            counts[byte] = counts.get(byte, 0) + 1
        n = len(b)
        h = -sum(c / n * math.log2(c / n) for c in counts.values())
        return int(h)  # 0..8 buckets

    narrow = ensure_parallelism(df.select(id_col, payload_col))
    return narrow.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads to (width, height, mode) metadata.

    STUB: requires an image codec library, which is not available in this
    environment. The Spark-side contract (BinaryType in, struct out via
    mapInPandas) is what the engine defines; plug a decoder in here.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding needs a codec library (PIL); not present in this "
            "environment — extract_binary_features covers the plumbing"
        ) from e
    raise NotImplementedError("wire PIL decode here when the codec is present")


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n: int = 30) -> DataFrame:
    """Sample every Nth frame from video payloads.

    STUB: requires a container/codec demuxer (ffmpeg); same contract as
    :func:`decode_image`.
    """
    raise NotImplementedError(
        "video frame sampling needs ffmpeg bindings; not present in this "
        "environment — the mapInPandas batch contract is defined in "
        "extract_binary_features"
    )
