"""Round-4 catalog queries.

Same conventions as :mod:`hbase_taggregator_spark.queries`: epoch-int
outputs, exact integer / decimal algebra for anything the oracle hashes,
deterministic tiebreaks, and DuckDB oracles that restate the identical
algebra in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.queries import _register, load_table

# ---------------------------------------------------------------------------
# full PNG pixel decode (operators/multimodal.py::decode_pixels) — the
# byte-real bytes→pixels path: complete synthetic PNGs (zlib IDAT, all
# five scanline filters, split IDAT chunks, CRC-verified) are decoded in
# pure stdlib Python over mapInPandas; the oracle restates every pixel
# arithmetically ((doc_id*7 + y*31 + x*13) mod 256) with exact integer
# summaries, so a single wrong byte anywhere in inflate/unfilter breaks
# the hash. Closes the last multimodal stub (r3 pixel decode was
# env-gated on PIL).
# ---------------------------------------------------------------------------


def _q_decode_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.multimodal import (
        decode_pixels,
        synth_png_images,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    return decode_pixels(synth_png_images(docs)).orderBy("doc_id")


_register(
    "multimodal_decode_pixels",
    _q_decode_pixels,
    """
    WITH docs AS (
        SELECT doc_id, 8 + doc_id % 16 AS w, 4 + doc_id % 12 AS h
        FROM documents WHERE doc_id % 10 = 0
    ), px AS (
        SELECT d.doc_id, d.w, d.h, yy.y, xx.x,
               (d.doc_id * 7 + yy.y * 31 + xx.x * 13) % 256 AS p
        FROM docs d,
             LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) yy,
             LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) xx
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_pixels,
           CAST(SUM(p) AS BIGINT) AS pixel_sum,
           CAST(SUM((y * w + x + 1) * p) AS BIGINT) AS pixel_checksum
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
)

# re-apply the gate-window ordering now that round-4 queries are
# registered. Tolerant, like every import-time apply: whichever module
# finishes LAST (it differs per entry point — importing queries_r3
# directly reaches this line while r3 itself has registered nothing yet)
# sees the full catalog and applies the ordering; earlier calls no-op on
# missing names. Window-name drift is caught by the strict apply in
# tests (test_gate_window_* assert names[:50] == _GATE_WINDOW on every
# import path).
from hbase_taggregator_spark.queries_ext import _apply_gate_window  # noqa: E402

_apply_gate_window(strict=False)
