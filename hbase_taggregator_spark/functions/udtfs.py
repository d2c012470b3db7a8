"""Python UDTF surface (Spark 4 user-defined TABLE functions).

Completes the user-function matrix alongside the JVM-expression decoder
registry (scalar), the pandas UDAF surface (grouped aggregate), and the
mapInPandas multimodal boundary (map-partitions): a UDTF is the
row→many-rows form — SQL-addressable via LATERAL, so pipelines can call
Python expansion logic from plain SQL.

Scale note: a UDTF is a Python-process boundary like any Python UDF —
batched over Arrow when ``useArrow`` is set, parallel per partition, but
still off the codegen path. Use for genuinely imperative expansions
(parsers, segmenters); stays out of the repo's hot paths, mirroring the
multimodal boundary discipline.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: Sentence segmentation: split after '.' runs of whitespace. Deliberately
#: regex-portable (RE2-safe, no lookbehind) so a SQL oracle can restate it
#: with string_split_regex.
_SENT_SPLIT = re.compile(r"\.\s+")


@udtf(returnType="doc_id bigint, sent_idx int, sentence string")
class SplitSentences:
    """Emit (doc_id, 1-based segment index, segment) per sentence;
    whitespace-only segments are dropped but keep their index — identical
    to enumerating the raw split in SQL and filtering after."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        for i, seg in enumerate(_SENT_SPLIT.split(text), start=1):
            if seg.strip():
                yield doc_id, i, seg


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF catalog under stable SQL names."""
    spark.udtf.register("split_sentences", SplitSentences)
