"""Scalar-function layer: the decoder registry (the engine's analog of the
reference's pluggable ``ColumnInterpreter``) and shared column helpers."""

from hbase_taggregator_spark.functions.decoders import (
    DECODERS,
    decode_value,
    encode_value,
    register_decoder,
)

__all__ = ["DECODERS", "decode_value", "encode_value", "register_decoder"]
