"""Value decoder registry — the Spark-native replacement for the reference's
``ColumnInterpreter`` plug-in mechanism.

The reference ships an interpreter *class name* in every request and
instantiates it reflectively on the region server
(``TimeseriesAggregateImplementation.java:122-139`` in /root/reference;
hbase-client's ``ColumnInterpreter`` supplies ``getValue`` bytes→T plus the
promote/divide hooks). Here the same extension point is a plain registry of
named column expressions: bytes→column decoders that run inside codegen — no
remote code loading, no reflection, and the promote/divide algebra collapses
into Spark's cast/aggregate machinery (SURVEY.md §2.1 row 16).

Built-in decoders mirror the interpreters HBase ships (Long / Double /
BigDecimal) in big-endian byte order (``Bytes.toLong`` semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F

# 2^63 and 2^64 exceed Java long literals → decimal string constants.
# Built lazily: a Column can only be constructed with an active session,
# and this module must import before any SparkSession exists.
def _sign_dec() -> Column:
    return F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))")


def _wrap_dec() -> Column:
    return F.expr("CAST('18446744073709551616' AS DECIMAL(20,0))")


def _be_bytes_to_long(c: Column) -> Column:
    """8-byte big-endian signed long (Bytes.toLong). conv() parses the hex
    as unsigned; the sign bit is restored with exact decimal arithmetic
    (the constants don't fit a Java long literal)."""
    unsigned = F.conv(F.hex(c), 16, 10).cast("decimal(20,0)")
    signed = F.when(unsigned >= _sign_dec(), unsigned - _wrap_dec()).otherwise(unsigned)
    return signed.cast("long")


def _long_to_be_bytes(c: Column) -> Column:
    wrapped = F.when(
        c < 0, c.cast("decimal(20,0)") + _wrap_dec()
    ).otherwise(c.cast("decimal(20,0)"))
    # decimal → hex via conv on the string representation
    return F.unhex(F.lpad(F.conv(wrapped.cast("string"), 10, 16), 16, "0"))


def scaled_decimal_decoder(scale: int) -> Callable[[Column], Column]:
    """Decoder for the fixed-scale decimal layout: an 8-byte big-endian
    signed long holding the *unscaled* value (BigDecimal.unscaledValue with a
    known scale — the pure-expression analog of HBase's
    BigDecimalColumnInterpreter; the variable-length Bytes.toBigDecimal
    framing collapses to a schema-level scale here). Entirely conv/hex
    expressions — runs inside codegen."""
    if not 0 <= scale <= 18:
        raise ValueError(f"scale must be in [0, 18], got {scale}")

    def decode(c: Column) -> Column:
        unscaled = _be_bytes_to_long(c)
        return (
            unscaled.cast("decimal(20,0)") / F.lit(10**scale).cast("decimal(20,0)")
        ).cast(f"decimal(20,{scale})")

    return decode


def scaled_decimal_encoder(scale: int) -> Callable[[Column], Column]:
    """Inverse of :func:`scaled_decimal_decoder`: decimal → unscaled long →
    8 big-endian bytes. Exact when the input's scale ≤ ``scale``."""

    def encode(c: Column) -> Column:
        unscaled = (
            c.cast(f"decimal(20,{scale})") * F.lit(10**scale).cast("decimal(20,0)")
        ).cast("long")
        return _long_to_be_bytes(unscaled)

    return encode


DECODERS: dict[str, Callable[[Column], Column]] = {
    "long_be": _be_bytes_to_long,
    "utf8": lambda c: c.cast("string"),
    # BigDecimalColumnInterpreter analog at common scales; arbitrary scales
    # via register_decoder(name, scaled_decimal_decoder(s))
    "decimal_be_2": scaled_decimal_decoder(2),
    "decimal_be_6": scaled_decimal_decoder(6),
}


def _double_bits(c: Column) -> Column:
    # no bits→double builtin; decode via the long pattern then reinterpret
    # with a join-free trick is not expressible — keep the long decoder and
    # cast for integral doubles; full IEEE reinterpret would need a UDF,
    # so it is intentionally NOT registered (UDFs are the slow path).
    raise NotImplementedError(
        "IEEE-754 bit reinterpretation needs a UDF; store doubles natively "
        "or as scaled longs (the reference's tests only use LongColumnInterpreter)"
    )


DECODERS["double_bits_be"] = _double_bits


def register_decoder(name: str, fn: Callable[[Column], Column]) -> None:
    """Register a custom decoder (the plug-in point; pure function of a
    Column — stays JVM-side unless the caller brings a UDF)."""
    DECODERS[name] = fn


def decode_value(c: Column | str, decoder: str = "long_be") -> Column:
    """Decode a BinaryType cell value by registry name."""
    col = F.col(c) if isinstance(c, str) else c
    fn = DECODERS.get(decoder)
    if fn is None:
        raise ValueError(f"unknown decoder {decoder!r}; have {sorted(DECODERS)}")
    return fn(col)


def encode_value(c: Column | str, decoder: str = "long_be") -> Column:
    """Inverse of :func:`decode_value` for the encoders that have one
    (test/fixture synthesis)."""
    col = F.col(c) if isinstance(c, str) else c
    if decoder == "long_be":
        return _long_to_be_bytes(col)
    if decoder == "utf8":
        return F.encode(col.cast("string"), "UTF-8")
    if decoder.startswith("decimal_be_"):
        return scaled_decimal_encoder(int(decoder.rsplit("_", 1)[1]))(col)
    raise ValueError(f"no encoder for {decoder!r}")
