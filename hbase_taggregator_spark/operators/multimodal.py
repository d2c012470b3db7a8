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


#: output schema of decode_image
IMAGE_META_SCHEMA = "doc_id long, fmt string, width int, height int"


def _parse_image_header(b: bytes) -> tuple[str, int, int]:
    """Pure-Python metadata decode of the public image container formats:
    PNG IHDR (big-endian u32 dims at offsets 16/20), GIF logical screen
    (little-endian u16 at 6/8), BMP BITMAPINFOHEADER (little-endian i32 at
    18/22), JPEG SOFn marker scan. Header layouts are from the published
    format specs — no codec library involved; pixel decode stays behind
    :func:`decode_pixels`."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            "bmp",
            int.from_bytes(b[18:22], "little", signed=True),
            int.from_bytes(b[22:26], "little", signed=True),
        )
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seglen
    return ("unknown", -1, -1)


def decode_image(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode image payloads to (fmt, width, height) metadata — Arrow-batched
    ``mapInPandas``, headers-only pure-Python parsing (PNG/GIF/BMP/JPEG; see
    :func:`_parse_image_header`), so the gate runs with no codec library.
    Full pixel decode is the separately-gated :func:`decode_pixels`; swapping
    the parser for a real codec changes nothing about the Spark contract
    (BinaryType in, flat struct out, bounded Arrow batches, payload bytes
    never on the driver)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(lambda b: _parse_image_header(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "fmt": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]).astype("int32"),
                    "height": meta.map(lambda m: m[2]).astype("int32"),
                }
            )

    narrow = ensure_parallelism(df.select(id_col, payload_col))
    return narrow.mapInPandas(decode, IMAGE_META_SCHEMA)


def _hex_be32(c: F.Column) -> F.Column:
    return F.lpad(F.hex(c.cast("bigint")), 8, "0")


def _hex_le32(c: F.Column) -> F.Column:
    h = _hex_be32(c)
    return F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )


def _hex_le16(c: F.Column) -> F.Column:
    h = F.lpad(F.hex(c.cast("bigint")), 4, "0")
    return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))


def synth_image_payload(
    width: F.Column, height: F.Column, fmt: F.Column
) -> F.Column:
    """Deterministic minimal image payload (real PNG/GIF/BMP header bytes
    with the given dimensions) built ENTIRELY from JVM expressions (hex
    string assembly → unhex) — the test-fixture generator for
    :func:`decode_image`, so gate queries get byte-real payloads without a
    Python producer."""
    png = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _hex_be32(width), _hex_be32(height), F.lit("0806000000"),
    )
    gif = F.concat(
        F.lit("474946383961"), _hex_le16(width), _hex_le16(height),
        F.lit("F70000"),
    )
    bmp = F.concat(
        F.lit("424D" + "1A000000" + "00000000" + "1A000000" + "28000000"),
        _hex_le32(width), _hex_le32(height),
    )
    hexs = (
        F.when(fmt == "png", png).when(fmt == "gif", gif).otherwise(bmp)
    )
    return F.unhex(hexs)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9, filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(ftype: int, raw: bytes, prev: bytes) -> bytes:
    """Apply PNG scanline filter ``ftype`` (0=None 1=Sub 2=Up 3=Average
    4=Paeth) to one 8-bit grayscale row (bpp=1). ``prev`` is the RAW
    (unfiltered) prior scanline, zeros for the first row."""
    out = bytearray([ftype])
    for x, r in enumerate(raw):
        a = raw[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 0:
            f = r
        elif ftype == 1:
            f = r - a
        elif ftype == 2:
            f = r - b
        elif ftype == 3:
            f = r - (a + b) // 2
        else:
            f = r - _paeth(a, b, c)
        out.append(f & 0xFF)
    return bytes(out)


def _png_unfilter_row(ftype: int, data: bytes, prev: bytes) -> bytearray:
    """Invert :func:`_png_filter_row` — reconstruct the raw scanline."""
    out = bytearray()
    for x, f in enumerate(data):
        a = out[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 0:
            v = f
        elif ftype == 1:
            v = f + a
        elif ftype == 2:
            v = f + b
        elif ftype == 3:
            v = f + (a + b) // 2
        elif ftype == 4:
            v = f + _paeth(a, b, c)
        else:
            raise ValueError(f"PNG filter type {ftype} out of range 0-4")
        out.append(v & 0xFF)
    return out


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def synth_png_bytes(doc_id: int, width: int, height: int) -> bytes:
    """COMPLETE valid 8-bit-grayscale PNG (signature, IHDR, zlib IDAT,
    IEND, correct CRCs) whose pixel at (x, y) is the pure arithmetic
    ``(doc_id*7 + y*31 + x*13) mod 256`` — so an oracle can restate every
    decoded pixel without a codec. Scanline filters cycle ``y mod 5``
    through all five PNG filter types, and the IDAT stream is split into
    two chunks, so a decoder must implement real unfiltering and
    multi-chunk reassembly, not just inflate. Byte layout from the public
    PNG spec (RFC 2083); cf. the header-only fixture
    :func:`synth_image_payload` (reference has no image path at all —
    this is north-star surface)."""
    import zlib

    rows = [
        bytes((doc_id * 7 + y * 31 + x * 13) % 256 for x in range(width))
        for y in range(height)
    ]
    prev = bytes(width)
    filtered = bytearray()
    for y, raw in enumerate(rows):
        filtered += _png_filter_row(y % 5, raw, prev)
        prev = raw
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])  # 8-bit, grayscale, deflate, adaptive, none
    )
    comp = zlib.compress(bytes(filtered), 6)
    mid = max(1, len(comp) // 2)  # two IDAT chunks — force reassembly
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:mid])
        + _png_chunk(b"IDAT", comp[mid:])
        + _png_chunk(b"IEND", b"")
    )


def _png_decode_gray(b: bytes) -> tuple[int, int, bytearray]:
    """Pure-stdlib PNG decode for 8-bit grayscale, non-interlaced images:
    chunk walk with CRC32 verification, multi-IDAT reassembly, zlib
    inflate, and per-scanline unfiltering (all five filter types).
    Returns (width, height, pixels row-major). Raises on bad signature,
    corrupt CRC, unsupported color mode, or truncated pixel data."""
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG signature: {b[:8]!r}")
    pos, width, height, idat = 8, -1, -1, bytearray()
    while pos + 12 <= len(b):
        clen = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        crc = int.from_bytes(b[pos + 8 + clen : pos + 12 + clen], "big")
        if (zlib.crc32(ctype + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, _, _, interlace = data[8:13]
            if (bit_depth, color_type, interlace) != (8, 0, 0):
                raise ValueError(
                    "only 8-bit non-interlaced grayscale supported, got "
                    f"depth={bit_depth} color={color_type} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width < 0:
        raise ValueError("missing IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1  # filter byte + one byte per pixel (grayscale-8)
    if len(raw) != stride * height:
        raise ValueError(
            f"pixel data length {len(raw)} != {stride}*{height}"
        )
    pixels = bytearray()
    prev = bytes(width)
    for y in range(height):
        row = _png_unfilter_row(
            raw[y * stride], raw[y * stride + 1 : (y + 1) * stride], prev
        )
        pixels += row
        prev = bytes(row)
    return width, height, pixels


#: output schema of decode_pixels — exact integer pixel summaries, so a
#: SQL oracle verifies every decoded byte without array comparison
PIXEL_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "pixel_sum long, pixel_checksum long"
)


def synth_png_images(
    df: DataFrame, id_col: str = "doc_id", max_w: int = 16, max_h: int = 12
) -> DataFrame:
    """(id, payload) rows where payload is a complete
    :func:`synth_png_bytes` PNG with id-derived dimensions
    ``(8 + id % max_w, 4 + id % max_h)`` — the byte-real fixture feed for
    :func:`decode_pixels`, Arrow-batched like every multimodal producer."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        synth_png_bytes(
                            int(i), 8 + int(i) % max_w, 4 + int(i) % max_h
                        )
                        for i in ids
                    ],
                }
            )

    narrow = ensure_parallelism(df.select(id_col))
    return narrow.mapInPandas(build, "doc_id long, payload binary")


def decode_pixels(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Full pixel decode of PNG payloads — REAL bytes-to-pixels work in
    pure stdlib Python (:func:`_png_decode_gray`: chunk walk + CRC check +
    zlib inflate + scanline unfiltering), Arrow-batched over
    ``mapInPandas`` like :func:`decode_image`. PIL is used as a faster
    drop-in when importable (same output); this environment has no codec
    library, so the stdlib path is the one under test.

    Emits exact integer pixel summaries per image (count, sum, and a
    position-weighted checksum ``sum((y*w + x + 1) * p(x,y))``) rather
    than the pixel array — every decoded byte participates, the result is
    oracle-checkable, and the output stays small at scale. Swap the
    summary projection for the raw array when a downstream model needs
    tensors; the decode path is identical.
    """
    try:
        import PIL.Image as _PIL  # pragma: no cover - not in this env
    except ImportError:
        _PIL = None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, ws, hs, ns, sums, cks = [], [], [], [], [], []
            for id_, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                if _PIL is not None:  # pragma: no cover - not in this env
                    img = _PIL.open(io.BytesIO(b)).convert("L")
                    w, h = img.size
                    px = img.tobytes()
                else:
                    w, h, px = _png_decode_gray(b)
                ids.append(id_)
                ws.append(w)
                hs.append(h)
                ns.append(w * h)
                sums.append(sum(px))
                cks.append(sum((i + 1) * p for i, p in enumerate(px)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(ns, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "pixel_checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, PIXEL_SCHEMA)


def synth_video_payload(id_col: F.Column) -> F.Column:
    """Deterministic synthetic video container — the byte-real fixture for
    :func:`sample_frames`, built entirely from JVM expressions like
    :func:`synth_image_payload`. Layout: ``'SVID'`` magic, uint16-BE frame
    count (``4 + id % 5``), uint32-BE frame size (16), then the frames —
    frame ``i`` is the 16 raw bytes of ``md5('frame:{id}:{i}')``. A stand-in
    for a real container at the byte level: the demuxer must actually parse
    the header and compute offsets to get the frames back."""
    sid = id_col.cast("string")
    n_frames = (F.lit(4) + id_col.cast("bigint") % 5).cast("int")
    header = F.concat(
        F.lit("53564944"),  # 'SVID'
        F.lpad(F.hex(n_frames.cast("bigint")), 4, "0"),
        F.lit("00000010"),  # frame_size = 16
    )
    frames_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.md5(
                F.concat(F.lit("frame:"), sid, F.lit(":"), i.cast("string"))
            ),
        ),
        "",
    )
    return F.unhex(F.concat(header, frames_hex))


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 30,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample every Nth frame from video payloads — real container demux
    over the Arrow ``mapInPandas`` boundary: parse the header (magic,
    frame count, frame size), compute byte offsets, slice the sampled
    frames, and emit per-frame rows with a portable fingerprint
    (``md5`` of the frame's uppercase hex — DuckDB's md5 is VARCHAR-only,
    so the hex detour keeps the gate oracle expressible). PIXEL decode of
    a real codec stays env-gated in :func:`decode_pixels`; the demux path
    here — schema, batching, offset math, error on foreign containers —
    is the production plumbing, exercised on :func:`synth_video_payload`
    bytes.

    Scale shape: pure map-side (no shuffle), Arrow-batched; output rows
    carry fingerprints/lengths, not frame bytes, so the sampled-frame
    manifest is small even when payloads are not. Swap the fingerprint
    projection for the raw slice when a downstream codec needs bytes.
    """
    import hashlib

    out_schema = (
        f"{id_col} long, frame_idx int, frame_len int, frame_fp string"
    )

    def demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, fps = [], [], [], []
            for id_, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                if b[:4] != b"SVID":
                    raise ValueError(
                        f"unknown container magic {b[:4]!r} for {id_col}={id_}"
                    )
                nf = int.from_bytes(b[4:6], "big")
                fs = int.from_bytes(b[6:10], "big")
                for idx in range(0, nf, every_n):
                    fr = b[10 + idx * fs : 10 + (idx + 1) * fs]
                    ids.append(id_)
                    idxs.append(idx)
                    lens.append(len(fr))
                    fps.append(
                        hashlib.md5(fr.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_len": lens,
                 "frame_fp": fps}
            )

    return df.select(id_col, payload_col).mapInPandas(demux, out_schema)
