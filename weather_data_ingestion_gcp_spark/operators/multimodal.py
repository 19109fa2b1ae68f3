"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract — schema, Arrow batching, ``mapInPandas``
signatures, partitioning — is real and tested. Decoding is real too, with
two tiers: Pillow when importable (full pixel decode), else a pure-bytes
container-header parse that reads width/height/channels/format straight
from PNG / JPEG / GIF / BMP headers with no image library at all. The
``fake=True`` path keeps the deterministic length-derived decoder used by
the cross-engine oracles (DuckDB can mirror arithmetic on byte length, not
a JPEG bitstream).

At scale: binary payloads dominate row size, so every operator here projects
the payload away as early as possible and mapInPandas batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep Arrow buffers in
executor memory.
"""

from __future__ import annotations

import struct
import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The mapInPandas closures below are pickled by value (they are nested
# functions), but they call module-level helpers (_parse_image_header,
# _decode_image_bytes, _parse_wav_header) which cloudpickle serializes by
# REFERENCE — so a Python worker whose sys.path lacks this repo (any
# executor the package was not shipped to; measured: a driver process
# launched from another cwd) dies with ModuleNotFoundError on the first
# decode task. Registering the module pickles those helpers by value too:
# the UDF payload becomes self-contained stdlib-only bytecode, no worker-
# side import of this package required. The helpers are small pure
# functions, so the per-UDF payload cost is a few KB, once per task launch.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

#: Output schema of decode_metadata — stable contract for downstream ops.
DECODE_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, channels int, format string"
)

#: PNG color type -> sample count (PNG spec, IHDR color-type field).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_image_header(p: bytes) -> tuple[int, int, int, str]:
    """(width, height, channels, format) parsed from real container bytes.

    Pure-bytes, dependency-free readers for the four ubiquitous formats —
    all per their public specs:

    - PNG: 8-byte signature, then the IHDR chunk at a fixed offset —
      width/height are big-endian u32 at bytes 16/20, color type at 25.
    - JPEG: walk the marker stream to the first SOF frame header
      (0xC0–0xCF minus DHT/JPG/DAC); height/width are big-endian u16 at
      +5/+7 inside it, component count at +9.
    - GIF: 6-byte version signature then little-endian u16 logical-screen
      width/height; palette formats decode to RGB (3 channels).
    - BMP: 'BM' + BITMAPINFOHEADER — little-endian i32 width/height at
      18/22, bits-per-pixel at 28 (height may be negative = top-down).

    Raises ``ValueError`` on anything else — the caller surfaces it as a
    per-row decode error, the honest behavior for corrupt media at scale.
    """
    if len(p) >= 26 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        color_type = p[25]
        return w, h, _PNG_CHANNELS.get(color_type, 3), "png"
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker == 0xFF:  # legal fill/padding byte before a marker
                i += 1
                continue
            if marker == 0xD9:  # EOI — end of image, no SOF found
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", p[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                return w, h, p[i + 9], "jpeg"
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF frame header found")
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", p[6:10])
        return w, h, 3, "gif"
    if len(p) >= 30 and p[:2] == b"BM":
        w, h = struct.unpack("<ii", p[18:26])
        bpp = struct.unpack("<H", p[28:30])[0]
        return w, abs(h), max(1, bpp // 8), "bmp"
    raise ValueError("unsupported or corrupt image container")


def _decode_image_bytes(payload: bytes, fake: bool) -> tuple[int, int, int, str]:
    """(width, height, channels, format) for one payload.

    Real path: Pillow when available (full decode), else the pure-bytes
    header parse above — works on genuine PNG/JPEG/GIF/BMP files with no
    image library in the container. Fake path: deterministic in payload
    length, mirrored arithmetic in the DuckDB oracles.
    """
    if fake:
        n = len(payload)
        return (n % 640 + 1, (n * 7) % 480 + 1, 3, "fake-rgb")
    try:
        import io

        from PIL import Image  # optional; not in this container

        with Image.open(io.BytesIO(payload)) as im:
            return (im.width, im.height, len(im.getbands()), im.format.lower())
    except ImportError:
        return _parse_image_header(bytes(payload))


def with_binary_payload(df: DataFrame, src_col: str, id_col: str) -> DataFrame:
    """Attach an opaque binary payload column (here: utf-8 bytes of a text
    column standing in for real media bytes) + typed metadata."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(src_col).cast("binary").alias("payload"),
        F.octet_length(F.col(src_col).cast("binary")).alias("byte_len"),
        F.sha2(F.col(src_col).cast("binary"), 256).alias("sha256"),
    )


def decode_metadata(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas decode: (doc_id, payload) -> typed image metadata.

    Arrow-batched: each pandas batch decodes vectorized-ish in one Python
    call per batch, not per row; output drops the payload immediately.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_image_bytes(p, fake) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "channels": pd.Series([m[2] for m in meta], dtype="int32"),
                    "format": [m[3] for m in meta],
                }
            )
            yield out

    return media.select("doc_id", "payload").mapInPandas(decode, DECODE_META_SCHEMA)


#: Output schema of resize_payloads — payload out, dims pinned.
RESIZE_SCHEMA = "doc_id bigint, width int, height int, payload binary"

#: Output schema of extract_features — fixed-dim embedding per payload.
FEATURE_SCHEMA = "doc_id bigint, feature array<double>"


def resize_payloads(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """mapInPandas resize: (doc_id, payload) -> payload re-encoded at the
    target dimensions. STUB codec (no image library here): the fake
    "resize" deterministically truncates/pads the byte stream to
    width*height bytes, so batch shapes, Arrow binary round-tripping,
    and output sizing are all real and testable; a Pillow-backed resize
    replaces one inner function. Payload-carrying output, so batches are
    bounded by arrow.maxRecordsPerBatch (the executor-memory contract
    documented at module top)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out_payload = [
                bytes(p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "payload": out_payload,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: (doc_id, payload) -> fixed-dim
    float vector. STUB featurizer: component j is the mean of payload
    byte values at positions congruent to j mod ``dim`` — deterministic
    and vectorized with numpy per batch, so the Arrow batch path, the
    array<double> output column, and downstream similarity-search
    compatibility (same shape as the embeddings table) are all real;
    a CLIP/CNN encoder replaces one inner function."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                if len(a) == 0:
                    feats.append([0.0] * dim)
                    continue
                pad = (-len(a)) % dim
                a = np.pad(a, (0, pad))
                feats.append(a.reshape(-1, dim).mean(axis=0).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "feature": feats}
            )

    return media.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Video-frame-sampling *plumbing*: emit one row per sampled offset
    (the decode of each frame is the same stub boundary). Pure JVM:
    sequence + explode, no Python in the row path."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("byte_len") - 1, F.lit(0)), F.lit(every_n_bytes))
        ).alias("frame_offset"),
    )


# ---------------------------------------------------------------------------
# audio containers — same pure-bytes discipline as the image parsers
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, sample_rate int, channels int, "
    "bits_per_sample int, n_samples bigint, duration_ms bigint, format string"
)


def _parse_wav_header(p: bytes) -> tuple[int, int, int, int, int, str]:
    """(sample_rate, channels, bits, n_samples, duration_ms, format) from
    real RIFF/WAVE bytes, per the public WAVE spec: 'RIFF' + size +
    'WAVE', then a chunk walk — 'fmt ' carries channels/rate/bits at
    fixed little-endian offsets, 'data''s size gives the sample count.
    Chunk sizes pad to even offsets (RIFF rule). Raises ValueError on
    anything else — corrupt media surfaces per-row, as with images."""
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    fmt = None
    data_len = None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = struct.unpack("<I", p[i + 4 : i + 8])[0]
        body = p[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = struct.unpack("<H", body[2:4])[0]
            rate = struct.unpack("<I", body[4:8])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (rate, channels, bits)
        elif cid == b"data":
            data_len = size
        i += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data_len is None:
        raise ValueError("wav: missing fmt or data chunk")
    rate, channels, bits = fmt
    if rate <= 0 or channels <= 0 or bits <= 0:
        raise ValueError("wav: degenerate fmt chunk")
    n_samples = data_len // (channels * max(1, bits // 8))
    duration_ms = (n_samples * 1000) // rate
    return rate, channels, bits, n_samples, duration_ms, "wav"


def audio_metadata(media: DataFrame) -> DataFrame:
    """Per-payload audio container metadata over Arrow batches — the
    audio member of the decode family (images: decode_metadata). Bad
    payloads yield nulled metadata rows with format='error' rather than
    failing the batch (quarantine-not-crash, like the pipeline's
    corrupt-NDJSON handling)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    rate, ch, bits, n, ms, fmt = _parse_wav_header(b)
                    out.append((doc_id, len(b), rate, ch, bits, n, ms, fmt))
                except ValueError:
                    out.append(
                        (doc_id, len(b), None, None, None, None, None, "error")
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "byte_len", "sample_rate", "channels",
                    "bits_per_sample", "n_samples", "duration_ms", "format",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, AUDIO_META_SCHEMA
    )


def make_wav_payload(
    doc_id: int, rate: int = 16000, channels: int = 1, bits: int = 16
) -> bytes:
    """Deterministic valid WAVE bytes for tests/fixtures: a doc_id-seeded
    sample count so every payload differs but reproducibly."""
    n = 100 + (doc_id % 50)
    data = bytes((doc_id + i) % 256 for i in range(n * channels * (bits // 8)))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate,
        rate * channels * (bits // 8), channels * (bits // 8), bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
