"""Multimodal column plumbing — BASELINE.json extension.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow batch
shapes) is real and tested. ``decode_media`` decodes codec-free image
containers FOR REAL — binary PPM (P6) and uncompressed 24-bit BMP parse
with numpy/struct alone — including a genuine nearest-neighbor resize;
compressed formats (jpeg/mp4/...) still raise, since their codec libraries
are not in this environment, and plug into the same ``_DECODERS`` seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "binary_metadata",
    "decode_media",
    "encode_ppm",
    "encode_bmp",
    "sample_frames",
    "extract_features",
]

META_SCHEMA = "doc_id bigint, n_bytes bigint, head_byte bigint, media_format string"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the UTF-8 text bytes as an opaque media payload column.

    In a real pipeline this column comes straight from parquet ``binary``;
    deriving it from text keeps the fixture deterministic and oracle-checkable
    (byte length / head byte are recomputable in SQL).
    """
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def binary_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas`` keeps partitioning intact (no shuffle) and moves bytes
    via Arrow batches — the pattern real decoders (image resize, audio
    resample, frame sampling) plug into.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "head_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "media_format": "raw",
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, META_SCHEMA)


DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, "
    "mean_r double, mean_g double, mean_b double, thumb array<double>"
)


def encode_ppm(pixels) -> bytes:
    """Inverse of the PPM decoder: (h, w, 3) uint8 array → binary P6 bytes.

    Lets pipelines (and tests) roundtrip real image payloads without any
    codec library — PPM is the classic uncompressed interchange format.
    """
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _decode_ppm(payload: bytes):
    """Binary PPM (P6): ASCII header (whitespace/comment tolerant), then raw
    RGB bytes. Returns an (h, w, 3) uint8 array."""
    import numpy as np

    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:  # magic, width, height, maxval
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval, then raster
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM: magic {tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def encode_bmp(pixels) -> bytes:
    """Inverse of the BMP decoder: (h, w, 3) uint8 RGB array → uncompressed
    24-bit BMP bytes (BGR rows, 4-byte padded, bottom-up) — the properties
    the decoder must undo, roundtrip-property-tested."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in arr[::-1]:  # bottom-up storage
        raw = row[..., ::-1].tobytes()  # RGB → BGR
        raster += raw + b"\x00" * (row_bytes - len(raw))
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + bytes(raster)


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP: 14-byte file header + BITMAPINFOHEADER,
    BGR rows padded to 4 bytes, stored bottom-up (top-down when height is
    negative). Returns an (h, w, 3) uint8 RGB array."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up storage → top-down array
    return rows[..., ::-1].copy()  # BGR → RGB


def _resize_nearest(arr, out_h: int, out_w: int):
    """Real nearest-neighbor resize by index selection (no codec libs)."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols]


_DECODERS = {"ppm": _decode_ppm, "bmp": _decode_bmp}


def decode_media(
    df: DataFrame,
    media_format: str,
    id_col: str = "doc_id",
    thumb_size: int = 8,
) -> DataFrame:
    """Decode an image payload column and extract real pixel features.

    Formats with codec-free containers decode for real — binary PPM (P6)
    and uncompressed 24-bit BMP are parsed with numpy/struct alone — through
    the same Arrow-batched, partition-preserving ``mapInPandas`` shape the
    rest of the multimodal stack uses. Output per row: dimensions, per-
    channel means, and a ``thumb_size``x``thumb_size`` nearest-neighbor
    grayscale thumbnail (the "resize" op, flattened row-major).

    Compressed formats (jpeg/png/mp4/...) still raise: their codecs
    (PIL/ffmpeg) are not in this environment; a real decoder drops into
    ``_DECODERS`` unchanged.
    """
    decoder = _DECODERS.get(media_format)
    if decoder is None:
        raise NotImplementedError(
            f"media decoding for {media_format!r} requires codec libraries "
            f"not present in this environment (codec-free formats decoded "
            f"for real: {sorted(_DECODERS)}); register a decoder in "
            "_DECODERS to extend"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # yield per input batch, never unconditionally: an empty partition
        # must yield nothing — an empty DataFrame gives its list column a
        # numeric dtype Arrow cannot convert to array<double>
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "n_channels": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "thumb": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = decoder(bytes(payload))
                gray = arr.mean(axis=2)
                thumb = _resize_nearest(gray, thumb_size, thumb_size)
                out["doc_id"].append(doc_id)
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["n_channels"].append(arr.shape[2])
                out["mean_r"].append(float(arr[..., 0].mean()))
                out["mean_g"].append(float(arr[..., 1].mean()))
                out["mean_b"].append(float(arr[..., 2].mean()))
                out["thumb"].append([float(x) for x in thumb.ravel()])
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(decode, DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes bigint, head_byte bigint"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_size: int = 16,
    every_k: int = 4,
) -> DataFrame:
    """Deterministic frame sampling over an opaque binary payload.

    Treats the payload as a sequence of fixed-size frames (a stand-in for
    video GOPs / audio windows) and keeps every k-th frame with byte-level
    metadata. The Arrow-batched ``mapInPandas`` shape — per-partition
    iterator, one output row per sampled frame — is exactly what a real
    frame decoder (ffmpeg et al.) plugs into; the byte slicing itself is
    real and oracle-checkable.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "head_byte": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every_k):
                    frame = payload[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["head_byte"].append(frame[0])
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(sample, FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, embedding array<float>"
FEATURE_DIMS = 64


def byte_histogram_encoder(payload: bytes) -> list[float]:
    """The default encoder: 64-dim folded byte histogram, length-normalized.

    A deterministic STAND-IN for a learned encoder (CLIP/CLAP-style models
    are not in this environment); identical payloads map to identical
    embeddings (cosine 1.0), so the downstream similarity stack is testable.
    """
    import numpy as np

    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIMS
    hist = np.bincount(arr % FEATURE_DIMS, minlength=FEATURE_DIMS)
    return (hist / arr.size).astype(np.float32).tolist()


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    encoder=None,
) -> DataFrame:
    """Arrow-batched feature extraction: binary payload → embedding column.

    ``encoder`` is the pluggable seam for a real learned model: any picklable
    ``bytes -> sequence[float]`` callable (cloudpickle ships it to executors;
    heavyweight model handles should be lazily initialized inside the
    callable, once per executor). Defaults to
    :func:`byte_histogram_encoder`. The Spark shape is encoder-independent:
    per-partition Arrow batches in, ``array<float>`` embeddings out, no
    shuffle, and the output composes directly with the similarity stack
    (`operators/similarity.py`: ``brute_force_topk``, ``build_ivf_index``).
    """
    enc = encoder if encoder is not None else byte_histogram_encoder

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                ids.append(doc_id)
                vecs.append([float(x) for x in enc(bytes(payload))])
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return df.select(id_col, "payload").mapInPandas(featurize, FEATURE_SCHEMA)
