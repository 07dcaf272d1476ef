"""Multimodal column plumbing — BASELINE.json extension.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow batch
shapes) is real and tested. ``decode_media`` decodes codec-free image
containers FOR REAL — binary PPM (P6), uncompressed 24-bit BMP, and QOI
(qoiformat.org — byte-oriented compression, no entropy coding) parse with
numpy/struct alone — including a genuine nearest-neighbor resize; formats
needing real codec libraries (jpeg/mp4/...) still raise, since those libs
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
    "encode_qoi",
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
        # NULL payloads are in-contract for a parquet binary column: map
        # them to NULL metadata (SQL semantics — octet_length(NULL) IS
        # NULL), not a mid-stage TypeError. Vectorized (.str accessor,
        # boolean masks), not per-row Python lambdas: this stage runs
        # over every row of the corpus. Nullable Int64 so pd.NA survives
        # the Arrow conversion.
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.str.len().astype("Int64")
            # .str[0] is NA for BOTH a NULL payload and an empty one —
            # the empty case must read -1 (a byte value that cannot
            # occur), the NULL case must stay NA
            head = payload.str[0].astype("Int64")
            head = head.mask(payload.notna() & (n_bytes == 0), -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "head_byte": head,
                    "media_format": pd.Series(
                        "raw", index=payload.index
                    ).mask(payload.isna(), None),
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


def encode_qoi(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array → QOI bytes (qoiformat.org, public spec).

    A full encoder — emits RUN, INDEX, DIFF, LUMA and RGB chunks exactly as
    the one-page spec defines them — so the roundtrip property test drives
    every op the decoder must undo. QOI is byte-oriented and codec-free
    (no entropy coding), which is what makes a real implementation possible
    in this environment.
    """
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    out = bytearray(b"qoif")
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([3, 0])
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for r, g, b in arr.reshape(-1, 3):
        px = (int(r), int(g), int(b), 255)
        if px == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))  # QOI_OP_RUN
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        slot = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
        if index[slot] == px:
            out.append(slot)  # QOI_OP_INDEX
        else:
            index[slot] = px
            dr = (px[0] - prev[0]) & 0xFF
            dg = (px[1] - prev[1]) & 0xFF
            db = (px[2] - prev[2]) & 0xFF
            # signed interpretations with the spec's biases
            sdr = dr - 256 if dr > 127 else dr
            sdg = dg - 256 if dg > 127 else dg
            sdb = db - 256 if db > 127 else db
            if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                out.append(0x40 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2))
            elif -32 <= sdg <= 31 and -8 <= sdr - sdg <= 7 and -8 <= sdb - sdg <= 7:
                out.append(0x80 | (sdg + 32))  # QOI_OP_LUMA
                out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
            else:
                out += bytes([0xFE, px[0], px[1], px[2]])  # QOI_OP_RGB
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"  # end marker
    return bytes(out)


def _decode_qoi(payload: bytes):
    """QOI decoder (qoiformat.org spec): 14-byte header, then a chunk
    stream over a running pixel + 64-slot seen-pixel index. Returns an
    (h, w, 3) uint8 RGB array (alpha dropped for RGBA-channel files; the
    chunk state machine still tracks it, as INDEX hashing depends on it).

    Sequential by construction (each chunk depends on the previous pixel) —
    per-image Python loops are the honest shape here; parallelism comes
    from Spark decoding many images per Arrow batch across partitions.
    """
    import numpy as np

    if payload[:4] != b"qoif":
        raise ValueError(f"not a QOI payload: magic {payload[:4]!r}")
    w = int.from_bytes(payload[4:8], "big")
    h = int.from_bytes(payload[8:12], "big")
    channels = payload[12]
    if channels not in (3, 4):
        raise ValueError(f"invalid QOI channels field: {channels}")
    n_px = w * h
    px_out = np.empty((n_px, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, written = 14, 0
    while written < n_px:
        tag = payload[i]
        i += 1
        if tag == 0xFE:  # QOI_OP_RGB
            r, g, b = payload[i], payload[i + 1], payload[i + 2]
            i += 3
        elif tag == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = payload[i], payload[i + 1], payload[i + 2], payload[i + 3]
            i += 4
        elif tag >> 6 == 0b00:  # QOI_OP_INDEX
            r, g, b, a = index[tag]
            px_out[written] = (r, g, b)
            written += 1
            continue  # indexed pixel is already in the table
        elif tag >> 6 == 0b01:  # QOI_OP_DIFF (2-bit deltas, bias 2)
            r = (r + ((tag >> 4) & 3) - 2) & 0xFF
            g = (g + ((tag >> 2) & 3) - 2) & 0xFF
            b = (b + (tag & 3) - 2) & 0xFF
        elif tag >> 6 == 0b10:  # QOI_OP_LUMA (6-bit dg, 4-bit dr-dg/db-dg)
            dg = (tag & 0x3F) - 32
            nxt = payload[i]
            i += 1
            r = (r + dg + ((nxt >> 4) & 0xF) - 8) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg + (nxt & 0xF) - 8) & 0xFF
        else:  # QOI_OP_RUN (run of the previous pixel, bias -1)
            run = (tag & 0x3F) + 1
            px_out[written : written + run] = (r, g, b)
            written += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        px_out[written] = (r, g, b)
        written += 1
    return px_out.reshape(h, w, 3)


def _resize_nearest(arr, out_h: int, out_w: int):
    """Real nearest-neighbor resize by index selection (no codec libs)."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols]


_DECODERS = {"ppm": _decode_ppm, "bmp": _decode_bmp, "qoi": _decode_qoi}


def _decode_with_pil(payload: bytes):
    """Compressed-codec decoder via Pillow — registered only when PIL is
    importable (same gate pattern as the Avro source): decode to RGB,
    return the (h, w, 3) uint8 array every other decoder returns.

    The registration gate runs on the DRIVER but this body runs in
    executor tasks — a driver-only Pillow install would otherwise surface
    as an opaque mid-job ImportError, so the import failure is re-raised
    with the gate's name on it."""
    from io import BytesIO

    import numpy as np

    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - cluster-env dependent
        raise RuntimeError(
            "Pillow is importable on the driver (which registered the "
            "jpeg/png decoders in _DECODERS) but not on this executor — "
            "install pillow on every node or pin the decoder set explicitly"
        ) from exc

    with Image.open(BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


try:  # pillow-gated: jpeg/png decode for real wherever PIL is installed;
    # everywhere else decode_media keeps raising its named error for them
    import PIL.Image  # noqa: F401

    _DECODERS["jpeg"] = _decode_with_pil
    _DECODERS["png"] = _decode_with_pil
except ImportError:  # pragma: no cover - environment-dependent
    pass


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
                if payload is None:  # nothing to decode; skip, don't crash
                    continue
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
                if payload is None:  # a NULL payload has no frames
                    continue
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
                if payload is None:  # no bytes to encode; skip, don't crash
                    continue
                ids.append(doc_id)
                vecs.append([float(x) for x in enc(bytes(payload))])
            if ids:  # an empty frame's list column can't cast to array<float>
                yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return df.select(id_col, "payload").mapInPandas(featurize, FEATURE_SCHEMA)
