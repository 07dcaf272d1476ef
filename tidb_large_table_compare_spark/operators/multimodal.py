"""Multimodal column plumbing — BASELINE.json extension.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow batch
shapes) is real and tested; the actual media decoding is stubbed behind
``decode_media`` because codec libraries are not in this environment — the
stub extracts deterministic byte-level features so oracles can verify the
pipeline end-to-end.
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


def decode_media(df: DataFrame, media_format: str) -> DataFrame:
    """Decode/feature-extract a real media payload (image/audio/video).

    STUB: codec libraries (PIL/ffmpeg/librosa) are not available in this
    environment. The Spark plumbing above (schema, batching, partitioning)
    is what a real decoder drops into.
    """
    raise NotImplementedError(
        f"media decoding for {media_format!r} requires codec libraries not "
        "present in this environment; see binary_metadata() for the "
        "Arrow-batched plumbing a decoder plugs into"
    )


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
