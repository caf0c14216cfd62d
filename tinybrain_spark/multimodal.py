"""Multimodal column plumbing: opaque BinaryType payloads with typed
metadata, batch-decoded via mapInPandas (pipeline op: multimodal).

The container has no image/audio libraries, so the actual decode is a
deterministic fake behind ``decode_payload`` — the Spark-side plumbing
(schema, Arrow binary transport, batch shape) is real and tested.  A
real deployment swaps ``decode_payload`` for PIL/ffmpeg and nothing
else changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("fake_width", LongType(), False),
        StructField("fake_height", LongType(), False),
    ]
)


def decode_payload(payload: bytes) -> dict:
    """STUB decode.  Deterministic fake 'image header' parse; a real
    implementation would do e.g. ``PIL.Image.open(io.BytesIO(payload))``
    and raise NotImplementedError for unsupported codecs."""
    n = len(payload)
    return {"n_bytes": n, "fake_width": n % 640 + 16, "fake_height": n % 480 + 16}


def extract_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload binary) -> typed metadata, batch-wise."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_payload(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out.astype("int64")

    return df.mapInPandas(_extract, META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_size: int = 4096,
    every_k: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the blob
    as fixed-size frames (a real codec would parse container frame
    boundaries here — same one-blob-in / many-frames-out batch shape)
    and keep every ``every_k``-th complete frame.  Output frames are
    real BinaryType cells; one input row fans out to ceil(n_frames/k)
    rows inside the same Arrow batch — no shuffle."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                n_frames = len(raw) // frame_size
                for fi in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(raw[fi * frame_size : (fi + 1) * frame_size])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    n_dims: int = 16,
) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> array<float>
    embedding.  The 'model' is a deterministic byte-bucket histogram
    (normalized) — a real deployment swaps in an ONNX/torch encoder;
    the Spark side (binary in, fixed-dim float vector out, Arrow
    batches) is identical."""
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("features", ArrayType(FloatType(), False), False),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    feats.append(np.zeros(n_dims, dtype=np.float32))
                    continue
                hist = np.bincount(arr // (256 // n_dims), minlength=n_dims)
                feats.append((hist / len(arr)).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(), "features": feats}
            )

    return df.mapInPandas(_feat, schema)
