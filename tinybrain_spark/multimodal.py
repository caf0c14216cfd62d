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
from pyspark.sql.types import LongType, StructField, StructType

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
