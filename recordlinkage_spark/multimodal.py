"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` partitioning — while the actual media decoding is STUBBED
(this container has no image/audio libraries): ``decode_fn=None`` uses a
deterministic fake decoder so the pipeline shape can be exercised
end-to-end; pass a real decoder (PIL / torchaudio / pyav) in production.

Schema conventions:
  media(doc_id long, kind string, payload binary, meta map<string,string>)
  features(doc_id long, kind string, feature array<double>, width int, height int)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, kind string, feature array<double>, width int, height int"
)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode: derive a tiny 4x4 'image'
    from the payload bytes. Replace with PIL/pyav in production."""
    if payload is None:
        payload = b""
    arr = np.frombuffer(payload[:16].ljust(16, b"\0"), dtype=np.uint8)
    return arr.reshape(4, 4).astype(np.float64) / 255.0


def extract_features(
    media: DataFrame,
    decode_fn=None,
    batch_size: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The feature here is a 16-dim flattened thumbnail (fake decoder) —
    production swaps ``decode_fn`` for a real decoder + model forward pass.
    Partition-parallel: no shuffle, one Python worker pass per partition.
    """
    decode = decode_fn or _fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "feature": [im.flatten().tolist() for im in imgs],
                "width": [im.shape[1] for im in imgs],
                "height": [im.shape[0] for im in imgs],
            })

    return media.mapInPandas(process, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass — pure plumbing stub (no image libs in this container).

    Raises NotImplementedError in the UDF body ONLY when invoked with real
    decode; the plan/schema contract is still testable lazily.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image library (PIL/opencv); "
            "this container ships none — plumbing stub only"
        )

    return media.mapInPandas(process, media.schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_no, payload)
    rows using a deterministic fake splitter (payload chunks stand in for
    decoded frames)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vectorized fan-out: frame counts + offsets in numpy, one
            # flat slice pass for the payload chunks (no iterrows)
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            n_chunks = np.array([(len(p) + 63) // 64 for p in payloads],
                                dtype=np.int64)
            n_frames = -(-n_chunks // every_n)  # ceil-div
            total = int(n_frames.sum())
            if total == 0:
                continue
            doc_idx = np.repeat(np.arange(len(payloads)), n_frames)
            starts = np.cumsum(n_frames) - n_frames
            frame_no = (np.arange(total) - starts[doc_idx]) * every_n
            off = frame_no * 64
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[doc_idx],
                "frame_no": frame_no.astype("int32"),
                "payload": [payloads[d][o:o + 64]
                            for d, o in zip(doc_idx, off)],
            })

    return media.mapInPandas(process, "doc_id long, frame_no int, payload binary")


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computable without decoding (JVM only)."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_md5", F.md5(F.col(payload_col))
    )
