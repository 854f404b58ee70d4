"""Multimodal (image/audio/video) column plumbing.

Media are carried as opaque ``binary`` columns plus typed metadata
(modality, mime, width/height/duration). The Spark-side machinery —
schemas, Arrow-batched ``mapInPandas`` UDF signatures, batch shaping,
partition sizing — is real and tested; the actual codec step is STUBBED
(this container ships no image/audio libraries): ``decode_stub`` either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake feature vector derived from the bytes, so downstream operators
(dedup-by-feature, ANN) are exercisable end-to-end.

Scale notes: binary payloads dominate row size, so the UDFs are
``mapInPandas`` (whole-batch Arrow transfer, no per-row overhead) and the
pipeline projects metadata-only columns wherever the payload isn't needed
— Parquet column pruning keeps the bytes on disk.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, mime string, payload binary, "
    "width int, height int, duration_ms int"
)
FEATURE_DIM = 16


def attach_binary_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text table (CI stand-in): payload =
    utf-8 bytes, modality round-robins image/audio/video."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: sha256-seeded unit vector."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, modality, n_bytes, feature array<double>): Arrow-batched
    decode + feature extraction. strict=True raises NotImplementedError in
    the decode step — the marked seam where a real codec plugs in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; plug a real decoder into _fake_features"
                )
            feats = [
                _fake_features(p if isinstance(p, (bytes, bytearray)) else bytes(p or b""))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema="media_id long, modality string, n_bytes long, feature array<double>"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """(media_id, frame_idx, frame_sha256): video frame sampling plumbing.
    The decoder is stubbed: frames = deterministic byte slices."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video decode not available here")
            ids, idxs, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload if isinstance(payload, (bytes, bytearray)) else bytes(payload or b"")
                n_frames = max(1, len(b) // max(every_ms, 1))
                for i in range(min(n_frames, 8)):
                    chunk = b[i * every_ms : (i + 1) * every_ms]
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha256": shas})

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema="media_id long, frame_idx int, frame_sha256 string")
    )
