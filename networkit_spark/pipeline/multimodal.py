"""Multimodal (image/audio/video) column plumbing.

Media are carried as opaque ``binary`` columns plus typed metadata
(modality, mime, width/height/duration). The Spark-side machinery —
schemas, Arrow-batched ``mapInPandas`` UDF signatures, batch shaping,
partition sizing — is real and tested. Decoding: uncompressed 24-bit
BMP images are decoded FOR REAL in pure numpy (``decode_bmp`` — header
parse, bottom-up row order, 4-byte row padding), so strict mode runs
end-to-end on BMP payloads with features computed from actual pixels;
jpeg/audio/video codecs are not present in this container, so those
modalities keep the documented stub: strict mode raises
``NotImplementedError``, non-strict produces a deterministic
byte-derived feature so downstream operators (dedup-by-feature, ANN)
stay exercisable end-to-end.

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


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) to an
    (h, w, 3) uint8 RGB array — pure numpy, no codec libraries.
    Raises ValueError on anything that is not such a BMP."""
    b = bytes(payload or b"")
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(b) < need:
        raise ValueError("truncated BMP payload")
    raw = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    rows = raw.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (the inverse of :func:`decode_bmp`; used to synthesize test media)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    data = body.tobytes()
    size = 54 + len(data)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + data


def bmp_pixel_features(px: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real-pixel feature vector: per-channel mean/std (6), an 8-bin
    grayscale histogram (8), aspect ratio and log-area (2) = 16 dims."""
    f = px.astype(np.float64)
    gray = f.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    hist = hist / max(gray.size, 1)
    h, w = px.shape[0], px.shape[1]
    out = np.concatenate(
        [
            f.reshape(-1, 3).mean(axis=0) / 255.0,
            f.reshape(-1, 3).std(axis=0) / 255.0,
            hist,
            [w / max(h, 1), np.log1p(h * w) / 20.0],
        ]
    )
    return out[:dim]


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: sha256-seeded unit vector."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, modality, n_bytes, feature array<double>): Arrow-batched
    decode + feature extraction. Payloads with the BMP magic decode for
    real (pure-numpy 24-bit parser) and payloads with the JPEG SOI magic
    decode for real too (pure-numpy baseline JFIF — huffman + IDCT, see
    pipeline/jpeg.py); features come from actual pixels. Remaining
    formats (video, progressive JPEG, PNG, ...) raise
    NotImplementedError under strict=True — the marked seam where
    further codecs plug in — and fall back to the deterministic
    byte-derived feature otherwise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from networkit_spark.pipeline.jpeg import decode_jpeg

        for pdf in batches:
            feats = []
            for p, modality in zip(pdf["payload"], pdf["modality"]):
                b = p if isinstance(p, (bytes, bytearray)) else bytes(p or b"")
                decoded = None
                if b[:2] == b"BM":
                    try:
                        decoded = decode_bmp(b)  # real pure-numpy decode
                    except ValueError:
                        if strict:
                            raise
                        decoded = None  # text that happens to start 'BM'
                elif b[:3] == b"\xff\xd8\xff":
                    try:
                        decoded = decode_jpeg(b)  # real baseline JFIF decode
                    except ValueError:
                        if strict:
                            raise
                        decoded = None
                if decoded is not None:
                    feats.append(bmp_pixel_features(decoded))
                elif strict:
                    raise NotImplementedError(
                        f"{modality} decode requires codecs not present in "
                        "this environment (uncompressed 24-bit BMP and "
                        "baseline JFIF decode natively; see decode_bmp / "
                        "pipeline/jpeg.py)"
                    )
                else:
                    feats.append(_fake_features(b))
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
