"""Multimodal (image/audio/video) column plumbing.

Media are carried as opaque ``binary`` columns plus typed metadata
(modality, mime, width/height/duration). The Spark-side machinery —
schemas, Arrow-batched ``mapInPandas`` UDF signatures, batch shaping,
partition sizing — is real and tested. Decoding: uncompressed 24-bit
BMP images (``decode_bmp``), baseline JFIF (``pipeline/jpeg.py``), and
raw video — Y4M / uncompressed RIFF-AVI (``parse_y4m`` /
``parse_avi_raw``, BT.601 YCbCr→RGB) — are decoded FOR REAL in pure
numpy, so strict mode runs end-to-end on those payloads with features
and frame samples computed from actual pixels. Compressed codecs
(PNG, H.264, audio, ...) are not present in this container, so those
formats keep the documented stub: strict mode raises
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


# --------------------------------------------------------------------------
# video: Y4M (YUV4MPEG2) and uncompressed RIFF-AVI (BI_RGB 24-bit DIB
# frames) — pure-numpy parsers, no codec libraries. These close the last
# NotImplementedError seam: strict-mode frame sampling and feature
# extraction run end-to-end on real raw-video payloads.
# --------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def parse_y4m(payload: bytes) -> tuple[list[bytes], tuple[int, int], str, float]:
    """Parse a YUV4MPEG2 stream into (raw planar frames, (w, h),
    colorspace, fps). Supported colorspaces: C420 (any chroma-siting
    suffix: jpeg/mpeg2/paldv — the plane layout is identical), C422,
    C444, Cmono. Raises ValueError on anything else or on truncation."""
    b = bytes(payload or b"")
    if not b.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = 0
    fn, fd = 30, 1
    cs = "420"
    for tok in b[len(_Y4M_MAGIC):nl].decode("ascii", "replace").split():
        if tok[:1] == "W":
            w = int(tok[1:])
        elif tok[:1] == "H":
            h = int(tok[1:])
        elif tok[:1] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok[:1] == "C":
            cs = tok[1:]
    if w <= 0 or h <= 0 or fn <= 0 or fd <= 0:
        raise ValueError("invalid Y4M geometry/rate")
    if cs.startswith("420"):
        cs = "420"
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        fsize = w * h * 3 // 2
    elif cs == "422":
        if w % 2:
            raise ValueError("C422 requires even width")
        fsize = w * h * 2
    elif cs == "444":
        fsize = w * h * 3
    elif cs == "mono":
        fsize = w * h
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or not b[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed Y4M FRAME header")
        start = fnl + 1
        if start + fsize > len(b):
            raise ValueError("truncated Y4M frame")
        frames.append(b[start : start + fsize])
        pos = start + fsize
    return frames, (w, h), cs, fn / fd


def y4m_frame_to_rgb(raw: bytes, w: int, h: int, cs: str) -> np.ndarray:
    """Convert one raw planar YCbCr frame to (h, w, 3) uint8 RGB with the
    BT.601 limited-range matrix (round-half-away, clipped) — the
    deterministic pure-numpy path."""
    buf = np.frombuffer(raw, dtype=np.uint8)
    y = buf[: w * h].reshape(h, w).astype(np.float64)
    if cs == "mono":
        cb = cr = np.full((h, w), 128.0)
    elif cs == "420":
        c = buf[w * h :].reshape(2, h // 2, w // 2).astype(np.float64)
        cb = c[0].repeat(2, axis=0).repeat(2, axis=1)
        cr = c[1].repeat(2, axis=0).repeat(2, axis=1)
    elif cs == "422":
        c = buf[w * h :].reshape(2, h, w // 2).astype(np.float64)
        cb = c[0].repeat(2, axis=1)
        cr = c[1].repeat(2, axis=1)
    else:  # 444
        c = buf[w * h :].reshape(2, h, w).astype(np.float64)
        cb, cr = c[0], c[1]
    yy = 1.164383 * (y - 16.0)
    r = yy + 1.596027 * (cr - 128.0)
    g = yy - 0.391762 * (cb - 128.0) - 0.812968 * (cr - 128.0)
    bl = yy + 2.017232 * (cb - 128.0)
    return (
        np.clip(np.round(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)
    )


def encode_y4m(
    frames: np.ndarray | list[np.ndarray], fps: float = 30.0, cs: str = "444"
) -> bytes:
    """Encode planar YCbCr frames as a YUV4MPEG2 stream (test/synthesis
    inverse of :func:`parse_y4m`). ``frames``: per frame either (h, w)
    for Cmono or (3, h, w) planes for C444 / pre-subsampled planes for
    C420/C422 (lists of (ysize + 2*csize,) raw vectors also accepted)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if cs == "mono":
        h, w = frames[0].shape
    else:
        _, h, w = frames[0].shape if frames[0].ndim == 3 else (0, 0, 0)
        if frames[0].ndim != 3:
            raise ValueError("non-mono frames must be (planes, h, w)")
    num, den = (int(round(fps * 1001)), 1001) if fps != int(fps) else (int(fps), 1)
    hdr = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{cs}\n".encode()
    out = [hdr]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.tobytes())
    return b"".join(out)


def parse_avi_raw(payload: bytes) -> tuple[list[bytes], tuple[int, int], float]:
    """Parse an uncompressed RIFF-AVI (single 'vids' stream, BI_RGB
    24-bit DIB frames in '00db'/'00dc' chunks) into (raw bottom-up BGR
    frame bytes, (w, h), fps). Raises ValueError on compressed streams
    or malformed containers."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF-AVI payload")

    def chunks(pos: int, end: int):
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            size = int.from_bytes(b[pos + 4 : pos + 8], "little")
            yield cid, pos + 8, min(size, end - pos - 8)
            pos += 8 + size + (size & 1)

    w = h = 0
    fps = 0.0
    frames: list[bytes] = []
    micro_per_frame = 0

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps, micro_per_frame
        for cid, off, size in chunks(pos, end):
            if cid == b"LIST":
                walk(off + 4, off + size)  # skip the list-type fourcc
            elif cid == b"avih" and size >= 40:
                micro_per_frame = int.from_bytes(b[off : off + 4], "little")
            elif cid == b"strh" and size >= 32:
                if b[off : off + 4] == b"vids":
                    scale = int.from_bytes(b[off + 20 : off + 24], "little")
                    rate = int.from_bytes(b[off + 24 : off + 28], "little")
                    if scale > 0 and rate > 0:
                        fps = rate / scale
            elif cid == b"strf" and size >= 40:
                bw = int.from_bytes(b[off + 4 : off + 8], "little", signed=True)
                bh = int.from_bytes(b[off + 8 : off + 12], "little", signed=True)
                bpp = int.from_bytes(b[off + 14 : off + 16], "little")
                comp = int.from_bytes(b[off + 16 : off + 20], "little")
                if comp != 0 or bpp != 24:
                    raise ValueError(
                        f"unsupported AVI stream: bpp={bpp} compression={comp}"
                    )
                w, h = bw, abs(bh)
            elif cid[2:4] in (b"db", b"dc"):
                frames.append(b[off : off + size])

    walk(12, len(b))
    if w <= 0 or h <= 0 or not frames:
        raise ValueError("no uncompressed video frames found")
    if fps <= 0:
        fps = 1e6 / micro_per_frame if micro_per_frame > 0 else 30.0
    row_bytes = (w * 3 + 3) & ~3
    for f in frames:
        if len(f) < row_bytes * h:
            raise ValueError("truncated AVI frame")
    return frames, (w, h), fps


def avi_frame_to_rgb(raw: bytes, w: int, h: int) -> np.ndarray:
    """Convert one raw bottom-up padded BGR DIB frame to (h, w, 3) uint8
    RGB — exact byte reshuffling, no arithmetic."""
    row_bytes = (w * 3 + 3) & ~3
    rows = (
        np.frombuffer(raw, dtype=np.uint8, count=row_bytes * h)
        .reshape(h, row_bytes)[:, : w * 3]
        .reshape(h, w, 3)
    )
    return rows[::-1, :, ::-1].copy()


def encode_avi_raw(frames: np.ndarray, fps: float = 30.0) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed RIFF-AVI
    (BI_RGB 24-bit '00db' chunks; inverse of :func:`parse_avi_raw`)."""
    px = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((n, h, row_bytes), dtype=np.uint8)
    body[:, :, : w * 3] = px[:, ::-1, :, ::-1].reshape(n, h, w * 3)
    frame_size = row_bytes * h

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + len(data).to_bytes(4, "little") + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    rate = int(round(fps * 1000))
    avih = (
        int(1e6 * 1000 / rate).to_bytes(4, "little")  # dwMicroSecPerFrame
        + (frame_size * int(max(fps, 1))).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # flags
        + n.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")  # one stream
        + frame_size.to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    strh = (
        b"vids"
        + b"DIB "
        + b"\x00" * 12  # flags, priority+language, initial frames
        + (1000).to_bytes(4, "little")  # dwScale
        + rate.to_bytes(4, "little")  # dwRate
        + (0).to_bytes(4, "little")
        + n.to_bytes(4, "little")
        + frame_size.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality
        + (0).to_bytes(4, "little")
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + frame_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", body[i].tobytes()) for i in range(n)))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def decode_video_frames(
    payload: bytes,
) -> tuple[list[bytes], float, "np.ndarray | None", str]:
    """Dispatch a video payload to the matching raw parser. Returns
    (raw frame byte-strings, fps, decoder_params, kind) where kind is
    'y4m' or 'avi'; raises ValueError for any other format."""
    b = bytes(payload or b"")
    if b.startswith(_Y4M_MAGIC):
        frames, (w, h), cs, fps = parse_y4m(b)
        return frames, fps, np.array([w, h], dtype=np.int64), f"y4m:{cs}"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        frames, (w, h), fps = parse_avi_raw(b)
        return frames, fps, np.array([w, h], dtype=np.int64), "avi"
    raise ValueError("not a supported raw video payload (Y4M / raw AVI)")


def video_frame_rgb(raw: bytes, params: np.ndarray, kind: str) -> np.ndarray:
    """Decode one raw frame returned by :func:`decode_video_frames`."""
    w, h = int(params[0]), int(params[1])
    if kind.startswith("y4m:"):
        return y4m_frame_to_rgb(raw, w, h, kind[4:])
    return avi_frame_to_rgb(raw, w, h)


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
                elif b.startswith(_Y4M_MAGIC) or (
                    b[:4] == b"RIFF" and b[8:12] == b"AVI "
                ):
                    try:
                        frames, _, params, kind = decode_video_frames(b)
                        decoded = video_frame_rgb(frames[0], params, kind)
                    except ValueError:
                        if strict:
                            raise
                        decoded = None
                if decoded is not None:
                    feats.append(bmp_pixel_features(decoded))
                elif strict:
                    raise NotImplementedError(
                        f"{modality} decode requires codecs not present in "
                        "this environment (uncompressed 24-bit BMP, baseline "
                        "JFIF, Y4M and raw-AVI decode natively; see "
                        "decode_bmp / pipeline/jpeg.py / parse_y4m / "
                        "parse_avi_raw)"
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


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    strict: bool = False,
    max_frames: int = 8,
) -> DataFrame:
    """(media_id, frame_idx, frame_sha256, pix_sum): video frame
    sampling. Y4M and uncompressed-AVI payloads decode FOR REAL
    (pure-numpy parsers, see :func:`parse_y4m` / :func:`parse_avi_raw`):
    one frame is kept every ``every_ms`` of stream time (stride
    ``max(1, round(every_ms · fps / 1000))``, capped at ``max_frames``),
    ``frame_idx`` is the true stream frame index, ``frame_sha256``
    digests the raw stored frame bytes, and ``pix_sum`` is the decoded
    RGB pixel sum. Other payloads raise NotImplementedError under
    ``strict=True`` (the documented seam where compressed codecs would
    plug in) and fall back to deterministic byte slices otherwise
    (``pix_sum`` = chunk byte sum — still oracle-replayable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas, sums = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload if isinstance(payload, (bytes, bytearray)) else bytes(payload or b"")
                try:
                    frames, fps, params, kind = decode_video_frames(b)
                except ValueError:
                    if strict:
                        raise NotImplementedError(
                            "video decode supports raw Y4M / uncompressed "
                            "AVI natively; compressed codecs are not "
                            "present in this environment"
                        )
                    n_frames = max(1, len(b) // max(every_ms, 1))
                    for i in range(min(n_frames, max_frames)):
                        chunk = b[i * every_ms : (i + 1) * every_ms]
                        ids.append(mid)
                        idxs.append(i)
                        shas.append(hashlib.sha256(chunk).hexdigest())
                        sums.append(int(np.frombuffer(chunk, np.uint8).sum()))
                    continue
                stride = max(1, int(round(every_ms * fps / 1000.0)))
                for i in list(range(0, len(frames), stride))[:max_frames]:
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frames[i]).hexdigest())
                    sums.append(
                        int(video_frame_rgb(frames[i], params, kind).astype(np.int64).sum())
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_sha256": shas,
                    "pix_sum": sums,
                }
            )

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload")
        .mapInPandas(
            run,
            schema="media_id long, frame_idx int, frame_sha256 string, pix_sum long",
        )
    )
