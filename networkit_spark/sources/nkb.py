"""NetworKit binary graph format (``.nkb``, magic ``nkbg002``).

A real reader/writer for the reference's native binary format, so a
NetworKit user can hand their existing binary graphs straight to this
engine (and export back). Format per the reference's public spec
``io/NetworkitBinaryGraph.md`` and the bit-exact varint/zigzag layout in
``include/networkit/io/NetworkitBinaryGraph.hpp:75-140``; block layout per
``io/NetworkitBinaryWriter.cpp:176-330``:

- header: 8-byte magic ``nkbg002\\0`` + 9 little-endian uint64 fields
  (checksum=0, features, nodes, chunks, and the five section offsets);
  features bit 0 = directed, bits 1-3 = weight format
  (0 none, 1 varint, 2 zigzag-varint, 3 double, 4 float).
- base data: one uint8 flag per node (bit 0 SET = node exists) +
  ``firstVertex[chunks-1]`` uint64 chunk boundaries.
- adjacency block: ``chunks-1`` uint64 prefix offsets, uint64 total edge
  count, then per node varint(count) + varint neighbor ids. Undirected
  graphs store each edge once in the adjacency block (neighbors
  ``v <= u``) and once in the transpose block (``v >= u``); directed
  graphs store out-neighbors / in-neighbors.
- weight blocks mirror the adjacency/transpose order (no counts).

The varint is NOT LEB128: byte 0 encodes the number of data bytes in the
position of its least-significant set bit (0 header byte = 8 data bytes),
the remaining header bits hold the value's low bits, data bytes follow
little-endian (``NetworkitBinaryGraph.hpp:75``).

Spark mapping: the format's own chunking IS the parallelism unit. The
writer encodes each chunk's varint blob executor-side (``applyInPandas``
per chunk — only compressed blobs travel to the driver, which stitches
the single file: unavoidable for a single-file container, same posture
as the METIS/GML writers). The reader turns the header's chunk offset
table into a task DataFrame and decodes chunk byte-ranges in parallel
with ``mapInPandas``, so a 1000-chunk file fans out across executors
with no driver-side decode.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

MAGIC = b"nkbg002\x00"
_HEADER = struct.Struct("<8s9Q")

WF_NONE, WF_VARINT, WF_SIGNED_VARINT, WF_DOUBLE, WF_FLOAT = range(5)
_U64 = (1 << 64) - 1


# --------------------------------------------------------------- varint
def varint_encode(value: int, out: bytearray) -> None:
    """Append the nkbg varint encoding of ``value`` (uint64) to ``out``."""
    if value == 0:
        out.append(1)
        return
    if value >= (1 << 56):
        out.append(0)
        out += (value & _U64).to_bytes(8, "little")
        return
    data_bytes = (value.bit_length() - 1) // 7
    out.append(((1 << data_bytes) | (value << (data_bytes + 1))) & 0xFF)
    v = value >> (7 - data_bytes)
    for _ in range(data_bytes):
        out.append(v & 0xFF)
        v >>= 8


def varint_decode(buf, pos: int) -> tuple[int, int]:
    """Decode one nkbg varint at ``pos``; returns (value, next_pos)."""
    b0 = buf[pos]
    if b0 == 0:
        return int.from_bytes(bytes(buf[pos + 1 : pos + 9]), "little"), pos + 9
    n = (b0 & -b0).bit_length() - 1  # index of lowest set bit
    val = b0 >> (n + 1)
    shift = 7 - n
    for i in range(n):
        val |= buf[pos + 1 + i] << shift
        shift += 8
    return val, pos + n + 1


def zigzag_encode(value: int) -> int:
    return ((value << 1) ^ (-1 if value < 0 else 0)) & _U64


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


# --------------------------------------------------------------- writer
def _encode_weight(w: float, wf: int, out: bytearray) -> None:
    if wf == WF_VARINT:
        varint_encode(int(w), out)
    elif wf == WF_SIGNED_VARINT:
        varint_encode(zigzag_encode(int(w)), out)
    elif wf == WF_DOUBLE:
        out += struct.pack("<d", w)
    elif wf == WF_FLOAT:
        out += struct.pack("<f", w)


def _chunk_bounds(n: int, chunks: int) -> list[int]:
    """first_in_chunk[0..chunks]: chunk c covers [b[c], b[c+1]).

    Matches the reference writer: each chunk gets ``n // chunks`` nodes,
    the last chunk takes the remainder (NetworkitBinaryWriter.cpp:134).
    """
    per = n // chunks
    bounds = [c * per for c in range(chunks)]
    bounds.append(n)
    return bounds


def detect_weight_format(g: Graph) -> int:
    """Reference auto-detection: unweighted→none; integral non-negative
    →varint; integral→zigzag varint; else double."""
    if not g.weighted:
        return WF_NONE
    row = g.edges.agg(
        F.min("weight").alias("mn"),
        F.max(F.abs(F.col("weight") - F.round("weight"))).alias("frac"),
        F.max(F.abs("weight")).alias("mx"),
    ).collect()[0]
    if row.frac == 0.0 and row.mx < float(1 << 62):
        return WF_VARINT if row.mn >= 0 else WF_SIGNED_VARINT
    return WF_DOUBLE


def write_networkit_binary(
    g: Graph, path: str, chunks: int = 32, weight_format: int | None = None
) -> None:
    """Write ``g`` as a NetworKit binary graph file.

    Assumes continuous ids 0..n-1 (``ids.compact`` first otherwise).
    Chunk varint blobs are encoded executor-side in parallel; the driver
    only concatenates blobs and writes the header/offset tables.
    """
    spark = g.edges.sparkSession
    n = g.num_nodes()
    chunks = max(1, min(chunks, n) if n else 1)
    bounds = _chunk_bounds(n, chunks)
    per = n // chunks
    wf = detect_weight_format(g) if weight_format is None else weight_format

    if g.directed:
        adj = g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), "weight")
        tra = g.edges.select(F.col("dst").alias("u"), F.col("src").alias("v"), "weight")
    else:
        adj = g.edges.filter(F.col("dst") <= F.col("src")).select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "weight"
        )
        tra = g.edges.filter(F.col("dst") >= F.col("src")).select(
            F.col("src").alias("u"), F.col("dst").alias("v"), "weight"
        )
    both = adj.withColumn("blk", F.lit(0)).unionByName(tra.withColumn("blk", F.lit(1)))
    chunk_col = F.least(F.floor(F.col("u") / F.lit(max(per, 1))), F.lit(chunks - 1))
    both = both.withColumn("chunk", chunk_col.cast("long"))
    # seed every chunk so applyInPandas sees empty ones too
    skel = spark.range(chunks).select(
        F.col("id").alias("chunk"),
        F.lit(-1).cast("long").alias("u"),
        F.lit(-1).cast("long").alias("v"),
        F.lit(0.0).alias("weight"),
        F.lit(-1).alias("blk"),
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        c = int(pdf["chunk"].iloc[0])
        lo, hi = bounds[c], bounds[c + 1]
        pdf = pdf[pdf["blk"] >= 0].sort_values(["blk", "u", "v"])
        out = {"n_out": 0, "n_in": 0}
        blobs: dict[int, bytes] = {}
        wblobs: dict[int, bytes] = {}
        for blk, key in ((0, "n_out"), (1, "n_in")):
            sub = pdf[pdf["blk"] == blk]
            us = sub["u"].to_numpy()
            vs = sub["v"].to_numpy()
            ws = sub["weight"].to_numpy()
            starts = np.searchsorted(us, np.arange(lo, hi), side="left")
            ends = np.searchsorted(us, np.arange(lo, hi), side="right")
            buf, wbuf = bytearray(), bytearray()
            for i in range(hi - lo):
                s, e = int(starts[i]), int(ends[i])
                varint_encode(e - s, buf)
                for j in range(s, e):
                    varint_encode(int(vs[j]), buf)
                    if wf != WF_NONE:
                        _encode_weight(float(ws[j]), wf, wbuf)
            out[key] = len(us)
            blobs[blk] = bytes(buf)
            wblobs[blk] = bytes(wbuf)
        return pd.DataFrame(
            {
                "chunk": [c],
                "adj": [blobs[0]],
                "transp": [blobs[1]],
                "wadj": [wblobs[0]],
                "wtransp": [wblobs[1]],
                "n_out": [out["n_out"]],
                "n_in": [out["n_in"]],
            }
        )

    rows = (
        both.unionByName(skel)
        .groupBy("chunk")
        .applyInPandas(
            encode,
            "chunk long, adj binary, transp binary, wadj binary, "
            "wtransp binary, n_out long, n_in long",
        )
        .collect()
    )
    rows.sort(key=lambda r: r.chunk)
    adj_b = [r.adj for r in rows]
    tra_b = [r.transp for r in rows]
    wadj_b = [r.wadj for r in rows]
    wtra_b = [r.wtransp for r in rows]
    n_out = sum(r.n_out for r in rows)
    n_in = sum(r.n_in for r in rows)

    def prefix(blobs: list[bytes]) -> list[int]:
        acc, out = 0, []
        for b in blobs[:-1]:
            acc += len(b)
            out.append(acc)
        return out

    features = (1 if g.directed else 0) | ((wf & 0x7) << 1)
    off_base = _HEADER.size
    off_adj = off_base + n + (chunks - 1) * 8
    off_tra = off_adj + (chunks - 1) * 8 + 8 + sum(len(b) for b in adj_b)
    if wf != WF_NONE:
        off_w = off_tra + (chunks - 1) * 8 + 8 + sum(len(b) for b in tra_b)
        off_wt = off_w + (chunks - 1) * 8 + sum(len(b) for b in wadj_b)
    else:
        off_w = off_wt = 0

    with open(path, "wb") as f:
        f.write(
            _HEADER.pack(
                MAGIC, 0, features, n, chunks, off_base, off_adj, off_tra, off_w, off_wt
            )
        )
        f.write(bytes([1]) * n)  # bit 0 set = node exists
        f.write(struct.pack(f"<{chunks - 1}Q", *bounds[1:chunks]))
        f.write(struct.pack(f"<{chunks - 1}Q", *prefix(adj_b)))
        f.write(struct.pack("<Q", n_out))
        for b in adj_b:
            f.write(b)
        f.write(struct.pack(f"<{chunks - 1}Q", *prefix(tra_b)))
        f.write(struct.pack("<Q", n_in))
        for b in tra_b:
            f.write(b)
        if wf != WF_NONE:
            f.write(struct.pack(f"<{chunks - 1}Q", *prefix(wadj_b)))
            for b in wadj_b:
                f.write(b)
            f.write(struct.pack(f"<{chunks - 1}Q", *prefix(wtra_b)))
            for b in wtra_b:
                f.write(b)


# --------------------------------------------------------------- reader
def _decode_chunk(raw: bytes, lo: int, hi: int, wraw: bytes, wf: int):
    """Decode one chunk's adjacency (+weights) byte range → (u, v, w) lists."""
    us: list[int] = []
    vs: list[int] = []
    pos = 0
    for u in range(lo, hi):
        cnt, pos = varint_decode(raw, pos)
        for _ in range(cnt):
            v, pos = varint_decode(raw, pos)
            us.append(u)
            vs.append(v)
    m = len(us)
    if wf == WF_NONE:
        ws = [1.0] * m
    elif wf == WF_DOUBLE:
        ws = np.frombuffer(wraw, dtype="<f8", count=m).tolist()
    elif wf == WF_FLOAT:
        ws = np.frombuffer(wraw, dtype="<f4", count=m).astype("f8").tolist()
    else:
        ws, wpos = [], 0
        for _ in range(m):
            val, wpos = varint_decode(wraw, wpos)
            ws.append(float(zigzag_decode(val)) if wf == WF_SIGNED_VARINT else float(val))
    return us, vs, ws


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """Read a NetworKit binary graph file into a Graph.

    The driver parses only the header and offset tables; chunk payloads
    are decoded in parallel, one Spark task per format chunk, each
    reading just its own byte range of the file.
    """
    path = os.path.abspath(path)
    with open(path, "rb") as f:
        magic, _cksum, features, n, chunks, off_base, off_adj, off_tra, off_w, _off_wt = (
            _HEADER.unpack(f.read(_HEADER.size))
        )
        if not magic.startswith(b"nkbg"):
            raise ValueError(f"not a NetworKit binary graph: magic={magic!r}")
        f.seek(off_base)
        flags = np.frombuffer(f.read(n), dtype=np.uint8)
        bnd = [0] + (
            list(struct.unpack(f"<{chunks - 1}Q", f.read((chunks - 1) * 8)))
            if chunks > 1
            else []
        ) + [n]
        f.seek(off_adj)
        adj_off = [0] + (
            list(struct.unpack(f"<{chunks - 1}Q", f.read((chunks - 1) * 8)))
            if chunks > 1
            else []
        )
        f.read(8)  # total edge count (recomputed from the lists)
        adj_data0 = off_adj + chunks * 8  # (chunks-1) offsets + count field
        adj_off.append(off_tra - adj_data0)
        wf = (features >> 1) & 0x7
        if wf != WF_NONE:
            f.seek(off_w)
            w_off = [0] + (
                list(struct.unpack(f"<{chunks - 1}Q", f.read((chunks - 1) * 8)))
                if chunks > 1
                else []
            )
            wdata0 = off_w + (chunks - 1) * 8
            w_off.append(_off_wt - wdata0)
        else:
            w_off = [0] * (chunks + 1)
            wdata0 = 0

    directed = bool(features & 0x1)
    tasks = spark.createDataFrame(
        [
            (
                c,
                bnd[c],
                bnd[c + 1],
                adj_data0 + adj_off[c],
                adj_data0 + adj_off[c + 1],
                wdata0 + w_off[c],
                wdata0 + w_off[c + 1],
            )
            for c in range(chunks)
        ],
        "chunk long, lo long, hi long, a0 long, a1 long, w0 long, w1 long",
    ).repartition(min(chunks, 256))

    def decode(batches):
        for pdf in batches:
            for row in pdf.itertuples():
                with open(path, "rb") as fh:
                    fh.seek(row.a0)
                    raw = fh.read(row.a1 - row.a0)
                    if wf != WF_NONE:
                        fh.seek(row.w0)
                        wraw = fh.read(row.w1 - row.w0)
                    else:
                        wraw = b""
                us, vs, ws = _decode_chunk(raw, row.lo, row.hi, wraw, wf)
                yield pd.DataFrame({"src": us, "dst": vs, "weight": ws})

    edges = tasks.mapInPandas(decode, "src long, dst long, weight double")
    if bool(np.all(flags & 1)):
        nodes = spark.range(n).select("id")
    else:
        keep = np.flatnonzero(flags & 1)
        nodes = spark.createDataFrame(
            pd.DataFrame({"id": keep.astype("int64")})
        ).select("id")
    return Graph.from_edges(
        edges, directed=directed, weighted=wf != WF_NONE, nodes=nodes
    )
