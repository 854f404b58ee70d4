"""NetworKit binary format (.nkb) — varint spec vectors, a hand-assembled
golden file, and read/write round-trips across weight formats."""

import os
import struct

import pytest

from networkit_spark.graph import Graph
from networkit_spark.sources.nkb import (
    WF_DOUBLE,
    WF_FLOAT,
    WF_NONE,
    WF_SIGNED_VARINT,
    WF_VARINT,
    detect_weight_format,
    read_networkit_binary,
    varint_decode,
    varint_encode,
    write_networkit_binary,
    zigzag_decode,
    zigzag_encode,
)

def canon_edges(g):
    rows = g.edges.collect()
    if g.directed:
        return sorted((r.src, r.dst, r.weight) for r in rows)
    return sorted(
        (r.src, r.dst, r.weight) for r in rows if r.src <= r.dst
    )


def enc(v):
    buf = bytearray()
    varint_encode(v, buf)
    return bytes(buf)


def test_varint_spec_vectors():
    # NetworkitBinaryGraph.hpp:75-107 documented layouts
    assert enc(0) == b"\x01"
    assert enc(1) == b"\x03"  # 0b0000001|1
    assert enc(2) == b"\x05"
    assert enc(65) == b"\x83"  # 7-bit value fits the header byte
    assert enc(129) == b"\x06\x02"  # 8 bits -> one data byte
    big = 1 << 56
    assert enc(big) == b"\x00" + big.to_bytes(8, "little")


def test_varint_roundtrip():
    import random

    rnd = random.Random(7)
    vals = [0, 1, 127, 128, (1 << 56) - 1, 1 << 56, (1 << 64) - 1]
    vals += [rnd.getrandbits(rnd.randint(1, 64)) for _ in range(500)]
    buf = bytearray()
    for v in vals:
        varint_encode(v, buf)
    pos = 0
    for v in vals:
        got, pos = varint_decode(bytes(buf), pos)
        assert got == v
    assert pos == len(buf)


def test_zigzag():
    assert [zigzag_encode(v) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    for v in (-(1 << 62), -3, 0, 5, 1 << 62):
        assert zigzag_decode(zigzag_encode(v)) == v


def test_golden_file_bytes(spark, tmp_path):
    # path 0-1-2, undirected unweighted, one chunk: every byte hand-derived
    # from NetworkitBinaryWriter.cpp:225-316.
    g = Graph.of(spark, [(0, 1), (1, 2)], n=3)
    path = str(tmp_path / "p3.nkb")
    write_networkit_binary(g, path, chunks=1)
    raw = open(path, "rb").read()
    assert raw[:8] == b"nkbg002\x00"
    cks, feat, n, chunks, ob, oa, ot, ow, owt = struct.unpack("<9Q", raw[8:80])
    assert (cks, feat, n, chunks) == (0, 0, 3, 1)
    assert (ob, oa, ot, ow, owt) == (80, 83, 96, 0, 0)
    assert raw[80:83] == b"\x01\x01\x01"  # node flags: bit0 = exists
    assert raw[83:91] == struct.pack("<Q", 2)  # adjListSize
    assert raw[91:96] == b"\x01\x03\x01\x03\x03"  # [] / [0] / [1]
    assert raw[96:104] == struct.pack("<Q", 2)  # transpose size
    assert raw[104:109] == b"\x03\x03\x03\x05\x01"  # [1] / [2] / []
    assert len(raw) == 109


def _assert_same(g, h):
    assert h.directed == g.directed
    assert sorted(r.id for r in h.nodes.collect()) == sorted(
        r.id for r in g.nodes.collect()
    )
    assert canon_edges(h) == canon_edges(g)


def test_roundtrip_weighted_undirected(spark, tmp_path):
    g = Graph.of(
        spark,
        [(0, 1, 2.5), (1, 2, 0.5), (2, 3, 4.0), (0, 3, 1.25), (3, 3, 9.0)],
        n=5,  # node 4 isolated
        weighted=True,
    )
    path = str(tmp_path / "w.nkb")
    write_networkit_binary(g, path, chunks=3)
    assert detect_weight_format(g) == WF_DOUBLE
    _assert_same(g, read_networkit_binary(spark, path))


def test_roundtrip_directed_signed_int_weights(spark, tmp_path):
    g = Graph.of(
        spark,
        [(0, 1, -3.0), (1, 2, 7.0), (2, 0, -1.0), (0, 2, 2.0)],
        n=3,
        directed=True,
        weighted=True,
    )
    assert detect_weight_format(g) == WF_SIGNED_VARINT
    path = str(tmp_path / "d.nkb")
    write_networkit_binary(g, path, chunks=2)
    h = read_networkit_binary(spark, path)
    _assert_same(g, h)


def test_roundtrip_unsigned_int_weights(spark, tmp_path):
    g = Graph.of(spark, [(0, 1, 3.0), (1, 2, 300.0)], n=3, weighted=True)
    assert detect_weight_format(g) == WF_VARINT
    path = str(tmp_path / "u.nkb")
    write_networkit_binary(g, path)
    _assert_same(g, read_networkit_binary(spark, path))


def test_roundtrip_float_format(spark, tmp_path):
    g = Graph.of(spark, [(0, 1, 1.5), (1, 2, 2.5)], n=3, weighted=True)
    path = str(tmp_path / "f.nkb")
    write_networkit_binary(g, path, weight_format=WF_FLOAT)
    h = read_networkit_binary(spark, path)
    _assert_same(g, h)  # 1.5/2.5 are float-exact


def test_roundtrip_unweighted_directed_more_chunks_than_nodes(spark, tmp_path):
    g = Graph.of(spark, [(0, 1), (1, 0), (1, 2)], n=3, directed=True)
    path = str(tmp_path / "c.nkb")
    write_networkit_binary(g, path, chunks=32)  # clamped to n=3
    raw = open(path, "rb").read()
    assert struct.unpack("<Q", raw[32:40])[0] == 3  # chunks field
    _assert_same(g, read_networkit_binary(spark, path))


def test_write_is_deterministic(spark, tmp_path):
    g = Graph.of(spark, [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 4.0)], n=4, weighted=True)
    p1, p2 = str(tmp_path / "a.nkb"), str(tmp_path / "b.nkb")
    write_networkit_binary(g, p1, chunks=2)
    write_networkit_binary(g, p2, chunks=2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_bad_magic_raises(spark, tmp_path):
    path = str(tmp_path / "bad.nkb")
    with open(path, "wb") as f:
        f.write(b"not-nkbg" + b"\x00" * 72)
    with pytest.raises(ValueError, match="magic"):
        read_networkit_binary(spark, path)
