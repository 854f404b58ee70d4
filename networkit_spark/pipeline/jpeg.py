"""Pure-numpy baseline JFIF (JPEG) codec — no codec libraries.

This closes the image-decode seam in :mod:`networkit_spark.pipeline.
multimodal` for real: ``decode_jpeg`` parses a baseline sequential JFIF
stream (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, optional DRI restart markers),
huffman-decodes the entropy segment with FF00 byte-unstuffing, then
dequantizes, de-zigzags, runs the orthonormal inverse DCT as two 8×8
matrix multiplies per block (numpy-batched over ALL blocks at once),
upsamples chroma by integer factors and converts YCbCr→RGB per the JFIF
spec. ``encode_jpeg`` is the matching baseline encoder (standard Annex-K
huffman tables, quality-scaled quant tables, 4:4:4) used to synthesize
deterministic test payloads so the round trip pins the decoder without
external fixtures.

Scope (documented): baseline sequential DCT, 8-bit, 1 or 3 components,
any integer sampling factors whose MCU divides the padded image (covers
4:4:4, 4:2:2, 4:2:0). Progressive, arithmetic coding, and 12-bit are out
of scope and raise ValueError — the strict-mode seam reports them
honestly rather than mis-decoding.

Reference parity note: the reference engine (networkit) has no image
path at all — this module serves the LLM-pipeline tier (multimodal
ingest at 100 TB), where decode runs inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: ZIGZAG[i] = position in the 8x8 block of the i-th scanned coef
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical huffman assignment (JPEG F.2.2.3)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()
    }


# orthonormal 8-point DCT matrix: row u, col x
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        a = np.sqrt(0.125) if _u == 0 else 0.5
        _C[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT of an (n, 8, 8) coefficient stack, one einsum pass."""
    return np.einsum("ui,nuv,vj->nij", _C, blocks, _C)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # a real marker: stop feeding (RST handled by caller)
                    self.pos -= 1
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise ValueError("truncated JPEG entropy segment")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")

    def align_restart(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND (F.2.2.1): map t magnitude bits to a signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 75) -> bytes:
    """Baseline 4:4:4 JFIF encoder for (h, w, 3) uint8 RGB (or (h, w)
    grayscale) — standard tables, quality-scaled quantization."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if quality < 1 or quality > 100:
        raise ValueError("quality in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((STD_LUMA_Q * scale + 50) // 100, 1, 255)
    qc = np.clip((STD_CHROMA_Q * scale + 50) // 100, 1, 255)

    if gray:
        planes = [px.astype(np.float64) - 128.0]
        qs = [ql]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qs = [ql, qc, qc]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_specs = [DC_LUMA_SPEC] + ([DC_CHROMA_SPEC] if not gray else [])
    ac_specs = [AC_LUMA_SPEC] + ([AC_CHROMA_SPEC] if not gray else [])
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    # quantized zigzag coefficients per component, block-row-major
    comp_coefs = []
    for plane, q in zip(planes, qs):
        pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = (
            pad.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = _fdct_blocks(blocks)
        zz = coefs.reshape(-1, 64)[:, ZIGZAG]
        comp_coefs.append(np.round(zz / q[ZIGZAG]).astype(np.int64))

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    n_blocks = comp_coefs[0].shape[0]
    for bi in range(n_blocks):
        for ci, zz in enumerate(comp_coefs):
            ti = min(ci, 1)
            dct, act = dc_codes[ti], ac_codes[ti]
            blk = zz[bi]
            diff = int(blk[0]) - prev_dc[ci]
            prev_dc[ci] = int(blk[0])
            t = _category(diff) if diff else 0
            code, ln = dct[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = 0
            for k in range(63, 0, -1):
                if blk[k]:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = act[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, ln = act[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for cls, specs in ((0, dc_specs), (1, ac_specs)):
        for ti, (bits, vals) in enumerate(specs):
            out += seg(
                0xFFC4, bytes([(cls << 4) | ti]) + bytes(bits) + bytes(vals)
            )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF stream to (h, w, 3) uint8 RGB
    (grayscale streams are replicated to 3 channels). Raises ValueError
    on progressive/arithmetic/unsupported streams."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack(">H", d[pos : pos + 2])[0]
        body = d[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                qt[tq] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, ti = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[ti] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomp = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scomp.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            scan = {"comps": scomp, "data_start": pos + ln}
            break
        pos += ln
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across
        c["bh"] = mcuy * c["v"]
        c["coefs"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
    by_id = {c["id"]: c for c in comps}

    br = _BitReader(d[scan["data_start"] :])
    prev_dc = {c["cs"]: 0 for c in scan["comps"]}
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            br.align_restart()
            for k in prev_dc:
                prev_dc[k] = 0
        my, mx = divmod(mi, mcux)
        for sc in scan["comps"]:
            c = by_id[sc["cs"]]
            dct = huff_dc[sc["td"]]
            act = huff_ac[sc["ta"]]
            q = qt[c["tq"]]
            for vy in range(c["v"]):
                for hx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = br.read_huffman(dct)
                    diff = _extend(br.read(t), t) if t else 0
                    prev_dc[sc["cs"]] += diff
                    zz[0] = prev_dc[sc["cs"]]
                    k = 1
                    while k < 64:
                        rs = br.read_huffman(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _extend(br.read(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = zz * q[ZIGZAG]
                    row = my * c["v"] + vy
                    col = mx * c["h"] + hx
                    c["coefs"][row * c["bw"] + col] = blk.reshape(8, 8)

    planes = []
    for c in comps:
        px = _idct_blocks(c["coefs"]) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        img = (
            px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.kron(img, np.ones((ry, rx)))
        planes.append(img[:fh, :fw])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    # round-to-nearest before the uint8 cast — astype truncates, which
    # biased every reconstructed sample down by up to 1 LSB
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
