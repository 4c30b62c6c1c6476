"""Minimal REAL baseline-JPEG decoder (no third-party deps) — the same
spirit as the built-in PNG and GIF-LZW decoders in operators/multimodal.py:
zlib/numpy-class tooling only, implementing the PUBLIC spec (ITU-T T.81 /
ISO 10918-1, baseline sequential DCT).

Supported: SOF0 (baseline, 8-bit), Huffman entropy coding (DHT), 1- or
3-component (grayscale / YCbCr), sampling factors up to 2×2 (4:4:4, 4:2:2,
4:2:0), DRI restart intervals.  Progressive (SOF2), arithmetic coding, and
12-bit precision raise NotImplementedError naming the feature — the
extension point where a production pipeline drops in torchvision/libjpeg.

Decode fidelity note: T.81 does not pin one DCT implementation; this
decoder uses an exact float IDCT (orthonormal 8×8 DCT-III via a matrix
product) and box (pixel-replication) chroma upsampling.  libjpeg's default
integer "islow" IDCT and fancy upsampling may differ by ±1-2 code values
per sample, so the PIL parity test compares within that tolerance — unlike
PNG/GIF where byte identity is asserted.

Scale shape: decoding runs inside the same mapInPandas Arrow batches as
every other codec (operators/multimodal.py extract_features) — the
per-payload work is a pure function, embarrassingly parallel across the
cluster.  The entropy-decode loop here is per-bit Python (a correctness
baseline for thumbnails and tests, not a throughput claim).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIG = b"\xff\xd8"

# zig-zag order: index i of the scan → position in the 8×8 block (T.81 §A.3.6)
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix; IDCT of block B is  M.T @ B @ M
_C = np.array([
    [np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
     * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
    for k in range(8)
])


class _HuffTable:
    """Canonical Huffman table from a DHT segment's (bits, values)."""

    def __init__(self, bits: list[int], values: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; restart markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2          # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()    # caller resyncs at MCU boundary
            else:
                # past the scan (EOI or next marker): pad with 1-bits,
                # which is what T.81 §F.2.2.5 prescribes for the tail
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the RSTn marker at a restart boundary and re-align."""
        self.bitbuf = 0
        self.nbits = 0
        # skip to the marker (any partial byte is discarded by the reset)
        while not (self.data[self.pos] == 0xFF
                   and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartHit(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """T.81 table F.2 EXTEND: map the t-bit magnitude to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(r: _BitReader, table: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _decode_block(r: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable,
                  pred: int, qt: np.ndarray) -> tuple[np.ndarray, int]:
    """One 8×8 block: DC diff + AC run-length → dequantized coefficients."""
    coef = np.zeros(64, dtype=np.float64)
    t = _decode_huff(r, dc_tab)
    pred += _extend(r.bits(t), t)
    coef[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:              # ZRL: 16 zeros
                k += 16
                continue
            break                      # EOB
        k += run
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        coef[k] = _extend(r.bits(size), size) * qt[k]
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = coef
    return block.reshape(8, 8), pred


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, pixel bytes) — interleaved RGB for 3-component
    scans, luma bytes for grayscale (matching PIL's tobytes() layout)."""
    if payload[:2] != JPEG_SIG:
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}   # (class, id)
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    pos = 2
    scan_comps: list[dict] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        data = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:             # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                p += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        data[p:p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                else:
                    qt[tq] = np.frombuffer(
                        data[p:p + 128], dtype=">u2").astype(np.float64)
                    p += 128
        elif marker == 0xC4:           # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, data[p + 17:p + 17 + n])
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = data[0], *struct.unpack(">HH", data[1:5]), data[5]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: only baseline sequential DCT supported "
                f"(SOF marker 0x{marker:02X}: progressive/arithmetic/"
                f"hierarchical)"
            )
        elif marker == 0xDD:           # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:           # SOS
            ns = data[0]
            for i in range(ns):
                cs, tdta = data[1 + 2 * i], data[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cs)
                scan_comps.append({**c, "dc": tdta >> 4, "ac": tdta & 0x0F})
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if w is None or not scan_comps:
        raise ValueError("jpeg: missing SOF/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("jpeg: sampling factors above 2x2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in scan_comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))

    r = _BitReader(payload, pos)
    preds = [0] * len(scan_comps)
    mcu = 0
    while mcu < mcux * mcuy:
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.restart()
            preds = [0] * len(scan_comps)
        my, mx = divmod(mcu, mcux)
        try:
            for ci, c in enumerate(scan_comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[ci] = _decode_block(
                            r, huff[(0, c["dc"])], huff[(1, c["ac"])],
                            preds[ci], qt[c["tq"]],
                        )
                        px = _idct2(block) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
        except _RestartHit:
            # encoder emitted RSTn early relative to our count — resync
            r.restart()
            preds = [0] * len(scan_comps)
            continue
        mcu += 1

    # crop to component resolution, replicate-upsample to full size
    full = []
    for c, plane in zip(scan_comps, planes):
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        p = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, out.tobytes()
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, out.tobytes()
