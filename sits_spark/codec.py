"""Gorilla-style compression for rolled-up series blocks.

Implements the two codecs from the public Gorilla paper (Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015,
sections 4.1/4.2):

- ``encode_ts_d2`` / ``decode_ts_d2``: delta-of-delta int64 timestamp
  encoding with the paper's variable-width buckets (0 / 7 / 9 / 12 / 64
  bits — we widen the final bucket from the paper's 32 to 64 bits so
  arbitrary epoch-second gaps round-trip).
- ``encode_xor`` / ``decode_xor``: float64 XOR encoding with
  leading/trailing-zero window reuse.

These run inside Arrow-batched pandas UDFs producing ``BinaryType`` blobs
per (conv_id, window) — the Spark-side analog of the reference packing
band values into INT2S/FLT4S rasters on write
(/root/reference/R/sits_apply.R:89-94, /root/reference/R/api_reduce.R:245-254).
NaNs round-trip (their bit pattern is preserved by the XOR scheme).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_ts_d2", "decode_ts_d2", "encode_xor", "decode_xor"]


class _BitWriter:
    """Big-endian bit writer with incremental byte flush (keeps the
    accumulator small — a single growing int would make long blocks
    quadratic in Python)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("acc", "nbits", "pos")

    def __init__(self, data: bytes) -> None:
        self.acc = int.from_bytes(data, "big")
        self.nbits = len(data) * 8
        self.pos = 0

    def read(self, width: int) -> int:
        shift = self.nbits - self.pos - width
        self.pos += width
        return (self.acc >> shift) & ((1 << width) - 1)


def encode_ts_d2(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode an int64 timestamp array (paper §4.1).

    Layout: [n:u32][first:i64][first_delta zigzag:u64-ish via 64 bits]
    then per point a prefix-coded dod:
      '0'              -> dod == 0
      '10'   + 7 bits  -> dod in [-63, 64]
      '110'  + 9 bits  -> dod in [-255, 256]
      '1110' + 12 bits -> dod in [-2047, 2048]
      '1111' + 64 bits -> anything else
    Values in the small buckets are stored biased by (2^(w-1) - 1).
    """
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]), 64)
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod, 64)
    return w.bytes()


def decode_ts_d2(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    out[0] = first - (1 << 64) if first >= (1 << 63) else first
    if n == 1:
        return out
    d = r.read(64)
    delta = d - (1 << 64) if d >= (1 << 63) else d
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            v = r.read(64)
            dod = v - (1 << 64) if v >= (1 << 63) else v
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode_xor(values: np.ndarray) -> bytes:
    """XOR-encode a float64 array (paper §4.2).

    Layout: [n:u32][first:64 raw bits] then per point:
      '0'            -> xor == 0
      '10' + bits    -> meaningful bits fit the previous leading/length window
      '11' + 6-bit leading + 6-bit length(1..64, stored len-1) + bits
    (The paper uses 5 leading bits; we use 6 so NaN payload patterns with
    <32 leading zeros still encode. Leading counts are clamped to 63.)
    """
    vals = np.asarray(values, dtype=np.float64)
    bits = vals.view(np.uint64)
    n = len(vals)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    prev = int(bits[0])
    w.write(prev, 64)
    lead, length = -1, -1  # no previous window
    xors = (bits[1:] ^ bits[:-1]).tolist()
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        xl = _clz64(x)
        xt = _ctz64(x)
        if xl > 63:
            xl = 63
        xlen = 64 - xl - xt
        if lead >= 0 and xl >= lead and xlen <= length and (64 - lead - length) <= xt:
            w.write(0b10, 2)
            w.write(x >> (64 - lead - length), length)
        else:
            lead, length = xl, xlen
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(length - 1, 6)
            w.write(x >> xt, length)
    return w.bytes()


def decode_xor(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 1:
            lead = r.read(6)
            length = r.read(6) + 1
        x = r.read(length) << (64 - lead - length)
        cur ^= x
        out[i] = cur
    return out.view(np.float64)
