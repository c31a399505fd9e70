"""Delta-of-delta timestamp compression (Pelkonen et al., "Gorilla",
VLDB 2015, §4.1.1).  Public algorithm, implemented from the paper with one
widening: the escape branch stores 64 bits (µs-precision transcript
timestamps can exceed the paper's 32-bit window).

Layout: 64-bit first timestamp, 64-bit first delta, then per point a
variable-length delta-of-delta D:

    D == 0               -> '0'
    D in [-63, 64]       -> '10'   + 7  bits of (D + 63)
    D in [-255, 256]     -> '110'  + 9  bits of (D + 255)
    D in [-2047, 2048]   -> '1110' + 12 bits of (D + 2047)
    else                 -> '1111' + 64 bits two's-complement
"""

from __future__ import annotations

import numpy as np

from pytimetk_ray.codec.bits import BitReader, BitWriter

_MASK64 = (1 << 64) - 1


def dod_encode(ts: np.ndarray) -> bytes:
    """Encode an int64 timestamp array (any storage unit) to a bitstream."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    w = BitWriter()
    if n == 0:
        return w.getvalue()
    w.write(int(t[0]) & _MASK64, 64)
    if n == 1:
        return w.getvalue()
    deltas = np.diff(t)
    w.write(int(deltas[0]) & _MASK64, 64)
    dods = np.diff(deltas)
    for d in dods.tolist():
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & _MASK64, 64)
    return w.getvalue()


def dod_decode(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` int64 timestamps from a delta-of-delta bitstream."""
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(blob)
    t = _signed64(r.read(64))
    out[0] = t
    if n == 1:
        return out
    delta = _signed64(r.read(64))
    t = _signed64((t + delta) & _MASK64)  # wrap like numpy int64
    out[1] = t
    for i in range(2, n):
        if r.read(1) == 0:
            d = 0
        elif r.read(1) == 0:
            d = r.read(7) - 63
        elif r.read(1) == 0:
            d = r.read(9) - 255
        elif r.read(1) == 0:
            d = r.read(12) - 2047
        else:
            d = _signed64(r.read(64))
        delta = _signed64((delta + d) & _MASK64)
        t = _signed64((t + delta) & _MASK64)
        out[i] = t
    return out


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u
