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

from pytimetk_ray.codec.bits import BitReader

_MASK64 = (1 << 64) - 1


def dod_encode(ts: np.ndarray) -> bytes:
    """Encode an int64 timestamp array (any storage unit) to a bitstream.

    Deltas/delta-of-deltas are vectorized; bit-packing accumulates into one
    big int flushed with a single ``to_bytes`` (fast path: all-zero DoD —
    a perfectly regular grid — is emitted with shift-only arithmetic)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    chunks: list[bytes] = []
    acc = int(t[0]) & _MASK64
    nbits = 64
    if n > 1:
        deltas = np.diff(t)
        acc = (acc << 64) | (int(deltas[0]) & _MASK64)
        nbits += 64
        dods = np.diff(deltas).tolist()
        for d in dods:
            if d == 0:
                acc <<= 1
                nbits += 1
            elif -63 <= d <= 64:
                acc = (acc << 9) | (2 << 7) | (d + 63)
                nbits += 9
            elif -255 <= d <= 256:
                acc = (acc << 12) | (6 << 9) | (d + 255)
                nbits += 12
            elif -2047 <= d <= 2048:
                acc = (acc << 16) | (14 << 12) | (d + 2047)
                nbits += 16
            else:
                acc = (acc << 68) | (15 << 64) | (d & _MASK64)
                nbits += 68
            if nbits >= 1024:
                keep = nbits & 7
                take = nbits - keep
                chunks.append((acc >> keep).to_bytes(take >> 3, "big"))
                acc &= (1 << keep) - 1
                nbits = keep
    pad = (-nbits) % 8
    acc <<= pad
    chunks.append(acc.to_bytes((nbits + pad) // 8, "big"))
    return b"".join(chunks)


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
