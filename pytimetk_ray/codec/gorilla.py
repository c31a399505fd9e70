"""Gorilla XOR float compression (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2).

Public algorithm, implemented from the paper:

- first value stored raw (64 bits)
- each next value XORed with the previous:
  - XOR == 0            -> control bit ``0``
  - fits previous window -> ``10`` + meaningful bits in the previous
    (leading, length) window
  - else                 -> ``11`` + 5-bit leading-zero count + 6-bit
    (length-1) + the meaningful bits

The XOR array and leading/trailing-zero counts are precomputed vectorized in
numpy; only the bit-packing itself loops.  Decode returns bit-identical
float64s (NaN payloads included) — the tier checkpoint round-trip test relies
on that.
"""

from __future__ import annotations

import numpy as np

from pytimetk_ray.codec.bits import BitReader, BitWriter


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (returns 64 for zero)."""
    bits = np.zeros(len(x), dtype=np.int64)
    v = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        bits[mask] += shift
        v[mask] >>= np.uint64(shift)
    nz = x != 0
    out = np.full(len(x), 64, dtype=np.int64)
    out[nz] = 63 - bits[nz]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (returns 64 for zero)."""
    lsb = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, 63 - _clz64(lsb))


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array into a Gorilla XOR bitstream."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    w = BitWriter()
    if n == 0:
        return w.getvalue()
    w.write(int(v[0]), 64)
    if n == 1:
        return w.getvalue()
    xors = np.bitwise_xor(v[1:], v[:-1])
    lead = _clz64(xors)
    trail = _ctz64(xors)
    np.minimum(lead, 31, out=lead)  # 5-bit leading field
    prev_lead, prev_len = -1, -1
    for i in range(n - 1):
        x = int(xors[i])
        if x == 0:
            w.write(0, 1)
            continue
        l, t = int(lead[i]), int(trail[i])
        mlen = 64 - l - t
        if prev_lead >= 0 and l >= prev_lead and (64 - prev_lead - prev_len) <= t:
            # fits inside the previous (leading, length) window
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.write(0b11, 2)
            w.write(l, 5)
            w.write(mlen - 1, 6)
            w.write(x >> t, mlen)
            prev_lead, prev_len = l, mlen
    return w.getvalue()


def gorilla_decode(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` float64 values from a Gorilla XOR bitstream."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(blob)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10': previous window
            bits = r.read(mlen)
            x = bits << (64 - lead - mlen)
        else:  # '11': new window
            lead = r.read(5)
            mlen = r.read(6) + 1
            bits = r.read(mlen)
            x = bits << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
