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

from pytimetk_ray.codec.bits import BitReader


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
    """Encode a float64 array into a Gorilla XOR bitstream.

    XORs and leading/trailing-zero counts are vectorized; the bit-packing
    loop keeps the accumulator in local variables and flushes bytes in bulk
    (one big-int ``to_bytes`` at the end) — ~5x faster than a per-write
    BitWriter for typical chunks."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    chunks: list[bytes] = []
    acc = int(v[0])
    nbits = 64
    if n > 1:
        xors = np.bitwise_xor(v[1:], v[:-1])
        xl = xors.tolist()
        if n <= 128:
            # scalar bit ops beat 12 numpy array passes on tiny chunks
            ll = [min(64 - x.bit_length(), 31) for x in xl]
            tl = [((x & -x).bit_length() - 1) if x else 64 for x in xl]
        else:
            lead = _clz64(xors)
            np.minimum(lead, 31, out=lead)  # 5-bit leading field
            trail = _ctz64(xors)
            ll = lead.tolist()
            tl = trail.tolist()
        prev_lead, prev_len = -1, -1
        prev_trail = 65
        for i in range(n - 1):
            x = xl[i]
            if x == 0:
                acc <<= 1
                nbits += 1
                continue
            l = ll[i]
            t = tl[i]
            if l >= prev_lead and prev_trail <= t:
                # '10' + meaningful bits in the previous window
                acc = (acc << (2 + prev_len)) | (2 << prev_len) | (x >> prev_trail)
                nbits += 2 + prev_len
            else:
                mlen = 64 - l - t
                # '11' + 5-bit lead + 6-bit (mlen-1) + mlen bits
                acc = (
                    (acc << (13 + mlen))
                    | (3 << (11 + mlen))
                    | (l << (6 + mlen))
                    | ((mlen - 1) << mlen)
                    | (x >> t)
                )
                nbits += 13 + mlen
                prev_lead, prev_len, prev_trail = l, mlen, 64 - l - mlen
            if nbits >= 1024:
                # flush whole bytes; big-int stays small (O(n) total, not O(n^2))
                keep = nbits & 7
                take = nbits - keep
                chunks.append((acc >> keep).to_bytes(take >> 3, "big"))
                acc &= (1 << keep) - 1
                nbits = keep
    pad = (-nbits) % 8
    acc <<= pad
    chunks.append(acc.to_bytes((nbits + pad) // 8, "big"))
    return b"".join(chunks)


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
