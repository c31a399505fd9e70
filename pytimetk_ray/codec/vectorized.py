"""Vectorized multi-segment encoders for the Gorilla / delta-of-delta
codecs (format-identical to codec.gorilla / codec.dod — same bitstreams,
verified by byte-equality tests against the scalar encoders).

Why: the scalar encoders pay Python big-int arithmetic per value (~1M vals/s)
and per-call setup per conversation; tier chunks are often tiny (a 1d-tier
conversation may hold <10 points), so per-call overhead dominates.  Here an
entire sorted column (many conversations) is encoded in ONE call:

1. XORs / lead-trail counts / DoD width classes: a handful of numpy passes
   over the whole column.
2. The only per-value Python work is the Gorilla window-reuse decision
   (sequential by construction): integer compares appending one bool per
   NONZERO xor.  Everything else — field widths, payloads, bit offsets — is
   vectorized off those decisions.  DoD needs no loop at all.
3. Bit assembly: every field is a <=71-bit span inside a 9-byte window at
   its byte-aligned scatter position; nonzero window bytes are OR-scattered
   into one output buffer (``np.bitwise_or.at`` after dropping zero lanes —
   typically ~2 nonzero lanes of 9).  Segments start at fresh bytes, so each
   blob is a plain slice — no per-segment packing calls.
"""

from __future__ import annotations

import numpy as np

from pytimetk_ray.codec.gorilla import _clz64, _ctz64


def _assemble(widths: np.ndarray, payloads: np.ndarray,
              value_bits: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """OR-scatter variable-width fields into per-segment byte-aligned blobs.

    ``widths``/``payloads``: one entry per FIELD (width 0 fields allowed,
    skipped).  ``value_bits``: bits per VALUE (n entries, = sum of its
    fields' widths — used for segment bit bounds).  ``bounds``: segment
    bounds over values (len nseg+1)."""
    n = len(value_bits)
    nseg = len(bounds) - 1
    cumv = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(value_bits, out=cumv[1:])
    seg_bits = cumv[bounds]                      # bit offset of each segment start
    seg_lens = np.diff(seg_bits)                 # bits per segment
    seg_bytes = (seg_lens + 7) >> 3
    seg_byte_off = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(seg_bytes, out=seg_byte_off[1:])
    out = np.zeros(int(seg_byte_off[-1]), dtype=np.uint8)

    # global (padded) bit offset of every value = within-segment offset
    # + its segment's byte-aligned start
    seg_of_value = np.searchsorted(bounds, np.arange(n), side="right") - 1
    bit_off_value = (cumv[:-1] - seg_bits[seg_of_value]) + seg_byte_off[seg_of_value] * 8

    # expand to per-field offsets (2 fields per value: header then mantissa)
    w = widths.reshape(n, 2).astype(np.int64)
    field_off = np.empty((n, 2), dtype=np.int64)
    field_off[:, 0] = bit_off_value
    field_off[:, 1] = bit_off_value + w[:, 0]
    fo = field_off.ravel()
    fw = widths.astype(np.int64)
    keep = fw > 0
    fo, fw, fp = fo[keep], fw[keep], payloads[keep]

    s = (fo & 7).astype(np.uint64)               # bit shift inside first byte
    b = fo >> 3                                  # first byte index
    a = fp.astype(np.uint64) << (np.uint64(64) - fw.astype(np.uint64))  # top-aligned
    z_hi = a >> s                                # window bytes 0..7
    z_lo = np.where(s > 0, a << (np.uint64(64) - np.maximum(s, np.uint64(1))), np.uint64(0))
    z_lo = (z_lo >> np.uint64(56)).astype(np.uint8)  # window byte 8

    lanes = np.empty((len(fo), 9), dtype=np.uint8)
    lanes[:, :8] = z_hi.astype(">u8").view(np.uint8).reshape(-1, 8)
    lanes[:, 8] = z_lo
    idx = (b[:, None] + np.arange(9)).ravel()
    flat = lanes.ravel()
    nz = flat != 0
    np.bitwise_or.at(out, idx[nz], flat[nz])

    ob = seg_byte_off
    return [out[ob[i]:ob[i + 1]].tobytes() for i in range(nseg)]


def gorilla_encode_many(values: np.ndarray, bounds) -> list[bytes]:
    """Encode ``len(bounds)-1`` contiguous segments of a float64 array into
    Gorilla bitstreams (one blob per segment; byte-identical to
    ``gorilla_encode`` on each slice)."""
    bounds = np.asarray(bounds, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    nseg = len(bounds) - 1
    if nseg <= 0:
        return []
    if n == 0:
        return [b""] * nseg
    firsts = bounds[:-1]
    xors = np.zeros(n, dtype=np.uint64)
    xors[1:] = v[1:] ^ v[:-1]
    xors[firsts] = 0
    lead = np.minimum(_clz64(xors), 31)
    trail = _ctz64(xors)

    # widths/payloads: header field + mantissa field per value
    widths = np.zeros(2 * n, dtype=np.int64)
    pays = np.zeros(2 * n, dtype=np.uint64)
    wh, wm = widths[0::2], widths[1::2]
    ph, pm = pays[0::2], pays[1::2]
    wh[:] = 1                                    # default: '0' control bit
    wh[firsts] = 64
    ph[firsts] = v[firsts]

    nz = np.flatnonzero(xors)                    # nonzero, never at firsts
    if len(nz):
        # sequential window-reuse decisions (the only per-value Python work)
        seg_of = np.searchsorted(bounds, nz, side="right") - 1
        ll = lead[nz].tolist()
        tl = trail[nz].tolist()
        sl = seg_of.tolist()
        is_new = np.empty(len(nz), dtype=bool)
        wl, wt = 99, 99                          # sentinel: no window yet
        cur_seg = -1
        for i in range(len(nz)):
            if sl[i] != cur_seg:
                cur_seg = sl[i]
                wl, wt = 99, 99
            l = ll[i]
            t = tl[i]
            if l >= wl and wt <= t:
                is_new[i] = False
            else:
                is_new[i] = True
                wl, wt = l, t

        new_i = nz[is_new]
        mlen_new = 64 - lead[new_i] - trail[new_i]
        wh[new_i] = 13
        ph[new_i] = ((np.uint64(3) << np.uint64(11))
                     | (lead[new_i].astype(np.uint64) << np.uint64(6))
                     | (mlen_new - 1).astype(np.uint64))
        wm[new_i] = mlen_new
        pm[new_i] = xors[new_i] >> trail[new_i].astype(np.uint64)

        reuse_i = nz[~is_new]
        if len(reuse_i):
            # applicable window = last 'new' event before each reuse
            ev = np.cumsum(is_new) - 1           # index into new events
            ev_r = ev[~is_new]
            wh[reuse_i] = 2
            ph[reuse_i] = 2
            wm[reuse_i] = mlen_new[ev_r]
            pm[reuse_i] = xors[reuse_i] >> trail[new_i][ev_r].astype(np.uint64)

    return _assemble(widths, pays, widths[0::2] + widths[1::2], bounds)


def dod_encode_many(ts: np.ndarray, bounds) -> list[bytes]:
    """Encode segments of an int64 timestamp array into delta-of-delta
    bitstreams (byte-identical to ``dod_encode`` per slice).  Fully
    vectorized — DoD width classes are stateless."""
    bounds = np.asarray(bounds, dtype=np.int64)
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    nseg = len(bounds) - 1
    if nseg <= 0:
        return []
    if n == 0:
        return [b""] * nseg
    firsts = bounds[:-1]
    pos0 = np.zeros(n, dtype=bool)
    pos0[firsts] = True
    pos1 = np.zeros(n, dtype=bool)
    pos1[firsts[firsts + 1 < n] + 1] = True
    pos1 &= ~pos0                                # 1-point segment: next seg's first

    deltas = np.zeros(n, dtype=np.int64)
    np.subtract(t[1:], t[:-1], out=deltas[1:])
    dods = np.zeros(n, dtype=np.int64)
    np.subtract(deltas[2:], deltas[1:-1], out=dods[2:])

    d = dods
    c0 = d == 0
    c1 = (d >= -63) & (d <= 64)
    c2 = (d >= -255) & (d <= 256)
    c3 = (d >= -2047) & (d <= 2048)
    widths = np.zeros(2 * n, dtype=np.int64)
    pays = np.zeros(2 * n, dtype=np.uint64)
    wh, wm = widths[0::2], widths[1::2]
    ph, pm = pays[0::2], pays[1::2]
    wh[:] = np.select([c0, c1, c2, c3], [1, 2, 3, 4], default=4)
    ph[:] = np.select([c0, c1, c2, c3], [0, 2, 6, 14], default=15)
    wm[:] = np.select([c0, c1, c2, c3], [0, 7, 9, 12], default=64)
    pm[:] = np.select(
        [c0, c1, c2, c3],
        [np.zeros(n, dtype=np.uint64), (d + 63).astype(np.uint64),
         (d + 255).astype(np.uint64), (d + 2047).astype(np.uint64)],
        default=d.view(np.uint64),
    )
    wh[pos0] = 64
    ph[pos0] = t.view(np.uint64)[pos0]
    wm[pos0] = 0
    pm[pos0] = 0
    wh[pos1] = 64
    ph[pos1] = deltas.view(np.uint64)[pos1]
    wm[pos1] = 0
    pm[pos1] = 0

    return _assemble(widths, pays, widths[0::2] + widths[1::2], bounds)


# --- fast decoders (verification path): word-window bit reads + bulk
# --- zero-run emission.  Byte format identical to codec.gorilla/dod.

class _WordReader:
    """MSB-first bit reader over 64-bit words: any <=64-bit field costs at
    most two word fetches (vs the per-byte loop in bits.BitReader)."""

    __slots__ = ("words", "pos")

    def __init__(self, blob: bytes):
        pad = (-len(blob)) % 8
        if pad:
            blob = blob + b"\x00" * pad
        self.words = np.frombuffer(blob, dtype=">u8").tolist()
        self.pos = 0

    def read(self, w: int) -> int:
        p = self.pos
        self.pos = p + w
        wi, off = divmod(p, 64)
        first = self.words[wi]
        end = off + w
        if end <= 64:
            return (first >> (64 - end)) & ((1 << w) - 1)
        rem = end - 64
        lo = self.words[wi + 1] >> (64 - rem)
        return ((first & ((1 << (64 - off)) - 1)) << rem) | lo


def gorilla_decode_fast(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` float64s; '0'-control runs (repeated values — constant
    count columns) are emitted in bulk via the precomputed set-bit index."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    bl = bits.tolist()
    nbits = len(bits)
    ones = None  # lazy: only needed when a zero-run actually occurs
    r = _WordReader(blob)
    prev = r.read(64)
    out[0] = prev
    lead, mlen = -1, -1
    i = 1
    while i < n:
        p = r.pos
        if bl[p]:  # '1x' control
            r.pos = p + 1
            if r.read(1) == 0:  # '10': previous window
                x = r.read(mlen) << (64 - lead - mlen)
            else:  # '11': new window
                lead = r.read(5)
                mlen = r.read(6) + 1
                x = r.read(mlen) << (64 - lead - mlen)
            prev ^= x
            out[i] = prev
            i += 1
            continue
        # zero-run: repeat prev until the next set bit (bulk emit)
        if ones is None:
            ones = np.flatnonzero(bits)
        j = np.searchsorted(ones, p)
        nxt = int(ones[j]) if j < len(ones) else nbits
        run = min(nxt - p, n - i)
        out[i:i + run] = prev
        i += run
        r.pos = p + run
    return out.view(np.float64)


def dod_decode_fast(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` int64 timestamps; zero delta-of-delta runs (regular
    grids) are emitted in bulk as an arithmetic sequence."""
    M = (1 << 64) - 1

    def s64(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    bl = bits.tolist()
    ones = None
    r = _WordReader(blob)
    t = s64(r.read(64))
    out[0] = t
    if n == 1:
        return out
    delta = s64(r.read(64))
    t = s64((t + delta) & M)
    out[1] = t
    i = 2
    nbits = len(bits)
    while i < n:
        p = r.pos
        if bl[p]:
            r.pos = p + 1
            if r.read(1) == 0:
                d = r.read(7) - 63
            elif r.read(1) == 0:
                d = r.read(9) - 255
            elif r.read(1) == 0:
                d = r.read(12) - 2047
            else:
                d = s64(r.read(64))
            delta = s64((delta + d) & M)
            t = s64((t + delta) & M)
            out[i] = t
            i += 1
            continue
        # run of zero DoDs: constant delta -> arithmetic bulk fill
        if ones is None:
            ones = np.flatnonzero(bits)
        j = np.searchsorted(ones, p)
        nxt = int(ones[j]) if j < len(ones) else nbits
        run = min(nxt - p, n - i)
        seq = (np.int64(t) + np.arange(1, run + 1, dtype=np.int64)
               * np.int64(delta))
        out[i:i + run] = seq
        t = int(seq[-1])
        i += run
        r.pos = p + run
    return out
