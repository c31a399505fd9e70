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


# --- fast decoders: a minimal sequential STRUCTURAL scan (control bits
# --- only — field offsets/widths/shifts per value), then one vectorized
# --- payload gather + prefix reconstruction (np.bitwise_xor.accumulate for
# --- Gorilla, double cumsum for DoD).  Byte format identical to
# --- codec.gorilla/dod; ~5-10x the round-3 per-value-Python decoders.

def _gather_fields(buf: np.ndarray, off: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Right-aligned <=64-bit fields at arbitrary bit offsets, vectorized:
    each field lives inside the 72-bit window at its byte offset; combine
    the window's first 8 bytes (big-endian u64) with byte 8 for the spill.
    ``buf`` must be padded with >=9 trailing zero bytes."""
    off = np.asarray(off, dtype=np.int64)
    w64 = np.asarray(w, dtype=np.uint64)
    b = off >> 3
    s = (off & 7).astype(np.uint64)
    win = buf[b[:, None] + np.arange(9)]
    hi = win[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
    lo = win[:, 8].astype(np.uint64)
    x = (hi << s) | (lo >> (np.uint64(8) - s))
    return x >> (np.uint64(64) - w64)


def _padded(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob + b"\x00" * 9, dtype=np.uint8)


def _word32_list(buf: np.ndarray) -> list:
    """Python list of big-endian 32-bit windows at every BYTE offset:
    any <=20-bit field at bit offset p reads as ONE list lookup
    ``(w32[p >> 3] >> (32 - width - (p & 7))) & mask`` — the structural
    scan's only per-token memory access.  O(len(blob)) to build."""
    v = buf.astype(np.uint32)
    w = (v[:-3] << 24) | (v[1:-2] << 16) | (v[2:-1] << 8) | v[3:]
    return w.tolist()


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


def _scan_gorilla(w32, bits, nbits, seg_bits, vstarts, ns):
    """Structural scan over many concatenated Gorilla segments: returns
    (token bit offsets, token value indices).  Per-segment window state
    resets at each segment's byte-aligned start; every segment's first
    nonzero xor opens a '11' window, so the GLOBAL last-'11' rank used by
    the vectorized tail never crosses a segment boundary."""
    ps: list[int] = []
    idxs: list[int] = []
    ones = None
    pair2 = None
    ar = None
    ap, ai = ps.append, idxs.append
    for s in range(len(ns)):
        n_s = ns[s]
        if n_s <= 0:
            continue
        p = seg_bits[s] + 64
        i = vstarts[s] + 1
        end_i = vstarts[s] + n_s
        mlen = 0
        # tiny segments: per-probe numpy overhead exceeds the scalar loop —
        # disable bulk probing below ~128 values
        if n_s < 128:
            last_k = 0
            scalar_since = -(1 << 40)
        else:
            last_k = 64
            scalar_since = 0
        while i < end_i:
            w = w32[p >> 3]
            o = p & 7
            t = (w >> (30 - o)) & 3
            if t == 2:  # '10' reuse token
                stride = 2 + mlen
                if last_k > 2 or scalar_since >= 256:
                    scalar_since = 0
                    if pair2 is None:
                        pair2 = (bits[:-1] << 1) | bits[1:]
                        ar = np.arange(8192)
                    K = min(end_i - i, max(16, last_k * 2), 8192,
                            (nbits - 2 - p) // stride + 1)
                    if K < 1:
                        K = 1
                    cand = p + stride * ar[:K]
                    good = pair2[cand] == 2
                    k = int(good.argmin())
                    if good[k]:
                        k = K
                    elif k == 0:
                        k = 1
                    ps.extend(cand[:k].tolist())
                    idxs.extend(range(i, i + k))
                    p += stride * k
                    i += k
                    last_k = k
                else:
                    scalar_since += 1
                    ap(p)
                    ai(i)
                    p += stride
                    i += 1
            elif t == 3:  # '11' new window
                ap(p)
                ai(i)
                mlen = ((w >> (19 - o)) & 63) + 1
                p += 13 + mlen
                i += 1
                if scalar_since >= 0:  # probing stays off in tiny segments
                    last_k = 64
            elif t == 1:  # single zero
                p += 1
                i += 1
            else:
                if ones is None:
                    ones = np.flatnonzero(bits)
                j = np.searchsorted(ones, p)
                nxt = int(ones[j]) if j < len(ones) else nbits
                run = min(nxt - p, end_i - i)
                i += run
                p += run
    return ps, idxs


def gorilla_decode_many(blobs, ns) -> np.ndarray:
    """Decode many independent Gorilla segments in ONE pass (the read-path
    twin of ``gorilla_encode_many``): segments are byte-aligned, so blobs
    concatenate into one buffer; the structural scan walks all segments
    sequentially (cheap), while the expensive numpy work — unpackbits,
    word windows, payload gather, xor prefix — runs ONCE globally.  The
    per-segment xor reset is `out = acc ^ repeat(acc_before_segment)`.
    ~1000x less fixed overhead than decoding 26-point tier chunks one
    blob at a time."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        return np.empty(0, dtype=np.float64)
    blob = b"".join(blobs)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                       count=len(blobs))
    seg_bytes = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(lens, out=seg_bytes[1:])
    seg_bits = (seg_bytes[:-1] * 8).tolist()
    vstarts_a = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(ns, out=vstarts_a[1:])
    vstarts = vstarts_a[:-1]
    buf = _padded(blob)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    w32 = _word32_list(buf)
    ps, idxs = _scan_gorilla(w32, bits, len(bits), seg_bits,
                             vstarts.tolist(), ns.tolist())
    xors = np.zeros(total, dtype=np.uint64)
    if ps:
        parr = np.array(ps, dtype=np.int64)
        is_new = bits[parr + 1].astype(bool)
        hdr = _gather_fields(buf, parr[is_new] + 2,
                             np.full(int(is_new.sum()), 11, dtype=np.int64))
        lead_new = (hdr >> np.uint64(6)).astype(np.int64)
        mlen_new = (hdr & np.uint64(0x3F)).astype(np.int64) + 1
        rank = np.cumsum(is_new) - 1
        lead_t = lead_new[rank]
        mlen_t = mlen_new[rank]
        offs = np.where(is_new, parr + 13, parr + 2)
        fields = _gather_fields(buf, offs, mlen_t)
        xors[np.array(idxs, dtype=np.int64)] = (
            fields << (np.uint64(64) - lead_t.astype(np.uint64)
                       - mlen_t.astype(np.uint64)))
    live = ns > 0
    firsts = vstarts[live]
    xors[firsts] = _gather_fields(
        buf, np.asarray(seg_bits, dtype=np.int64)[live],
        np.full(int(live.sum()), 64, dtype=np.int64))
    acc = np.bitwise_xor.accumulate(xors)
    pre = acc[firsts] ^ xors[firsts]  # global prefix just BEFORE each seg
    return (acc ^ np.repeat(pre, ns[live])).view(np.float64)


def dod_decode_many(blobs, ns) -> np.ndarray:
    """Decode many independent DoD segments in one pass (see
    ``gorilla_decode_many``).  Per-segment resets for the two prefix sums:
    ``x - repeat(x[first]) + repeat(seed)`` — int64 wraparound matches the
    scalar codec's mod-2^64 arithmetic."""
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    blob = b"".join(blobs)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                       count=len(blobs))
    seg_bytes = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(lens, out=seg_bytes[1:])
    seg_bits_a = seg_bytes[:-1] * 8
    seg_bits = seg_bits_a.tolist()
    vstarts_a = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum(ns, out=vstarts_a[1:])
    vstarts = vstarts_a[:-1]
    buf = _padded(blob)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    nbits = len(bits)
    w32 = _word32_list(buf)
    wtab = [0] * 8 + [9, 9, 9, 9, 12, 12, 16, 68]
    ps: list[int] = []
    idxs: list[int] = []
    ones = None
    ap, ai = ps.append, idxs.append
    nsl = ns.tolist()
    vsl = vstarts.tolist()
    for s in range(len(nsl)):
        n_s = nsl[s]
        if n_s <= 2:
            continue
        p = seg_bits[s] + 128
        i = vsl[s] + 2
        end_i = vsl[s] + n_s
        while i < end_i:
            t = (w32[p >> 3] >> (28 - (p & 7))) & 15
            if t & 8:
                ap(p)
                ai(i)
                p += wtab[t]
                i += 1
            elif t & 4:
                p += 1
                i += 1
            else:
                if ones is None:
                    ones = np.flatnonzero(bits)
                j = np.searchsorted(ones, p)
                nxt = int(ones[j]) if j < len(ones) else nbits
                run = min(nxt - p, end_i - i)
                i += run
                p += run
    d = np.zeros(total, dtype=np.int64)
    if ps:
        parr = np.array(ps, dtype=np.int64)
        b1 = bits[parr + 1] == 0
        b2 = ~b1 & (bits[parr + 2] == 0)
        b3 = ~b1 & ~b2 & (bits[parr + 3] == 0)
        offs = parr + np.select([b1, b2, b3], [2, 3, 4], default=4)
        ws = np.select([b1, b2, b3], [7, 9, 12], default=64)
        biases = np.select([b1, b2, b3], [63, 255, 2047], default=0)
        fields = _gather_fields(buf, offs, ws)
        d[np.array(idxs, dtype=np.int64)] = fields.view(np.int64) - biases
    live = ns > 0
    firsts = vstarts[live]
    t0 = _gather_fields(buf, seg_bits_a[live],
                        np.full(int(live.sum()), 64, dtype=np.int64)
                        ).view(np.int64)
    multi = ns >= 2
    delta0 = np.zeros(int(live.sum()), dtype=np.int64)
    delta0[multi[live]] = _gather_fields(
        buf, seg_bits_a[multi] + 64,
        np.full(int(multi.sum()), 64, dtype=np.int64)).view(np.int64)
    cs = np.cumsum(d)
    deltas = cs - np.repeat(cs[firsts], ns[live]) + np.repeat(delta0, ns[live])
    deltas[firsts] = 0
    cs2 = np.cumsum(deltas)
    return cs2 - np.repeat(cs2[firsts], ns[live]) + np.repeat(t0, ns[live])


# Scalar decoders (word-window bit reads + bulk zero-run emission): the
# vectorized decoders below carry ~40 numpy-call fixed overhead per blob,
# so tiny tier segments (a 1d-tier conversation may hold <10 points) use
# these instead — crossover measured at ~256 values.
# SCALAR_CROSSOVER is module-level so tests can lower it and drive the
# vectorized path with small hypothesis inputs (both paths stay pinned).

SCALAR_CROSSOVER = 256


def _gorilla_decode_scalar(blob: bytes, n: int) -> np.ndarray:
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


def _dod_decode_scalar(blob: bytes, n: int) -> np.ndarray:
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


def gorilla_decode_fast(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` float64s.  Sequential work is ONLY the structural scan
    (control bits + the 11-bit window headers that determine field widths);
    mantissa payloads are gathered in one vectorized pass and values
    reconstructed with a single xor-prefix (v[i] = v0 ^ xor[1] ^..^ xor[i]).
    '0'-control runs (repeated values) skip in bulk via the set-bit index."""
    if n < SCALAR_CROSSOVER:
        return _gorilla_decode_scalar(blob, n)
    buf = _padded(blob)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    nbits = len(bits)
    w32 = _word32_list(buf)
    ones = None  # lazy: only needed when a zero-run actually occurs
    ps: list[int] = []
    idxs: list[int] = []
    mlen = 0
    p = 64
    i = 1
    last_k = 64   # adaptive bulk-probe size (recent '10'-run length)
    scalar_since = 0  # scalar '10' tokens since the last bulk attempt
    pair2 = None  # lazy: built on the first bulk probe
    ar = None
    ap, ai = ps.append, idxs.append
    while i < n:
        w = w32[p >> 3]
        o = p & 7
        t = (w >> (30 - o)) & 3
        if t == 2:  # '10': reuse-window token — constant width 2+mlen
            stride = 2 + mlen
            # bulk-stride: between '11' events every '10' token has the
            # same width, so candidate starts are ARITHMETIC; check their
            # control bits vectorized and emit the whole run at once.
            # Probe backoff: interleaved '10 0 10 0' streams fail every
            # probe — drop to the scalar path and only re-probe every 256
            # tokens (or after a window change).
            if last_k > 2 or scalar_since >= 256:
                scalar_since = 0
                if pair2 is None:
                    # 2-bit control at every position in ONE gather:
                    # pair2[p] == 2 <=> bits (p, p+1) == '10'
                    pair2 = (bits[:-1] << 1) | bits[1:]
                    ar = np.arange(8192)
                K = min(n - i, max(16, last_k * 2), 8192,
                        (nbits - 2 - p) // stride + 1)
                if K < 1:
                    K = 1
                cand = p + stride * ar[:K]
                good = pair2[cand] == 2
                k = int(good.argmin())
                if good[k]:
                    k = K  # argmin==0 with good[0] True: all K are '10'
                elif k == 0:
                    k = 1  # only past-nbits clamping; keep progress
                ps.extend(cand[:k].tolist())
                idxs.extend(range(i, i + k))
                p += stride * k
                i += k
                last_k = k
            else:
                scalar_since += 1
                ap(p)
                ai(i)
                p += stride
                i += 1
        elif t == 3:  # '11': parse the 6-bit mlen (advances the scan)
            ap(p)
            ai(i)
            mlen = ((w >> (19 - o)) & 63) + 1
            p += 13 + mlen
            i += 1
            last_k = 64  # window changed: re-enable bulk probing
        elif t == 1:  # single '0' then a control: cheap skip
            p += 1
            i += 1
        else:
            # zero-run (>=2): xor stays 0 until the next set bit (bulk skip)
            if ones is None:
                ones = np.flatnonzero(bits)
            j = np.searchsorted(ones, p)
            nxt = int(ones[j]) if j < len(ones) else nbits
            run = min(nxt - p, n - i)
            i += run
            p += run
    xors = np.zeros(n, dtype=np.uint64)
    if ps:
        # classify tokens + window state vectorized: '11' tokens carry an
        # 11-bit (lead,mlen) header; '10' tokens inherit the LAST '11'
        # window (forward-fill via maximum.accumulate over event indices)
        parr = np.array(ps, dtype=np.int64)
        is_new = bits[parr + 1].astype(bool)
        hdr = _gather_fields(buf, parr[is_new] + 2,
                             np.full(int(is_new.sum()), 11, dtype=np.int64))
        lead_new = (hdr >> np.uint64(6)).astype(np.int64)
        mlen_new = (hdr & np.uint64(0x3F)).astype(np.int64) + 1
        rank = np.cumsum(is_new) - 1  # last '11' at or before each token
        # (>= 0 for every token: the first nonzero xor always opens a window)
        lead_t = lead_new[rank]
        mlen_t = mlen_new[rank]
        offs = np.where(is_new, parr + 13, parr + 2)
        fields = _gather_fields(buf, offs, mlen_t)
        xors[np.array(idxs, dtype=np.int64)] = (
            fields << (np.uint64(64) - lead_t.astype(np.uint64)
                       - mlen_t.astype(np.uint64)))
    xors[0] = _gather_fields(buf, [0], [64])[0]
    return np.bitwise_xor.accumulate(xors).view(np.float64)


def dod_decode_fast(blob: bytes, n: int) -> np.ndarray:
    """Decode ``n`` int64 timestamps.  The structural scan is STATELESS
    (DoD class prefixes fully determine field widths), so the loop only
    walks control bits; payloads gather vectorized and the timestamps come
    back as delta = d-prefix-sum, t = delta-prefix-sum — two np.cumsum
    calls whose int64 wraparound matches the scalar codec's mod-2^64."""
    if n < SCALAR_CROSSOVER:
        return _dod_decode_scalar(blob, n)
    buf = _padded(blob)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    nbits = len(bits)
    w32 = _word32_list(buf)
    ones = None
    ps: list[int] = []
    idxs: list[int] = []
    # DoD classes are STATELESS: one 4-bit prefix read fully determines the
    # token width — the scan is one list lookup + a width-table hop
    wtab = [0] * 8 + [9, 9, 9, 9, 12, 12, 16, 68]
    p = 64 if n == 1 else 128
    i = 2
    ap, ai = ps.append, idxs.append
    while i < n:
        t = (w32[p >> 3] >> (28 - (p & 7))) & 15
        if t & 8:
            ap(p)
            ai(i)
            p += wtab[t]
            i += 1
        elif t & 4:  # '01xx': single zero DoD then a control
            p += 1
            i += 1
        else:
            # run of >=2 zero DoDs: constant delta — skip in bulk
            if ones is None:
                ones = np.flatnonzero(bits)
            j = np.searchsorted(ones, p)
            nxt = int(ones[j]) if j < len(ones) else nbits
            run = min(nxt - p, n - i)
            i += run
            p += run
    head = _gather_fields(buf, [0, 64], [64, 64]).view(np.int64)
    if n == 1:
        return head[:1].copy()
    d = np.zeros(n, dtype=np.int64)
    if ps:
        parr = np.array(ps, dtype=np.int64)
        b1 = bits[parr + 1] == 0
        b2 = ~b1 & (bits[parr + 2] == 0)
        b3 = ~b1 & ~b2 & (bits[parr + 3] == 0)
        offs = parr + np.select([b1, b2, b3], [2, 3, 4], default=4)
        ws = np.select([b1, b2, b3], [7, 9, 12], default=64)
        biases = np.select([b1, b2, b3], [63, 255, 2047], default=0)
        fields = _gather_fields(buf, offs, ws)
        d[np.array(idxs, dtype=np.int64)] = fields.view(np.int64) - biases
    deltas = np.cumsum(d)                    # d[0]=d[1]=0
    deltas += head[1]                        # delta_i = delta0 + sum d[2..i]
    deltas[0] = 0                            # no step into out[0]
    out = np.cumsum(deltas)
    out += head[0]
    return out
