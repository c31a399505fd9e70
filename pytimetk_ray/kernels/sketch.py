"""Mergeable quantile sketch (KLL) — bounded-memory distributed quantiles.

The engine's exact quantile paths (``ops/quantiles.column_quantiles``,
``ops/correlationfunnel.binarize``) merge per-batch (value, count)
histograms: bit-exact, but the merged state grows with the number of
DISTINCT values — unbounded for continuous doubles at 100 TB.  This module
adds the standard space-bounded alternative: the KLL sketch of
Karnin-Lang-Liberty ("Optimal quantile approximation in streams",
FOCS 2016, public algorithm), with additive rank error eps ~ O(1/k) in
O(k log(n/k)) space regardless of value cardinality.

Mergeability is the distributed contract: ``map_batches`` builds one sketch
per block (vectorized numpy updates), a tiny keyed reduce merges the
per-block sketches, quantiles come off the merged sketch — the SAME
partial/combine shape as every aggregate in this engine, with the
accumulator bounded by k instead of by distinct-value count.

Determinism: compaction keeps every other element of the sorted buffer;
the classic algorithm flips a fair coin for the offset, here the offset
alternates deterministically per level (a public derandomization used by
several production implementations).  The sketch is therefore reproducible
on a fixed block layout; rank error remains within the KLL envelope for
non-adversarial data (tested by property tests across distributions).
"""

from __future__ import annotations

import numpy as np

_CAP_RATIO = 2.0 / 3.0


class KLL:
    """KLL quantile sketch over float64 values (NaNs ignored).

    levels[h] is a SORTED float64 array whose elements each represent
    2**h original values.  Level capacities decay geometrically from k at
    the top, floored at 2.
    """

    __slots__ = ("k", "levels", "n", "_flips")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._flips: list[bool] = [False]

    # -- construction --------------------------------------------------------

    def _capacity(self, h: int) -> int:
        depth = len(self.levels)
        return max(2, int(np.ceil(self.k * _CAP_RATIO ** (depth - 1 - h))))

    def update_many(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self._flips.append(False)
        for h, arr in enumerate(other.levels):
            if len(arr):
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._capacity(h):
                buf = np.sort(self.levels[h], kind="mergesort")
                off = 1 if self._flips[h] else 0
                self._flips[h] = not self._flips[h]
                promoted = buf[off::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self._flips.append(False)
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted])
            h += 1

    # -- queries --------------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                wts.append(np.full(len(arr), 1 << h, dtype=np.int64))
        if not vals:
            return (np.empty(0, dtype=np.float64),
                    np.empty(0, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="mergesort")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Value whose estimated rank is ~q*n (nearest-rank convention)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[min(np.searchsorted(cum, target, side="left"),
                           len(v) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs], dtype=np.float64)

    def rank(self, x: float) -> float:
        """Estimated fraction of values <= x."""
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        i = np.searchsorted(v, x, side="right")
        return float(cum[i - 1] / cum[-1]) if i else 0.0

    # -- serialization (rides Ray Data rows as plain bytes) -------------------

    def to_bytes(self) -> bytes:
        head = np.array([self.k, self.n, len(self.levels)], dtype=np.int64)
        sizes = np.array([len(a) for a in self.levels], dtype=np.int64)
        body = (np.concatenate(self.levels) if any(len(a) for a in self.levels)
                else np.empty(0, dtype=np.float64))
        return head.tobytes() + sizes.tobytes() + body.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KLL":
        head = np.frombuffer(raw[:24], dtype=np.int64)
        k, n, nlev = int(head[0]), int(head[1]), int(head[2])
        sizes = np.frombuffer(raw[24:24 + 8 * nlev], dtype=np.int64)
        body = np.frombuffer(raw[24 + 8 * nlev:], dtype=np.float64)
        sk = cls(k=k)
        sk.n = n
        sk.levels = []
        sk._flips = [False] * nlev
        pos = 0
        for s in sizes:
            sk.levels.append(body[pos:pos + s].copy())
            pos += int(s)
        return sk


# --- HyperLogLog (Flajolet et al. 2007) -------------------------------------


class HLL:
    """HyperLogLog distinct-count sketch over uint64 hashes.

    ``p`` index bits -> m = 2**p single-byte registers (m=4096 at the
    default p=12: ~1.04/sqrt(m) ~ 1.6% standard error in 4 KiB, regardless
    of cardinality).  Mergeable by elementwise register max — the same
    partial/combine contract as every aggregate in this engine; merging is
    associative and commutative, so combine order never changes the
    estimate (bit-reproducible across block layouts, unlike KLL).

    Input is the caller's 64-bit hash (use ``kernels.text.md5_u64_many``
    for strings or ``pd.util.hash_array`` for numerics) — the sketch never
    sees raw values.  Small-range correction per the original paper; the
    64-bit variant needs no large-range correction.
    """

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> "HLL":
        """Vectorized register update from a uint64 hash array."""
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1
        nbits = 64 - self.p
        rank = np.zeros(len(h), dtype=np.uint8)
        alive = np.ones(len(h), dtype=bool)
        top = np.uint64(1) << np.uint64(63)
        for r in range(1, nbits + 1):
            zero_top = alive & ((rest & top) == 0)
            rank[alive] = r
            alive = zero_top
            if not alive.any():
                break
            rest = rest << np.uint64(1)
        rank[alive] = nbits + 1
        np.maximum.at(self.regs, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError("HLL precision mismatch")
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        if self.m >= 128:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        elif self.m == 64:
            alpha = 0.709
        elif self.m == 32:
            alpha = 0.697
        else:
            alpha = 0.673
        # sum(2^-reg) accumulated as an EXACT integer: S = sum 2^(B-reg)
        # with B = max rank, so sum(2^-reg) == S / 2^B with no float
        # summation-order dependence.  This makes the estimate reproducible
        # from SQL-built registers (the events_ndistinct oracle) — the only
        # remaining float ops below are individually correctly-rounded and
        # mirrored term-for-term in the SQL.
        B = 64 - self.p + 1
        counts = np.bincount(self.regs, minlength=B + 1)
        S = sum(int(c) << (B - r) for r, c in enumerate(counts) if c)
        e = alpha * m * m * float(1 << B) / float(S)
        if e <= 2.5 * m:
            zeros = int((self.regs == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.regs.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HLL":
        s = cls(raw[0])
        s.regs = np.frombuffer(raw[1:], dtype=np.uint8).copy()
        return s


# --- SpaceSaving heavy hitters (Metwally et al. 2005) ------------------------


class SpaceSaving:
    """SpaceSaving top-k summary (Metwally, Agrawal, El Abbadi, "Efficient
    computation of frequent and top-k elements in data streams", ICDT 2005)
    with the mergeable-summaries combine of Agarwal et al. (PODS 2012).

    Holds at most ``capacity`` counters.  For every tracked item,
    ``count - err <= true_count <= count``; any item with true count
    > N/capacity is guaranteed tracked.  When ``capacity`` exceeds the
    stream's distinct-item count the summary is EXACT (err = 0 for all) —
    the property the oracle twin uses.

    ``update_counts`` consumes (item, count) pairs — per-batch exact counts
    from a vectorized ``value_counts`` — so the Python loop runs over
    DISTINCT items per batch, never the token stream.
    """

    __slots__ = ("capacity", "counts", "errs")

    def __init__(self, capacity: int = 1024):
        self.capacity = int(capacity)
        self.counts: dict = {}
        self.errs: dict = {}

    def update_counts(self, items, counts) -> "SpaceSaving":
        for it, c in zip(items, counts):
            c = int(c)
            if it in self.counts:
                self.counts[it] += c
            elif len(self.counts) < self.capacity:
                self.counts[it] = c
                self.errs[it] = 0
            else:
                victim = min(self.counts, key=lambda x: (self.counts[x], x))
                m = self.counts.pop(victim)
                self.errs.pop(victim)
                self.counts[it] = m + c
                self.errs[it] = m
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        # Agarwal et al. (PODS 2012) combine: an item tracked in only ONE
        # summary may have occurrences absorbed into the other summary's
        # evicted mass — offset it by the other's minimum count (0 when the
        # other is below capacity, i.e. exact: untracked => true count 0).
        # Keeps `count >= true_count` in the approximate regime; the exact
        # regime (oracle twin) is unchanged.
        m_self = (min(self.counts.values())
                  if len(self.counts) >= self.capacity else 0)
        m_other = (min(other.counts.values())
                   if len(other.counts) >= other.capacity else 0)
        if m_other:
            for it in self.counts:
                if it not in other.counts:
                    self.counts[it] += m_other
                    self.errs[it] += m_other
        for it, c in other.counts.items():
            e = other.errs[it]
            if it in self.counts:
                self.counts[it] += c
                self.errs[it] += e
            else:
                self.counts[it] = c + m_self
                self.errs[it] = e + m_self
        if len(self.counts) > self.capacity:
            # keep the top-capacity by count (ties: item asc, stable);
            # evicted mass raises the retained floor like single-stream
            # eviction would — errors stay upper bounds
            order = sorted(self.counts.items(),
                           key=lambda kv: (-kv[1], kv[0]))
            kept = order[: self.capacity]
            floor = max(c for _, c in order[self.capacity:])
            self.counts = dict(kept)
            self.errs = {it: min(self.errs[it] + floor, self.counts[it])
                         for it, _ in kept}
        return self

    def topk(self, k: int) -> list[tuple[object, int, int]]:
        """[(item, count_upper_bound, err)] — count desc, item asc."""
        order = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(it, c, self.errs[it]) for it, c in order[:k]]
