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
