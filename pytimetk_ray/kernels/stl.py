"""STL — Seasonal-Trend decomposition using LOESS, in pure numpy.

Public algorithm (Cleveland, Cleveland, McRae & Terpenning, "STL: A
Seasonal-Trend Decomposition Procedure Based on Loess", Journal of Official
Statistics 6 (1990) 3-73).  The reference engine delegates to
``statsmodels.tsa.seasonal.STL`` (src/pytimetk/core/anomalize.py:703-730,
core/stl_diagnostics.py:127-134 — behavior contract only); statsmodels is
absent in this environment, so the decomposition itself is implemented here.

Parameter defaults mirror statsmodels' STL wrapper:
- ``seasonal`` (cycle-subseries loess span) default 7
- ``trend`` span: smallest odd integer >= 1.5*period / (1 - 1.5/seasonal)
- ``low_pass`` span: smallest odd integer >= period
- degrees default 1; ``inner`` = 2 (non-robust) / 1 (robust); ``outer`` = 0 /
  15 with bisquare robustness weights h = 6*median|resid|.

DOCUMENTED VARIANT: loess is evaluated at every position (statsmodels'
``*_jump`` interpolation shortcuts are not used), so results can differ from
a jump>1 statsmodels run at interpolated points; with jump=1 the algorithm
is the same recurrence.

Everything is vectorized: one loess call builds an (E, q) gather matrix
(E = evaluation points, q = span), computes tricube weights and the
closed-form weighted degree-0/1 fit with no Python loop over positions; the
inner/outer loops are the algorithm's own (bounded, typically 2x1) rounds.
"""

from __future__ import annotations

import numpy as np

__all__ = ["loess", "stl_decompose"]


def _odd_at_least(x: float) -> int:
    k = int(np.ceil(x))
    return k + 1 if k % 2 == 0 else k


def loess(
    y: np.ndarray,
    span: int,
    degree: int = 1,
    eval_pos: np.ndarray | None = None,
    rho: np.ndarray | None = None,
) -> np.ndarray:
    """Loess-smooth ``y`` (values at integer positions 0..n-1) with tricube
    neighborhood weights, evaluated at integer positions ``eval_pos`` (which
    may lie outside [0, n-1] — STL's cycle-subseries extension evaluates one
    step beyond each end).

    ``span`` = q nearest neighbors; when q > n all points are used with
    lambda = lambda_n + (q - n)/2 (Cleveland §2, boundary rule).
    ``rho``: optional robustness weights multiplying the tricube weights.
    ``degree``: 0 (local constant) or 1 (local line).
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if eval_pos is None:
        eval_pos = np.arange(n, dtype=np.int64)
    t = np.asarray(eval_pos, dtype=np.int64)
    if n == 0:
        return np.full(len(t), np.nan)
    if n == 1:
        return np.full(len(t), y[0])
    q = int(span)
    qe = min(q, n)
    # contiguous window of the qe nearest points of integer t
    s = np.clip(t - (qe - 1) // 2, 0, n - qe)
    idx = s[:, None] + np.arange(qe)[None, :]           # (E, qe)
    dist = np.abs(idx - t[:, None]).astype(np.float64)
    lam = np.maximum(t - s, s + qe - 1 - t).astype(np.float64)
    if q > n:
        lam = lam + (q - n) / 2.0
    lam = np.maximum(lam, 1e-12)
    u = dist / lam[:, None]
    w = (1.0 - u**3) ** 3
    np.clip(w, 0.0, None, out=w)
    if rho is not None:
        wr = w * np.asarray(rho, dtype=np.float64)[idx]
        # a window whose robustness weights all vanish has no weighted fit;
        # fall back to the unweighted tricube fit there (the Fortran STL
        # treats this as a failed local fit and substitutes)
        dead = wr.sum(axis=1) <= 1e-300
        w = np.where(dead[:, None], w, wr)
    yv = y[idx]
    s0 = w.sum(axis=1)
    s0 = np.where(s0 <= 0, np.nan, s0)
    if degree == 0:
        return (w * yv).sum(axis=1) / s0
    x = idx.astype(np.float64)
    s1 = (w * x).sum(axis=1)
    s2 = (w * x * x).sum(axis=1)
    sy = (w * yv).sum(axis=1)
    sxy = (w * x * yv).sum(axis=1)
    den = s0 * s2 - s1 * s1
    # degenerate neighborhoods (single effective point) fall back to deg 0
    safe = np.abs(den) > 1e-12 * np.maximum(s0 * s2, 1.0)
    slope = np.where(safe, (s0 * sxy - s1 * sy) / np.where(safe, den, 1.0), 0.0)
    intercept = (sy - slope * s1) / s0
    return intercept + slope * t


def _ma(x: np.ndarray, k: int) -> np.ndarray:
    """Plain length-k moving average: out[i] = mean(x[i:i+k])."""
    c = np.concatenate([[0.0], np.cumsum(x)])
    return (c[k:] - c[:-k]) / k


def stl_decompose(
    values: np.ndarray,
    period: int,
    *,
    seasonal: int = 7,
    trend: int | None = None,
    low_pass: int | None = None,
    seasonal_deg: int = 1,
    trend_deg: int = 1,
    low_pass_deg: int = 1,
    robust: bool = False,
    inner: int | None = None,
    outer: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Full STL; returns ``(seasonal_component, trend_component)``.
    remainder = values - seasonal - trend."""
    y = np.asarray(values, dtype=np.float64)
    n = len(y)
    p = max(int(period), 2)
    ns = max(int(seasonal), 3)
    if ns % 2 == 0:
        ns += 1
    nt = int(trend) if trend is not None else _odd_at_least(1.5 * p / (1 - 1.5 / ns))
    if nt % 2 == 0:
        nt += 1
    nl = int(low_pass) if low_pass is not None else _odd_at_least(p)
    if nl % 2 == 0:
        nl += 1
    n_inner = inner if inner is not None else (1 if robust else 2)
    n_outer = outer if outer is not None else (15 if robust else 0)
    if n < 2 * p:
        # too short for cycle-subseries machinery: loess trend + per-phase
        # mean seasonal (degenerate but well-defined)
        T = loess(y, nt, trend_deg)
        detr = y - T
        phase = np.arange(n) % p
        means = np.array([detr[phase == k].mean() if (phase == k).any() else 0.0
                          for k in range(p)])
        means -= means.mean()
        return means[phase], T

    rho = np.ones(n)
    T = np.zeros(n)
    S = np.zeros(n)
    phase = np.arange(n) % p
    sub_index = [np.flatnonzero(phase == k) for k in range(p)]
    for _ in range(n_outer + 1):
        for _ in range(n_inner):
            # 1. detrend
            detr = y - T
            # 2. cycle-subseries loess, extended one step each end
            C = np.empty(n + 2 * p)
            for k in range(p):
                ii = sub_index[k]
                m = len(ii)
                sm = loess(detr[ii], ns, seasonal_deg,
                           eval_pos=np.arange(-1, m + 1), rho=rho[ii])
                # C position of subseries step j is k + (j+1)*p  (j=-1..m)
                C[k + (np.arange(-1, m + 1) + 1) * p] = sm
            # trailing positions of short subseries (n % p != 0): the grid
            # slot k + (m+1)*p can exceed n+2p-1 — handled by construction:
            # positions are k + (j+1)*p <= k + (m+1)*p; for the longest
            # subseries that is <= n + 2p - 1, and shorter phases leave
            # holes filled by their own extension (see mask below)
            # 3. low-pass: MA(p) x2, MA(3), then loess(nl)
            L = loess(_ma(_ma(_ma(C, p), p), 3), nl, low_pass_deg)
            # 4/5. seasonal & deseasonalized
            S = C[p : p + n] - L
            # 6. trend loess
            T = loess(y - S, nt, trend_deg, rho=rho)
        R = y - S - T
        h = 6.0 * np.median(np.abs(R))
        if h <= 0:
            rho = np.ones(n)
        else:
            u = np.clip(np.abs(R) / h, 0.0, 1.0)
            rho = (1.0 - u * u) ** 2
    return S, T
