"""Rolling-window HMM regime detection — self-contained numpy Gaussian HMM.

Reference behavior contract (src/pytimetk/finance/regime_detection.py:84-124,
389-453): per group, log returns = log(close/prev) with ±inf -> NaN; for each
rolling window ending at i (stepping ``step_size``), fit a ``n_regimes``-state
Gaussian HMM on the window's FINITE returns (skip when fewer than
``min_obs = max(window//2, n_regimes*10)``), predict the state sequence, and
write the last ``min(step_size, n_finite)`` predicted labels at their original
row positions; all other rows stay NaN.  Fits warm-start from the previous
window's parameters, exactly like the reference's hmm_params carry-over.

The reference delegates the fit to hmmlearn/pomegranate (absent here); this
module implements the standard Baum-Welch EM + Viterbi for a 1-D
diagonal-covariance Gaussian HMM in numpy (public algorithm, Rabiner 1989
tutorial form): scaled forward/backward recurrences, vectorized xi
accumulation, tol-on-loglik stopping.

LABEL DETERMINISM (documented variant): hmmlearn's state indices are
init-dependent and arbitrary; here states are CANONICALIZED by sorting on the
fitted state mean ascending (regime 0 = lowest mean return), which makes the
output deterministic and comparable across windows/groups.  Numeric values of
the labels may therefore differ from an hmmlearn run even when the segment
boundaries agree.

Execution shape: one vectorized-per-group kernel over hash partitions
(exec.partitioned_group_map) — groups parallelize across the cluster; the
per-window EM is the irreducible sequential core (each window is a few
hundred observations; forward/backward are O(n·K²) recurrences).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

_TINY = 1e-300


def _emissions(x: np.ndarray, mu: np.ndarray, var: np.ndarray) -> np.ndarray:
    B = np.exp(-0.5 * (x[:, None] - mu) ** 2 / var) / np.sqrt(2.0 * np.pi * var)
    return np.maximum(B, _TINY)


def hmm_fit(x: np.ndarray, n_states: int, *, n_iter: int = 50,
            tol: float = 1e-3, params=None):
    """Baum-Welch EM for a 1-D Gaussian HMM.  Returns (pi, A, mu, var).

    Deterministic init (no RNG): means at evenly spaced quantiles of the
    data, shared variance, sticky 0.9-diagonal transitions."""
    n, K = len(x), n_states
    if params is None:
        mu = np.quantile(x, np.linspace(0.15, 0.85, K)).astype(np.float64)
        # split quantile ties so states stay distinct on near-constant data
        mu = mu + np.arange(K) * 1e-9
        var = np.full(K, max(x.var(), 1e-10))
        pi = np.full(K, 1.0 / K)
        A = np.full((K, K), 0.1 / max(K - 1, 1))
        np.fill_diagonal(A, 0.9)
    else:
        pi, A, mu, var = (np.array(p, dtype=np.float64) for p in params)
    prev_ll = -np.inf
    for _ in range(n_iter):
        B = _emissions(x, mu, var)
        # scaled forward
        alpha = np.empty((n, K))
        c = np.empty(n)
        a = pi * B[0]
        c[0] = a.sum()
        alpha[0] = a / c[0]
        for t in range(1, n):
            a = (alpha[t - 1] @ A) * B[t]
            c[t] = a.sum()
            alpha[t] = a / c[t]
        ll = float(np.log(c).sum())
        # scaled backward; beta is additionally renormalized per step — its
        # per-t scale cancels in gamma (normalized per t) and xi (normalized
        # per t), and the extra scaling keeps tight-cluster fits finite
        beta = np.empty((n, K))
        beta[-1] = 1.0
        for t in range(n - 2, -1, -1):
            b = (A @ (B[t + 1] * beta[t + 1])) / c[t + 1]
            beta[t] = b / max(b.max(), _TINY)
        gamma = alpha * beta
        gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), _TINY)
        # vectorized xi accumulation over all t at once
        num = alpha[:-1, :, None] * A[None, :, :] * (B[1:] * beta[1:])[:, None, :]
        num /= np.maximum(num.sum(axis=(1, 2), keepdims=True), _TINY)
        xi_sum = num.sum(axis=0)
        # M-step
        pi = gamma[0]
        A = xi_sum / np.maximum(xi_sum.sum(axis=1, keepdims=True), _TINY)
        w = gamma.sum(axis=0)
        mu = (gamma * x[:, None]).sum(axis=0) / w
        var = np.maximum((gamma * (x[:, None] - mu) ** 2).sum(axis=0) / w, 1e-10)
        if abs(ll - prev_ll) < tol:
            break
        prev_ll = ll
    return pi, A, mu, var


def hmm_viterbi(x: np.ndarray, pi, A, mu, var) -> np.ndarray:
    """Most-likely state path (log-space Viterbi)."""
    n, K = len(x), len(mu)
    logB = np.log(_emissions(x, mu, var))
    logA = np.log(np.maximum(A, _TINY))
    delta = np.log(np.maximum(pi, _TINY)) + logB[0]
    back = np.empty((n, K), dtype=np.int64)
    for t in range(1, n):
        cand = delta[:, None] + logA
        back[t] = cand.argmax(axis=0)
        delta = cand[back[t], np.arange(K)] + logB[t]
    path = np.empty(n, dtype=np.int64)
    path[-1] = int(delta.argmax())
    for t in range(n - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path


def _detect_regimes(values: np.ndarray, window: int, n_regimes: int,
                    step_size: int, n_iter: int) -> np.ndarray:
    """Reference detect_regimes loop (regime_detection.py:389-453) over one
    group's log-return array; labels canonicalized by state mean."""
    n = len(values)
    regimes = np.full(n, np.nan)
    min_obs = max(window // 2, n_regimes * 10)
    params = None
    for i in range(window - 1, n, step_size):
        start = max(0, i - window + 1)
        wv = values[start : i + 1]
        finite_idx = np.flatnonzero(np.isfinite(wv))
        if len(finite_idx) < min_obs:
            continue
        x = wv[finite_idx]
        try:
            pi, A, mu, var = hmm_fit(x, n_regimes, n_iter=n_iter, params=params)
        except FloatingPointError:
            continue
        params = (pi, A, mu, var)
        path = hmm_viterbi(x, pi, A, mu, var)
        rank = np.empty(n_regimes, dtype=np.int64)
        rank[np.argsort(mu, kind="stable")] = np.arange(n_regimes)
        labeled = rank[path]
        tail = min(step_size, len(finite_idx))
        regimes[finite_idx[-tail:] + start] = labeled[-tail:]
    return regimes


def augment_regime_detection(
    ds: rd.Dataset,
    group_keys,
    order_by,
    close_column: str,
    window: int = 252,
    n_regimes: int = 2,
    step_size: int = 1,
    n_iter: int = 50,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Adds ``{close}_regime_{window}``: rolling-HMM regime labels (NaN where
    no fit was produced), reference name template regime_detection.py:141."""
    out_col = f"{close_column}_regime_{window}"

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        with np.errstate(all="ignore"):
            lr = np.log(part[close_column].to_numpy(np.float64)
                        / g.shift(1).to_numpy(np.float64))
        lr[~np.isfinite(lr)] = np.nan
        gcodes = part.groupby(list(group_keys), sort=False).ngroup().to_numpy()
        out = np.full(len(part), np.nan)
        starts = np.flatnonzero(np.r_[True, gcodes[1:] != gcodes[:-1]])
        bounds = np.append(starts, len(part))
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            out[lo:hi] = _detect_regimes(lr[lo:hi], window, n_regimes,
                                         step_size, n_iter)
        part[out_col] = out
        return part

    return partitioned_group_map(
        ds, list(group_keys), kernel,
        sort_by=list(group_keys) + list(order_by),
        num_partitions=num_partitions,
    )
