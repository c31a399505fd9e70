"""ts_features — per-series feature vectors (the tsfeatures surface).

Reference: src/pytimetk/core/ts_features.py:27-56 wraps the external
``tsfeatures`` package (its own CI stubs it; absent here), exposing
acf/pacf features, arch_stat, crossing_points, entropy, flat_spots,
lumpiness/stability, stl_features, holt/hw parameters, unit-root tests,
series_length and hurst.  This module computes the same quantities from
their PUBLIC formulas in numpy.  Documented variants:

- pacf via Durbin-Levinson on the biased FFT ACF (tsfeatures uses
  statsmodels yw; same recurrence, different small-sample bias) — the same
  variant already noted for acf_diagnostics;
- ``nonlinearity`` is the lag-1 Teräsvirta neural-network test
  (10 * n * (SSE0-SSE1)/SSE0 / n form below);
- ``holt_*`` / ``hw_*`` parameters come from SSE-minimizing fits of Holt's
  linear method / additive Holt-Winters with a built-in Nelder-Mead
  (statsmodels uses a different optimizer/initialization, so values are
  close, not identical);
- ``hurst`` is the full-series rescaled-range log(R/S)/log(n), the same
  formula as finance.augment_hurst_exponent;
- ``unitroot_kpss`` is the KPSS level statistic with the Bartlett long-run
  variance, l = trunc(4*(n/100)^0.25); ``unitroot_pp`` is the
  Phillips-Perron Z_alpha for the demeaned case:
  Z_a = m*(rho-1) - m^2*(lambda^2-gamma0) / (2 * sum((y1-mean(y1))^2)).

Execution: one vectorized per-group kernel over hash partitions
(exec.partitioned_group_map); each group emits a single feature row, so the
output is tiny relative to the input and no second shuffle is needed.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

BUILTIN_FEATURES = frozenset({
    "length", "mean", "var", "std", "acf1", "acf10", "diff1_acf1",
    "diff2_acf1", "crossing_points", "flat_spots", "lumpiness", "stability",
    "entropy", "trend_strength", "seasonal_strength",
    # extended set (round 2)
    "x_pacf5", "diff1x_pacf5", "diff2x_pacf5", "arch_lm", "nonlinearity",
    "unitroot_kpss", "unitroot_pp", "hurst", "spike", "linearity",
    "curvature", "e_acf1", "e_acf10", "holt_alpha", "holt_beta",
    "hw_alpha", "hw_beta", "hw_gamma",
    # heterogeneity quartet (GARCH(1,1) via built-in numpy MLE)
    "arch_acf", "garch_acf", "arch_r2", "garch_r2",
})


def _acf(v: np.ndarray, k: int) -> float:
    if len(v) <= k:
        return np.nan
    vc = v - v.mean()
    denom = (vc * vc).sum()
    return (vc[k:] * vc[:-k]).sum() / denom if denom else np.nan


def _acf_many(v: np.ndarray, nlags: int) -> np.ndarray:
    """Biased ACF r_0..r_nlags (same estimator as _acf)."""
    out = np.full(nlags + 1, np.nan)
    out[0] = 1.0
    for k in range(1, nlags + 1):
        out[k] = _acf(v, k)
    return out


def _pacf5_ss(v: np.ndarray) -> float:
    """Sum of squares of the first 5 PACF values (Durbin-Levinson on the
    biased ACF; tsfeatures pacf_features x_pacf5)."""
    n = len(v)
    if n < 7 or v.std() == 0:
        return np.nan
    nlags = 5
    rho = _acf_many(v, nlags)
    if not np.all(np.isfinite(rho)):
        return np.nan
    phi = np.zeros((nlags + 1, nlags + 1))
    pacf = np.zeros(nlags + 1)
    for k in range(1, nlags + 1):
        if k == 1:
            phi[1, 1] = rho[1]
        else:
            num = rho[k] - np.dot(phi[k - 1, 1:k], rho[k - 1:0:-1])
            den = 1.0 - np.dot(phi[k - 1, 1:k], rho[1:k])
            phi[k, k] = num / den if den != 0 else 0.0
            for j in range(1, k):
                phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf[k] = phi[k, k]
    return float((pacf[1:] ** 2).sum())


def _ols_r2(X: np.ndarray, y: np.ndarray) -> float:
    """R^2 of OLS with intercept."""
    A = np.column_stack([np.ones(len(y)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ beta
    sst = ((y - y.mean()) ** 2).sum()
    return 1.0 - (resid**2).sum() / sst if sst > 0 else np.nan


def arch_lm(v: np.ndarray, lags: int = 12, demean: bool = True) -> float:
    """ARCH LM R^2: regress x_t^2 on its first ``lags`` lags (tsfeatures
    arch_stat)."""
    x = v - v.mean() if demean else v.astype(np.float64)
    x2 = x * x
    n = len(x2)
    if n <= lags + 1:
        return np.nan
    y = x2[lags:]
    X = np.column_stack([x2[lags - k - 1: n - k - 1] for k in range(lags)])
    try:
        return float(_ols_r2(X, y))
    except np.linalg.LinAlgError:
        return np.nan


def nonlinearity_stat(v: np.ndarray) -> float:
    """Lag-1 Teräsvirta neural-network test, scaled as tsfeatures does:
    10 * stat / n with stat = n*(SSE0-SSE1)/SSE0."""
    n = len(v)
    if n < 8 or not np.all(np.isfinite(v)) or v.std() == 0:
        return np.nan
    x = (v - v.mean()) / v.std()
    y, y1 = x[1:], x[:-1]
    A0 = np.column_stack([np.ones(len(y)), y1])
    b0, *_ = np.linalg.lstsq(A0, y, rcond=None)
    u = y - A0 @ b0
    sse0 = float((u**2).sum())
    if sse0 <= 0:
        return np.nan
    A1 = np.column_stack([np.ones(len(y)), y1, y1**2, y1**3])
    b1, *_ = np.linalg.lstsq(A1, u, rcond=None)
    sse1 = float(((u - A1 @ b1) ** 2).sum())
    m = len(y)
    stat = m * (sse0 - sse1) / sse0
    return float(10.0 * stat / n)


def _bartlett_lrv(e: np.ndarray, l: int) -> float:
    """Long-run variance with Bartlett weights: g0 + 2*sum (1-j/(l+1))*gj,
    gj = sum(e_t e_{t-j}) / len(e)."""
    n = len(e)
    g0 = float((e * e).sum() / n)
    s = g0
    for j in range(1, l + 1):
        gj = float((e[j:] * e[:-j]).sum() / n)
        s += 2.0 * (1.0 - j / (l + 1.0)) * gj
    return s


def unitroot_kpss(v: np.ndarray) -> float:
    """KPSS level statistic: sum(S_t^2) / (n^2 * lrv), S = cumsum(x - mean),
    Bartlett lags l = trunc(4*(n/100)^0.25)."""
    n = len(v)
    if n < 4:
        return np.nan
    e = v - v.mean()
    S = np.cumsum(e)
    l = int(np.trunc(4.0 * (n / 100.0) ** 0.25))
    lrv = _bartlett_lrv(e, l)
    if lrv <= 0:
        return np.nan
    return float((S * S).sum() / (n * n * lrv))


def unitroot_pp(v: np.ndarray) -> float:
    """Phillips-Perron Z_alpha, demeaned case (formula in the module
    docstring); Bartlett lags l = trunc(4*(m/100)^0.25)."""
    n = len(v)
    if n < 5:
        return np.nan
    y, y1 = v[1:], v[:-1]
    m = len(y)
    y1c = y1 - y1.mean()
    dx = float((y1c * y1c).sum())
    if dx == 0:
        return np.nan
    rho = float((y1c * (y - y.mean())).sum() / dx)
    a = y.mean() - rho * y1.mean()
    u = y - a - rho * y1
    l = int(np.trunc(4.0 * (m / 100.0) ** 0.25))
    g0 = float((u * u).sum() / m)
    lam = _bartlett_lrv(u, l)
    return float(m * (rho - 1.0) - m * m * (lam - g0) / (2.0 * dx))


def hurst_rs(v: np.ndarray) -> float:
    """Full-series rescaled-range Hurst: log(R/S)/log(n) with R = range of
    cumulative deviations, S = population std (finance hurst contract)."""
    n = len(v)
    if n < 8:
        return np.nan
    mu = v.mean()
    s = v.std()
    if s == 0:
        return np.nan
    z = np.cumsum(v - mu)
    r = float(z.max() - z.min())
    if r <= 0:
        return np.nan
    return float(np.log(r / s) / np.log(n))


def _ar_whiten(v: np.ndarray) -> np.ndarray | None:
    """Residuals of an OLS AR(p) with intercept, p = min(n-1,
    floor(10*log10(n))) (the tsfeatures heterogeneity pre-whitening order;
    fixed order rather than AIC selection — documented variant)."""
    n = len(v)
    if n < 8:
        return None
    p = int(min(n - 1, np.floor(10.0 * np.log10(n))))
    if p < 1 or n - p < p + 2:
        return None
    y = v[p:]
    X = np.column_stack([v[p - k - 1: n - k - 1] for k in range(p)])
    A = np.column_stack([np.ones(len(y)), X])
    try:
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    except np.linalg.LinAlgError:
        return None
    return y - A @ beta


def garch11_fit(e: np.ndarray) -> tuple[float, float, float, np.ndarray] | None:
    """GARCH(1,1) by Gaussian quasi-MLE with variance targeting
    (omega = var*(1-alpha-beta)), optimized over (alpha, beta) with the
    built-in Nelder-Mead.  sigma2_0 = sample variance.  Returns
    (omega, alpha, beta, sigma2 path) or None when degenerate.  Public
    model (Bollerslev 1986); self-contained numpy — no external fitter."""
    e = e[np.isfinite(e)]
    n = len(e)
    if n < 12:
        return None
    var = float(e.var())
    if var <= 0:
        return None
    e2 = e * e

    def negll(p):
        a, b = float(p[0]), float(p[1])
        if a < 0 or b < 0 or a + b >= 0.999:
            return 1e300
        omega = var * (1.0 - a - b)
        s2 = var
        ll = np.log(s2) + e2[0] / s2
        for t in range(1, n):
            s2 = omega + a * e2[t - 1] + b * s2
            ll += np.log(s2) + e2[t] / s2
        return 0.5 * ll

    best, best_f = None, np.inf
    for a0, b0 in ((0.1, 0.8), (0.05, 0.5), (0.2, 0.2)):
        res = nelder_mead(negll, [a0, b0], [(1e-6, 0.998), (1e-6, 0.998)])
        f = negll(res)
        if f < best_f:
            best, best_f = res, f
    a, b = float(best[0]), float(best[1])
    omega = var * (1.0 - a - b)
    s2 = np.empty(n)
    s2[0] = var
    for t in range(1, n):
        s2[t] = omega + a * e2[t - 1] + b * s2[t - 1]
    return omega, a, b, s2


def heterogeneity(v: np.ndarray, lags: int = 12) -> dict[str, float]:
    """tsfeatures-style heterogeneity quartet: AR-pre-whiten, then
    arch_acf  = sum of squared ACF(resid^2, 12),
    arch_r2   = ARCH-LM R^2 of the whitened residuals,
    garch_acf / garch_r2 = the same statistics on the GARCH(1,1)
    standardized residuals z = resid/sigma_t."""
    out = {"arch_acf": np.nan, "garch_acf": np.nan,
           "arch_r2": np.nan, "garch_r2": np.nan}
    e = _ar_whiten(v)
    if e is None or len(e) <= lags + 2 or e.std() == 0:
        return out
    e2 = e * e
    out["arch_acf"] = float(np.nansum([_acf(e2, k) ** 2
                                       for k in range(1, lags + 1)]))
    out["arch_r2"] = arch_lm(e, lags=lags)
    fit = garch11_fit(e)
    if fit is None:
        return out
    _, _, _, s2 = fit
    if np.any(s2 <= 0):
        return out
    z = e / np.sqrt(s2)
    z2 = z * z
    out["garch_acf"] = float(np.nansum([_acf(z2, k) ** 2
                                        for k in range(1, lags + 1)]))
    out["garch_r2"] = arch_lm(z, lags=lags)
    return out


def nelder_mead(f, x0, bounds, n_iter: int = 200, tol: float = 1e-8):
    """Minimal Nelder-Mead (public algorithm) with box clipping."""
    x0 = np.asarray(x0, dtype=np.float64)
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])

    def clip(x):
        return np.clip(x, lo, hi)

    d = len(x0)
    simplex = [clip(x0)]
    for i in range(d):
        p = x0.copy()
        p[i] = p[i] + 0.1 if p[i] + 0.1 <= hi[i] else p[i] - 0.1
        simplex.append(clip(p))
    simplex = np.array(simplex)
    fv = np.array([f(p) for p in simplex])
    for _ in range(n_iter):
        order = np.argsort(fv)
        simplex, fv = simplex[order], fv[order]
        if abs(fv[-1] - fv[0]) < tol:
            break
        c = simplex[:-1].mean(axis=0)
        xr = clip(c + (c - simplex[-1]))
        fr = f(xr)
        if fr < fv[0]:
            xe = clip(c + 2.0 * (c - simplex[-1]))
            fe = f(xe)
            simplex[-1], fv[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fv[-2]:
            simplex[-1], fv[-1] = xr, fr
        else:
            xc = clip(c + 0.5 * (simplex[-1] - c))
            fc = f(xc)
            if fc < fv[-1]:
                simplex[-1], fv[-1] = xc, fc
            else:  # shrink
                simplex[1:] = clip(simplex[0] + 0.5 * (simplex[1:] - simplex[0]))
                fv[1:] = [f(p) for p in simplex[1:]]
    i = int(np.argmin(fv))
    return simplex[i]


def _holt_sse(v: np.ndarray, alpha: float, beta: float) -> float:
    """One-step-ahead SSE of Holt's linear method (standard recursions,
    level0 = x0, trend0 = x1 - x0)."""
    level, trend = v[0], v[1] - v[0]
    sse = 0.0
    for t in range(1, len(v)):
        pred = level + trend
        err = v[t] - pred
        sse += err * err
        new_level = alpha * v[t] + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    return sse


def holt_parameters(v: np.ndarray) -> tuple[float, float]:
    """(alpha, beta) minimizing Holt one-step SSE."""
    if len(v) < 6:
        return np.nan, np.nan
    res = nelder_mead(lambda p: _holt_sse(v, p[0], p[1]), [0.3, 0.1],
                      [(1e-4, 0.9999), (1e-4, 0.9999)])
    return float(res[0]), float(res[1])


def _hw_sse(v: np.ndarray, period: int, alpha: float, beta: float,
            gamma: float) -> float:
    """One-step SSE of additive Holt-Winters (standard recursions; level0 =
    mean of season 1, trend0 = (mean season 2 - mean season 1)/period,
    seasonal0 = season-1 deviations)."""
    p = period
    level = v[:p].mean()
    trend = (v[p:2 * p].mean() - level) / p
    seas = list(v[:p] - level)
    sse = 0.0
    for t in range(p, len(v)):
        pred = level + trend + seas[t % p]
        err = v[t] - pred
        sse += err * err
        new_level = alpha * (v[t] - seas[t % p]) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        seas[t % p] = gamma * (v[t] - new_level) + (1 - gamma) * seas[t % p]
        level = new_level
    return sse


def hw_parameters(v: np.ndarray, period: int) -> tuple[float, float, float]:
    """(alpha, beta, gamma) minimizing additive Holt-Winters one-step SSE."""
    if period < 2 or len(v) < 2 * period + 2:
        return np.nan, np.nan, np.nan
    res = nelder_mead(
        lambda p: _hw_sse(v, period, p[0], p[1], p[2]), [0.3, 0.1, 0.1],
        [(1e-4, 0.9999)] * 3)
    return float(res[0]), float(res[1]), float(res[2])


def ts_features(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    features: Sequence[str] | None = None,
    arch_lags: int = 12,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Per-series feature vector.  With the external ``tsfeatures`` package
    installed, unknown feature names are rejected the same way; the built-in
    set (BUILTIN_FEATURES, 37 features) covers the default tsfeatures
    surface INCLUDING the GARCH(1,1) heterogeneity quartet (built-in numpy
    MLE — no external fitter needed).

    Optimizer-backed features are OPT-IN: ``features=None`` (the default)
    computes the closed-form features only and deliberately omits
    holt_alpha/holt_beta, hw_alpha/hw_beta/hw_gamma and the heterogeneity
    quartet (arch_acf/garch_acf/arch_r2/garch_r2), because each runs an
    iterative Nelder-Mead / MLE fit PER GROUP — a per-series cost you should
    choose explicitly at scale.  Request them by name, e.g.
    ``features=[*BUILTIN_FEATURES]`` for everything."""
    by = list(by)
    try:
        import tsfeatures  # noqa: F401

        have_tsfeatures = True
    except ImportError:
        have_tsfeatures = False
    if features and have_tsfeatures is False and set(features) - BUILTIN_FEATURES:
        raise NotImplementedError(
            "feature(s) outside the built-in set require the external "
            f"'tsfeatures' package: {sorted(set(features) - BUILTIN_FEATURES)}"
        )
    want = set(features) if features else set(BUILTIN_FEATURES)
    # the Holt/HW optimizer loops per group; only pay for it when asked
    fit_holt = bool({"holt_alpha", "holt_beta"} & want) if features else False
    fit_hw = bool({"hw_alpha", "hw_beta", "hw_gamma"} & want) if features else False
    fit_het = (bool({"arch_acf", "garch_acf", "arch_r2", "garch_r2"} & want)
               if features else False)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        from pytimetk_ray.kernels.decomp import auto_periods, classical_decompose

        rows = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            v = g[value_column].to_numpy(dtype=np.float64)
            n = len(v)
            row = dict(zip(by, keys))
            row["length"] = n
            row["mean"] = v.mean() if n else np.nan
            row["var"] = v.var(ddof=1) if n > 1 else np.nan
            row["std"] = v.std(ddof=1) if n > 1 else np.nan
            row["acf1"] = _acf(v, 1)
            row["acf10"] = float(np.nansum([_acf(v, k) ** 2 for k in range(1, 11)])) if n > 2 else np.nan
            row["diff1_acf1"] = _acf(np.diff(v), 1) if n > 2 else np.nan
            row["diff2_acf1"] = _acf(np.diff(v, 2), 1) if n > 3 else np.nan
            # crossing_points: flips of (v <= median) (Hyndman tsfeatures def)
            if n > 1:
                ab = v <= np.median(v)
                row["crossing_points"] = int((ab[1:] != ab[:-1]).sum())
            else:
                row["crossing_points"] = 0
            # flat_spots: longest run within one of 10 quantile bins
            if n > 1:
                try:
                    binned = pd.cut(pd.Series(v), 10, labels=False).to_numpy()
                    change = np.r_[True, binned[1:] != binned[:-1]]
                    runs = np.diff(np.r_[np.flatnonzero(change), n])
                    row["flat_spots"] = int(runs.max())
                except ValueError:
                    row["flat_spots"] = n
            else:
                row["flat_spots"] = n
            # tiled-window stability (var of means) / lumpiness (var of vars)
            if n >= 2:
                tiles = [v[i:i + 10] for i in range(0, n, 10)]
                means = pd.Series([t.mean() for t in tiles])
                varis = pd.Series([t.var(ddof=1) if len(t) > 1 else np.nan for t in tiles])
                row["stability"] = means.var()  # pandas skips NaN, ddof=1
                row["lumpiness"] = varis.var()
            else:
                row["stability"] = np.nan
                row["lumpiness"] = np.nan
            # spectral entropy: normalized Shannon entropy of the periodogram
            if n > 3:
                vc = v - v.mean()
                spec = np.abs(np.fft.rfft(vc)) ** 2
                spec = spec[1:]  # drop DC
                tot = spec.sum()
                if tot > 0:
                    p = spec / tot
                    p = p[p > 0]
                    row["entropy"] = float(-(p * np.log(p)).sum() / np.log(len(spec)))
                else:
                    row["entropy"] = np.nan
            else:
                row["entropy"] = np.nan
            # pacf / arch / nonlinearity / unit roots / hurst (round-2 set)
            row["x_pacf5"] = _pacf5_ss(v)
            row["diff1x_pacf5"] = _pacf5_ss(np.diff(v)) if n > 7 else np.nan
            row["diff2x_pacf5"] = _pacf5_ss(np.diff(v, 2)) if n > 8 else np.nan
            row["arch_lm"] = arch_lm(v, lags=arch_lags)
            row["nonlinearity"] = nonlinearity_stat(v)
            row["unitroot_kpss"] = unitroot_kpss(v)
            row["unitroot_pp"] = unitroot_pp(v)
            row["hurst"] = hurst_rs(v)
            # STL-style features from the classical decomposition
            if n > 5:
                period, _ = auto_periods(g[date_column])
                period = min(max(int(period), 2), max(n // 2, 2))
                seasonal, trend = classical_decompose(v, period)
                rem = v - seasonal - trend
                vr = np.var(rem)
                row["trend_strength"] = max(0.0, 1 - vr / np.var(v - seasonal)) if np.var(v - seasonal) else np.nan
                row["seasonal_strength"] = max(0.0, 1 - vr / np.var(v - trend)) if np.var(v - trend) else np.nan
                # spike: var of leave-one-out variances of the remainder
                # (tsfeatures stl_features: varloo = (v*(n-1) - d)/(n-2)
                # with d = squared deviations, v = sample var)
                if n > 6 and vr > 0:
                    v_s = rem.var(ddof=1)
                    d = (rem - rem.mean()) ** 2
                    varloo = (v_s * (n - 1) - d) / (n - 2)
                    row["spike"] = float(np.var(varloo, ddof=1))
                else:
                    row["spike"] = np.nan
                # linearity/curvature: trend regressed on orthogonal polys
                t_idx = np.arange(n, dtype=np.float64)
                P = np.column_stack([np.ones(n), t_idx, t_idx**2])
                Q, _r = np.linalg.qr(P)
                coef, *_ = np.linalg.lstsq(Q, trend, rcond=None)
                row["linearity"] = float(coef[1])
                row["curvature"] = float(coef[2])
                row["e_acf1"] = _acf(rem, 1)
                row["e_acf10"] = float(np.nansum([_acf(rem, k) ** 2 for k in range(1, 11)]))
            else:
                for c in ("trend_strength", "seasonal_strength", "spike",
                          "linearity", "curvature", "e_acf1", "e_acf10"):
                    row[c] = np.nan
            if fit_holt:
                row["holt_alpha"], row["holt_beta"] = holt_parameters(v)
            if fit_hw:
                period = min(max(int(auto_periods(g[date_column])[0]), 2),
                             max(n // 2, 2))
                hw = hw_parameters(v, period)
                row["hw_alpha"], row["hw_beta"], row["hw_gamma"] = hw
            if fit_het:
                row.update(heterogeneity(v))
            rows.append(row)
        out = pd.DataFrame(rows)
        if features:
            out = out[by + [f for f in features if f in out.columns]]
        return out

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )
