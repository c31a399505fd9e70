"""Seasonal decomposition + IQR outlier kernels for anomalize.

Pure numpy/pandas (statsmodels is not available in this environment; true
STL is gated behind an import-try and falls back to the classical
decomposition).  Behavior contract from the reference:

- twitter method: classical additive/multiplicative decompose for the
  seasonal component (centered-MA trend, per-phase seasonal means,
  ``extrapolate_trend="freq"``) then a block-median trend over
  ``median_span`` contiguous blocks (src/pytimetk/core/anomalize.py:605-656)
- ``_iqr``: ``limits = [-1*(q1 + (0.15/alpha)*iqr), q3 + (0.15/alpha)*iqr]``
  — the lower-limit formula is reproduced VERBATIM including its sign quirk
  (anomalize.py:733-784, :759)
- seasonal/trend auto-periods from the time-scale template
  (src/pytimetk/core/frequency.py:333-405): median-diff unit ->
  seasonal/trend period -> observation counts
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# median-diff unit thresholds (seconds) -> (seasonal_period, trend_period)
# (reference: frequency.py:246-331 unit table + :378-390 template)
_TIME_SCALE = [
    # (max_median_seconds, seasonal_seconds, trend_seconds)
    (60, 3600, 12 * 3600),                       # S -> 1H / 12H
    (3600, 86400, 14 * 86400),                   # T -> 1D / 14D
    (86400, 86400, int(30.44 * 86400)),          # H -> 1D / 1M
    (7 * 86400, 7 * 86400, int(3 * 30.44 * 86400)),       # D -> 1W / 1Q
    (int(30.44 * 86400), int(3 * 30.44 * 86400), int(365.25 * 86400)),  # W -> 1Q / 1Y
    (int(3 * 30.44 * 86400), int(365.25 * 86400), int(5 * 365.25 * 86400)),   # M -> 1Y / 5Y
    (int(365.25 * 86400), int(365.25 * 86400), int(10 * 365.25 * 86400)),     # Q -> 1Y / 10Y
    (np.inf, int(5 * 365.25 * 86400), int(30 * 365.25 * 86400)),              # Y -> 5Y / 30Y
]


def auto_periods(ts: pd.Series) -> tuple[int, int]:
    """(seasonal_period, trend_period) in observations from the median diff."""
    med = ts.diff().dt.total_seconds().median()
    if not np.isfinite(med) or med <= 0:
        return 7, 28
    for max_med, seas_s, trend_s in _TIME_SCALE:
        if med <= max_med:
            period = max(int(round(seas_s / med)), 2)
            trend = max(int(round(trend_s / med)), period + 1)
            return period, trend
    return 7, 28


def classical_decompose(values: np.ndarray, period: int, model: str = "additive"):
    """Classical seasonal decomposition (numpy): centered-MA trend,
    per-phase seasonal means, linear trend extrapolation at the edges.
    Returns (seasonal, trend)."""
    n = len(values)
    v = values.astype(np.float64)
    period = max(int(period), 2)
    # centered moving average (even periods use the 2xMA half-weights)
    if period % 2 == 0:
        w = np.full(period + 1, 1.0 / period)
        w[0] = w[-1] = 0.5 / period
    else:
        w = np.full(period, 1.0 / period)
    half = len(w) // 2
    if n >= len(w):
        core = np.convolve(v, w, mode="valid")
        trend = np.full(n, np.nan)
        trend[half : half + len(core)] = core
    else:
        trend = np.full(n, np.nanmean(v))
    trend = _extrapolate_linear(trend)
    detrended = v - trend if model == "additive" else v / trend
    phase = np.arange(n) % period
    seas_means = np.full(period, np.nan)
    for p in range(period):
        vals_p = detrended[phase == p]
        if len(vals_p):
            seas_means[p] = np.nanmean(vals_p)
    center = np.nanmean(seas_means)
    seas_means = seas_means - center if model == "additive" else seas_means / center
    seasonal = seas_means[phase]
    return seasonal, trend


def _extrapolate_linear(trend: np.ndarray) -> np.ndarray:
    """Fill leading/trailing NaNs by linear extrapolation from the valid
    span (statsmodels extrapolate_trend='freq' behavior)."""
    valid = np.flatnonzero(np.isfinite(trend))
    if len(valid) == 0:
        return np.zeros_like(trend)
    if len(valid) == 1:
        return np.full_like(trend, trend[valid[0]])
    out = trend.copy()
    first, last = valid[0], valid[-1]
    if first > 0:
        slope = trend[valid[1]] - trend[valid[0]]
        out[:first] = trend[first] - slope * np.arange(first, 0, -1)
    if last < len(trend) - 1:
        slope = trend[valid[-1]] - trend[valid[-2]]
        k = len(trend) - 1 - last
        out[last + 1 :] = trend[last] + slope * np.arange(1, k + 1)
    # interior NaNs (short series): linear interpolate
    bad = ~np.isfinite(out)
    if bad.any():
        out[bad] = np.interp(np.flatnonzero(bad), np.flatnonzero(~bad), out[~bad])
    return out


def twitter_trend(seasadj: np.ndarray, median_span: int) -> np.ndarray:
    """Block-median trend: split the series into ``median_span`` contiguous
    blocks, each block's trend = its median of the seasonally-adjusted
    values (reference anomalize.py:636-645)."""
    n = len(seasadj)
    median_span = max(int(median_span), 1)
    # reference: sorted(repeat_sequence(range(span), n)) -> equal contiguous blocks
    block = np.sort(np.resize(np.arange(median_span), n))
    out = np.empty(n)
    for b in range(median_span):
        m = block == b
        if m.any():
            out[m] = np.median(seasadj[m])
    return out


def iqr_outliers(remainder: np.ndarray, alpha: float = 0.05):
    """Reference ``_iqr`` verbatim (anomalize.py:733-784): returns
    (anomaly_yes_no, direction, score, l1, l2)."""
    q1, q3 = np.percentile(remainder, [25, 75])
    iq = q3 - q1
    limits = [-1 * (q1 + (0.15 / alpha) * iq), q3 + (0.15 / alpha) * iq]
    centerline = sum(limits) / 2
    score = np.abs(remainder - centerline)
    hi = remainder > limits[1]
    lo = remainder < limits[0]
    anomaly = np.where(hi | lo, "Yes", "No")
    direction = np.where(hi, 1, np.where(lo, -1, 0))
    return anomaly, direction, score, limits[0], limits[1]


def anomalize_frame(
    gdf: pd.DataFrame,
    date_column: str,
    value_column: str,
    *,
    period: int | None = None,
    trend: int | None = None,
    method: str = "twitter",
    decomp: str = "additive",
    clean: str = "min_max",
    iqr_alpha: float = 0.05,
    clean_alpha: float = 0.75,
    stl_robust: bool = True,
    stl_inner: int | None = None,
    stl_outer: int | None = None,
) -> pd.DataFrame:
    """Run the full anomalize pipeline on ONE group's sorted frame, returning
    date + 11 diagnostic columns (reference column contract,
    anomalize.py:158-168)."""
    v = gdf[value_column].to_numpy(dtype=np.float64)
    ts = gdf[date_column]
    if period is None or trend is None:
        p_auto, t_auto = auto_periods(ts)
        period = period or p_auto
        trend = trend or t_auto
    period = min(max(int(period), 2), max(len(v) // 2, 2))

    if method == "stl":
        # real loess STL (kernels/stl.py, Cleveland 1990) with the window
        # choices the reference passes to statsmodels STL
        # (anomalize.py:703-730): seasonal = period made odd, trend =
        # max(trend, period+2) made odd, robust fit
        from pytimetk_ray.kernels.stl import stl_decompose

        def make_odd(x):
            return x + 1 if x % 2 == 0 else x

        seasonal, trend_arr = stl_decompose(
            v, period, seasonal=make_odd(period),
            trend=make_odd(max(trend, period + 2)), robust=stl_robust,
            inner=stl_inner, outer=stl_outer,
        )
        seasadj = v - seasonal
    else:  # twitter
        seasonal, _ = classical_decompose(v, period, decomp)
        seasadj = v - seasonal
        median_span = max(int(round(len(v) / max(trend, 1))), 1)
        trend_arr = twitter_trend(seasadj, median_span)

    remainder = seasadj - trend_arr
    anomaly, direction, score, l1, l2 = iqr_outliers(remainder, iqr_alpha)

    out = pd.DataFrame(
        {
            date_column: ts.to_numpy(),
            "observed": v,
            "seasonal": seasonal,
            "seasadj": seasadj,
            "trend": trend_arr,
            "remainder": remainder,
            "anomaly": anomaly,
            "anomaly_score": score,
            "anomaly_direction": direction,
            "recomposed_l1": seasonal + trend_arr + l1,
            "recomposed_l2": seasonal + trend_arr + l2,
        }
    )
    if clean == "linear":
        s = pd.Series(np.where(out["anomaly"].to_numpy() == "No", v, np.nan))
        out["observed_clean"] = s.interpolate(method="linear", limit_direction="both").to_numpy()
    else:  # min_max clamp (reference anomalize.py:574-594)
        spread = (1 - clean_alpha) * (out["recomposed_l2"] - out["recomposed_l1"]) / 2
        out["observed_clean"] = np.where(
            direction == -1,
            out["recomposed_l1"] + spread,
            np.where(direction == 1, out["recomposed_l2"] - spread, v),
        )
    return out
