"""Per-series diagnostics: ACF/PACF/CCF, STL-style decomposition table,
seasonal melt — numpy implementations (statsmodels is unavailable here).

Reference behavior contracts:

- ``acf_diagnostics`` (src/pytimetk/core/acf_diagnostics.py:33-117): long
  table of lag/value per metric with white-noise bands ``+/- 2/sqrt(n)``.
  ACF via FFT (reference uses ``sm_acf(fft=True)``); PACF via
  Durbin-Levinson (reference uses yule-walker mle — close variant, noted).
- ``stl_diagnostics`` (src/pytimetk/core/stl_diagnostics.py:9-117): columns
  ``observed seasonal seasadj trend remainder`` with auto period/trend from
  the time-scale template (kernels/decomp.auto_periods).
- ``seasonal_diagnostics`` (src/pytimetk/core/seasonal_diagnostics.py:28-88):
  melt auto-selected calendar features against the value in long format.

All three are per-group ``partitioned_group_map`` kernels.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.kernels.decomp import auto_periods, classical_decompose


def acf_vals(x: np.ndarray, nlags: int) -> np.ndarray:
    """Autocorrelation via FFT (biased estimator, the statsmodels default)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    x = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conjugate(f))[: nlags + 1] / n
    if acov[0] == 0:
        return np.zeros(nlags + 1)
    return acov / acov[0]


def pacf_vals(x: np.ndarray, nlags: int) -> np.ndarray:
    """Partial autocorrelation via Durbin-Levinson on the ACF."""
    rho = acf_vals(x, nlags)
    pacf = np.zeros(nlags + 1)
    pacf[0] = 1.0
    phi = np.zeros((nlags + 1, nlags + 1))
    for k in range(1, nlags + 1):
        if k == 1:
            phi[1, 1] = rho[1]
        else:
            num = rho[k] - np.dot(phi[k - 1, 1:k], rho[k - 1 : 0 : -1])
            den = 1.0 - np.dot(phi[k - 1, 1:k], rho[1:k])
            phi[k, k] = num / den if den != 0 else 0.0
            for j in range(1, k):
                phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf[k] = phi[k, k]
    return pacf


def pacf_ywmle(x: np.ndarray, nlags: int) -> np.ndarray:
    """PACF via per-lag Yule-Walker 'mle' fits — the reference's method
    (statsmodels ``pacf(method="ywmle")``, delegated from
    src/pytimetk/core/acf_diagnostics.py:57-58; public formula): biased
    autocovariances r_k = sum(xc[:-k]*xc[k:]) / n over the demeaned series,
    phi = solve(toeplitz(r[:k]), r[1:k+1]), pacf[k] = phi[-1].  Same linear
    system Durbin-Levinson solves, but via the dense LAPACK solve statsmodels
    uses — closes the small-sample numerical variance vs the reference."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    xc = x - x.mean()
    r = np.empty(nlags + 1)
    r[0] = xc @ xc / n
    for k in range(1, nlags + 1):
        r[k] = xc[:-k] @ xc[k:] / n
    out = np.zeros(nlags + 1)
    out[0] = 1.0
    if r[0] == 0 or nlags == 0:
        return out
    lagix = np.abs(np.subtract.outer(np.arange(nlags), np.arange(nlags)))
    for k in range(1, nlags + 1):
        try:
            out[k] = np.linalg.solve(r[lagix[:k, :k]], r[1:k + 1])[-1]
        except np.linalg.LinAlgError:
            out[k] = np.nan
    return out


def ccf_vals(x: np.ndarray, y: np.ndarray, nlags: int) -> np.ndarray:
    """Cross-correlation of x with lagged y (statsmodels sm_ccf convention)."""
    x = np.asarray(x, float) - np.mean(x)
    y = np.asarray(y, float) - np.mean(y)
    n = len(x)
    d = n * x.std() * y.std()
    if d == 0:
        return np.zeros(nlags + 1)
    return np.array([np.sum(x[k:] * y[: n - k]) / d for k in range(nlags + 1)])


def acf_diagnostics(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    lags: int = 24,
    ccf_columns: Sequence[str] = (),
    pacf_method: str = "ywmle",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Long table: group keys + (metric, lag, value, white_noise_upper/lower).

    ``pacf_method``: "ywmle" (default — the reference's statsmodels method,
    per-lag Yule-Walker mle solves) or "dl" (Durbin-Levinson on the biased
    FFT ACF — same equations, recursive arithmetic)."""
    by = list(by)
    ccf_columns = list(ccf_columns)
    pacf_fn = pacf_ywmle if pacf_method == "ywmle" else pacf_vals

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        frames = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            x = g[value_column].to_numpy(dtype=np.float64)
            n = len(x)
            nl = min(lags, n - 1)
            band = 2.0 / np.sqrt(n) if n else np.nan
            recs = []
            for lag, v in enumerate(acf_vals(x, nl)):
                recs.append(("acf", lag, v))
            for lag, v in enumerate(pacf_fn(x, nl)):
                recs.append(("pacf", lag, v))
            for cc in ccf_columns:
                for lag, v in enumerate(ccf_vals(x, g[cc].to_numpy(float), nl)):
                    recs.append((f"ccf_{cc}", lag, v))
            df = pd.DataFrame(recs, columns=["metric", "lag", "value"])
            df["white_noise_upper"] = band
            df["white_noise_lower"] = -band
            for k, val in zip(by, keys):
                df.insert(0, k, val)
            frames.append(df)
        return pd.concat(frames, ignore_index=True) if frames else part.head(0)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )


def stl_diagnostics(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    period: int | None = None,
    method: str = "stl",
    seasonal: int | None = None,
    trend_window: int | None = None,
    robust: bool = True,
    inner: int | None = None,
    outer: int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Per-row decomposition table: keys + date + observed/seasonal/seasadj/
    trend/remainder.

    ``method="stl"`` (default) runs the real loess STL (kernels/stl.py,
    Cleveland 1990) with the reference's window resolution
    (stl_diagnostics.py:109-131: seasonal window = max(period, 7) made odd;
    trend window = auto trend period made odd, >= 3, capped at the largest
    odd <= n; robust=True default).  ``method="classical"`` keeps the
    classical decomposition (centered-MA trend + per-phase means)."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        from pytimetk_ray.kernels.stl import stl_decompose

        frames = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            v = g[value_column].to_numpy(dtype=np.float64)
            p_auto, t_auto = auto_periods(g[date_column])
            p = period or p_auto
            p = min(max(int(p), 2), max(len(v) // 2, 2))
            if method == "stl":
                n = len(v)
                sw = seasonal if seasonal is not None else max(p, 7)
                if sw % 2 == 0:
                    sw += 1
                tw = trend_window if trend_window is not None else max(t_auto, 3)
                if tw % 2 == 0:
                    tw += 1
                tw = max(min(tw, n - (1 - n % 2)), 3)
                seas_arr, trend = stl_decompose(
                    v, p, seasonal=sw, trend=tw, robust=robust,
                    inner=inner, outer=outer)
            else:
                seas_arr, trend = classical_decompose(v, p)
            seasadj = v - seas_arr
            df = pd.DataFrame(
                {
                    date_column: g[date_column].to_numpy(),
                    "observed": v,
                    "seasonal": seas_arr,
                    "seasadj": seasadj,
                    "trend": trend,
                    "remainder": seasadj - trend,
                }
            )
            for k, val in zip(by, keys):
                df.insert(0, k, val)
            frames.append(df)
        return pd.concat(frames, ignore_index=True) if frames else part.head(0)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )


# feature bands by median spacing (reference seasonal_diagnostics.py:28-88)
_SEASONAL_FEATURES = [
    (60, ["second", "minute", "hour"]),
    (3600, ["minute", "hour", "wday_lbl"]),
    (86400, ["hour", "wday_lbl", "week"]),
    (7 * 86400, ["wday_lbl", "week", "month_lbl"]),
    (int(30.44 * 86400), ["week", "month_lbl", "quarter"]),
    (np.inf, ["month_lbl", "quarter", "year"]),
]


def seasonal_diagnostics(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Long melt of auto-selected calendar features vs the value."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        frames = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            idx = pd.to_datetime(g[date_column])
            med = idx.diff().dt.total_seconds().median()
            feats = next(f for m, f in _SEASONAL_FEATURES if not np.isfinite(med) or med < m)
            cols = {}
            for f in feats:
                if f == "second":
                    cols[f] = idx.dt.second
                elif f == "minute":
                    cols[f] = idx.dt.minute
                elif f == "hour":
                    cols[f] = idx.dt.hour
                elif f == "wday_lbl":
                    cols[f] = idx.dt.day_name()
                elif f == "week":
                    cols[f] = idx.dt.isocalendar().week.astype(np.int64)
                elif f == "month_lbl":
                    cols[f] = idx.dt.month_name()
                elif f == "quarter":
                    cols[f] = idx.dt.quarter
                elif f == "year":
                    cols[f] = idx.dt.year
            base = pd.DataFrame({date_column: idx.to_numpy(), value_column: g[value_column].to_numpy(), **cols})
            melted = base.melt(
                id_vars=[date_column, value_column],
                value_vars=feats, var_name="feature", value_name="feature_value",
            )
            melted["feature_value"] = melted["feature_value"].astype(str)
            for k, val in zip(by, keys):
                melted.insert(0, k, val)
            frames.append(melted)
        return pd.concat(frames, ignore_index=True) if frames else part.head(0)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )
