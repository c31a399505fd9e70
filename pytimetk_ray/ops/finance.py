"""Finance indicators — per-group ordered kernels over close/HLC columns.

Reference semantics (behavior studied, not copied) and column-name templates
reproduced verbatim from src/pytimetk/finance/*:

- ``augment_rsi``    ``{c}_rsi_{p}`` — 100 - 100/(1 + mean_gains/mean_losses),
  simple rolling means (rsi.py:381-396)
- ``augment_macd``   ``{c}_macd_line_{f}_{s}_{sig}``, ``_macd_signal_line_…``,
  ``_macd_histogram_…`` — EMA(span, adjust=False) (macd.py:305-347)
- ``augment_bbands`` ``{c}_bband_middle|upper|lower_{p}_{sd}`` (bbands.py:287-331)
- ``augment_atr``    ``{c}_tr_{p}`` / ``{c}_atr_{p}`` true-range rolling means
  (atr.py:294-322)
- ``augment_cmo``    ``{c}_cmo_{p}`` Chande momentum (cmo.py:279-306)
- ``augment_ppo``    ``{c}_ppo_line_{f}_{s}`` (ppo.py:313)
- ``augment_roc``    ``{c}_roc_{start}_{p}`` — (num - den)/den with
  num=shift(start), den=shift(p); NaN on zero denominator (roc.py docstring)
- ``augment_qsmomentum`` ``{c}_qsmom_{f}_{s}_{r}`` — (slow_leg - fast_leg) /
  rolling std(ddof=0) of 1-period returns (qsmomentum.py notes)
- ``augment_drawdown`` ``{c}_peak``, ``{c}_drawdown``, ``{c}_drawdown_pct``
  (drawdown.py:72-83)
- ``augment_stochastic_oscillator`` ``{c}_stoch_k_{k}`` / ``{c}_stoch_d_{k}_{d}``
  (stochastic_oscillator.py:49-94)
- ``augment_ewma_volatility`` ``{c}_ewma_vol_{w}_{lam}`` — recursive
  σ²_t = (1-λ)r²_t + λσ²_{t-1} on log returns, min_periods=w
  (ewma_volatility.py:77-85)
- ``augment_fip_momentum`` ``{c}_fip_momentum_{w}`` — frog-in-pan
  sign-consistency: sign(total return) * (%neg - %pos) (fip_momentum.py:318-328)
- ``augment_hurst_exponent`` ``{c}_hurst_{w}`` — rescaled-range
  log(R/S)/log(n) over rolling windows (hurst_exponent.py:279,406)
- ``augment_rolling_risk_metrics`` ``{c}_sharpe_ratio_{w}`` etc.
  (rolling_risk_metrics.py:436-482)

Execution: every indicator is a vectorized pandas kernel applied per hash
partition over whole sorted groups (exec.partitioned_group_map) — same plan
as the window ops; none of these shuffle more than once.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def _op(ds, group_keys, order_by, kernel, num_partitions=DEFAULT_NUM_PARTITIONS):
    return partitioned_group_map(
        ds, list(group_keys), kernel,
        sort_by=list(group_keys) + list(order_by),
        num_partitions=num_partitions,
    )


def augment_rsi(ds: rd.Dataset, group_keys, order_by, close_column: str,
                periods=14, **kw) -> rd.Dataset:
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        delta = g.diff()
        gains = delta.where(delta > 0, 0.0)
        losses = -delta.where(delta < 0, 0.0)
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        for p in ps:
            mg = gains.groupby(gcodes).rolling(p).mean().reset_index(drop=True)
            ml = losses.groupby(gcodes).rolling(p).mean().reset_index(drop=True)
            part[f"{close_column}_rsi_{p}"] = (100 - 100 / (1 + mg / ml)).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_macd(ds: rd.Dataset, group_keys, order_by, close_column: str,
                 fast_period=12, slow_period=26, signal_period=9, **kw) -> rd.Dataset:
    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        ema_f = g.transform(lambda s: s.ewm(span=fast_period, adjust=False).mean())
        ema_s = g.transform(lambda s: s.ewm(span=slow_period, adjust=False).mean())
        line = ema_f - ema_s
        sig = line.groupby(
            part.groupby(list(group_keys), sort=False).ngroup()
        ).transform(lambda s: s.ewm(span=signal_period, adjust=False).mean())
        base = f"{close_column}_macd"
        suffix = f"{fast_period}_{slow_period}_{signal_period}"
        part[f"{base}_line_{suffix}"] = line.to_numpy()
        part[f"{base}_signal_line_{suffix}"] = sig.to_numpy()
        part[f"{base}_histogram_{suffix}"] = (line - sig).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_bbands(ds: rd.Dataset, group_keys, order_by, close_column: str,
                   periods=20, std_dev=2.0, **kw) -> rd.Dataset:
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        s = part[close_column]
        for p in ps:
            roll = s.groupby(gcodes).rolling(p)
            mid = roll.mean().reset_index(drop=True).to_numpy()
            sd = roll.std().reset_index(drop=True).to_numpy()
            sd_label = std_dev if std_dev % 1 else int(std_dev)
            part[f"{close_column}_bband_middle_{p}_{sd_label}"] = mid
            part[f"{close_column}_bband_upper_{p}_{sd_label}"] = mid + std_dev * sd
            part[f"{close_column}_bband_lower_{p}_{sd_label}"] = mid - std_dev * sd
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_atr(ds: rd.Dataset, group_keys, order_by, high_column: str,
                low_column: str, close_column: str, periods=14, **kw) -> rd.Dataset:
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        prev_close = part.groupby(list(group_keys), sort=False, group_keys=False)[
            close_column
        ].shift(1)
        h, l = part[high_column], part[low_column]
        tr = pd.concat(
            [h - l, (h - prev_close).abs(), (l - prev_close).abs()], axis=1
        ).max(axis=1)
        for p in ps:
            part[f"{close_column}_tr_{p}"] = tr.to_numpy()
            part[f"{close_column}_atr_{p}"] = (
                tr.groupby(gcodes).rolling(p).mean().reset_index(drop=True).to_numpy()
            )
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_adx(ds: rd.Dataset, group_keys, order_by, high_column: str,
                low_column: str, close_column: str, periods=14, **kw) -> rd.Dataset:
    """Wilder DI/ADX: true range + directional movement, Wilder-smoothed with
    ``ewm(alpha=1/p, adjust=False, min_periods=p)`` (reference adx.py:295-344);
    columns ``{c}_plus_di_{p}``, ``{c}_minus_di_{p}``, ``{c}_adx_{p}``."""
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gb = part.groupby(list(group_keys), sort=False, group_keys=False)
        prev_close = gb[close_column].shift(1)
        prev_high = gb[high_column].shift(1)
        prev_low = gb[low_column].shift(1)
        h, l = part[high_column], part[low_column]
        tr = pd.concat([h - l, (h - prev_close).abs(), (l - prev_close).abs()], axis=1).max(axis=1)
        up, dn = h - prev_high, prev_low - l
        plus_dm = pd.Series(np.where(up > dn, np.maximum(up, 0), 0.0), index=part.index)
        minus_dm = pd.Series(np.where(dn > up, np.maximum(dn, 0), 0.0), index=part.index)
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        for p in ps:
            a = 1.0 / p

            def wilder(s):
                return s.groupby(gcodes).transform(
                    lambda x: x.ewm(alpha=a, adjust=False, min_periods=p).mean()
                )

            trs, pds_, mds = wilder(tr), wilder(plus_dm), wilder(minus_dm)
            plus_di = 100 * pds_ / trs
            minus_di = 100 * mds / trs
            dx = 100 * (plus_di - minus_di).abs() / (plus_di + minus_di)
            adx = dx.groupby(gcodes).transform(
                lambda x: x.ewm(alpha=a, adjust=False, min_periods=p).mean()
            )
            part[f"{close_column}_plus_di_{p}"] = plus_di.to_numpy()
            part[f"{close_column}_minus_di_{p}"] = minus_di.to_numpy()
            part[f"{close_column}_adx_{p}"] = adx.to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_cmo(ds: rd.Dataset, group_keys, order_by, close_column: str,
                periods=14, **kw) -> rd.Dataset:
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        delta = g.diff()
        gains = delta.where(delta > 0, 0.0)
        losses = -delta.where(delta < 0, 0.0)
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        for p in ps:
            sg = gains.groupby(gcodes).rolling(p).sum().reset_index(drop=True)
            sl = losses.groupby(gcodes).rolling(p).sum().reset_index(drop=True)
            part[f"{close_column}_cmo_{p}"] = (100 * (sg - sl) / (sg + sl)).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_ppo(ds: rd.Dataset, group_keys, order_by, close_column: str,
                fast_period=12, slow_period=26, **kw) -> rd.Dataset:
    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        ema_f = g.transform(lambda s: s.ewm(span=fast_period, adjust=False).mean())
        ema_s = g.transform(lambda s: s.ewm(span=slow_period, adjust=False).mean())
        part[f"{close_column}_ppo_line_{fast_period}_{slow_period}"] = (
            100 * (ema_f - ema_s) / ema_s
        ).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_roc(ds: rd.Dataset, group_keys, order_by, close_column: str,
                periods=1, start_index: int = 0, **kw) -> rd.Dataset:
    ps = _periods(periods)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        num = g.shift(start_index) if start_index else part[close_column]
        for p in ps:
            den = g.shift(p)
            roc = (num - den) / den
            roc = roc.where(den != 0)  # NaN on zero denominator
            part[f"{close_column}_roc_{start_index}_{p}"] = roc.to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_qsmomentum(ds: rd.Dataset, group_keys, order_by, close_column: str,
                       roc_fast_period=21, roc_slow_period=252,
                       returns_period=126, **kw) -> rd.Dataset:
    f, s, r = roc_fast_period, roc_slow_period, returns_period

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        c = part[close_column]
        slow_leg = (g.shift(f) - g.shift(s)) / g.shift(s)
        fast_leg = (c - g.shift(f)) / g.shift(f)
        rets = g.pct_change(fill_method=None)
        vol = rets.groupby(gcodes).rolling(r).std(ddof=0).reset_index(drop=True)
        part[f"{close_column}_qsmom_{f}_{s}_{r}"] = (
            (slow_leg - fast_leg) / vol
        ).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_drawdown(ds: rd.Dataset, group_keys, order_by, close_column: str,
                     **kw) -> rd.Dataset:
    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        peak = g.cummax()
        part[f"{close_column}_peak"] = peak.to_numpy()
        dd = part[close_column] - peak
        part[f"{close_column}_drawdown"] = dd.to_numpy()
        part[f"{close_column}_drawdown_pct"] = (dd / peak).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_stochastic_oscillator(ds: rd.Dataset, group_keys, order_by,
                                  high_column: str, low_column: str,
                                  close_column: str, k_periods=14, d_periods=3,
                                  **kw) -> rd.Dataset:
    kp, dp = k_periods, d_periods

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        lo = part[low_column].groupby(gcodes).rolling(kp).min().reset_index(drop=True)
        hi = part[high_column].groupby(gcodes).rolling(kp).max().reset_index(drop=True)
        k = 100 * (part[close_column].reset_index(drop=True) - lo) / (hi - lo)
        part[f"{close_column}_stoch_k_{kp}"] = k.to_numpy()
        part[f"{close_column}_stoch_d_{kp}_{dp}"] = (
            k.groupby(gcodes.reset_index(drop=True)).rolling(dp).mean()
            .reset_index(drop=True).to_numpy()
        )
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_ewma_volatility(ds: rd.Dataset, group_keys, order_by,
                            close_column: str, windows=20, decay_factor=0.94,
                            **kw) -> rd.Dataset:
    ws = _periods(windows)
    lam = decay_factor

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        log_ret = np.log(part[close_column] / g.shift(1))
        r2 = log_ret**2
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        # recursive EWMA with alpha = 1-lam == ewm(alpha=1-lam, adjust=False)
        sigma2 = r2.groupby(gcodes).transform(
            lambda s: s.ewm(alpha=1 - lam, adjust=False, min_periods=1).mean()
        )
        counts = r2.notna().groupby(gcodes).cumsum()
        for w in ws:
            vol = np.sqrt(sigma2).where(counts >= w)
            part[f"{close_column}_ewma_vol_{w}_{lam}"] = vol.to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_fip_momentum(ds: rd.Dataset, group_keys, order_by,
                         close_column: str, window=252, **kw) -> rd.Dataset:
    ws = _periods(window)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        rets = g.pct_change(fill_method=None)
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        for w in ws:
            roll = rets.groupby(gcodes).rolling(w)
            pct_neg = roll.apply(lambda x: (x < 0).mean(), raw=True).reset_index(drop=True)
            pct_pos = roll.apply(lambda x: (x > 0).mean(), raw=True).reset_index(drop=True)
            total = roll.apply(lambda x: np.prod(1 + x) - 1, raw=True).reset_index(drop=True)
            part[f"{close_column}_fip_momentum_{w}"] = (
                np.sign(total) * (pct_neg - pct_pos)
            ).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_hurst_exponent(ds: rd.Dataset, group_keys, order_by,
                           close_column: str, window=100, **kw) -> rd.Dataset:
    ws = _periods(window)

    def _hurst(x: np.ndarray) -> float:
        n = len(x)
        mean = x.mean()
        dev = np.cumsum(x - mean)
        r = dev.max() - dev.min()
        s = x.std(ddof=0)
        if s == 0 or r == 0:
            return np.nan
        return float(np.log(r / s) / np.log(n))

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        s = part[close_column]
        for w in ws:
            part[f"{close_column}_hurst_{w}"] = (
                s.groupby(gcodes).rolling(w).apply(_hurst, raw=True)
                .reset_index(drop=True).to_numpy()
            )
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_rolling_risk_metrics(ds: rd.Dataset, group_keys, order_by,
                                 close_column: str, window=252,
                                 risk_free_rate=0.0, trading_days=252,
                                 **kw) -> rd.Dataset:
    w = window

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        rets = g.pct_change(fill_method=None)
        gcodes = part.groupby(list(group_keys), sort=False).ngroup()
        roll = rets.groupby(gcodes).rolling(w)
        mean = roll.mean().reset_index(drop=True)
        std = roll.std().reset_index(drop=True)
        downside = rets.where(rets < 0)
        dstd = downside.groupby(gcodes).rolling(w, min_periods=1).std().reset_index(drop=True)
        ann = np.sqrt(trading_days)
        rf = risk_free_rate / trading_days
        c = close_column
        part[f"{c}_sharpe_ratio_{w}"] = ((mean - rf) / std * ann).to_numpy()
        part[f"{c}_sortino_ratio_{w}"] = ((mean - rf) / dstd * ann).to_numpy()
        part[f"{c}_volatility_annualized_{w}"] = (std * ann).to_numpy()
        part[f"{c}_skewness_{w}"] = roll.skew().reset_index(drop=True).to_numpy()
        part[f"{c}_kurtosis_{w}"] = roll.kurt().reset_index(drop=True).to_numpy()
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def _periods(spec) -> list[int]:
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, tuple):
        return list(range(spec[0], spec[1] + 1))
    return list(spec)
