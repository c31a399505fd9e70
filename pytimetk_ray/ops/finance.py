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
from pytimetk_ray.ops.regime import augment_regime_detection  # noqa: F401


def _op(ds, group_keys, order_by, kernel, num_partitions=DEFAULT_NUM_PARTITIONS):
    return partitioned_group_map(
        ds, list(group_keys), kernel,
        sort_by=list(group_keys) + list(order_by),
        num_partitions=num_partitions,
    )


def _windows(x: np.ndarray, w: int):
    """(n-w+1, w) sliding view over the partition-wide array, oldest-first.
    Zero-copy (stride trick); callers chunk the arithmetic that materializes.
    Windows that span a group boundary must be invalidated by the caller —
    either via the leading-NaN of per-group diffs/returns (NaN propagates),
    or with an explicit ``same_group`` mask for raw-value windows."""
    return np.lib.stride_tricks.sliding_window_view(x, w)


def _chunked_rows(n_windows: int, w: int, max_elems: int = 1 << 22):
    """Row-chunk bounds so each materialized (chunk, w) temp stays ~32 MB."""
    step = max(1, max_elems // max(w, 1))
    return [(i, min(i + step, n_windows)) for i in range(0, n_windows, step)]


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
    """Quant-Science momentum (reference qsmomentum.py:46-99).  The return
    volatility is an explicit two-pass population std over each window
    (left-fold sums, oldest first) rather than pandas' online rolling std —
    numerically equivalent at ~1e-15 and bit-reproducible by the DuckDB
    oracle's LAG-chain formulation."""
    f, s, r = roc_fast_period, roc_slow_period, returns_period

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        c = part[close_column]
        slow_leg = (g.shift(f) - g.shift(s)) / g.shift(s)
        fast_leg = (c - g.shift(f)) / g.shift(f)
        rets = g.pct_change(fill_method=None).to_numpy(dtype=np.float64)
        n = len(rets)
        vol = np.full(n, np.nan)
        if n >= r:
            win = _windows(rets, r)  # group-lead NaN rets invalidate crossers
            with np.errstate(all="ignore"):
                for a, b in _chunked_rows(len(win), r):
                    wv = win[a:b]
                    mu = wv.sum(axis=1) / r
                    d = wv - mu[:, None]
                    vol[r - 1 + a : r - 1 + b] = np.sqrt((d * d).sum(axis=1) / r)
        with np.errstate(all="ignore"):
            part[f"{close_column}_qsmom_{f}_{s}_{r}"] = (
                (slow_leg - fast_leg).to_numpy() / vol
            )
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
    """Frog-in-pan momentum (reference fip_momentum.py:318-328):
    sign(prod(1+r) - 1) * (%neg - %pos) over each full return window.
    Vectorized sliding windows (left-fold product, oldest first) replace the
    reference's three per-window rolling.apply loops; bit-identical to them
    for full windows, and bit-reproducible by the oracle's LAG-chain SQL."""
    ws = _periods(window)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]
        rets = g.pct_change(fill_method=None).to_numpy(dtype=np.float64)
        n = len(rets)
        for w in ws:
            out = np.full(n, np.nan)
            if n >= w:
                win = _windows(rets, w)
                with np.errstate(all="ignore"):
                    for a, b in _chunked_rows(len(win), w):
                        wv = win[a:b]
                        # ±inf returns (price hitting zero) NaN the whole
                        # window: pandas rolling coerces inf->NaN internally
                        # (verified pandas 2.2.2: Series([1,inf,3]).rolling(2)
                        # .apply(sum) == [nan,nan,nan]), so the reference's
                        # rolling.apply produces NaN there too — parity pinned
                        # by test_finance.py's zero-price fixture
                        invalid = ~np.isfinite(wv).all(axis=1)
                        pct_neg = (wv < 0).sum(axis=1) / float(w)
                        pct_pos = (wv > 0).sum(axis=1) / float(w)
                        total = (1.0 + wv).prod(axis=1) - 1.0
                        res = np.sign(total) * (pct_neg - pct_pos)
                        res[invalid] = np.nan
                        out[w - 1 + a : w - 1 + b] = res
            part[f"{close_column}_fip_momentum_{w}"] = out
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_hurst_exponent(ds: rd.Dataset, group_keys, order_by,
                           close_column: str, window=100, **kw) -> rd.Dataset:
    """Rolling rescaled-range Hurst exponent log(R/S)/log(n)
    (reference hurst_exponent.py:279,406), vectorized over sliding windows
    (two-pass mean/std, per-window cumulative deviation) instead of a
    per-window rolling.apply loop.  Raw-value windows don't self-invalidate
    at group boundaries, so crossers are masked explicitly."""
    ws = _periods(window)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        gcodes = part.groupby(list(group_keys), sort=False).ngroup().to_numpy()
        vals = part[close_column].to_numpy(dtype=np.float64)
        n = len(vals)
        for w in ws:
            out = np.full(n, np.nan)
            if n >= w:
                win = _windows(vals, w)
                same_group = gcodes[w - 1 :] == gcodes[: n - w + 1]
                logn = np.log(w)
                with np.errstate(all="ignore"):
                    for a, b in _chunked_rows(len(win), w):
                        wv = win[a:b]
                        mu = wv.mean(axis=1)
                        d = wv - mu[:, None]
                        dev = np.cumsum(d, axis=1)
                        rng = dev.max(axis=1) - dev.min(axis=1)
                        s = np.sqrt((d * d).mean(axis=1))
                        h = np.log(rng / s) / logn
                        h[(s == 0) | (rng == 0) | ~same_group[a:b]] = np.nan
                        out[w - 1 + a : w - 1 + b] = h
            part[f"{close_column}_hurst_{w}"] = out
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def augment_rolling_risk_metrics(ds: rd.Dataset, group_keys, order_by,
                                 close_column: str, window=252,
                                 risk_free_rate=0.0, trading_days=252,
                                 benchmark_column: str | None = None,
                                 returns: str = "pct",
                                 **kw) -> rd.Dataset:
    """Rolling Sharpe/Sortino/vol/omega/skew/kurt — plus Treynor and
    information ratio when ``benchmark_column`` is given — over full return
    windows (reference rolling_risk_metrics.py:436-495).  All metrics are
    explicit two-pass sliding-window formulas (left-fold sums, oldest
    first; sample skewness/excess-kurtosis with the standard bias
    corrections) instead of pandas' online rolling kernels — numerically
    equivalent at ~1e-15 and bit-reproducible by the DuckDB oracle's
    LAG-chain SQL.  ``returns="log"`` uses the current reference's
    ln(close/prev) returns (:375-376); the default "pct" keeps the
    pct_change formulation the round-1 oracles pin.  Remaining documented
    variants vs the current reference: windows are FULL
    (min_periods == window, not window//2), and Sortino's downside std
    spans only the window's negative returns (sample ddof=1, NaN when
    fewer than two) rather than the population mean of clipped squares.
    Omega = sum(max(r,0)) / -sum(min(r,0)) (0 denominator -> NaN); Treynor
    beta = (E[rb] - E[r]E[b]) / (E[b^2] - E[b]^2) population covariances
    (reference :472-484); information = (E[r] - E[b]) / std(r - b, ddof=1)
    (reference :487-493, no annualization)."""
    w = window

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(list(group_keys), sort=False, group_keys=False)[close_column]

        def _rets(series_gb, values):
            prev = series_gb.shift(1).to_numpy(dtype=np.float64)
            if returns == "log":
                with np.errstate(all="ignore"):
                    return np.log(values / prev)
            return values / prev - 1.0

        rets = _rets(g, part[close_column].to_numpy(dtype=np.float64))
        n = len(rets)
        ann = np.sqrt(trading_days)
        rf = risk_free_rate / trading_days
        c = close_column
        cols = {
            f"{c}_sharpe_ratio_{w}": np.full(n, np.nan),
            f"{c}_sortino_ratio_{w}": np.full(n, np.nan),
            f"{c}_volatility_annualized_{w}": np.full(n, np.nan),
            f"{c}_omega_ratio_{w}": np.full(n, np.nan),
            f"{c}_skewness_{w}": np.full(n, np.nan),
            f"{c}_kurtosis_{w}": np.full(n, np.nan),
        }
        if benchmark_column is not None:
            gb = part.groupby(list(group_keys), sort=False,
                              group_keys=False)[benchmark_column]
            brets = _rets(gb, part[benchmark_column].to_numpy(dtype=np.float64))
            cols[f"{c}_treynor_ratio_{w}"] = np.full(n, np.nan)
            cols[f"{c}_information_ratio_{w}"] = np.full(n, np.nan)
        if n >= w:
            win = _windows(rets, w)  # group-lead NaN rets invalidate crossers
            fw = float(w)
            skew_c = np.sqrt(fw * (fw - 1.0)) / (fw - 2.0)
            with np.errstate(all="ignore"):
                for a, b in _chunked_rows(len(win), w):
                    wv = win[a:b]
                    sl = slice(w - 1 + a, w - 1 + b)
                    mu = wv.sum(axis=1) / fw
                    d = wv - mu[:, None]
                    d2 = d * d
                    ss = d2.sum(axis=1)
                    std = np.sqrt(ss / (fw - 1.0))
                    cols[f"{c}_sharpe_ratio_{w}"][sl] = (mu - rf) / std * ann
                    cols[f"{c}_volatility_annualized_{w}"][sl] = std * ann
                    # downside (negative-return) sample std, >=2 obs
                    neg = wv < 0
                    cnt = neg.sum(axis=1)
                    md = (wv * neg).sum(axis=1) / cnt
                    dd = wv - md[:, None]
                    dstd = np.sqrt(((dd * dd) * neg).sum(axis=1) / (cnt - 1))
                    dstd[cnt < 2] = np.nan
                    cols[f"{c}_sortino_ratio_{w}"][sl] = (mu - rf) / dstd * ann
                    m2 = ss / fw
                    m3 = (d2 * d).sum(axis=1) / fw
                    m4 = (d2 * d2).sum(axis=1) / fw
                    cols[f"{c}_skewness_{w}"][sl] = skew_c * (m3 / (m2 * np.sqrt(m2)))
                    g2 = m4 / (m2 * m2) - 3.0
                    cols[f"{c}_kurtosis_{w}"][sl] = (
                        ((fw + 1.0) * g2 + 6.0) * (fw - 1.0)
                    ) / ((fw - 2.0) * (fw - 3.0))
                    # omega: sum of positive parts / -sum of negative parts
                    pos = (wv * (wv > 0)).sum(axis=1)
                    ns = (wv * neg).sum(axis=1)
                    om = pos / -ns
                    om[ns == 0] = np.nan
                    cols[f"{c}_omega_ratio_{w}"][sl] = om
                    if benchmark_column is not None:
                        wb = _windows(brets, w)[a:b]
                        bmu = wb.sum(axis=1) / fw
                        cov = (wv * wb).sum(axis=1) / fw - mu * bmu
                        bvar = (wb * wb).sum(axis=1) / fw - bmu * bmu
                        beta = cov / bvar
                        beta[bvar == 0] = np.nan
                        cols[f"{c}_treynor_ratio_{w}"][sl] = (mu - rf) / beta * ann
                        act = wv - wb
                        am = act.sum(axis=1) / fw
                        ad = act - am[:, None]
                        tstd = np.sqrt((ad * ad).sum(axis=1) / (fw - 1.0))
                        tstd[tstd == 0] = np.nan
                        cols[f"{c}_information_ratio_{w}"][sl] = (mu - bmu) / tstd
        for name, arr in cols.items():
            part[name] = arr
        return part

    return _op(ds, group_keys, order_by, kernel, **kw)


def _periods(spec) -> list[int]:
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, tuple):
        return list(range(spec[0], spec[1] + 1))
    return list(spec)
