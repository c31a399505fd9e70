"""Finance indicators vs single-group pandas oracles (reference formulas)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.ops import finance as fin


@pytest.fixture(scope="module")
def px() -> pd.DataFrame:
    rng = np.random.default_rng(5)
    frames = []
    for sym in ["AAA", "BBB", "CCC"]:
        n = 300
        ret = rng.normal(0.0005, 0.02, n)
        close = 100 * np.cumprod(1 + ret)
        high = close * (1 + np.abs(rng.normal(0, 0.01, n)))
        low = close * (1 - np.abs(rng.normal(0, 0.01, n)))
        dates = pd.date_range("2022-01-03", periods=n, freq="B").astype("datetime64[us]")
        frames.append(pd.DataFrame({"symbol": sym, "date": dates, "close": close,
                                    "high": high, "low": low}))
    return pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)


@pytest.fixture(scope="module")
def ds(px):
    return rd.from_pandas(px)


def sorted_out(out):
    return out.to_pandas().sort_values(["symbol", "date"], ignore_index=True)


def per_group(px, fn):
    o = px.sort_values(["symbol", "date"], ignore_index=True)
    return o.groupby("symbol", sort=False, group_keys=False).apply(fn).reset_index(drop=True), o


def test_rsi(ds, px):
    out = sorted_out(fin.augment_rsi(ds, ["symbol"], ["date"], "close", periods=14))

    def oracle(g):
        d = g["close"].diff()
        mg = d.where(d > 0, 0.0).rolling(14).mean()
        ml = (-d.where(d < 0, 0.0)).rolling(14).mean()
        return 100 - 100 / (1 + mg / ml)

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_rsi_14"], exp, rtol=1e-10, equal_nan=True)


def test_macd(ds, px):
    out = sorted_out(fin.augment_macd(ds, ["symbol"], ["date"], "close"))

    def oracle(g):
        f = g["close"].ewm(span=12, adjust=False).mean()
        s = g["close"].ewm(span=26, adjust=False).mean()
        line = f - s
        sig = line.ewm(span=9, adjust=False).mean()
        return pd.DataFrame({"line": line, "sig": sig, "hist": line - sig})

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_macd_line_12_26_9"], exp["line"], rtol=1e-10)
    np.testing.assert_allclose(out["close_macd_signal_line_12_26_9"], exp["sig"], rtol=1e-10)
    np.testing.assert_allclose(out["close_macd_histogram_12_26_9"], exp["hist"], rtol=1e-9, atol=1e-12)


def test_bbands(ds, px):
    out = sorted_out(fin.augment_bbands(ds, ["symbol"], ["date"], "close", periods=20))

    def oracle(g):
        m = g["close"].rolling(20).mean()
        s = g["close"].rolling(20).std()
        return pd.DataFrame({"m": m, "u": m + 2 * s, "l": m - 2 * s})

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_bband_middle_20_2"], exp["m"], rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(out["close_bband_upper_20_2"], exp["u"], rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(out["close_bband_lower_20_2"], exp["l"], rtol=1e-10, equal_nan=True)


def test_atr(ds, px):
    out = sorted_out(fin.augment_atr(ds, ["symbol"], ["date"], "high", "low", "close", periods=14))

    def oracle(g):
        pc = g["close"].shift(1)
        tr = pd.concat([g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()], axis=1).max(axis=1)
        return tr.rolling(14).mean()

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_atr_14"], exp, rtol=1e-10, equal_nan=True)


def test_cmo_ppo(ds, px):
    out = sorted_out(fin.augment_cmo(ds, ["symbol"], ["date"], "close", periods=14))
    out2 = sorted_out(fin.augment_ppo(ds, ["symbol"], ["date"], "close"))

    def cmo_oracle(g):
        d = g["close"].diff()
        sg = d.where(d > 0, 0.0).rolling(14).sum()
        sl = (-d.where(d < 0, 0.0)).rolling(14).sum()
        return 100 * (sg - sl) / (sg + sl)

    exp, _ = per_group(px, cmo_oracle)
    np.testing.assert_allclose(out["close_cmo_14"], exp, rtol=1e-10, equal_nan=True)

    def ppo_oracle(g):
        f = g["close"].ewm(span=12, adjust=False).mean()
        s = g["close"].ewm(span=26, adjust=False).mean()
        return 100 * (f - s) / s

    exp2, _ = per_group(px, ppo_oracle)
    np.testing.assert_allclose(out2["close_ppo_line_12_26"], exp2, rtol=1e-10)


def test_roc_drawdown(ds, px):
    out = sorted_out(fin.augment_roc(ds, ["symbol"], ["date"], "close", periods=5))
    exp, o = per_group(px, lambda g: g["close"] / g["close"].shift(5) - 1)
    np.testing.assert_allclose(out["close_roc_0_5"], exp, rtol=1e-9, equal_nan=True)

    out2 = sorted_out(fin.augment_drawdown(ds, ["symbol"], ["date"], "close"))
    peak, _ = per_group(px, lambda g: g["close"].cummax())
    np.testing.assert_allclose(out2["close_peak"], peak, rtol=1e-12)
    np.testing.assert_allclose(out2["close_drawdown"], o["close"] - peak, rtol=1e-9, atol=1e-12)


def test_stochastic(ds, px):
    out = sorted_out(fin.augment_stochastic_oscillator(
        ds, ["symbol"], ["date"], "high", "low", "close"))

    def oracle(g):
        lo = g["low"].rolling(14).min()
        hi = g["high"].rolling(14).max()
        k = 100 * (g["close"] - lo) / (hi - lo)
        return pd.DataFrame({"k": k, "d": k.rolling(3).mean()})

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_stoch_k_14"], exp["k"], rtol=1e-10, equal_nan=True)
    np.testing.assert_allclose(out["close_stoch_d_14_3"], exp["d"], rtol=1e-10, equal_nan=True)


def test_qsmomentum_ewmavol_fip_hurst_risk(ds, px):
    out = sorted_out(fin.augment_qsmomentum(
        ds, ["symbol"], ["date"], "close", roc_fast_period=5, roc_slow_period=20, returns_period=10))
    assert "close_qsmom_5_20_10" in out.columns
    assert out["close_qsmom_5_20_10"].notna().sum() > 0

    out = sorted_out(fin.augment_ewma_volatility(ds, ["symbol"], ["date"], "close", windows=10))
    col = "close_ewma_vol_10_0.94"
    assert col in out.columns
    g0 = px.sort_values(["symbol", "date"]).groupby("symbol").get_group("AAA")
    lr = np.log(g0["close"] / g0["close"].shift(1))
    sig2 = (lr**2).ewm(alpha=0.06, adjust=False, min_periods=1).mean()
    exp = np.sqrt(sig2).where(pd.Series(np.arange(len(g0)), index=g0.index) >= 10)
    got = out[out["symbol"] == "AAA"][col].reset_index(drop=True)
    np.testing.assert_allclose(got.iloc[12:], exp.reset_index(drop=True).iloc[12:], rtol=1e-9)

    out = sorted_out(fin.augment_fip_momentum(ds, ["symbol"], ["date"], "close", window=30))
    assert out["close_fip_momentum_30"].abs().max() <= 1.0 + 1e-9

    # zero price -> -100% then +inf return: pandas rolling coerces inf->NaN
    # internally, so the reference's rolling.apply NaNs every window that
    # contains the inf return — pin exact parity against rolling.apply itself
    n, w = 40, 10
    close = np.linspace(100.0, 120.0, n)
    close[15] = 0.0
    zdf = pd.DataFrame({
        "symbol": "ZZZ",
        "date": pd.date_range("2022-01-03", periods=n, freq="B").astype("datetime64[us]"),
        "close": close,
    })
    zout = sorted_out(fin.augment_fip_momentum(
        rd.from_pandas(zdf), ["symbol"], ["date"], "close", window=w))
    r = zdf["close"].pct_change()

    def _fip(s):
        with np.errstate(all="ignore"):
            total = np.prod(1.0 + s) - 1.0
            return np.sign(total) * ((s < 0).sum() / w - (s > 0).sum() / w)

    exp_fip = r.rolling(w).apply(_fip, raw=True)
    np.testing.assert_allclose(zout[f"close_fip_momentum_{w}"], exp_fip,
                               rtol=1e-12, equal_nan=True)
    # windows past the inf return are finite again
    assert np.isfinite(zout[f"close_fip_momentum_{w}"].iloc[-1])
    # windows containing the inf return are NaN (pandas inf coercion)
    assert np.isnan(zout[f"close_fip_momentum_{w}"].iloc[20])

    out = sorted_out(fin.augment_hurst_exponent(ds, ["symbol"], ["date"], "close", window=50))
    h = out["close_hurst_50"].dropna()
    assert len(h) and (h > 0).all() and (h < 1.2).all()

    out = sorted_out(fin.augment_rolling_risk_metrics(ds, ["symbol"], ["date"], "close", window=60))
    for c in ["close_sharpe_ratio_60", "close_sortino_ratio_60",
              "close_volatility_annualized_60", "close_skewness_60", "close_kurtosis_60"]:
        assert c in out.columns and out[c].notna().sum() > 0


def test_adx(ds, px):
    out = sorted_out(fin.augment_adx(ds, ["symbol"], ["date"], "high", "low", "close", periods=14))

    def oracle(g):
        pc_, ph, pl = g["close"].shift(1), g["high"].shift(1), g["low"].shift(1)
        tr = pd.concat([g["high"] - g["low"], (g["high"] - pc_).abs(), (g["low"] - pc_).abs()], axis=1).max(axis=1)
        up, dn = g["high"] - ph, pl - g["low"]
        pdm = pd.Series(np.where(up > dn, np.maximum(up, 0), 0.0), index=g.index)
        mdm = pd.Series(np.where(dn > up, np.maximum(dn, 0), 0.0), index=g.index)
        a = 1 / 14
        w = lambda s: s.ewm(alpha=a, adjust=False, min_periods=14).mean()
        pdi = 100 * w(pdm) / w(tr)
        mdi = 100 * w(mdm) / w(tr)
        dx = 100 * (pdi - mdi).abs() / (pdi + mdi)
        return pd.DataFrame({"pdi": pdi, "mdi": mdi, "adx": w(dx)})

    exp, _ = per_group(px, oracle)
    np.testing.assert_allclose(out["close_plus_di_14"], exp["pdi"], rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(out["close_minus_di_14"], exp["mdi"], rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(out["close_adx_14"], exp["adx"], rtol=1e-9, equal_nan=True)
