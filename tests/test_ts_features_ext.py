"""Extended ts_features (pacf5, arch_lm, unit roots, hurst, stl extras,
Holt/HW parameter fits) against naive formulas and structural properties."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.ops.ts_features import (
    _holt_sse,
    _hw_sse,
    _pacf5_ss,
    arch_lm,
    holt_parameters,
    hurst_rs,
    hw_parameters,
    nelder_mead,
    nonlinearity_stat,
    ts_features,
    unitroot_kpss,
    unitroot_pp,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def test_pacf5_ar1_signature(rng):
    # AR(1): pacf(1) ~ phi, pacf(k>1) ~ 0 -> sum of squares ~ phi^2
    n, phi = 4000, 0.6
    x = np.zeros(n)
    eps = rng.normal(0, 1, n)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t]
    got = _pacf5_ss(x)
    assert abs(got - phi**2) < 0.05


def test_arch_lm_detects_arch(rng):
    n = 3000
    # ARCH(1): sigma_t^2 = 0.2 + 0.7 e_{t-1}^2
    e = np.zeros(n)
    z = rng.normal(0, 1, n)
    for t in range(1, n):
        e[t] = z[t] * np.sqrt(0.2 + 0.7 * e[t - 1] ** 2)
    iid = rng.normal(0, 1, n)
    assert arch_lm(e) > 0.1 > arch_lm(iid)


def test_arch_lm_matches_naive_r2(rng):
    x = rng.normal(0, 1, 200)
    lags = 3
    xc = x - x.mean()
    x2 = xc * xc
    y = x2[lags:]
    X = np.column_stack([np.ones(len(y))] +
                        [x2[lags - k - 1: len(x2) - k - 1] for k in range(lags)])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r2 = 1 - ((y - X @ beta) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    np.testing.assert_allclose(arch_lm(x, lags=3), r2, rtol=1e-10)


def test_nonlinearity_orders(rng):
    n = 2000
    lin = np.zeros(n)
    eps = rng.normal(0, 1, n)
    for t in range(1, n):
        lin[t] = 0.5 * lin[t - 1] + eps[t]
    nl = np.zeros(n)
    for t in range(1, n):  # bounded smooth nonlinearity
        nl[t] = 0.9 * np.tanh(2.0 * nl[t - 1]) + 0.3 * eps[t]
    assert nonlinearity_stat(nl) > nonlinearity_stat(lin)


def test_unitroot_kpss_orders(rng):
    n = 1000
    stationary = rng.normal(0, 1, n)
    walk = np.cumsum(rng.normal(0, 1, n))
    assert unitroot_kpss(walk) > unitroot_kpss(stationary)
    # KPSS of iid noise is small (well under the 5% critical value 0.463)
    assert unitroot_kpss(stationary) < 0.463


def test_unitroot_pp_orders(rng):
    n = 1000
    stationary = rng.normal(0, 1, n)
    walk = np.cumsum(rng.normal(0, 1, n))
    # PP Z_alpha is strongly negative for stationary series, near 0 for a walk
    assert unitroot_pp(stationary) < -100
    assert unitroot_pp(walk) > -30


def test_hurst_regimes(rng):
    n = 5000
    walk = np.cumsum(rng.normal(0, 1, n))      # H ~ close to 1 for the level
    noise = rng.normal(0, 1, n)                # mean-reverting: lower H
    assert hurst_rs(walk) > hurst_rs(noise)
    assert 0 < hurst_rs(noise) < 1


def test_nelder_mead_quadratic():
    res = nelder_mead(lambda p: (p[0] - 0.3) ** 2 + (p[1] - 0.7) ** 2,
                      [0.5, 0.5], [(0, 1), (0, 1)])
    np.testing.assert_allclose(res, [0.3, 0.7], atol=1e-3)


def test_holt_fit_beats_defaults(rng):
    t = np.arange(200.0)
    v = 5 + 0.3 * t + rng.normal(0, 0.8, 200)
    a, b = holt_parameters(v)
    assert 0 < a < 1 and 0 < b < 1
    assert _holt_sse(v, a, b) <= _holt_sse(v, 0.3, 0.1) + 1e-9


def test_hw_fit_beats_defaults(rng):
    t = np.arange(240.0)
    v = 10 + 0.1 * t + 4 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 240)
    a, b, g = hw_parameters(v, 12)
    assert all(0 < p < 1 for p in (a, b, g))
    assert _hw_sse(v, 12, a, b, g) <= _hw_sse(v, 12, 0.3, 0.1, 0.1) + 1e-9


def test_ts_features_dataset_all_columns(ray_session, rng):
    frames = []
    for g in ("a", "b"):
        ts = pd.date_range("2024-01-01", periods=120, freq="h").astype("datetime64[us]")
        frames.append(pd.DataFrame({
            "g": g, "ts": ts,
            "v": rng.normal(0, 1, 120) + np.sin(np.arange(120) / 24 * 2 * np.pi)}))
    df = pd.concat(frames, ignore_index=True)
    out = ts_features(rd.from_pandas(df), "ts", "v", by=["g"]).to_pandas()
    assert len(out) == 2
    for col in ("x_pacf5", "arch_lm", "nonlinearity", "unitroot_kpss",
                "unitroot_pp", "hurst", "spike", "linearity", "curvature",
                "e_acf1", "e_acf10"):
        assert col in out.columns and out[col].notna().all(), col
    # explicit holt/hw request adds the fitted parameters
    out2 = ts_features(rd.from_pandas(df), "ts", "v", by=["g"],
                       features=["length", "holt_alpha", "holt_beta",
                                 "hw_alpha", "hw_beta", "hw_gamma"]).to_pandas()
    assert out2.columns.tolist() == ["g", "length", "holt_alpha", "holt_beta",
                                     "hw_alpha", "hw_beta", "hw_gamma"]
    assert out2.drop(columns="g").notna().all().all()


def test_unknown_feature_rejected(ray_session):
    df = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=10, freq="D"),
                       "v": np.arange(10.0)})
    with pytest.raises(NotImplementedError):
        ts_features(rd.from_pandas(df), "ts", "v", features=["heterogeneity"])
