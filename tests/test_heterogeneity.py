"""GARCH(1,1) heterogeneity quartet (ops/ts_features.py built-in QMLE)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.ops.ts_features import (
    _ar_whiten,
    arch_lm,
    garch11_fit,
    heterogeneity,
    ts_features,
)


def _simulate_garch(n=600, omega=0.2, alpha=0.15, beta=0.7, seed=3):
    rng = np.random.default_rng(seed)
    e = np.empty(n)
    s2 = omega / (1 - alpha - beta)
    for t in range(n):
        e[t] = np.sqrt(s2) * rng.standard_normal()
        s2 = omega + alpha * e[t] ** 2 + beta * s2
    return e


def test_garch11_recovers_persistence():
    e = _simulate_garch()
    fit = garch11_fit(e)
    assert fit is not None
    omega, a, b, s2 = fit
    # persistence a+b is the well-identified quantity; individual params
    # are noisy at n=600
    assert 0.6 < a + b < 0.99
    assert a > 0.03
    assert omega > 0
    assert np.all(s2 > 0)
    # recursion check at a random index
    t = 123
    e2 = e * e
    assert np.isclose(s2[t], omega + a * e2[t - 1] + b * s2[t - 1])


def test_garch_standardization_removes_arch_effect():
    e = _simulate_garch(n=800, alpha=0.25, beta=0.65, seed=11)
    het = heterogeneity(e)
    # the raw residuals show ARCH structure; standardized ones show less
    assert het["arch_acf"] > het["garch_acf"]
    assert het["arch_r2"] > het["garch_r2"]
    assert het["arch_r2"] > 0.05


def test_heterogeneity_nan_on_short_series():
    het = heterogeneity(np.arange(10, dtype=np.float64))
    assert all(np.isnan(v) for v in het.values())


def test_ar_whiten_removes_linear_structure():
    rng = np.random.default_rng(5)
    x = np.empty(400)
    x[0] = 0.0
    eps = rng.standard_normal(400)
    for t in range(1, 400):
        x[t] = 0.8 * x[t - 1] + eps[t]
    resid = _ar_whiten(x)
    assert resid is not None
    # residual lag-1 autocorrelation should be near zero
    r1 = np.corrcoef(resid[1:], resid[:-1])[0, 1]
    assert abs(r1) < 0.1


def test_ts_features_het_through_ray():
    rng = np.random.default_rng(7)
    frames = []
    for gid in range(3):
        n = 200
        ts = pd.date_range("2024-01-01", periods=n, freq="h")
        frames.append(pd.DataFrame({
            "g": gid, "ts": ts,
            "v": _simulate_garch(n, seed=gid) + rng.normal(0, 0.01, n)}))
    df = pd.concat(frames, ignore_index=True)
    out = ts_features(rd.from_pandas(df), "ts", "v", by=["g"],
                      features=["length", "arch_acf", "garch_acf",
                                "arch_r2", "garch_r2"]).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"g", "length", "arch_acf", "garch_acf",
                                "arch_r2", "garch_r2"}
    assert out[["arch_acf", "arch_r2"]].notna().all().all()
    # single-process oracle for one group
    g0 = df[df.g == 0].sort_values("ts")["v"].to_numpy()
    het = heterogeneity(g0)
    row = out[out.g == 0].iloc[0]
    for k, v in het.items():
        assert np.isclose(row[k], v, equal_nan=True)
