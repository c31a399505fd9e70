"""Regime detection: numpy Gaussian-HMM EM + rolling-window labeling.

Behavior contract: reference regime_detection.py:84-124,389-453 (rolling fit
on finite log returns, warm-started params, last-step_size labels written).
Labels are canonicalized by state-mean ascending (documented variant)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.ops.regime import (
    _detect_regimes,
    augment_regime_detection,
    hmm_fit,
    hmm_viterbi,
)


def two_state_series(rng, n=400):
    """Alternating 50-obs blocks drawn from well-separated Gaussians."""
    states = np.repeat(np.arange(n // 50) % 2, 50)
    x = np.where(states == 0, rng.normal(-0.03, 0.005, n), rng.normal(0.03, 0.005, n))
    return x, states


def test_hmm_fit_recovers_separated_states():
    rng = np.random.default_rng(7)
    x, states = two_state_series(rng)
    pi, A, mu, var = hmm_fit(x, 2)
    # canonical order: sort by mean
    order = np.argsort(mu)
    path = hmm_viterbi(x, pi, A, mu, var)
    rank = np.empty(2, dtype=np.int64)
    rank[order] = np.arange(2)
    labels = rank[path]
    # >99% of points assigned to the generating state
    assert (labels == states).mean() > 0.99
    assert mu[order][0] < 0 < mu[order][1]
    # sticky transitions learned
    assert A[0, 0] > 0.8 and A[1, 1] > 0.8


def test_hmm_fit_deterministic():
    rng = np.random.default_rng(11)
    x = rng.normal(0, 0.02, 300)
    a = hmm_fit(x, 3)
    b = hmm_fit(x, 3)
    for p, q in zip(a, b):
        np.testing.assert_array_equal(p, q)


def test_hmm_fit_constant_data_no_crash():
    x = np.zeros(100)
    pi, A, mu, var = hmm_fit(x, 2)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    path = hmm_viterbi(x, pi, A, mu, var)
    assert path.shape == (100,)


def test_viterbi_tiny_known_path():
    # 2 states, near-deterministic emissions: path follows the data sign
    pi = np.array([0.5, 0.5])
    A = np.array([[0.9, 0.1], [0.1, 0.9]])
    mu = np.array([-1.0, 1.0])
    var = np.array([0.01, 0.01])
    x = np.array([-1.0, -1.0, 1.0, 1.0, -1.0])
    path = hmm_viterbi(x, pi, A, mu, var)
    np.testing.assert_array_equal(path, [0, 0, 1, 1, 0])


def test_detect_regimes_window_semantics():
    rng = np.random.default_rng(3)
    x, _ = two_state_series(rng, n=200)
    out = _detect_regimes(x, window=60, n_regimes=2, step_size=10, n_iter=20)
    # first window ends at i=59 and writes its last step_size labels, so
    # nothing before index window - step_size (reference write-back shape)
    assert np.all(np.isnan(out[:50]))
    assert np.isfinite(out[50:]).sum() > 0
    lab = out[np.isfinite(out)]
    assert set(np.unique(lab)) <= {0.0, 1.0}


def test_detect_regimes_nan_gaps_skipped():
    rng = np.random.default_rng(5)
    x, _ = two_state_series(rng, n=150)
    x[10:90] = np.nan  # < min_obs finite in early windows
    out = _detect_regimes(x, window=60, n_regimes=2, step_size=5, n_iter=20)
    # positions that are NaN in the input never get a label
    assert np.all(np.isnan(out[10:90]))


@pytest.fixture(scope="module")
def regime_px():
    rng = np.random.default_rng(19)
    frames = []
    for sym in ["AAA", "BBB"]:
        lr, _ = two_state_series(rng, n=250)
        close = 100 * np.exp(np.cumsum(lr))
        dates = pd.date_range("2022-01-03", periods=250, freq="B").astype("datetime64[us]")
        frames.append(pd.DataFrame({"symbol": sym, "date": dates, "close": close}))
    return pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)


def test_augment_regime_detection_matches_local(ray_session, regime_px):
    ds = rd.from_pandas(regime_px)
    out = (
        augment_regime_detection(ds, ["symbol"], ["date"], "close",
                                 window=60, n_regimes=2, step_size=10, n_iter=20)
        .to_pandas()
        .sort_values(["symbol", "date"], ignore_index=True)
    )
    exp = regime_px.sort_values(["symbol", "date"], ignore_index=True)
    for sym, g in exp.groupby("symbol", sort=False):
        with np.errstate(all="ignore"):
            lr = np.log(g["close"].to_numpy() / np.r_[np.nan, g["close"].to_numpy()[:-1]])
        lr[~np.isfinite(lr)] = np.nan
        want = _detect_regimes(lr, 60, 2, 10, 20)
        got = out.loc[out["symbol"] == sym, "close_regime_60"].to_numpy()
        np.testing.assert_array_equal(got, want)
