"""STL kernel: vectorized loess/STL vs a naive loop-based re-derivation of
Cleveland (1990), plus structural properties."""

import numpy as np
import pytest

from pytimetk_ray.kernels.stl import _ma, loess, stl_decompose


# --- naive re-implementations (straight from the paper, loops everywhere) --

def naive_loess(y, q, degree, eval_pos=None, rho=None):
    n = len(y)
    if eval_pos is None:
        eval_pos = range(n)
    out = []
    for t in eval_pos:
        qe = min(q, n)
        # qe nearest integer positions of t (contiguous window)
        s = min(max(t - (qe - 1) // 2, 0), n - qe)
        js = np.arange(s, s + qe)
        lam = max(t - s, s + qe - 1 - t)
        if q > n:
            lam += (q - n) / 2.0
        lam = max(lam, 1e-12)
        w = np.clip((1 - (np.abs(js - t) / lam) ** 3) ** 3, 0, None)
        if rho is not None:
            wr = w * np.asarray(rho)[js]
            if wr.sum() > 1e-300:  # else: unweighted fallback (failed fit)
                w = wr
        if degree == 0:
            out.append(np.sum(w * y[js]) / np.sum(w))
            continue
        x = js.astype(float)
        s0, s1 = w.sum(), (w * x).sum()
        s2, sy, sxy = (w * x * x).sum(), (w * y[js]).sum(), (w * x * y[js]).sum()
        den = s0 * s2 - s1 * s1
        if abs(den) > 1e-12 * max(s0 * s2, 1.0):
            b = (s0 * sxy - s1 * sy) / den
        else:
            b = 0.0
        a = (sy - b * s1) / s0
        out.append(a + b * t)
    return np.array(out)


def naive_stl(y, p, ns, nt, nl, inner, outer, robust):
    n = len(y)
    rho = np.ones(n)
    T = np.zeros(n)
    S = np.zeros(n)
    for _ in range(outer + 1):
        for _ in range(inner):
            detr = y - T
            C = np.empty(n + 2 * p)
            for k in range(p):
                ii = np.flatnonzero(np.arange(n) % p == k)
                sm = naive_loess(detr[ii], ns, 1,
                                 eval_pos=range(-1, len(ii) + 1), rho=rho[ii])
                for z, j in enumerate(range(-1, len(ii) + 1)):
                    C[k + (j + 1) * p] = sm[z]

            def ma(x, k):
                return np.array([x[i:i + k].mean() for i in range(len(x) - k + 1)])

            L = naive_loess(ma(ma(ma(C, p), p), 3), nl, 1)
            S = C[p:p + n] - L
            T = naive_loess(y - S, nt, 1, rho=rho)
        R = y - S - T
        h = 6 * np.median(np.abs(R))
        if h <= 0:
            rho = np.ones(n)
        else:
            u = np.clip(np.abs(R) / h, 0, 1)
            rho = (1 - u * u) ** 2
    return S, T


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(42)
    n = 120
    t = np.arange(n)
    return (10 + 0.05 * t + 3 * np.sin(2 * np.pi * t / 7)
            + rng.normal(0, 0.5, n))


def test_loess_matches_naive(series):
    for q in (7, 15, 121):  # includes q > n
        for deg in (0, 1):
            got = loess(series, q, deg)
            want = naive_loess(series, q, deg)
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                       err_msg=f"q={q} deg={deg}")


def test_loess_extension_positions(series):
    got = loess(series[:20], 7, 1, eval_pos=np.arange(-1, 21))
    want = naive_loess(series[:20], 7, 1, eval_pos=range(-1, 21))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_loess_rho_weights(series):
    rng = np.random.default_rng(1)
    rho = rng.uniform(0.1, 1.0, len(series))
    got = loess(series, 9, 1, rho=rho)
    want = naive_loess(series, 9, 1, rho=rho)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ma():
    x = np.arange(10.0)
    np.testing.assert_allclose(_ma(x, 3), [1, 2, 3, 4, 5, 6, 7, 8])


@pytest.mark.parametrize("robust", [False, True])
def test_stl_matches_naive(series, robust):
    inner, outer = (1, 3) if robust else (2, 0)
    S, T = stl_decompose(series, 7, seasonal=7, inner=inner, outer=outer,
                         robust=robust)
    Sn, Tn = naive_stl(series, 7, 7, 15, 7, inner, outer, robust)
    np.testing.assert_allclose(S, Sn, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(T, Tn, rtol=1e-10, atol=1e-10)


def test_stl_recovers_structure(series):
    S, T = stl_decompose(series, 7)
    n = len(series)
    t = np.arange(n)
    # trend tracks the linear drift (loess of a line + noise)
    drift = 10 + 0.05 * t
    assert np.abs(T[10:-10] - drift[10:-10]).mean() < 0.5
    # seasonal tracks the sine
    sine = 3 * np.sin(2 * np.pi * t / 7)
    assert np.corrcoef(S, sine)[0, 1] > 0.95
    # remainder is small vs the signal
    R = series - S - T
    assert np.abs(R).mean() < 0.6


def test_stl_robust_downweights_outliers(series):
    y = series.copy()
    y[50] += 40.0  # one huge spike
    S_r, T_r = stl_decompose(y, 7, robust=True)
    S_p, T_p = stl_decompose(y, 7, robust=False)
    # the robust trend near the spike stays closer to the clean trend
    _, T_clean = stl_decompose(series, 7, robust=False)
    err_r = np.abs(T_r[45:56] - T_clean[45:56]).max()
    err_p = np.abs(T_p[45:56] - T_clean[45:56]).max()
    assert err_r < err_p


def test_stl_short_series_degenerate():
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    S, T = stl_decompose(y, 4)  # n < 2p path
    assert np.all(np.isfinite(S)) and np.all(np.isfinite(T))
    np.testing.assert_allclose(S.reshape(-1)[:4].mean(), 0, atol=1e-9)
