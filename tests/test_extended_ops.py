"""Diagnostics, window UDFs, correlation funnel, signal, holiday, CV,
sequence ops."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.ops.apply_window import augment_expanding_apply, augment_rolling_apply
from pytimetk_ray.ops.correlationfunnel import binarize, correlate
from pytimetk_ray.ops.cv import TimeSeriesCV
from pytimetk_ray.ops.diagnostics import (
    acf_diagnostics,
    acf_vals,
    pacf_vals,
    seasonal_diagnostics,
    stl_diagnostics,
)
from pytimetk_ray.ops.holiday import augment_holiday_signature, us_federal_holidays
from pytimetk_ray.ops.sequences import (
    make_future_timeseries,
    make_weekday_sequence,
    make_weekend_sequence,
    week_of_month,
)
from pytimetk_ray.ops.signal import augment_hilbert, augment_wavelet, hilbert_analytic


@pytest.fixture(scope="module")
def tsdf():
    rng = np.random.default_rng(9)
    frames = []
    for g in ["a", "b"]:
        n = 120
        t = pd.date_range("2023-01-01", periods=n, freq="D").astype("datetime64[us]")
        v = 10 + np.sin(np.arange(n) * 2 * np.pi / 7) * 3 + rng.normal(0, 0.5, n)
        frames.append(pd.DataFrame({"g": g, "ts": t, "v": v, "w": rng.normal(size=n)}))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def tsds(tsdf):
    return rd.from_pandas(tsdf)


def test_acf_matches_numpy_definition():
    rng = np.random.default_rng(1)
    x = rng.normal(size=200)
    a = acf_vals(x, 10)
    # direct biased estimator
    xc = x - x.mean()
    direct = np.array([np.sum(xc[k:] * xc[: len(x) - k]) for k in range(11)]) / np.sum(xc * xc)
    np.testing.assert_allclose(a, direct, atol=1e-10)
    p = pacf_vals(x, 10)
    assert p[0] == 1.0 and np.all(np.abs(p[1:]) < 1)


def test_pacf_ywmle_solves_yule_walker():
    # yw-mle PACF (the reference's statsmodels method): per-lag dense solve
    # of toeplitz(r) phi = r[1:]; Durbin-Levinson solves the SAME equations,
    # so the two must agree to solver precision; the closed forms pin the
    # arithmetic independently
    from pytimetk_ray.ops.diagnostics import pacf_ywmle

    rng = np.random.default_rng(8)
    # AR(2)-ish series to give non-trivial structure
    x = np.zeros(300)
    e = rng.normal(size=300)
    for t in range(2, 300):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + e[t]
    got = pacf_ywmle(x, 8)
    dl = pacf_vals(x, 8)
    np.testing.assert_allclose(got, dl, rtol=1e-8, atol=1e-10)
    # closed forms from the biased autocovariances
    xc = x - x.mean()
    n = len(x)
    r = np.array([xc[: n - k] @ xc[k:] / n for k in range(3)])
    np.testing.assert_allclose(got[1], r[1] / r[0], rtol=1e-12)
    np.testing.assert_allclose(
        got[2], (r[0] * r[2] - r[1] ** 2) / (r[0] ** 2 - r[1] ** 2), rtol=1e-10)
    # degenerate inputs
    const = pacf_ywmle(np.ones(50), 3)
    assert const[0] == 1.0 and np.all(const[1:] == 0.0)


def test_acf_diagnostics(tsds, tsdf):
    out = acf_diagnostics(tsds, "ts", "v", by=["g"], lags=20, ccf_columns=["w"]).to_pandas()
    assert set(out["metric"].unique()) == {"acf", "pacf", "ccf_w"}
    a = out[(out["g"] == "a") & (out["metric"] == "acf")].sort_values("lag")
    assert a["value"].iloc[0] == 1.0
    # weekly seasonality -> lag-7 autocorrelation clearly positive
    assert a[a["lag"] == 7]["value"].iloc[0] > 0.5
    np.testing.assert_allclose(a["white_noise_upper"], 2 / np.sqrt(120))


def test_stl_diagnostics(tsds, tsdf):
    out = stl_diagnostics(tsds, "ts", "v", by=["g"], period=7).to_pandas()
    assert len(out) == len(tsdf)
    np.testing.assert_allclose(out["observed"], out["seasonal"] + out["seasadj"], atol=1e-9)
    np.testing.assert_allclose(out["remainder"], out["seasadj"] - out["trend"], atol=1e-9)
    # the sine seasonality should be captured: remainder variance << observed
    assert out["remainder"].var() < out["observed"].var() / 3


def test_seasonal_diagnostics(tsds):
    out = seasonal_diagnostics(tsds, "ts", "v", by=["g"]).to_pandas()
    assert set(out["feature"].unique()) == {"wday_lbl", "week", "month_lbl"}  # daily spacing band
    assert len(out) == 2 * 120 * 3


def test_rolling_apply(tsds, tsdf):
    out = augment_rolling_apply(
        tsds, ["g"], ["ts"], window=10,
        window_func=[("corr_vw", lambda df: df["v"].corr(df["w"]))],
    ).to_pandas().sort_values(["g", "ts"], ignore_index=True)
    o = tsdf.sort_values(["g", "ts"], ignore_index=True)
    exp = (
        o.groupby("g", sort=False)
        .apply(lambda gdf: gdf["v"].rolling(10).corr(gdf["w"]))
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["rolling_corr_vw_win_10"], exp, rtol=1e-9, equal_nan=True)


def test_expanding_apply(tsds, tsdf):
    out = augment_expanding_apply(
        tsds, ["g"], ["ts"], window_func=[("vmax", lambda df: df["v"].max())]
    ).to_pandas().sort_values(["g", "ts"], ignore_index=True)
    o = tsdf.sort_values(["g", "ts"], ignore_index=True)
    exp = o.groupby("g", sort=False)["v"].cummax()
    np.testing.assert_allclose(out["expanding_vmax"], exp, rtol=1e-12)


def test_binarize_correlate():
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "x": rng.normal(size=n),
            "cat": rng.choice(["u", "v", "w"], size=n, p=[0.6, 0.35, 0.05]),
        }
    )
    df["target"] = (df["x"] > 0.5).astype(np.int8)
    b = binarize(rd.from_pandas(df[["x", "cat"]]), n_bins=4).to_pandas()
    assert all(set(b[c].unique()) <= {0, 1} for c in b.columns)
    assert sum(c.startswith("x__") for c in b.columns) == 4
    b["target"] = df["target"].to_numpy()
    out = correlate(rd.from_pandas(b), "target")
    # top |corr| feature should be the highest x-bin
    top = out.iloc[0]["feature"]
    assert top.startswith("x__")
    # pearson against pandas oracle
    for _, row in out.iterrows():
        exp = b[row["feature"]].astype(float).corr(b["target"].astype(float))
        if np.isnan(exp):
            assert np.isnan(row["correlation"])
        else:
            np.testing.assert_allclose(row["correlation"], exp, rtol=1e-9)


def test_weighted_quantiles_bit_equal_numpy():
    # the distributed histogram quantile must reproduce np.nanquantile
    # bit-for-bit (bin edges decide bin membership at exact equality)
    from pytimetk_ray.ops.correlationfunnel import _weighted_np_quantiles

    rng = np.random.default_rng(9)
    qs = np.linspace(0, 1, 5)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        # heavy duplicates to stress the weighted order statistics
        v = rng.choice(rng.normal(size=max(1, n // 7)), size=n)
        vals, cnts = np.unique(v, return_counts=True)
        got = _weighted_np_quantiles(vals, cnts, qs)
        exp = np.nanquantile(v, qs)
        np.testing.assert_array_equal(
            got.view(np.uint64), exp.view(np.uint64), err_msg=f"trial {trial}")


def test_binarize_edges_match_full_collect():
    # distributed pre-pass edges == the old full-collect np.nanquantile path,
    # including NaN exclusion and categorical frequency thresholds
    rng = np.random.default_rng(4)
    n = 1000
    df = pd.DataFrame({
        "x": np.where(rng.random(n) < 0.1, np.nan, rng.normal(size=n)),
        "cat": rng.choice(["a", "b", "c", "d"], size=n, p=[0.5, 0.3, 0.19, 0.01]),
    })
    b = binarize(rd.from_pandas(df), n_bins=4, thresh_infreq=0.05).to_pandas()
    # infrequent level 'd' lumped into -OTHER
    assert "cat__d" not in b.columns and "cat__-OTHER" in b.columns
    # bins reproduce pd.cut over np.nanquantile edges on the full frame
    e = np.unique(np.nanquantile(df["x"].to_numpy(float), np.linspace(0, 1, 5)))
    cut = pd.cut(df["x"], bins=e, include_lowest=True, duplicates="drop")
    xcols = sorted(c for c in b.columns if c.startswith("x__"))
    assert len(xcols) == 4
    got_binned = b[xcols].to_numpy().argmax(axis=1)
    got_any = b[xcols].to_numpy().sum(axis=1)
    exp_codes = cut.cat.codes.to_numpy()
    mask = exp_codes >= 0
    # NaN rows one-hot to nothing; valid rows land in the same bin
    np.testing.assert_array_equal(got_any, (mask).astype(np.int64))
    sort_key = np.argsort([str(c) for c in cut.cat.categories])
    remap = np.empty(len(sort_key), dtype=np.int64)
    remap[sort_key] = np.arange(len(sort_key))
    np.testing.assert_array_equal(got_binned[mask], remap[exp_codes[mask]])


def test_hilbert(tsds, tsdf):
    out = augment_hilbert(tsds, ["g"], ["ts"], "v").to_pandas().sort_values(
        ["g", "ts"], ignore_index=True
    )
    o = tsdf.sort_values(["g", "ts"], ignore_index=True)
    a = hilbert_analytic(o[o["g"] == "a"]["v"].to_numpy())
    np.testing.assert_allclose(out[out["g"] == "a"]["v_hilbert_real"], a.real, atol=1e-9)
    np.testing.assert_allclose(out[out["g"] == "a"]["v_hilbert_imag"], a.imag, atol=1e-9)
    # analytic signal: real part == original series
    np.testing.assert_allclose(a.real, o[o["g"] == "a"]["v"], atol=1e-9)


def test_wavelet(tsds):
    out = augment_wavelet(tsds, ["g"], ["ts"], "v", scales=[2, 8]).to_pandas()
    for s in (2, 8):
        c = f"v_wavelet_morlet_scale_{s}"
        assert c in out.columns and np.isfinite(out[c]).all()


def test_holiday_signature():
    df = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-07-03", "2024-07-04", "2024-07-05", "2024-11-28"]).astype("datetime64[us]")}
    )
    out = augment_holiday_signature(rd.from_pandas(df), "ts", concurrency=1).to_pandas()
    out = out.sort_values("ts", ignore_index=True)
    assert out["is_holiday"].tolist() == [0, 1, 0, 1]
    assert out["before_holiday"].tolist() == [1, 0, 0, 0]
    assert out["after_holiday"].tolist() == [0, 0, 1, 0]
    assert out["holiday_name"].tolist()[1] == "Independence Day"
    assert out["holiday_name"].tolist()[3] == "Thanksgiving"
    # algorithmic calendar sanity
    hol2023 = us_federal_holidays(2023)
    assert hol2023[pd.Timestamp("2023-11-23").date()] == "Thanksgiving"


def test_cv_splits(tsds, tsdf):
    cv = TimeSeriesCV(frequency="D", train_size=60, forecast_horizon=14, stride=14)
    folds = list(cv.split(tsds, "ts"))
    assert len(folds) >= 2
    tr, te = folds[0]
    trp, tep = tr.to_pandas(), te.to_pandas()
    assert trp["ts"].max() < tep["ts"].min()
    assert len(trp) and len(tep)


def test_sequences():
    wd = make_weekday_sequence("2024-01-01", "2024-01-14")
    assert len(wd) == 10 and all(d.dayofweek < 5 for d in wd)
    we = make_weekend_sequence("2024-01-01", "2024-01-14")
    assert len(we) == 4
    fut = make_future_timeseries(pd.Series(pd.date_range("2024-01-01", periods=5, freq="D")), 3)
    assert list(fut) == list(pd.date_range("2024-01-06", periods=3, freq="D"))
    np.testing.assert_array_equal(week_of_month(["2024-01-01", "2024-01-08", "2024-01-31"]), [1, 2, 5])
