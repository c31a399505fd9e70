"""Parameter-variant coverage: window specs, decay variants, granularity
expansion, lambda window funcs, one-hot options."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import pytimetk_ray as tk


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(21)
    frames = []
    for g in ["a", "b"]:
        ts = pd.date_range("2023-06-01", periods=50, freq="6h").astype("datetime64[us]")
        frames.append(pd.DataFrame({"g": g, "ts": ts, "v": rng.normal(10, 2, 50)}))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def ds(frame):
    return rd.from_pandas(frame)


def test_lags_range_and_list_specs(ds, frame):
    # int n -> lags 1..n (reference lag expansion)
    out = tk.augment_lags(ds, ["g"], ["ts"], "v", lags=3).to_pandas()
    for k in (1, 2, 3):
        assert f"v_lag_{k}" in out.columns
    # tuple -> inclusive range; list -> explicit
    out = tk.augment_lags(ds, ["g"], ["ts"], "v", lags=(2, 4)).to_pandas()
    assert {"v_lag_2", "v_lag_3", "v_lag_4"} <= set(out.columns)
    out = tk.augment_leads(ds, ["g"], ["ts"], "v", leads=[1, 5]).to_pandas()
    assert {"v_lead_1", "v_lead_5"} <= set(out.columns)


def test_rolling_center_and_min_periods(ds, frame):
    out = tk.augment_rolling(
        ds, ["g"], ["ts"], "v", window=5, window_func="mean", center=True, min_periods=1
    ).to_pandas().sort_values(["g", "ts"], ignore_index=True)
    o = frame.sort_values(["g", "ts"], ignore_index=True)
    exp = (
        o.groupby("g", sort=False)["v"]
        .rolling(5, min_periods=1, center=True)
        .mean()
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["v_rolling_mean_win_5"], exp, rtol=1e-10)


def test_rolling_tuple_windows_and_lambda(ds, frame):
    out = tk.augment_rolling(
        ds, ["g"], ["ts"], "v", window=(2, 3),
        window_func=[("range", lambda x: x.max() - x.min())],
    ).to_pandas().sort_values(["g", "ts"], ignore_index=True)
    assert {"v_rolling_range_win_2", "v_rolling_range_win_3"} <= set(out.columns)
    o = frame.sort_values(["g", "ts"], ignore_index=True)
    exp = (
        o.groupby("g", sort=False)["v"].rolling(3)
        .apply(lambda x: x.max() - x.min(), raw=True)
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["v_rolling_range_win_3"], exp, rtol=1e-10, equal_nan=True)


def test_expanding_quantile_naming(ds):
    out = tk.augment_expanding(
        ds, ["g"], ["ts"], "v", window_func="quantile", quantile=0.25
    ).to_pandas()
    assert "v_expanding_quantile_25" in out.columns


def test_ewm_decay_variants(ds, frame):
    for label, val in (("com", 2.0), ("halflife", 3.0)):
        out = tk.augment_ewm(
            ds, ["g"], ["ts"], "v", window_func="mean", **{label: val}
        ).to_pandas().sort_values(["g", "ts"], ignore_index=True)
        col = f"v_ewm_mean_{label}_{val}"
        assert col in out.columns
        o = frame.sort_values(["g", "ts"], ignore_index=True)
        exp = o.groupby("g", sort=False)["v"].ewm(**{label: val}, adjust=True).mean()
        np.testing.assert_allclose(out[col], exp.reset_index(drop=True), rtol=1e-10)
    with pytest.raises(ValueError):
        tk.augment_ewm(ds, ["g"], ["ts"], "v", alpha=0.2, span=3)


def test_filter_granularity_expansion(ds, frame):
    # month-granularity end date expands to end-of-month
    out = tk.filter_by_time(ds, "ts", end_date="2023-06").to_pandas()
    assert out["ts"].max() <= pd.Timestamp("2023-06-30 23:59:59.999999")
    assert len(out) == (frame["ts"] <= pd.Timestamp("2023-06-30 23:59:59.999999")).sum()
    # year granularity keeps everything in 2023
    out = tk.filter_by_time(ds, "ts", "2023", "2023").to_pandas()
    assert len(out) == len(frame)


def test_diffs_multi_and_pct(ds, frame):
    out = tk.augment_diffs(ds, ["g"], ["ts"], "v", periods=[1, 3]).to_pandas()
    assert {"v_diff_1", "v_diff_3"} <= set(out.columns)
    out = tk.augment_pct_change(ds, ["g"], ["ts"], "v", periods=2).to_pandas()
    out = out.sort_values(["g", "ts"], ignore_index=True)
    o = frame.sort_values(["g", "ts"], ignore_index=True)
    exp = o.groupby("g", sort=False)["v"].pct_change(2, fill_method=None)
    np.testing.assert_allclose(out["v_pctdiff_2"], exp, rtol=1e-10, equal_nan=True)


def test_summarize_multi_value_columns(ds, frame):
    df2 = frame.assign(w=frame["v"] * 2)
    out = tk.summarize_by_time(
        rd.from_pandas(df2), "ts", ["v", "w"], freq="D", agg_func=["sum", "median"],
        by=["g"],
    ).to_pandas()
    for c in ("v_sum", "v_median", "w_sum", "w_median"):
        assert c in out.columns
    out = out.sort_values(["g", "bucket_ts"], ignore_index=True)
    np.testing.assert_allclose(out["w_sum"], 2 * out["v_sum"], rtol=1e-12)


def test_duration_string_lags(ds, frame):
    # 6h spacing: "1 day" resolves to 4 periods
    out = tk.augment_lags(ds, ["g"], ["ts"], "v", lags="1 day").to_pandas()
    assert "v_lag_4" in out.columns
    out = out.sort_values(["g", "ts"], ignore_index=True)
    o = frame.sort_values(["g", "ts"], ignore_index=True)
    exp = o.groupby("g", sort=False)["v"].shift(4)
    np.testing.assert_allclose(out["v_lag_4"], exp, equal_nan=True)


def test_anomalize_bind_data(ds, frame):
    out = tk.anomalize(ds, "ts", "v", by=["g"], period=4, trend=8, bind_data=True).to_pandas()
    assert len(out) == len(frame)
    # original columns preserved alongside diagnostics
    for c in ("g", "ts", "v", "observed", "anomaly", "observed_clean"):
        assert c in out.columns
    out = out.sort_values(["g", "ts"], ignore_index=True)
    np.testing.assert_allclose(out["v"], out["observed"], rtol=1e-12)


def test_augment_sessions(ds, frame):
    # 6h spacing with gap=7h -> every row same session; gap=3h -> each its own
    out = tk.augment_sessions(ds, ["g"], "ts", gap="7 hours").to_pandas()
    assert (out.groupby("g")["session_id"].nunique() == 1).all()
    out = tk.augment_sessions(ds, ["g"], "ts", gap="3 hours").to_pandas()
    out = out.sort_values(["g", "ts"], ignore_index=True)
    assert (out.groupby("g")["session_id"].nunique() == 50).all()
    np.testing.assert_array_equal(
        out[out["g"] == "a"]["session_id"].to_numpy(), np.arange(50)
    )
