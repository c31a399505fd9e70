"""Dataset operators vs single-process pandas oracles (the reference's test
contract: parallel output must equal sequential pandas semantics —
/root/reference/tests/conftest.py stubs Ray the same way)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import pytimetk_ray as tk


@pytest.fixture(scope="module")
def frame() -> pd.DataFrame:
    rng = np.random.default_rng(42)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for g in range(7):
        n = int(rng.integers(5, 60))
        gaps = rng.integers(1, 5000, size=n).cumsum()
        ts = t0 + pd.to_timedelta(gaps, unit="s")
        vals = rng.normal(100, 20, size=n)
        for i in range(n):
            rows.append({"g": f"g{g}", "ts": ts[i], "v": vals[i]})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df.sample(frac=1.0, random_state=1).reset_index(drop=True)  # shuffled input


@pytest.fixture(scope="module")
def ds(frame):
    return rd.from_pandas(frame)


def sortby(df, cols):
    return df.sort_values(cols, ignore_index=True)


def test_summarize_by_time(ds, frame):
    out = tk.summarize_by_time(
        ds, "ts", "v", freq="1h", agg_func=["sum", "count", "min", "max"], by=["g"]
    ).to_pandas()
    oracle = (
        frame.set_index("ts")
        .groupby("g")
        .resample("1h")["v"]
        .agg(["sum", "count", "min", "max"])
        .dropna(subset=["min"])  # resample emits empty buckets; our engine doesn't
        .reset_index()
        .rename(columns={"ts": "bucket_ts", "sum": "v_sum", "count": "v_count",
                         "min": "v_min", "max": "v_max"})
    )
    out = sortby(out, ["g", "bucket_ts"])
    oracle = sortby(oracle, ["g", "bucket_ts"])
    assert len(out) == len(oracle)
    np.testing.assert_array_equal(out["g"], oracle["g"])
    np.testing.assert_array_equal(
        out["bucket_ts"].astype("datetime64[us]"), oracle["bucket_ts"].astype("datetime64[us]")
    )
    np.testing.assert_allclose(out["v_sum"], oracle["v_sum"], rtol=1e-12)
    np.testing.assert_array_equal(out["v_count"], oracle["v_count"])
    np.testing.assert_array_equal(out["v_min"], oracle["v_min"])
    np.testing.assert_array_equal(out["v_max"], oracle["v_max"])


def test_lags_leads_diffs(ds, frame):
    out = tk.augment_lags(ds, ["g"], ["ts"], "v", lags=2).to_pandas()
    out = tk.augment_leads(rd.from_pandas(out), ["g"], ["ts"], "v", leads=1).to_pandas()
    out = tk.augment_diffs(rd.from_pandas(out), ["g"], ["ts"], "v", periods=1).to_pandas()
    out = sortby(out, ["g", "ts"])
    o = sortby(frame, ["g", "ts"])
    gb = o.groupby("g", sort=False)["v"]
    for k in (1, 2):
        np.testing.assert_allclose(out[f"v_lag_{k}"], gb.shift(k), equal_nan=True)
    np.testing.assert_allclose(out["v_lead_1"], gb.shift(-1), equal_nan=True)
    np.testing.assert_allclose(out["v_diff_1"], gb.diff(1), equal_nan=True)


def test_rolling(ds, frame):
    out = tk.augment_rolling(
        ds, ["g"], ["ts"], "v", window=4, window_func=["mean", "sum", "std"]
    ).to_pandas()
    out = sortby(out, ["g", "ts"])
    o = sortby(frame, ["g", "ts"])
    roll = o.groupby("g", sort=False)["v"].rolling(4, min_periods=4)
    np.testing.assert_allclose(
        out["v_rolling_mean_win_4"], roll.mean().reset_index(drop=True), equal_nan=True
    )
    np.testing.assert_allclose(
        out["v_rolling_sum_win_4"], roll.sum().reset_index(drop=True), equal_nan=True
    )
    np.testing.assert_allclose(
        out["v_rolling_std_win_4"], roll.std().reset_index(drop=True), equal_nan=True
    )


def test_expanding(ds, frame):
    out = tk.augment_expanding(
        ds, ["g"], ["ts"], "v", window_func=["sum", "max", "count", "mean"]
    ).to_pandas()
    out = sortby(out, ["g", "ts"])
    o = sortby(frame, ["g", "ts"])
    g = o.groupby("g", sort=False)["v"]
    np.testing.assert_allclose(out["v_expanding_sum"], g.cumsum(), rtol=1e-12)
    np.testing.assert_allclose(out["v_expanding_max"], g.cummax())
    np.testing.assert_array_equal(out["v_expanding_count"], g.cumcount() + 1)
    np.testing.assert_allclose(
        out["v_expanding_mean"],
        g.expanding(1).mean().reset_index(drop=True),
        rtol=1e-12,
    )


def test_ewm(ds, frame):
    out = tk.augment_ewm(ds, ["g"], ["ts"], "v", window_func="mean", alpha=0.3).to_pandas()
    assert "v_ewm_mean_alpha_0.3" in out.columns
    out = sortby(out, ["g", "ts"])
    o = sortby(frame, ["g", "ts"])
    oracle = o.groupby("g", sort=False)["v"].ewm(alpha=0.3, adjust=True).mean()
    np.testing.assert_allclose(
        out["v_ewm_mean_alpha_0.3"], oracle.reset_index(drop=True), rtol=1e-12
    )


def test_pad_by_time(ds, frame):
    out = tk.pad_by_time(ds, "ts", freq="1h", by=["g"], fillna=None).to_pandas()
    # oracle: per-group reindex onto date_range(min,max,freq)
    frames = []
    for g, gdf in frame.sort_values(["g", "ts"]).groupby("g"):
        grid = pd.date_range(gdf["ts"].min(), gdf["ts"].max(), freq="1h")
        padded = gdf.set_index("ts").reindex(grid).reset_index().rename(columns={"index": "ts"})
        padded["g"] = g
        frames.append(padded[["g", "ts", "v"]])
    oracle = pd.concat(frames, ignore_index=True)
    out = sortby(out, ["g", "ts"])[["g", "ts", "v"]]
    oracle = sortby(oracle, ["g", "ts"])
    assert len(out) == len(oracle)
    np.testing.assert_array_equal(out["g"], oracle["g"])
    np.testing.assert_array_equal(
        out["ts"].astype("datetime64[us]"), oracle["ts"].astype("datetime64[us]")
    )
    np.testing.assert_allclose(out["v"], oracle["v"], equal_nan=True)


def test_pad_fillna_and_constant_ffill(ds, frame):
    df = pd.DataFrame(
        {
            "g": ["a"] * 3 + ["b"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-05", "2024-02-01", "2024-02-03"]
            ).astype("datetime64[us]"),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
            "label": ["x", "x", "x", "y", "y"],  # constant per group
        }
    )
    out = tk.pad_by_time(rd.from_pandas(df), "ts", freq="D", by=["g"]).to_pandas()
    out = sortby(out, ["g", "ts"])
    assert len(out) == 5 + 3  # a: 5 days, b: 3 days
    assert out["label"].tolist() == ["x"] * 5 + ["y"] * 3  # constant col ffilled
    assert out["v"].isna().sum() == 3  # non-constant col stays NaN
    out2 = tk.pad_by_time(rd.from_pandas(df), "ts", freq="D", by=["g"], fillna=0).to_pandas()
    assert out2["v"].isna().sum() == 0


def test_filter_by_time(ds, frame):
    out = tk.filter_by_time(ds, "ts", "2024-01-01", "2024-01-01").to_pandas()
    oracle = frame[
        (frame["ts"] >= pd.Timestamp("2024-01-01"))
        & (frame["ts"] <= pd.Timestamp("2024-01-01 23:59:59.999999"))
    ]
    assert len(out) == len(oracle)


def test_ts_summary(ds, frame):
    out = tk.ts_summary(ds, "ts", by=["g"]).to_pandas()
    assert len(out) == frame["g"].nunique()
    out = sortby(out, ["g"])
    o = frame.sort_values(["g", "ts"])
    oracle_n = o.groupby("g")["ts"].count()
    np.testing.assert_array_equal(out["date_n"], oracle_n.to_numpy())
    med = o.groupby("g")["ts"].apply(lambda s: s.diff().dt.total_seconds().median())
    np.testing.assert_allclose(out["diff_median_s"], med.to_numpy())


def test_future_frame(ds, frame):
    out = tk.future_frame(ds, "ts", by=["g"], length_out=3, freq="1h", bind_data=False).to_pandas()
    assert len(out) == frame["g"].nunique() * 3
    out = sortby(out, ["g", "ts"])
    last = frame.groupby("g")["ts"].max()
    first_future = out.groupby("g")["ts"].min()
    np.testing.assert_array_equal(
        first_future.to_numpy(), (last + pd.Timedelta("1h")).to_numpy()
    )


def test_signature(ds, frame):
    out = tk.augment_timeseries_signature(ds, "ts").to_pandas()
    assert out.shape[1] == frame.shape[1] + 29
    row = out.iloc[0]
    t = pd.Timestamp(row["ts"])
    assert row["ts_year"] == t.year
    assert row["ts_wday"] == t.dayofweek + 1
    assert row["ts_weekend"] == (1 if t.dayofweek > 5 else 0)
    assert row["ts_am_pm"] == ("am" if t.hour <= 12 else "pm")


def test_apply_by_time(ds, frame):
    out = tk.apply_by_time(
        ds, "ts", freq="D", by=["g"], v_range=lambda df: df["v"].max() - df["v"].min()
    ).to_pandas()
    oracle = (
        frame.set_index("ts").groupby("g").resample("D")["v"].agg(lambda s: s.max() - s.min())
        .dropna().reset_index()
    )
    assert len(out) == len(oracle)
    out = sortby(out, ["g", "bucket_ts"])
    np.testing.assert_allclose(out["v_range"], oracle.sort_values(["g", "ts"])["v"], rtol=1e-12)


def test_anomalize_smoke(ds, frame):
    out = tk.anomalize(ds, "ts", "v", by=["g"], period=4, trend=8).to_pandas()
    assert len(out) == len(frame)
    for c in ["observed", "seasonal", "seasadj", "trend", "remainder", "anomaly",
              "anomaly_score", "anomaly_direction", "recomposed_l1", "recomposed_l2",
              "observed_clean"]:
        assert c in out.columns
    assert set(out["anomaly"].unique()) <= {"Yes", "No"}
    # recompose identity: observed == seasonal + seasadj? no — seasadj = observed - seasonal
    np.testing.assert_allclose(out["observed"], out["seasonal"] + out["seasadj"], rtol=1e-9)


def test_fourier(ds, frame):
    out = tk.augment_fourier(ds, ["g"], "ts", periods=7, max_order=2).to_pandas()
    for k in (1, 2):
        assert f"ts_sin_{k}_7" in out.columns and f"ts_cos_{k}_7" in out.columns
    v = out[[f"ts_sin_1_7", f"ts_cos_1_7"]].to_numpy()
    np.testing.assert_allclose((v ** 2).sum(axis=1), 1.0, rtol=1e-9)


def test_summarize_wide_format(ds, frame):
    wide = tk.summarize_by_time(
        ds, "ts", "v", freq="D", agg_func="sum", by=["g"], wide_format=True, fillna=0
    )
    assert isinstance(wide, pd.DataFrame)
    assert "bucket_ts" in wide.columns
    value_cols = [c for c in wide.columns if c != "bucket_ts"]
    assert len(value_cols) == frame["g"].nunique()
    # total mass preserved
    np.testing.assert_allclose(wide[value_cols].to_numpy().sum(), frame["v"].sum(), rtol=1e-9)
