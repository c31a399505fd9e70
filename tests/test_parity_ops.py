"""Frequency inference, frame utils, spline basis, dedup components."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.ops.frame_utils import (
    ceil_date,
    drop_zero_variance,
    floor_date,
    glimpse,
    transform_columns,
)
from pytimetk_ray.ops.frequency import (
    get_frequency,
    get_frequency_summary,
    get_seasonal_frequency,
    get_trend_frequency,
    time_scale_template,
)
from pytimetk_ray.ops.spline import augment_spline, bspline_basis
from pytimetk_ray.pipelines.dedup import dedup_components


def test_frequency_inference():
    daily = pd.date_range("2024-01-01", periods=30, freq="D")
    s = get_frequency_summary(daily).iloc[0]
    assert s["freq_median_unit"] == "D" and abs(s["freq_median_scale"] - 1) < 1e-9
    assert get_frequency(daily) in ("D", "1D")
    assert get_seasonal_frequency(daily, numeric=True) == 7      # 1W of daily
    assert get_trend_frequency(daily, numeric=True) == 91        # 1Q of daily
    hourly = pd.date_range("2024-01-01", periods=100, freq="h")
    assert get_seasonal_frequency(hourly, numeric=True) == 24    # 1D of hourly
    t = time_scale_template()
    assert list(t.columns) == ["median_unit", "seasonal_period", "trend_period"]
    assert len(t) == 8


def test_floor_ceil_date():
    df = pd.DataFrame({"ts": pd.to_datetime(["2024-03-05 10:31:07"]).astype("datetime64[us]")})
    out = floor_date(rd.from_pandas(df), "ts", "1h", out_column="fl").to_pandas()
    assert out["fl"].iloc[0] == pd.Timestamp("2024-03-05 10:00:00")
    out = ceil_date(rd.from_pandas(df), "ts", "1h", out_column="ce").to_pandas()
    assert out["ce"].iloc[0] == pd.Timestamp("2024-03-05 11:00:00")


def test_glimpse_and_zero_variance():
    df = pd.DataFrame({"a": [1, 2, 3], "konst": ["x", "x", "x"], "b": [0.1, 0.2, 0.3]})
    s = glimpse(rd.from_pandas(df))
    assert "3 rows x 3 columns" in s and "$ a" in s
    out = drop_zero_variance(rd.from_pandas(df)).to_pandas()
    assert list(out.columns) == ["a", "b"]


def test_transform_columns():
    df = pd.DataFrame({"x": [1.0, 4.0], "y": [9.0, 16.0], "z": ["a", "b"]})
    from pytimetk_ray.selection import matches

    out = transform_columns(rd.from_pandas(df), matches("^[xy]$"), np.sqrt).to_pandas()
    out = out.sort_values("x", ignore_index=True)
    np.testing.assert_allclose(out["x"], [1, 2])
    np.testing.assert_allclose(out["y"], [3, 4])


def test_bspline_basis_partition_of_unity():
    x = np.linspace(0, 10, 200)
    knots = np.array([0, 2.5, 5.0, 7.5, 10])
    B = bspline_basis(x, knots, 3)
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-9)  # partition of unity
    assert (B >= -1e-12).all()


def test_augment_spline():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"v": rng.uniform(0, 100, 300)})
    out = augment_spline(rd.from_pandas(df), "v", df=5, degree=3).to_pandas()
    cols = [c for c in out.columns if c.startswith("v_spline_")]
    assert len(cols) == 5
    np.testing.assert_allclose(out[cols].sum(axis=1), 1.0, atol=1e-9)


def test_dedup_components():
    pairs = pd.DataFrame({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 21]})
    out = dedup_components(rd.from_pandas(pairs)).to_pandas().sort_values("doc_id")
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[1] == lab[2] == lab[3] == 1   # chain 1-2-3 collapses to min id
    assert lab[10] == lab[11] == 10
    assert lab[20] == lab[21] == 20
