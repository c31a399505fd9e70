"""Frequency parsing and floor/ceil kernels vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from pytimetk_ray.freq import Freq, ceil_i64, floor_i64, parse_freq


def test_parse_aliases():
    assert parse_freq("D") == Freq(1, "D")
    assert parse_freq("3D") == Freq(3, "D")
    assert parse_freq("1min") == Freq(1, "min")
    assert parse_freq("T") == Freq(1, "min")
    assert parse_freq("h") == Freq(1, "h")
    assert parse_freq("H") == Freq(1, "h")
    assert parse_freq("M") == Freq(1, "M")
    assert parse_freq("MS") == Freq(1, "M")
    assert parse_freq("ME") == Freq(1, "M")
    assert parse_freq("Q") == Freq(1, "Q")
    assert parse_freq("Y") == Freq(1, "Y")
    assert parse_freq("W") == Freq(1, "W")
    assert parse_freq("15 minutes") == Freq(15, "min")
    assert parse_freq("3 months") == Freq(3, "M")


@pytest.mark.parametrize("freq,pandas_freq", [
    ("1min", "min"), ("5min", "5min"), ("h", "h"), ("D", "D"), ("W", "W-SUN"),
])
def test_floor_fixed_matches_pandas(freq, pandas_freq):
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2023-03-05 01:23:45").value
    ns = base + rng.integers(0, 90 * 86_400 * 10**9, size=500)
    idx = pd.DatetimeIndex(ns.astype("datetime64[ns]"))
    ours = floor_i64(ns, "ns", freq).astype("datetime64[ns]")
    if freq == "W":
        # pandas W floors to week *end*; our grid floors to Monday starts
        # (DuckDB date_trunc('week') semantics). Compare to period start.
        theirs = idx.to_period("W-SUN").start_time.values
    else:
        theirs = idx.floor(pandas_freq).values
    np.testing.assert_array_equal(ours, theirs)


def test_floor_calendar_matches_pandas():
    rng = np.random.default_rng(11)
    ns = pd.Timestamp("2019-06-15").value + rng.integers(0, 4 * 365 * 86_400 * 10**9, size=300)
    idx = pd.DatetimeIndex(ns.astype("datetime64[ns]"))
    np.testing.assert_array_equal(
        floor_i64(ns, "ns", "M").astype("datetime64[ns]"),
        idx.to_period("M").start_time.values,
    )
    np.testing.assert_array_equal(
        floor_i64(ns, "ns", "Q").astype("datetime64[ns]"),
        idx.to_period("Q").start_time.values,
    )
    np.testing.assert_array_equal(
        floor_i64(ns, "ns", "Y").astype("datetime64[ns]"),
        idx.to_period("Y").start_time.values,
    )


def test_floor_multi_month():
    ns = pd.DatetimeIndex(["2023-01-15", "2023-04-02", "2023-08-31", "2023-12-01"]).asi8
    out = floor_i64(ns, "ns", "3 months").astype("datetime64[ns]")
    exp = np.array(["2023-01-01", "2023-04-01", "2023-07-01", "2023-10-01"], dtype="datetime64[ns]")
    np.testing.assert_array_equal(out, exp)


def test_floor_us_unit():
    us = pd.DatetimeIndex(["2024-01-05 10:31:07.123456"]).as_unit("us").asi8
    out = floor_i64(us, "us", "1h").astype("datetime64[us]")
    assert out[0] == np.datetime64("2024-01-05T10:00:00", "us")


def test_ceil():
    ns = pd.DatetimeIndex(["2023-01-01 00:00:00", "2023-01-01 00:00:01"]).asi8
    out = ceil_i64(ns, "ns", "1min").astype("datetime64[ns]")
    assert out[0] == np.datetime64("2023-01-01T00:00:00", "ns")  # on-grid stays
    assert out[1] == np.datetime64("2023-01-01T00:01:00", "ns")
