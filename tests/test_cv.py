"""TimeSeriesCV modes/windows/calendar units + sklearn-style splitter,
against hand-derived fold boundaries (half-open [start, end) windows)."""

import numpy as np
import pandas as pd
import pytest

from pytimetk_ray.ops.cv import TimeSeriesCV, TimeSeriesCVSplitter

EPS = pd.Timedelta("1us")
JAN1, JAN31 = pd.Timestamp("2023-01-01"), pd.Timestamp("2023-01-31")


def test_backward_rolling_hand_derived():
    cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=5)
    b = cv.split_boundaries(JAN1, JAN31)
    # te_e anchors at Jan31+1us, steps back 5d (stride = horizon);
    # 4 folds fit (train_start of the 5th would be Dec 27)
    assert len(b) == 4
    tr_s, tr_e, te_s, te_e = b[-1]  # chronological order: last = anchored
    assert te_e == JAN31 + EPS
    assert te_s == te_e - pd.Timedelta("5D")
    assert tr_e == te_s and tr_s == tr_e - pd.Timedelta("10D")
    # earliest fold: shifted back 3 strides
    assert b[0][0] == tr_s - pd.Timedelta("15D")
    assert b[0][0] >= JAN1


def test_forward_rolling_hand_derived():
    cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=5,
                      mode="forward")
    b = cv.split_boundaries(JAN1, JAN31)
    assert b[0][0] == JAN1
    assert b[0][1] == JAN1 + pd.Timedelta("10D")
    assert b[0][3] == JAN1 + pd.Timedelta("15D")
    # folds advance 5d; test_end must stay <= Jan31+1us -> 4 folds
    assert len(b) == 4
    assert b[-1][3] <= JAN31 + EPS


def test_expanding_window():
    cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=5,
                      window="expanding", mode="forward")
    b = cv.split_boundaries(JAN1, JAN31)
    # train always starts at Jan 1 and grows by stride
    assert all(f[0] == JAN1 for f in b)
    sizes = [(f[1] - f[0]).days for f in b]
    assert sizes == [10, 15, 20, 25]
    # backward expanding: train start pinned, min size enforced
    cvb = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=5,
                       window="expanding")
    bb = cvb.split_boundaries(JAN1, JAN31)
    assert all(f[0] == JAN1 for f in bb)
    assert all((f[1] - f[0]) >= pd.Timedelta("10D") for f in bb)


def test_gap_and_stride():
    cv = TimeSeriesCV(frequency="D", train_size=7, forecast_horizon=3, gap=2,
                      stride=1, mode="forward")
    b = cv.split_boundaries(JAN1, JAN31)
    tr_s, tr_e, te_s, te_e = b[0]
    assert te_s - tr_e == pd.Timedelta("2D")
    assert b[1][0] - b[0][0] == pd.Timedelta("1D")


def test_split_limit_keeps_latest_in_backward():
    cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=5,
                      split_limit=2)
    b = cv.split_boundaries(JAN1, JAN31)
    assert len(b) == 2
    # generation order is backward, so the kept folds are the 2 LATEST
    assert b[-1][3] == JAN31 + EPS


def test_calendar_month_frequency():
    cv = TimeSeriesCV(frequency="months", train_size=6, forecast_horizon=2,
                      stride=2, mode="forward")
    b = cv.split_boundaries(pd.Timestamp("2022-01-15"),
                            pd.Timestamp("2023-12-15"))
    tr_s, tr_e, te_s, te_e = b[0]
    assert tr_e == pd.Timestamp("2022-07-15")   # +6 calendar months
    assert te_e == pd.Timestamp("2022-09-15")
    # month-end clamping is pandas DateOffset semantics
    cv2 = TimeSeriesCV(frequency="months", train_size=1, forecast_horizon=1,
                       mode="forward")
    b2 = cv2.split_boundaries(pd.Timestamp("2023-01-31"),
                              pd.Timestamp("2023-06-30"))
    assert b2[0][1] == pd.Timestamp("2023-02-28")


def test_relativedelta_unit_names():
    a = TimeSeriesCV(frequency="days", train_size=5, forecast_horizon=2)
    d = TimeSeriesCV(frequency="D", train_size=5, forecast_horizon=2)
    assert a.split_boundaries(JAN1, JAN31) == d.split_boundaries(JAN1, JAN31)


def test_invalid_params():
    with pytest.raises(ValueError):
        TimeSeriesCV(window="sliding")
    with pytest.raises(ValueError):
        TimeSeriesCV(mode="sideways")
    with pytest.raises(ValueError):
        TimeSeriesCV(train_size=0)


def test_splitter_indices():
    ts = pd.Series(pd.date_range(JAN1, JAN31, freq="D"))
    cv = TimeSeriesCVSplitter(frequency="days", train_size=14,
                              forecast_horizon=7, time_series=ts, stride=1,
                              window="rolling")
    splits = list(cv.split())
    assert cv.get_n_splits() == len(splits) > 0
    for tr_idx, te_idx in splits:
        assert len(tr_idx) == 14 and len(te_idx) == 7
        assert tr_idx.max() < te_idx.min()        # train strictly before test
        assert not np.intersect1d(tr_idx, te_idx).size
    # last fold's test ends at the series end (backward default)
    assert splits[-1][1][-1] == len(ts) - 1


def test_splitter_validates_lengths():
    ts = pd.Series(pd.date_range(JAN1, JAN31, freq="D"))
    cv = TimeSeriesCVSplitter(frequency="days", train_size=14,
                              forecast_horizon=7, time_series=ts)
    with pytest.raises(ValueError):
        list(cv.split(X=np.zeros((5, 2))))
