"""TimeSeriesCV — expanding/rolling-origin time splits over a Dataset, plus
the sklearn-compatible ``TimeSeriesCVSplitter``.

Reference: src/pytimetk/crossvalidation/time_series_cv.py:27-160 (params:
frequency / train_size / forecast_horizon / gap / stride / window / mode /
split_limit; the reference delegates split generation to the public
``timebasedcv`` package) and :455-622 (TimeSeriesCVSplitter yielding
(train_indices, test_indices) for sklearn CV search).

DOCUMENTED SEMANTICS (timebasedcv is not installed here; these are the
package's published interval rules re-stated precisely):
- every window is half-open ``[start, end)``;
- mode="forward": the first fold's train window starts at ``time_start``;
  folds advance by ``stride`` units; a fold is emitted while its test window
  fits inside ``[time_start, time_end)``;
- mode="backward" (the reference default): the LAST fold's test window ends
  exactly at ``time_end``; folds step backward by ``stride`` while the train
  window stays inside ``[time_start, time_end)``; folds are yielded in
  chronological order;
- ``window="expanding"`` pins train_start at ``time_start`` (train grows);
  ``train_size`` is then the MINIMUM number of train units;
- ``split_limit`` keeps the first N folds in GENERATION order (for backward
  mode these are the N latest folds), per the reference docstring.

Frequency accepts both this repo's aliases ("D", "1h", "15min") and the
reference's relativedelta unit names ("days", "hours", "weeks", "months",
"years"); calendar units step with pd.DateOffset (month/year arithmetic).

Mapping (SURVEY.md §2.7): fold BOUNDARIES are computed driver-side from the
dataset's min/max timestamp (a tiny aggregate); each fold is a lazy
``filter_by_time`` VIEW of the Dataset — no data is materialized or copied
per fold, and each fold's pipeline streams independently."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.freq import parse_freq
from pytimetk_ray.ops.filter_by_time import filter_by_time

_RELATIVEDELTA_UNITS = {
    "seconds": "s", "microseconds": "us", "milliseconds": "ms",
    "minutes": "min", "hours": "h", "days": "D", "weeks": "W",
}
_CAL_UNITS = {"months": "months", "years": "years"}
_EPS = pd.Timedelta("1us")


def _offset_fn(frequency: str):
    """Return k -> offset covering both fixed-width and calendar units."""
    f = frequency.strip().lower()
    if f in _CAL_UNITS:
        kw = _CAL_UNITS[f]
        return lambda k: pd.DateOffset(**{kw: int(k)})
    f = _RELATIVEDELTA_UNITS.get(f, frequency)
    pf = parse_freq(f)
    if pf.is_calendar:
        months = {"M": 1, "Q": 3, "Y": 12}[pf.unit] * pf.n
        return lambda k: pd.DateOffset(months=months * int(k))
    step = pd.Timedelta(pf.step_ns(), unit="ns")
    return lambda k: step * int(k)


class TimeSeriesCV:
    """Rolling/expanding-origin splits in units of ``frequency``."""

    def __init__(self, frequency: str = "D", train_size: int = 30,
                 forecast_horizon: int = 7, gap: int = 0,
                 stride: int | None = None, window: str = "rolling",
                 mode: str = "backward", split_limit: int | None = None):
        if window not in ("rolling", "expanding"):
            raise ValueError("window must be 'rolling' or 'expanding'")
        if mode not in ("forward", "backward"):
            raise ValueError("mode must be 'forward' or 'backward'")
        for name, v in (("train_size", train_size),
                        ("forecast_horizon", forecast_horizon), ("gap", gap)):
            if int(v) != v or (v <= 0 and name != "gap") or v < 0:
                raise ValueError(f"{name} must be a non-negative int, got {v!r}")
        self.off = _offset_fn(frequency)
        self.train_size = int(train_size)
        self.forecast_horizon = int(forecast_horizon)
        self.gap = int(gap)
        self.stride = int(stride) if stride else int(forecast_horizon)
        self.window = window
        self.mode = mode
        self.split_limit = split_limit

    def split_boundaries(self, start, end):
        """(train_start, train_end, test_start, test_end) per fold, in
        CHRONOLOGICAL order; windows are half-open ``[start, end)`` against
        an overall span ``[start, end]`` (both observed timestamps)."""
        t0 = pd.Timestamp(start)
        t_end = pd.Timestamp(end) + _EPS  # include the last observation
        off = self.off
        out = []
        k = 0
        if self.mode == "forward":
            while True:
                if self.window == "rolling":
                    tr_s = t0 + off(self.stride * k)
                    tr_e = tr_s + off(self.train_size)
                else:
                    tr_s = t0
                    tr_e = t0 + off(self.train_size + self.stride * k)
                te_s = tr_e + off(self.gap) if self.gap else tr_e
                te_e = te_s + off(self.forecast_horizon)
                if te_e > t_end:
                    break
                out.append((tr_s, tr_e, te_s, te_e))
                k += 1
        else:  # backward: last test window ends exactly at the data end
            while True:
                te_e = t_end - off(self.stride * k) if k else t_end
                te_s = te_e - off(self.forecast_horizon)
                tr_e = te_s - off(self.gap) if self.gap else te_s
                tr_s = (tr_e - off(self.train_size)
                        if self.window == "rolling" else t0)
                if tr_s < t0 or (self.window == "expanding"
                                 and tr_e - off(self.train_size) < t0):
                    break
                out.append((tr_s, tr_e, te_s, te_e))
                k += 1
        if self.split_limit is not None:
            out = out[: self.split_limit]
        if self.mode == "backward":
            out = out[::-1]
        return out

    def split(self, ds: rd.Dataset, date_column: str):
        """Yield (train_ds, test_ds) lazy views per fold."""
        from ray.data.aggregate import Max, Min

        stats = ds.aggregate(Min(date_column), Max(date_column))
        start = stats[f"min({date_column})"]
        end = stats[f"max({date_column})"]
        for ts, te, vs, ve in self.split_boundaries(start, end):
            train = filter_by_time(ds, date_column, ts, te - _EPS)
            test = filter_by_time(ds, date_column, vs, ve - _EPS)
            yield train, test


class TimeSeriesCVSplitter:
    """sklearn-compatible cross-validator (reference
    time_series_cv.py:455-622): yields (train_indices, test_indices) numpy
    arrays over a provided ``time_series``; duck-types the
    ``BaseCrossValidator`` interface (split / get_n_splits) so it plugs into
    sklearn model-selection searches without importing sklearn here."""

    def __init__(self, *, frequency: str, train_size: int,
                 forecast_horizon: int, time_series, gap: int = 0,
                 stride: int | None = None, window: str = "rolling",
                 mode: str = "backward", start_dt=None, end_dt=None,
                 split_limit: int | None = None):
        self.splitter = TimeSeriesCV(
            frequency=frequency, train_size=train_size,
            forecast_horizon=forecast_horizon, gap=gap, stride=stride,
            window=window, mode=mode, split_limit=split_limit)
        self.time_series_ = pd.to_datetime(pd.Series(time_series))
        self.start_dt_ = start_dt
        self.end_dt_ = end_dt
        self.size_ = len(self.time_series_)
        self.n_splits = self._compute_n_splits()

    def _boundaries(self):
        start = self.start_dt_ or self.time_series_.min()
        end = self.end_dt_ or self.time_series_.max()
        return self.splitter.split_boundaries(start, end)

    def _compute_n_splits(self) -> int:
        return len(self._boundaries())

    def split(self, X=None, y=None, groups=None):
        self._validate(X, y, groups)
        ts = self.time_series_.to_numpy()
        idx = np.arange(self.size_)
        for tr_s, tr_e, te_s, te_e in self._boundaries():
            train_mask = (ts >= np.datetime64(tr_s)) & (ts < np.datetime64(tr_e))
            test_mask = (ts >= np.datetime64(te_s)) & (ts < np.datetime64(te_e))
            yield idx[train_mask], idx[test_mask]

    def get_n_splits(self, X=None, y=None, groups=None) -> int:
        return self.n_splits

    def _validate(self, X, y, groups):
        for name, arr in (("X", X), ("y", y), ("groups", groups)):
            if arr is not None and len(arr) != self.size_:
                raise ValueError(
                    f"{name} has {len(arr)} rows but time_series has "
                    f"{self.size_}")
