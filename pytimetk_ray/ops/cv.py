"""TimeSeriesCV — expanding/rolling-origin time splits over a Dataset.

Reference: src/pytimetk/crossvalidation/time_series_cv.py:27-160 (params:
frequency / train_size / forecast_horizon / gap / stride / window) and the
sklearn-compatible splitter (:455-622).

Mapping (SURVEY.md §2.7): fold BOUNDARIES are computed driver-side from the
dataset's min/max timestamp (a tiny aggregate); each fold is a lazy
``filter_by_time`` VIEW of the Dataset — no data is materialized or copied
per fold, and each fold's pipeline streams independently."""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from pytimetk_ray.freq import parse_freq
from pytimetk_ray.ops.filter_by_time import filter_by_time


class TimeSeriesCV:
    """Rolling/expanding-origin splits in units of ``frequency``."""

    def __init__(self, frequency: str = "D", train_size: int = 30,
                 forecast_horizon: int = 7, gap: int = 0, stride: int | None = None,
                 window: str = "rolling"):
        self.freq = parse_freq(frequency)
        if self.freq.is_calendar:
            raise NotImplementedError("calendar-unit CV frequencies not supported")
        self.train_size = train_size
        self.forecast_horizon = forecast_horizon
        self.gap = gap
        self.stride = stride or forecast_horizon
        self.window = window

    def split_boundaries(self, start: pd.Timestamp, end: pd.Timestamp):
        """Yield (train_start, train_end, test_start, test_end) tuples."""
        step = pd.Timedelta(self.freq.step_ns(), unit="ns")
        t0 = pd.Timestamp(start)
        out = []
        train_start = t0
        while True:
            train_end = train_start + self.train_size * step
            test_start = train_end + self.gap * step
            test_end = test_start + self.forecast_horizon * step
            if test_end > pd.Timestamp(end) + step:
                break
            out.append((train_start, train_end, test_start, test_end))
            if self.window == "rolling":
                train_start = train_start + self.stride * step
            else:  # expanding: train_start fixed, grow train_size
                self.train_size += self.stride
        return out

    def split(self, ds: rd.Dataset, date_column: str):
        """Yield (train_ds, test_ds) lazy views per fold."""
        from ray.data.aggregate import Max, Min

        stats = ds.aggregate(Min(date_column), Max(date_column))
        start = stats[f"min({date_column})"]
        end = stats[f"max({date_column})"]
        for ts, te, vs, ve in self.split_boundaries(start, end):
            train = filter_by_time(ds, date_column, ts, te - pd.Timedelta("1us"))
            test = filter_by_time(ds, date_column, vs, ve - pd.Timedelta("1us"))
            yield train, test
