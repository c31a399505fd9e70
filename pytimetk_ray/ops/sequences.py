"""Date-sequence generators + small date utilities.

Reference: src/pytimetk/core/make_timeseries_sequence.py:68-255
(make_weekday_sequence / make_weekend_sequence with optional Fri-Sat weekend
convention), make_future_timeseries.py:12-146, and
utils/datetime_helpers.py ``week_of_month`` (:650-750, ``(day-1)//7+1``).

Driver-side generators (tiny outputs); wrap in ``ray.data.from_pandas`` if a
Dataset is needed."""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_weekday_sequence(start_date, end_date, *, friday_saturday_weekend: bool = False) -> pd.Series:
    """All weekdays in [start, end]; weekend = Sat/Sun (or Fri/Sat)."""
    days = pd.date_range(start_date, end_date, freq="D")
    weekend = {4, 5} if friday_saturday_weekend else {5, 6}
    return pd.Series([d for d in days if d.dayofweek not in weekend], name="date")


def make_weekend_sequence(start_date, end_date, *, friday_saturday_weekend: bool = False) -> pd.Series:
    days = pd.date_range(start_date, end_date, freq="D")
    weekend = {4, 5} if friday_saturday_weekend else {5, 6}
    return pd.Series([d for d in days if d.dayofweek in weekend], name="date")


def make_future_timeseries(idx: pd.Series, length_out: int, freq: str | None = None) -> pd.Series:
    """Future timestamps after the series' last value (reference core:
    ``date_range(start=last, periods=n+1)[1:]``)."""
    idx = pd.Series(pd.to_datetime(idx)).sort_values()
    if freq is None:
        freq = pd.infer_freq(idx) or pd.Timedelta(idx.diff().median())
    out = pd.date_range(start=idx.iloc[-1], periods=length_out + 1, freq=freq)[1:]
    return pd.Series(out, name=idx.name)


def week_of_month(dates) -> np.ndarray:
    """``(day - 1) // 7 + 1``."""
    d = pd.to_datetime(pd.Series(dates))
    return ((d.dt.day - 1) // 7 + 1).to_numpy()
