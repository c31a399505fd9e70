"""augment_holiday_signature — is_holiday / before / after / holiday_name.

Reference: src/pytimetk/feature_engineering/holiday_signature.py:33-46
(signature) and :268-311 (build a holiday lookup then map;
``before_holiday`` / ``after_holiday`` are +/-1-day shifts of membership).

The reference uses the ``holidays`` package (not in this environment); a
built-in algorithmic US-federal calendar stands in, and any installed
``holidays`` package is used when present (import-try).  The calendar is an
ACTOR-POOL state: built once per worker in ``__init__`` (the reference
rebuilds it per call — SURVEY.md §2.2 maps that to actor state)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

import ray.data as rd


def _nth_weekday(year, month, weekday, n) -> dt.date:
    d = dt.date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return d + dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year, month, weekday) -> dt.date:
    if month == 12:
        d = dt.date(year, 12, 31)
    else:
        d = dt.date(year, month + 1, 1) - dt.timedelta(days=1)
    return d - dt.timedelta(days=(d.weekday() - weekday) % 7)


def us_federal_holidays(year: int) -> dict[dt.date, str]:
    """Algorithmic US federal holiday calendar (public rules)."""
    return {
        dt.date(year, 1, 1): "New Year's Day",
        _nth_weekday(year, 1, 0, 3): "Martin Luther King Jr. Day",
        _nth_weekday(year, 2, 0, 3): "Washington's Birthday",
        _last_weekday(year, 5, 0): "Memorial Day",
        dt.date(year, 6, 19): "Juneteenth National Independence Day",
        dt.date(year, 7, 4): "Independence Day",
        _nth_weekday(year, 9, 0, 1): "Labor Day",
        _nth_weekday(year, 10, 0, 2): "Columbus Day",
        dt.date(year, 11, 11): "Veterans Day",
        _nth_weekday(year, 11, 3, 4): "Thanksgiving",
        dt.date(year, 12, 25): "Christmas Day",
    }


class HolidayTagger:
    """Actor-pool stage: calendar built once per worker."""

    def __init__(self, date_column: str, country: str = "US",
                 years=range(1990, 2050)):
        self.date_column = date_column
        cal: dict[dt.date, str] = {}
        try:  # optional external package
            import holidays as _h

            cal = dict(_h.country_holidays(country, years=list(years)))
        except ImportError:
            if country != "US":
                raise NotImplementedError(
                    "only the built-in US calendar is available without the "
                    "'holidays' package"
                )
            for y in years:
                cal.update(us_federal_holidays(y))
        self.dates = pd.DatetimeIndex(sorted(cal)).values.astype("datetime64[D]")
        self.names = np.array([cal[d] for d in sorted(cal)], dtype=object)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        days = batch[self.date_column].to_numpy().astype("datetime64[D]")
        idx = np.searchsorted(self.dates, days)
        idx_c = np.clip(idx, 0, len(self.dates) - 1)
        is_hol = (self.dates[idx_c] == days).astype(np.uint8)
        before = np.isin(days + np.timedelta64(1, "D"), self.dates).astype(np.uint8)
        after = np.isin(days - np.timedelta64(1, "D"), self.dates).astype(np.uint8)
        batch["is_holiday"] = is_hol
        batch["before_holiday"] = before
        batch["after_holiday"] = after
        names = np.where(is_hol == 1, self.names[idx_c], None)
        batch["holiday_name"] = names
        return batch


def augment_holiday_signature(
    ds: rd.Dataset,
    date_column: str,
    *,
    country: str = "US",
    concurrency: int = 4,
) -> rd.Dataset:
    return ds.map_batches(
        HolidayTagger,
        fn_constructor_kwargs=dict(date_column=date_column, country=country),
        batch_format="pandas",
        concurrency=concurrency,
    )
