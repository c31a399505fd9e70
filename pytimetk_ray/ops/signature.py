"""augment_timeseries_signature — 29 calendar features per timestamp.

Reference: src/pytimetk/feature_engineering/timeseries_signature.py:312-380.
The reference's pandas quirks are part of the observable contract and are
reproduced deliberately, not fixed:

- ``{d}_index_num`` = epoch **seconds** (ns // 10**9, :317)
- ``{d}_weekend`` = ``dayofweek > 5`` — i.e. only Sunday counts (:359-360)
- ``{d}_am_pm`` = ``"am" if hour <= 12`` (:377-379)
- ``{d}_wday`` = ``dayofweek + 1`` (Monday=1), ``{d}_mweek`` = ``(day-1)//7+1``

Execution: the canonical stateless per-batch projection — group-independent,
no shuffle, runs in ``map_batches(batch_format="pandas")`` where every
feature is a vectorized ``.dt`` accessor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

SIGNATURE_SUFFIXES = [
    "index_num", "year", "year_iso", "yearstart", "yearend", "leapyear",
    "half", "quarter", "quarteryear", "quarterstart", "quarterend",
    "month", "month_lbl", "monthstart", "monthend", "yweek", "mweek",
    "wday", "wday_lbl", "mday", "qday", "yday", "weekend",
    "hour", "minute", "second", "msecond", "nsecond", "am_pm",
]


def get_timeseries_signature(batch: pd.DataFrame, date_column: str) -> pd.DataFrame:
    d = date_column
    idx = pd.to_datetime(batch[d])
    ns = idx.astype("datetime64[ns]").astype(np.int64)
    batch[f"{d}_index_num"] = ns // 10**9
    batch[f"{d}_year"] = idx.dt.year
    batch[f"{d}_year_iso"] = idx.dt.isocalendar().year.astype(np.int64)
    batch[f"{d}_yearstart"] = idx.dt.is_year_start.astype(np.uint8)
    batch[f"{d}_yearend"] = idx.dt.is_year_end.astype(np.uint8)
    batch[f"{d}_leapyear"] = idx.dt.is_leap_year.astype(np.uint8)
    q = idx.dt.quarter
    batch[f"{d}_half"] = np.where(q <= 2, 1, 2)
    batch[f"{d}_quarter"] = q
    batch[f"{d}_quarteryear"] = idx.dt.year.astype(str) + "Q" + q.astype(str)
    batch[f"{d}_quarterstart"] = idx.dt.is_quarter_start.astype(np.uint8)
    batch[f"{d}_quarterend"] = idx.dt.is_quarter_end.astype(np.uint8)
    batch[f"{d}_month"] = idx.dt.month
    batch[f"{d}_month_lbl"] = idx.dt.month_name()
    batch[f"{d}_monthstart"] = idx.dt.is_month_start.astype(np.uint8)
    batch[f"{d}_monthend"] = idx.dt.is_month_end.astype(np.uint8)
    batch[f"{d}_yweek"] = idx.dt.isocalendar().week.astype(np.int64)
    batch[f"{d}_mweek"] = (idx.dt.day - 1) // 7 + 1
    batch[f"{d}_wday"] = idx.dt.dayofweek + 1
    batch[f"{d}_wday_lbl"] = idx.dt.day_name()
    batch[f"{d}_mday"] = idx.dt.day
    batch[f"{d}_qday"] = (idx - pd.PeriodIndex(idx, freq="Q").start_time).dt.days + 1
    batch[f"{d}_yday"] = idx.dt.dayofyear
    batch[f"{d}_weekend"] = np.where(idx.dt.dayofweek <= 5, 0, 1)  # quirk: Sunday only
    batch[f"{d}_hour"] = idx.dt.hour
    batch[f"{d}_minute"] = idx.dt.minute
    batch[f"{d}_second"] = idx.dt.second
    batch[f"{d}_msecond"] = idx.dt.microsecond
    batch[f"{d}_nsecond"] = idx.dt.nanosecond
    batch[f"{d}_am_pm"] = np.where(idx.dt.hour <= 12, "am", "pm")  # quirk: <=12
    return batch


def augment_timeseries_signature(ds: rd.Dataset, date_column: str) -> rd.Dataset:
    """Append all 29 ``{date_column}_*`` calendar features."""
    return ds.map_batches(
        get_timeseries_signature,
        batch_format="pandas",
        fn_kwargs=dict(date_column=date_column),
    )
