"""Frequency inference — get_frequency_summary / get_frequency /
get_seasonal_frequency / get_trend_frequency.

Reference: src/pytimetk/core/frequency.py:112-183 (summary: pandas
``inferred_freq`` on the first points, else median-diff bucketed into
unit/scale via a static seconds table), :187-243 (get_frequency), :409-631
(seasonal/trend via the time-scale template).  Driver-side series helpers —
the per-group distributed variants live in ts_summary / anomalize
(kernels/decomp.auto_periods uses the same tables)."""

from __future__ import annotations

import numpy as np
import pandas as pd

# seconds-per-unit thresholds (reference frequency.py:32-64, :246-331)
_UNITS = [
    ("S", 1.0, 60),
    ("T", 60.0, 3600),
    ("H", 3600.0, 86400),
    ("D", 86400.0, 7 * 86400),
    ("W", 7 * 86400.0, 30.44 * 86400),
    ("M", 30.44 * 86400.0, 3 * 30.44 * 86400),
    ("Q", 3 * 30.44 * 86400.0, 365.25 * 86400),
    ("Y", 365.25 * 86400.0, np.inf),
]

_TEMPLATE = {  # median_unit -> (seasonal_period, trend_period) strings
    "S": ("1H", "12H"), "T": ("1D", "14D"), "H": ("1D", "1M"),
    "D": ("1W", "1Q"), "W": ("1Q", "1Y"), "M": ("1Y", "5Y"),
    "Q": ("1Y", "10Y"), "Y": ("5Y", "30Y"),
}

_PERIOD_SECONDS = {
    "1H": 3600, "12H": 12 * 3600, "1D": 86400, "14D": 14 * 86400,
    "1W": 7 * 86400, "1Q": int(3 * 30.44 * 86400), "1M": int(30.44 * 86400),
    "1Y": int(365.25 * 86400), "5Y": int(5 * 365.25 * 86400),
    "10Y": int(10 * 365.25 * 86400), "30Y": int(30 * 365.25 * 86400),
}


def get_frequency_summary(idx) -> pd.DataFrame:
    """One-row frame: freq_inferred_unit, freq_median_timedelta,
    freq_median_scale, freq_median_unit."""
    s = pd.Series(pd.to_datetime(idx)).sort_values()
    inferred = None
    try:
        inferred = pd.infer_freq(s.iloc[:10])
    except (ValueError, TypeError):
        inferred = None
    med = s.diff().median()
    med_s = med.total_seconds() if pd.notna(med) else np.nan
    unit, scale = "D", np.nan
    for u, base, upper in _UNITS:
        if med_s < upper:
            unit, scale = u, med_s / base
            break
    return pd.DataFrame(
        [
            {
                "freq_inferred_unit": inferred,
                "freq_median_timedelta": med,
                "freq_median_scale": scale,
                "freq_median_unit": unit,
            }
        ]
    )


def get_frequency(idx, *, numeric: bool = False):
    """Inferred pandas alias, or '{scale}{unit}' from the median diff;
    numeric=True returns the median diff in seconds."""
    summ = get_frequency_summary(idx).iloc[0]
    if numeric:
        return float(summ["freq_median_timedelta"].total_seconds())
    if summ["freq_inferred_unit"]:
        return summ["freq_inferred_unit"]
    return f"{int(round(summ['freq_median_scale']))}{summ['freq_median_unit']}"


def _periods_from_template(idx, which: int, numeric: bool):
    summ = get_frequency_summary(idx).iloc[0]
    med_s = summ["freq_median_timedelta"].total_seconds()
    period_str = _TEMPLATE[summ["freq_median_unit"]][which]
    if not numeric:
        return period_str
    return max(int(round(_PERIOD_SECONDS[period_str] / med_s)), 2)


def get_seasonal_frequency(idx, *, numeric: bool = False):
    """Seasonal period (observations when numeric=True) via the template."""
    return _periods_from_template(idx, 0, numeric)


def get_trend_frequency(idx, *, numeric: bool = False):
    """Trend period (observations when numeric=True) via the template."""
    return _periods_from_template(idx, 1, numeric)


def time_scale_template(wide_format: bool = False) -> pd.DataFrame:
    """The static unit -> seasonal/trend period table
    (reference frequency.py:378-390)."""
    t = pd.DataFrame(
        {
            "median_unit": list(_TEMPLATE),
            "seasonal_period": [v[0] for v in _TEMPLATE.values()],
            "trend_period": [v[1] for v in _TEMPLATE.values()],
        }
    )
    return t.set_index("median_unit").T if wide_format else t


def frequency_summary_by(ds, date_column: str, *, by, num_partitions=None):
    """Distributed per-group frequency summary: one row per group with
    ``freq_median_scale`` / ``freq_median_unit`` and the template's
    seasonal/trend period strings (reference frequency.py:112-183 semantics
    per group; the pandas ``inferred_freq`` probe is omitted — irregular
    per-conversation streams never infer)."""
    from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for keys, g in part.groupby(by, sort=False):
            if not isinstance(keys, tuple):
                keys = (keys,)
            med = g[date_column].diff().median()
            med_s = med.total_seconds() if pd.notna(med) else np.nan
            if np.isnan(med_s):
                # single-observation group: no spacing exists — emit NULLs
                # (matches the SQL oracle's NULL-median guard; an arbitrary
                # 'D'/'Y' fallback would diverge between engines)
                unit, scale, seasonal, trend = None, np.nan, None, None
            else:
                unit, scale = "Y", med_s / _UNITS[-1][1]
                for u, base, upper in _UNITS:
                    if med_s < upper:
                        unit, scale = u, med_s / base
                        break
                seasonal, trend = _TEMPLATE[unit]
            rows.append(dict(zip(by, keys)) | {
                "freq_median_scale": scale, "freq_median_unit": unit,
                "seasonal_period": seasonal, "trend_period": trend,
            })
        return pd.DataFrame(rows)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )
