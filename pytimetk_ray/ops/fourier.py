"""augment_fourier — per-group Fourier terms.

Reference: src/pytimetk/feature_engineering/fourier.py:28 (signature),
:188-196 (``calc_fourier = sin/cos(2*pi*K*x / period)`` with the date scaled
to a sequence by the group's median timestamp diff in seconds —
``date_to_seq_scale_factor`` uses ``ts_summary.diff_median``), :274 (column
template ``{date}_{sin|cos}_{K}_{period}``).

Execution: one hash-partition task computes every group's median diff and the
trig terms vectorized."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def augment_fourier(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    date_column: str,
    *,
    periods=1,
    max_order: int = 1,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``{date}_sin_{K}_{period}`` / ``{date}_cos_{K}_{period}``."""
    periods = [periods] if isinstance(periods, (int, float)) else list(periods)
    group_keys = list(group_keys)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        ns = part[date_column].astype("datetime64[ns]").astype(np.int64)
        secs = ns / 1e9
        # median timestep from EXACT integer-ns diffs (diffing pre-divided
        # float seconds would quantize at the double's ~µs ulp)
        if group_keys:
            med_ns = part.assign(__ns__=ns).groupby(group_keys, sort=False)["__ns__"].transform(
                lambda s: s.diff().median()
            )
            scale = med_ns.to_numpy() / 1e9
        else:
            scale = np.full(len(part), pd.Series(ns).diff().median() / 1e9)
        scale = np.where((scale == 0) | ~np.isfinite(scale), 1.0, scale)
        x = secs.to_numpy() / scale
        for period in periods:
            for k in range(1, max_order + 1):
                arg = 2 * np.pi * k * x / period
                part[f"{date_column}_sin_{k}_{period}"] = np.sin(arg)
                part[f"{date_column}_cos_{k}_{period}"] = np.cos(arg)
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + [date_column],
        num_partitions=num_partitions if group_keys else 1,
    )
