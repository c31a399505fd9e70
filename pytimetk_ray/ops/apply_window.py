"""augment_rolling_apply / augment_expanding_apply — DataFrame-windowed
custom functions (multi-column UDFs, e.g. rolling correlation/regression).

Reference: src/pytimetk/feature_engineering/rolling_apply.py:27-44 (column
template ``rolling_{name}_win_{w}``) and expanding_apply.py:28
(``expanding_{name}``).  The UDF receives the window's DataFrame slice and
returns a scalar.

Execution: the slow UDF path — an explicit python loop over windows inside
each group, but groups are processed per hash partition so the loop
parallelizes across partitions (this is the same trade the reference makes,
minus its driver-side group materialization)."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def augment_rolling_apply(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    *,
    window: int,
    window_func: Sequence[tuple[str, Callable[[pd.DataFrame], float]]],
    min_periods: int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``rolling_{name}_win_{window}`` for each named UDF."""
    group_keys, order_by = list(group_keys), list(order_by)
    mp = window if min_periods is None else min_periods

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        for name, fn in window_func:
            out = np.full(len(part), np.nan)
            pos = 0
            for _, g in part.groupby(group_keys, sort=False):
                n = len(g)
                for i in range(n):
                    lo = max(0, i - window + 1)
                    if i - lo + 1 >= mp:
                        out[pos + i] = fn(g.iloc[lo : i + 1])
                pos += n
            part[f"rolling_{name}_win_{window}"] = out
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )


def augment_expanding_apply(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    *,
    window_func: Sequence[tuple[str, Callable[[pd.DataFrame], float]]],
    min_periods: int = 1,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``expanding_{name}`` for each named UDF."""
    group_keys, order_by = list(group_keys), list(order_by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        for name, fn in window_func:
            out = np.full(len(part), np.nan)
            pos = 0
            for _, g in part.groupby(group_keys, sort=False):
                n = len(g)
                for i in range(n):
                    if i + 1 >= min_periods:
                        out[pos + i] = fn(g.iloc[: i + 1])
                pos += n
            part[f"expanding_{name}"] = out
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )
