"""augment_expanding — per-group expanding (cumulative) aggregates.

Reference semantics (src/pytimetk/feature_engineering/expanding.py:41-61):
column template ``{col}_expanding_{func}`` (expanding.py:586,644; quantile ->
``{col}_expanding_quantile_{int(q*100)}``); ``min_periods`` defaults to 1.

The expanding state machine (running sum/count/min/max) is the same
continuous-aggregate recurrence the tier actors hold (SURVEY.md §7.4);
here it runs segment-vectorized across all groups of a hash partition.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

_BUILTINS = {"mean", "sum", "min", "max", "std", "var", "count", "median"}
# cumulative fast paths that avoid the generic expanding engine
_CUM_FAST = {"sum": "cumsum", "min": "cummin", "max": "cummax", "count": "cumcount"}


def augment_expanding(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_columns: str | Sequence[str],
    *,
    window_func="mean",
    min_periods: int = 1,
    quantile: float = 0.5,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``{col}_expanding_{func}`` columns."""
    cols = [value_columns] if isinstance(value_columns, str) else list(value_columns)
    funcs = window_func if isinstance(window_func, list) else [window_func]
    group_keys = list(group_keys)
    order_by = list(order_by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(group_keys, sort=False, group_keys=False)
        for col in cols:
            for f in funcs:
                if isinstance(f, tuple):
                    from pytimetk_ray.ops.rolling import (
                        _is_configurable, _resolve_configurable)

                    name, fn = f
                    exp = g[col].expanding(min_periods=min_periods)
                    if _is_configurable(fn):
                        vals = _resolve_configurable(fn, exp, quantile)
                    else:
                        vals = exp.apply(fn, raw=True)
                    out_name = f"{col}_expanding_{name}"
                    part[out_name] = vals.reset_index(drop=True).to_numpy()
                    continue
                if f in _CUM_FAST and min_periods <= 1:
                    # vectorized cumulative kernels (no expanding engine)
                    if f == "count":
                        part[f"{col}_expanding_count"] = (
                            g[col].cumcount().to_numpy() + 1
                        )
                    else:
                        part[f"{col}_expanding_{f}"] = getattr(g[col], _CUM_FAST[f])().to_numpy()
                    continue
                exp = g[col].expanding(min_periods=min_periods)
                if f == "quantile":
                    vals = exp.quantile(quantile)
                    out_name = f"{col}_expanding_quantile_{int(quantile * 100)}"
                elif f in _BUILTINS:
                    vals = getattr(exp, f)()
                    out_name = f"{col}_expanding_{f}"
                else:
                    raise ValueError(f"unsupported window_func {f!r}")
                part[out_name] = vals.reset_index(drop=True).to_numpy()
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )
