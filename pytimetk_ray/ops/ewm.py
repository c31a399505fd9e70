"""augment_ewm — per-group exponentially-weighted moving aggregates.

Reference semantics (src/pytimetk/feature_engineering/ewm.py:33-49): exactly
one decay parameter of ``alpha`` / ``com`` / ``span`` / ``halflife`` (mutual
exclusion, ewm.py:294-315); column template
``{col}_ewm_{func}_{decay_label}_{decay_value}`` (ewm.py:377,447,515-521).

The EWM recurrence ``s_t = a*x_t + (1-a)*s_{t-1}`` is order-sensitive, so a
conversation must never split across tasks: hash partitioning by group keys
guarantees that (exec.partitioned_group_map keeps whole groups together).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

_FUNCS = {"mean", "std", "var"}


def augment_ewm(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_columns: str | Sequence[str],
    *,
    window_func="mean",
    alpha: float | None = None,
    com: float | None = None,
    span: float | None = None,
    halflife: float | None = None,
    adjust: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``{col}_ewm_{func}_{decay_label}_{decay_value}`` columns."""
    decays = {"alpha": alpha, "com": com, "span": span, "halflife": halflife}
    given = {k: v for k, v in decays.items() if v is not None}
    if len(given) != 1:
        raise ValueError(f"exactly one of alpha/com/span/halflife required, got {given}")
    (label, value), = given.items()

    cols = [value_columns] if isinstance(value_columns, str) else list(value_columns)
    funcs = window_func if isinstance(window_func, list) else [window_func]
    group_keys = list(group_keys)
    order_by = list(order_by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(group_keys, sort=False, group_keys=False)
        for col in cols:
            ewm = g[col].ewm(**{label: value}, adjust=adjust)
            for f in funcs:
                if f not in _FUNCS:
                    raise ValueError(f"unsupported ewm func {f!r}")
                vals = getattr(ewm, f)()
                part[f"{col}_ewm_{f}_{label}_{value}"] = (
                    vals.reset_index(drop=True).to_numpy()
                )
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )
