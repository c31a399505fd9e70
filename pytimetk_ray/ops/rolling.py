"""augment_rolling — per-group rolling window aggregates.

Reference semantics (src/pytimetk/feature_engineering/rolling.py:43-65):
windows int / tuple-range / list; funcs builtin strings or named-lambda
tuples ``("name", fn)``; ``min_periods`` defaults to the window size;
``center`` supported; column template ``{col}_rolling_{func}_win_{w}``
(rolling.py:652,739 — reproduced verbatim, incl. quantile ->
``{col}_rolling_quantile_50_win_{w}``).

Execution: one hash-partitioned task per partition runs pandas
``groupby(...).rolling(...)`` over ALL groups in the partition at C speed —
versus the reference's one-Ray-task-per-group with driver-side group
materialization (rolling.py:567-604).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

_BUILTINS = {"mean", "sum", "min", "max", "std", "var", "count", "median"}


def pd_quantile(**kwargs):
    """Configuration tuple for a rolling/expanding quantile — the
    reference's 'configurable' function packaging (utils/pandas_helpers.py:
    333-349): ``("quantile_75", pd_quantile(q=0.75))`` names the output
    column ``{col}_rolling_quantile_75_win_{w}`` and forwards q /
    interpolation to the pandas window quantile.  Default interpolation is
    ``"midpoint"`` — reference parity."""
    default_kwargs = {"q": None, "interpolation": "midpoint",
                      "numeric_only": False}
    return "configurable", "quantile", default_kwargs, kwargs


def _resolve_configurable(spec, window_obj, default_q: float):
    """Run a ('configurable', func_name, defaults, user) tuple against a
    pandas Rolling/Expanding object; only keys already in the defaults are
    honored (the reference's update_dict semantics)."""
    _, func_name, default_kwargs, user_kwargs = spec
    kw = dict(default_kwargs)
    for k, v in user_kwargs.items():
        if k in kw:
            kw[k] = v
    if func_name == "quantile":
        q = kw["q"] if kw["q"] is not None else default_q
        return window_obj.quantile(q, interpolation=kw["interpolation"])
    kw = {k: v for k, v in kw.items() if v is not None}
    return getattr(window_obj, func_name)(**kw)


def _is_configurable(fn) -> bool:
    return isinstance(fn, tuple) and len(fn) == 4 and fn[0] == "configurable"


def _norm_windows(spec) -> list[int]:
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, tuple):
        return list(range(spec[0], spec[1] + 1))
    return list(spec)


def augment_rolling(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_columns: str | Sequence[str],
    *,
    window=2,
    window_func="mean",
    min_periods: int | None = None,
    center: bool = False,
    quantile: float = 0.5,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    split_rows: int | None = None,
) -> rd.Dataset:
    """Append ``{col}_rolling_{func}_win_{w}`` columns.

    ``window_func``: builtin name, ``"quantile"`` (uses ``quantile=``, column
    suffix ``quantile_{int(q*100)}``), a ``("name", callable)`` tuple, or a
    list mixing these.  ``min_periods`` defaults to the window size (rows
    before the window fills are null) — the reference's default.

    ``split_rows``: HOT-GROUP escape hatch (north_rule's explicit salting
    for order-sensitive kernels): groups are split into contiguous ranges of
    that many rows of the DENSE-integer order column (turn_idx), each range
    carrying the previous ``max(window)-1`` rows as an overlap prefix, so a
    conversation larger than one task's share parallelizes without changing
    window contents.  Requires ``center=False`` and ``min_periods == window``
    (the defaults); sums/means may differ from the unsplit path in the last
    float bit (different accumulation history), min/max/count are identical.
    """
    cols = [value_columns] if isinstance(value_columns, str) else list(value_columns)
    windows = _norm_windows(window)
    funcs = window_func if isinstance(window_func, list) else [window_func]
    group_keys = list(group_keys)
    order_by = list(order_by)

    if split_rows:
        from pytimetk_ray.exec import RID_COL, drop_overlap, tag_overlap_splits

        if center:
            raise NotImplementedError("split_rows requires center=False")
        if min_periods is not None and min_periods != max(windows):
            raise NotImplementedError("split_rows requires min_periods == window")
        tagged = tag_overlap_splits(
            ds, order_by[-1], rows_per_split=split_rows,
            overlap=max(windows) - 1,
        )
        out = augment_rolling(
            tagged, group_keys + [RID_COL], order_by, value_columns,
            window=window, window_func=window_func, min_periods=min_periods,
            center=center, quantile=quantile, num_partitions=num_partitions,
        )
        return drop_overlap(out)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from pytimetk_ray.exec import row_number_in_group

        g = part.groupby(group_keys, sort=False, group_keys=False)
        codes = None
        for col in cols:
            for w in windows:
                mp = w if min_periods is None else min_periods
                # fast path: sum/mean/min/max via one vectorized pass over
                # sliding windows — windows that would cross a group boundary
                # are exactly those with row-in-group < w-1, which
                # min_periods==w nulls anyway
                _FAST = {"sum": np.sum, "mean": np.mean, "min": np.min, "max": np.max}
                fast = [f for f in funcs if isinstance(f, str) and f in _FAST]
                if fast and not center and mp == w and w <= 256:
                    v = part[col].to_numpy(dtype=np.float64)
                    if len(v) >= w and not np.isnan(v).any():
                        if codes is None:
                            codes = pd.factorize(
                                part[group_keys[0]] if len(group_keys) == 1
                                else pd.MultiIndex.from_frame(part[group_keys]),
                                sort=False,
                            )[0]
                        sw = np.lib.stride_tricks.sliding_window_view(v, w)
                        rn = row_number_in_group(codes)
                        invalid = rn < w - 1
                        for f in fast:
                            full = np.full(len(v), np.nan)
                            full[w - 1 :] = _FAST[f](sw, axis=1)
                            full[invalid] = np.nan
                            part[f"{col}_rolling_{f}_win_{w}"] = full
                        funcs_left = [f for f in funcs if f not in fast]
                    else:
                        funcs_left = list(funcs)
                else:
                    funcs_left = list(funcs)
                if not funcs_left:
                    continue
                roll = g[col].rolling(window=w, min_periods=mp, center=center)
                for f in funcs_left:
                    if isinstance(f, tuple):
                        name, fn = f
                        if _is_configurable(fn):
                            vals = _resolve_configurable(fn, roll, quantile)
                        else:
                            vals = roll.apply(fn, raw=True)
                        out_name = f"{col}_rolling_{name}_win_{w}"
                    elif f == "quantile":
                        vals = roll.quantile(quantile)
                        out_name = f"{col}_rolling_quantile_{int(quantile * 100)}_win_{w}"
                    elif f in _BUILTINS:
                        vals = getattr(roll, f)()
                        out_name = f"{col}_rolling_{f}_win_{w}"
                    else:
                        raise ValueError(f"unsupported window_func {f!r}")
                    part[out_name] = vals.reset_index(drop=True).to_numpy()
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )
