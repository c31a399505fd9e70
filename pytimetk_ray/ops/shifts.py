"""Lag / lead / diff / pct_change within (group, time-ordered) series.

Reference semantics and column-name templates (reproduced verbatim):
- ``{col}_lag_{k}``  — src/pytimetk/feature_engineering/lags.py:36-51 (pandas
  ``groupby(keys)[col].shift(lag)``)
- ``{col}_lead_{k}`` — leads.py:35 (``shift(-lead)``)
- ``{col}_diff_{k}`` / normalized ``{col}_pctdiff_{k}`` — diffs.py:34-46
- ``{col}_pctdiff_{k}`` — pct_change.py:11-22

Execution: hash-partition by group (exec.partitioned_group_map), sort by
(group, order) inside each partition task, then ONE vectorized
``groupby().shift()`` across all groups in the partition — no per-group task
fan-out, no driver materialization (contrast the reference's driver-side
group loop, lags.py:213-242).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def _norm_periods(spec) -> list:
    """int -> [1..n] like the reference's lag expansion; tuple -> inclusive
    range; list -> as-is; duration strings ("2 days", "1h") pass through and
    resolve against the series' median timestep inside the kernel
    (reference: _shift_utils.resolve_shift_values,
    src/pytimetk/feature_engineering/_shift_utils.py:169-227 and
    resolve_lag_sequence, utils/datetime_helpers.py:228-332)."""
    if isinstance(spec, int):
        return list(range(1, spec + 1)) if spec > 1 else [spec]
    if isinstance(spec, tuple):
        return list(range(spec[0], spec[1] + 1))
    if isinstance(spec, str):
        return [spec]
    return list(spec)


def _resolve_duration(spec: str, part: pd.DataFrame, order_by) -> int:
    """Duration string -> row periods via the partition's median timestep."""
    import numpy as np

    from pytimetk_ray.freq import freq_to_timedelta_ns

    dur_ns = freq_to_timedelta_ns(spec)
    ts = part[order_by[0]]
    if not str(ts.dtype).startswith("datetime64"):
        raise ValueError(f"duration lag {spec!r} needs a datetime order column")
    med = pd.Series(ts.astype("datetime64[ns]").astype(np.int64)).diff().median()
    k = max(int(round(dur_ns / med)), 1) if med and med > 0 else 1
    return k


def _shift_op(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_columns: str | Sequence[str],
    periods,
    kind: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    split_rows: int | None = None,
) -> rd.Dataset:
    cols = [value_columns] if isinstance(value_columns, str) else list(value_columns)
    ks = _norm_periods(periods)
    group_keys = list(group_keys)
    order_by = list(order_by)

    if split_rows:
        # hot-group escape hatch: contiguous dense-integer order ranges with
        # a max-shift overlap prefix (exec.tag_overlap_splits); exact —
        # shifts copy values, no accumulation
        from pytimetk_ray.exec import RID_COL, drop_overlap, tag_overlap_splits

        if kind == "lead":
            raise NotImplementedError("split_rows for leads needs RIGHT overlap")
        if any(isinstance(k, str) for k in ks):
            raise NotImplementedError("split_rows with duration shifts")
        tagged = tag_overlap_splits(
            ds, order_by[-1], rows_per_split=split_rows, overlap=max(ks),
        )
        out = _shift_op(tagged, group_keys + [RID_COL], order_by, value_columns,
                        periods, kind, num_partitions=num_partitions)
        return drop_overlap(out)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(group_keys, sort=False, group_keys=False)
        for col in cols:
            s = g[col]
            for k in ks:
                if isinstance(k, str):
                    k = _resolve_duration(k, part, order_by)
                if kind == "lag":
                    part[f"{col}_lag_{k}"] = s.shift(k)
                elif kind == "lead":
                    part[f"{col}_lead_{k}"] = s.shift(-k)
                elif kind == "diff":
                    part[f"{col}_diff_{k}"] = s.diff(k)
                elif kind == "pctdiff":
                    part[f"{col}_pctdiff_{k}"] = s.pct_change(k, fill_method=None)
                else:
                    raise ValueError(kind)
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )


def augment_lags(ds, group_keys, order_by, value_columns, lags=1, **kw) -> rd.Dataset:
    """``{col}_lag_{k}`` = value shifted +k within each group."""
    return _shift_op(ds, group_keys, order_by, value_columns, lags, "lag", **kw)


def augment_leads(ds, group_keys, order_by, value_columns, leads=1, **kw) -> rd.Dataset:
    """``{col}_lead_{k}`` = value shifted -k within each group."""
    return _shift_op(ds, group_keys, order_by, value_columns, leads, "lead", **kw)


def augment_diffs(ds, group_keys, order_by, value_columns, periods=1, **kw) -> rd.Dataset:
    """``{col}_diff_{k}`` = value - lag_k(value) within each group."""
    return _shift_op(ds, group_keys, order_by, value_columns, periods, "diff", **kw)


def augment_pct_change(ds, group_keys, order_by, value_columns, periods=1, **kw) -> rd.Dataset:
    """``{col}_pctdiff_{k}`` = value / lag_k(value) - 1 within each group."""
    return _shift_op(ds, group_keys, order_by, value_columns, periods, "pctdiff", **kw)
