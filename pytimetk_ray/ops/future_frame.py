"""future_frame — extend each series with future timestamps.

Reference: src/pytimetk/core/future.py:84-96 (signature), :371-440 (per-group
frequency inference from sorted dates + constant-column forward fill;
``make_future_timeseries`` core ``date_range(start=last, periods=n+1)[1:]``,
src/pytimetk/core/make_future_timeseries.py:133-146).

Execution: per hash partition, future rows for ALL groups are produced with
one vectorized repeat/arange pass (no per-group date_range); frequency is
either given or inferred per group as the median timestamp delta.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, group_starts, partitioned_group_map
from pytimetk_ray.freq import parse_freq


def future_frame(
    ds: rd.Dataset,
    date_column: str,
    *,
    by: Sequence[str] = (),
    length_out: int = 10,
    freq: str | None = None,
    bind_data: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``length_out`` future rows per group at ``freq`` (or the
    per-group median timestamp delta when ``freq=None``).  New rows carry the
    group keys; group-constant columns forward-fill; everything else is null.
    ``bind_data=False`` returns only the future rows."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        n = len(part)
        if n == 0:
            return part
        ts_np = part[date_column].to_numpy()
        unit = str(ts_np.dtype)
        unit = unit[unit.index("[") + 1 : unit.index("]")]
        ts = ts_np.astype(np.int64)
        if by:
            codes = pd.factorize(
                pd.MultiIndex.from_frame(part[by]) if len(by) > 1 else part[by[0]], sort=False
            )[0]
        else:
            codes = np.zeros(n, dtype=np.int64)
        starts = group_starts(codes)
        ends = np.append(starts[1:], n) - 1
        g = len(starts)
        last = ts[ends]
        if freq is not None:
            step = np.full(g, parse_freq(freq).step(unit), dtype=np.int64)
        else:
            # per-group median delta (reference: inferred frequency from
            # sorted dates, future.py:389-394)
            within = codes[1:] == codes[:-1]
            med = pd.Series(np.diff(ts)[within]).groupby(codes[1:][within]).median()
            step = np.full(g, 1, dtype=np.int64)
            step[med.index.to_numpy()] = np.maximum(med.to_numpy().astype(np.int64), 1)
        k = np.tile(np.arange(1, length_out + 1, dtype=np.int64), g)
        gidx = np.repeat(np.arange(g, dtype=np.int64), length_out)
        fut_ts = last[gidx] + k * step[gidx]

        fut = {date_column: fut_ts.astype(f"datetime64[{unit}]")}
        other = [c for c in part.columns if c != date_column and c not in by]
        for col in by:
            fut[col] = part[col].to_numpy()[starts][gidx]
        nun = part.groupby(codes, sort=False)[other].nunique(dropna=False) if other else None
        lastvals = part.groupby(codes, sort=False)[other].last() if other else None
        for col in other:
            src = part[col].to_numpy()
            const = nun[col].to_numpy() == 1
            if src.dtype.kind in "iuf":
                dst = np.full(g * length_out, np.nan, dtype=np.float64)
            elif src.dtype.kind == "M":
                dst = np.full(g * length_out, np.datetime64("NaT"), dtype=src.dtype)
            else:
                dst = np.full(g * length_out, None, dtype=object)
            fill_groups = np.flatnonzero(const)
            if len(fill_groups):
                mask = np.isin(gidx, fill_groups)
                dst[mask] = lastvals[col].to_numpy()[gidx[mask]]
            fut[col] = dst
        fut_df = pd.DataFrame(fut, columns=list(part.columns))
        if bind_data:
            return pd.concat([part, fut_df], ignore_index=True)
        return fut_df

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column], num_partitions=num_partitions if by else 1
    )
