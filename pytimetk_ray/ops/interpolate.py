"""interpolate_by_time — pad to a dense grid, then linearly interpolate.

The continuous-aggregate companion to ``pad_by_time`` (reference:
src/pytimetk/core/pad.py pads but leaves inserted rows null — downstream
pandas users chain ``.interpolate()``; this operator fuses both so the gap
grid never round-trips through the driver).  Values observed on the grid
pass through untouched; interior gaps get exact linear interpolation in
timestamp space; leading/trailing gaps (no known neighbor on one side)
stay null.

Float contract (oracle parity): the interpolated value is computed as
``pv + (nv - pv) * ((t - pt) / (nt - pt))`` with the time ratio divided
FIRST — the identical expression text evaluates bit-equal in DuckDB, so
only the caller's final ROUND(…, 6) is needed.

Execution: one ``partitioned_group_map`` per hash partition over whole
groups; pad + interpolate run fused in the same task (vectorized across
all groups in the partition — prev/next known-row indices via masked
``np.maximum.accumulate`` with group-boundary guards, no per-group loop).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, group_starts, partitioned_group_map
from pytimetk_ray.kernels.gapfill import pad_groups


def _interp_linear(part: pd.DataFrame, by: list[str], date_column: str,
                   value_column: str) -> pd.DataFrame:
    """Vectorized per-group linear interpolation over a padded, group-sorted
    frame.  NaN rows with a known value on both sides (within their group)
    are filled; edge gaps remain NaN."""
    n = len(part)
    if n == 0:
        return part
    if by:
        codes = pd.factorize(
            pd.MultiIndex.from_frame(part[by]) if len(by) > 1 else part[by[0]],
            sort=False)[0]
    else:
        codes = np.zeros(n, dtype=np.int64)
    starts = group_starts(codes)
    sizes = np.diff(np.append(starts, n))
    start_of = np.repeat(starts, sizes)
    end_of = np.repeat(starts + sizes - 1, sizes)

    v = part[value_column].to_numpy(np.float64, copy=True)
    t = part[date_column].to_numpy().astype(np.int64)
    known = ~np.isnan(v)
    idx = np.arange(n, dtype=np.int64)

    prev = np.maximum.accumulate(np.where(known, idx, -1))
    nxt_rev = np.maximum.accumulate(np.where(known, n - 1 - idx, -1)[::-1])
    nxt = (n - 1) - nxt_rev[::-1]
    has_prev = prev >= start_of
    has_next = (nxt <= end_of) & (nxt >= 0)

    fill = ~known & has_prev & has_next
    if fill.any():
        p, q = prev[fill], nxt[fill]
        pv, nv = v[p], v[q]
        pt, nt = t[p].astype(np.float64), t[q].astype(np.float64)
        tt = t[fill].astype(np.float64)
        v[fill] = pv + (nv - pv) * ((tt - pt) / (nt - pt))
    out = part.copy()
    out[value_column] = v
    return out


def interpolate_by_time(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    freq: str = "D",
    by: Sequence[str] = (),
    start_date=None,
    end_date=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Pad every ``by``-group onto a dense ``freq`` grid and linearly
    interpolate ``value_column`` across interior gaps (in timestamp space,
    so calendar-irregular grids interpolate correctly too)."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        padded = pad_groups(part, by, date_column, freq,
                            start_date=start_date, end_date=end_date,
                            fillna=None)
        return _interp_linear(padded, by, date_column, value_column)

    if not by:
        return partitioned_group_map(ds, [], kernel, sort_by=[date_column],
                                     num_partitions=1)
    return partitioned_group_map(ds, by, kernel,
                                 sort_by=by + [date_column],
                                 num_partitions=num_partitions)
