"""ts_summary — per-series profile (continuous-aggregate shape).

Reference: src/pytimetk/core/ts_summary.py:27-38 (signature), :204-219
(composition: date summary + frequency summary + diff summary), :308-407
(diff quantiles).  Output: one tiny row per group with count, start/end, and
timestep-diff statistics in seconds (linear-interpolation quantiles, matching
pandas ``quantile`` / DuckDB ``quantile_cont``).

Execution: hash-partitioned group map; each task computes every group's
profile with one vectorized pandas groupby pass (diff via ``groupby.diff`` on
int64 timestamps), emitting ~1 row per group — the map side shrinks the data
by orders of magnitude before anything is collected.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def ts_summary(
    ds: rd.Dataset,
    date_column: str,
    *,
    by: Sequence[str] = (),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Per-group profile: ``date_n, date_start, date_end, diff_min_s,
    diff_q25_s, diff_median_s, diff_mean_s, diff_q75_s, diff_max_s``."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        ts = part[date_column]
        unit = str(ts.dtype)
        per_sec = {"datetime64[ns]": 1e9, "datetime64[us]": 1e6, "datetime64[ms]": 1e3, "datetime64[s]": 1.0}[unit]
        g = part.groupby(by, sort=False) if by else part.groupby(np.zeros(len(part), dtype=np.int64))
        base = g[date_column].agg(date_n="count", date_start="min", date_end="max")
        diffs = g[date_column].diff().dt.total_seconds()
        part = part.assign(__diff__=diffs)
        g2 = part.groupby(by, sort=False) if by else part.groupby(np.zeros(len(part), dtype=np.int64))
        d = g2["__diff__"]
        stats = pd.DataFrame(
            {
                "diff_min_s": d.min(),
                "diff_q25_s": d.quantile(0.25),
                "diff_median_s": d.quantile(0.5),
                "diff_mean_s": d.mean(),
                "diff_q75_s": d.quantile(0.75),
                "diff_max_s": d.max(),
            }
        )
        out = base.join(stats).reset_index()
        if not by:
            out = out.drop(columns=out.columns[0])
        _ = per_sec  # unit bookkeeping kept explicit for readers
        return out

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column], num_partitions=num_partitions if by else 1
    )
