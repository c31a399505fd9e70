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
        # diffs computed on exact integer microseconds: quantile interpolation
        # (a + (b-a)*q, q in {.25,.5,.75}) is then exact in float64, so the
        # final /1e6 gives bit-identical results across engines
        us = part[date_column].astype("datetime64[us]").astype(np.int64)
        diffs = part.assign(__us__=us).groupby(by, sort=False)["__us__"].diff() if by else pd.Series(us).diff()
        part = part.assign(__diff__=diffs.to_numpy())
        g2 = part.groupby(by, sort=False) if by else part.groupby(np.zeros(len(part), dtype=np.int64))
        d = g2["__diff__"]
        # mean of consecutive diffs telescopes to (end-start)/(n-1): computed
        # as (end_us - start_us) / 1e6 / (n-1) — exact integer difference then
        # two float divisions, bit-deterministic across engines
        span_us = (
            base["date_end"].astype("datetime64[us]").astype(np.int64)
            - base["date_start"].astype("datetime64[us]").astype(np.int64)
        )
        mean_s = span_us / 1e6 / (base["date_n"] - 1).replace(0, np.nan)
        stats = pd.DataFrame(
            {
                "diff_min_s": d.min() / 1e6,
                "diff_q25_s": d.quantile(0.25) / 1e6,
                "diff_median_s": d.quantile(0.5) / 1e6,
                "diff_mean_s": mean_s,
                "diff_q75_s": d.quantile(0.75) / 1e6,
                "diff_max_s": d.max() / 1e6,
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
