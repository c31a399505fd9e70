"""Visualization-grade per-series downsampling: M4 and LTTB.

The north-star engine's "downsample" axis beyond plain resampling
(``summarize_by_time`` keeps aggregate VALUES; these keep actual POINTS so
a plot of the reduced series is pixel-faithful):

- ``m4_downsample`` — the M4 operator (Jugel et al., "M4: A
  Visualization-Oriented Time Series Data Aggregation", VLDB 2014, public
  algorithm): per (series, time-bucket) keep the rows achieving min/max
  VALUE and first/last TIME — at most 4 rows per bucket, which provably
  preserves the rendered line at bucket-per-pixel width.  Pure per-group
  vectorized selection; SQL-oracle-able (window min/max/first/last).
- ``lttb_downsample`` — Largest-Triangle-Three-Buckets (Steinarsson 2013,
  public thesis algorithm): reduce each series to exactly ``n_out`` points,
  greedily keeping, per index-bucket, the point forming the largest
  triangle with the previously selected point and the NEXT bucket's
  centroid.  First/last points always survive.  The selection is
  inherently sequential ACROSS buckets but vectorized WITHIN each bucket
  (one argmax over the bucket per step, numpy).

Both run per-conversation through ``exec.partitioned_group_map`` — whole
groups co-located by one keyed exchange, many series per task, the same
partitioning contract as every ordered kernel in this engine.  Output rows
are SUBSETS of input rows (per-row byte identity preserved for carried
columns).

Scale note: M4 is embarrassingly parallel per bucket and is the pick at
100 TB; LTTB's cross-bucket chain makes each series a sequential scan
(still only O(n) per series, and series are independent).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def m4_downsample(
    ds: rd.Dataset,
    by: Sequence[str],
    date_column: str,
    value_column: str,
    *,
    freq: str = "1h",
    tie_breaker: str | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """M4: per (group, floor(ts, freq)) keep the first/last/min/max rows.

    Rows are kept (deduplicated — one row may fill several roles) in time
    order; all input columns pass through unchanged.  Election inside a
    bucket: first/last by (ts[, tie_breaker]), min/max by value with
    FIRST-(ts, tie_breaker)-occurrence tie-breaking — pass a unique
    ``tie_breaker`` column to make the selection total-order exact
    (matching the SQL oracle's ``ORDER BY value, ts, id`` convention).
    """
    from pytimetk_ray.freq import floor_i64

    by = list(by)
    sort_cols = by + [date_column] + ([tie_breaker] if tie_breaker else [])

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        # part arrives pre-sorted by (by, ts[, tie]): buckets are contiguous
        # position runs, and position order IS the within-bucket time order
        ts_np = part[date_column].to_numpy()
        unit = np.datetime_data(ts_np.dtype)[0]
        bucket = floor_i64(ts_np.astype(np.int64), unit, freq)
        codes, _ = pd.factorize(
            pd.MultiIndex.from_arrays(
                [part[c].to_numpy() for c in by] + [bucket]),
            sort=False)
        pos = np.arange(len(part), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.append(starts[1:], len(codes)) - 1
        v = part[value_column].to_numpy(np.float64)

        def argext(key: np.ndarray) -> np.ndarray:
            # per-bucket first row under (key asc, position asc): one global
            # lexsort, take the first row of every code run — vectorized
            o = np.lexsort((pos, key, codes))
            cc = codes[o]
            return o[np.flatnonzero(np.r_[True, cc[1:] != cc[:-1]])]

        keep = np.unique(np.concatenate(
            [starts, ends, argext(v), argext(-v)]))
        return part.iloc[keep].reset_index(drop=True)

    return partitioned_group_map(ds, by, kernel, sort_by=sort_cols,
                                 num_partitions=num_partitions)


def _lttb_one(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices kept by LTTB for one series already sorted by x."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n, dtype=np.int64)
    m = n_out - 2
    # bucket k covers sorted indices [1 + floor(k*(n-2)/m), 1 + floor((k+1)*(n-2)/m))
    edges = 1 + ((np.arange(m + 1, dtype=np.int64) * (n - 2)) // m)
    kept = np.empty(n_out, dtype=np.int64)
    kept[0] = 0
    a = 0
    for k in range(m):
        lo, hi = int(edges[k]), int(edges[k + 1])
        if k + 1 < m:
            nlo, nhi = int(edges[k + 1]), int(edges[k + 2])
            # centroid as sum/count (the SQL oracle's exact expression; with
            # exactly-representable x/y the summation order cannot matter)
            cx = x[nlo:nhi].sum() / (nhi - nlo)
            cy = y[nlo:nhi].sum() / (nhi - nlo)
        else:
            cx, cy = x[n - 1], y[n - 1]
        ax, ay = x[a], y[a]
        # triangle area*2 against segment [lo, hi): vectorized
        area = np.abs((ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay))
        a = lo + int(np.argmax(area))     # first occurrence on ties
        kept[k + 1] = a
    kept[n_out - 1] = n - 1
    return kept


def lttb_downsample(
    ds: rd.Dataset,
    by: Sequence[str],
    date_column: str,
    value_column: str,
    *,
    n_out: int = 100,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """LTTB: reduce every group to exactly ``n_out`` rows (groups smaller
    than ``n_out`` pass through).  Timestamps enter the triangle areas as
    float64 epoch-µs; ties in area keep the FIRST bucket point.  All input
    columns pass through on the surviving rows."""
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        # part arrives pre-sorted by (by, ts): groups are contiguous runs
        if len(by) > 1:
            codes, _ = pd.factorize(pd.MultiIndex.from_arrays(
                [part[c].to_numpy() for c in by]), sort=False)
        else:
            codes, _ = pd.factorize(part[by[0]], sort=False)
        ts = part[date_column].to_numpy()
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        bounds = np.append(starts, len(codes))
        # x = µs offset from the group's first point: every x, every bucket
        # x-sum, and every centroid stays exactly representable in float64
        # (group spans << 2^53 µs), so the triangle arithmetic is identical
        # on any engine that evaluates the same expression — the SQL oracle
        # uses the same origin shift
        x_i64 = ts.astype("datetime64[us]").astype(np.int64)
        y_all = part[value_column].to_numpy(np.float64)
        keep_chunks = []
        for gi in range(len(starts)):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            x_rel = (x_i64[s:e] - x_i64[s]).astype(np.float64)
            kept = _lttb_one(x_rel, y_all[s:e], n_out)
            keep_chunks.append(s + kept)
        rows = np.concatenate(keep_chunks)
        return part.iloc[rows].reset_index(drop=True)

    return partitioned_group_map(ds, by, kernel,
                                 sort_by=by + [date_column],
                                 num_partitions=num_partitions)
