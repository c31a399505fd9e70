"""Gap-fill kernel: regularize irregular per-group series onto a frequency
grid — the compute core of ``pad_by_time``.

Reference semantics (src/pytimetk/core/pad.py:360-446, read for behavior, not
code): per group, grid = ``date_range(min..max or explicit bounds, freq)``;
original rows are re-indexed onto the grid (off-grid rows drop, like pandas
``reindex``); group-key columns are filled with the key; ``fillna`` scalar
fills all other columns' new rows; with ``fillna=None`` new rows stay null
EXCEPT columns constant within the group (``nunique(dropna=False)==1``),
which are forward-filled (pad.py:390-399,427-438).

The kernel is vectorized ACROSS groups for BOTH frequency classes: one
``np.repeat``/``cumsum`` pass builds every group's grid at once, one scatter
places original rows.  Fixed-width units work on raw int64 timestamps;
calendar units (M/Q/Y) work in month-index space (``datetime64[M]``) with
pandas-date_range anchor semantics (first unit-anchor >= lo, stepping n
units), then convert back — no per-group ``date_range`` loop anywhere.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pytimetk_ray.exec import group_starts
from pytimetk_ray.freq import Freq, parse_freq

_CAL_UNIT_MONTHS = {"M": 1, "Q": 3, "Y": 12}


def _np_unit(dtype) -> str:
    # 'datetime64[us]' -> 'us'
    s = str(dtype)
    return s[s.index("[") + 1 : s.index("]")]


def pad_groups(
    part: pd.DataFrame,
    group_keys: Sequence[str],
    date_column: str,
    freq: str | Freq,
    *,
    start_date=None,
    end_date=None,
    fillna=None,
    const_ffill: bool = True,
    max_total_rows: int = 100_000_000,
) -> pd.DataFrame:
    """Pad every group in ``part`` (pre-sorted by group_keys+date) to a dense
    grid.  Returns a frame with the same columns.

    ``max_total_rows`` guards against grid explosion (a sparse group spanning
    a long range at a fine frequency): a clear error beats an OOM kill."""
    f = parse_freq(freq)
    group_keys = list(group_keys)
    n = len(part)
    if n == 0:
        return part

    ts_np = part[date_column].to_numpy()
    unit = _np_unit(ts_np.dtype)

    # group codes over the sorted frame
    if group_keys:
        codes = pd.factorize(
            pd.MultiIndex.from_frame(part[group_keys]) if len(group_keys) > 1 else part[group_keys[0]],
            sort=False,
        )[0]
    else:
        codes = np.zeros(n, dtype=np.int64)
    starts = group_starts(codes)
    ends = np.append(starts[1:], n) - 1
    g = len(starts)

    if not f.is_calendar:
        # index space = raw int64 timestamps
        idx = ts_np.astype(np.int64)
        step = f.step(unit)
        lo = np.full(g, _to_i64(start_date, unit), dtype=np.int64) if start_date is not None else idx[starts]
        hi = np.full(g, _to_i64(end_date, unit), dtype=np.int64) if end_date is not None else idx[ends]
        a0 = lo  # grid anchors exactly at lo
        on_extra = np.ones(n, dtype=bool)

        def to_dt(grid_idx: np.ndarray) -> np.ndarray:
            return grid_idx.astype(f"datetime64[{unit}]")
    else:
        # index space = months since 1970 (datetime64[M]); date_range anchor
        # semantics: first UNIT anchor (month/quarter/year start) >= lo,
        # stepping n units from there
        k = _CAL_UNIT_MONTHS[f.unit]
        step = f.n * k
        ts_m64 = ts_np.astype("datetime64[M]")
        idx = ts_m64.astype(np.int64)
        on_extra = ts_m64.astype(ts_np.dtype) == ts_np  # exact period starts only
        if start_date is not None:
            lo_t = np.full(g, np.datetime64(pd.Timestamp(start_date), unit))
        else:
            lo_t = ts_np[starts]
        if end_date is not None:
            hi_t = np.full(g, np.datetime64(pd.Timestamp(end_date), unit))
        else:
            hi_t = ts_np[ends]
        lo_m = lo_t.astype("datetime64[M]")
        a = lo_m.astype(np.int64) + (lo_t > lo_m.astype(lo_t.dtype)).astype(np.int64)
        # ceil to the unit anchor (quarter/year starts are month % k == 0)
        a0 = -(-a // k) * k
        lo = a0
        hi = hi_t.astype("datetime64[M]").astype(np.int64)

        def to_dt(grid_idx: np.ndarray) -> np.ndarray:
            return grid_idx.astype("datetime64[M]").astype(f"datetime64[{unit}]")

    counts = np.maximum((hi - a0) // step + 1, 0)
    total = int(counts.sum())
    if total > max_total_rows:
        worst = int(counts.max())
        raise ValueError(
            f"pad_by_time grid would produce {total:,} rows in one partition "
            f"(largest group: {worst:,}); the frequency is too fine for the "
            f"group time spans — use a coarser freq, explicit start/end "
            f"bounds, or raise max_total_rows"
        )

    grid_gidx = np.repeat(np.arange(g, dtype=np.int64), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - offsets[grid_gidx]
    grid_idx = a0[grid_gidx] + within * step

    # scatter original rows onto the grid (off-grid / out-of-bounds drop)
    rel = idx - a0[codes]
    on = (rel >= 0) & (rel % step == 0) & (idx <= hi[codes]) & (counts[codes] > 0) & on_extra
    pos = offsets[codes] + np.where(on, rel // step, 0)

    out = {}
    out[date_column] = to_dt(grid_idx)
    row_of_group_first = starts  # for key columns
    for col in part.columns:
        if col == date_column:
            continue
        if col in group_keys:
            out[col] = part[col].to_numpy()[row_of_group_first][grid_gidx]
            continue
        src = part[col].to_numpy()
        if src.dtype.kind in "iuf":
            dst = np.full(total, np.nan, dtype=np.float64)
            dst[pos[on]] = src[on].astype(np.float64)
        elif src.dtype.kind == "M":
            dst = np.full(total, np.datetime64("NaT"), dtype=src.dtype)
            dst[pos[on]] = src[on]
        else:
            dst = np.full(total, None, dtype=object)
            dst[pos[on]] = src[on]
        out[col] = dst

    padded = pd.DataFrame(out, columns=list(part.columns))

    other = [c for c in part.columns if c != date_column and c not in group_keys]
    if fillna is not None:
        padded[other] = padded[other].fillna(fillna)
        return padded

    # constant-column forward fill, per group, per reference semantics.
    # ``const_ffill=False`` disables it (gap rows stay null in EVERY non-key
    # column) — required by callers that must distinguish gap rows afterwards
    # (the tier cascade: a count column constant within a group would
    # otherwise be ffilled onto gap rows, inflating upper-tier counts).
    if other and g > 0 and const_ffill:
        nun = part.groupby(codes, sort=False)[other].nunique(dropna=False)
        for col in other:
            const_groups = nun.index[nun[col].to_numpy() == 1].to_numpy()
            if len(const_groups) == 0:
                continue
            is_const_row = np.isin(grid_gidx, const_groups)
            if not is_const_row.any():
                continue
            ff = padded.groupby(grid_gidx, sort=False)[col].ffill()
            padded[col] = padded[col].where(~is_const_row, ff)
    return padded


def _to_i64(value, unit: str) -> int:
    return int(np.datetime64(pd.Timestamp(value), unit).astype(np.int64))
