"""pad_by_time — make irregular series regular (Dataset-level operator).

Reference: src/pytimetk/core/pad.py:91-104 (signature) / :360-446 (behavior).
Execution: when ``start_date``/``end_date`` are explicit, every group's grid
is independent of global state, so the op is embarrassingly parallel; either
way the kernel runs per hash partition over whole groups
(kernels/gapfill.pad_groups — vectorized across groups, no per-group
date_range loop)."""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.kernels.gapfill import pad_groups


def pad_by_time(
    ds: rd.Dataset,
    date_column: str,
    *,
    freq: str = "D",
    by: Sequence[str] = (),
    start_date=None,
    end_date=None,
    fillna=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Pad each ``by``-group of ``ds`` onto a dense ``freq`` grid.

    Default bounds are each group's min/max timestamp; ``fillna`` fills new
    rows' value columns; with ``fillna=None`` new rows are null except
    group-constant columns, which forward-fill.
    """
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        return pad_groups(
            part,
            by,
            date_column,
            freq,
            start_date=start_date,
            end_date=end_date,
            fillna=fillna,
        )

    if not by:
        # single global series: run in one task (bounded output); still via
        # the same kernel for identical semantics
        return partitioned_group_map(
            ds, [], kernel, sort_by=[date_column], num_partitions=1
        )
    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column], num_partitions=num_partitions
    )
