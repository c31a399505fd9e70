"""filter_by_time — timestamp-range predicate with smart end-date expansion.

Reference: src/pytimetk/core/filter_by_time.py:200-295; the end-date
granularity expansion ("2023-02" means through 2023-02-28 23:59:59.999...)
is ``parse_end_date`` (src/pytimetk/utils/datetime_helpers.py:626-646) —
reimplemented here with ``pandas.Period(...).end_time``, which encodes the
same rule.

Execution: a vectorized Arrow mask inside ``map_batches`` (zero-copy), and —
because the predicate is a plain range on one column — Parquet row-group
pruning via ``read_parquet(filter=...)`` when callers construct the read
themselves (ops.filter_expression returns the pushdown expression).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _parse_start(v, unit: str):
    return pa.scalar(pd.Timestamp(v).as_unit(unit), type=pa.timestamp(unit))


def _parse_end(v, unit: str):
    if isinstance(v, str):
        end = pd.Period(v).end_time  # granularity-aware: "2023-02" -> month end
    else:
        end = pd.Timestamp(v)
    return pa.scalar(end.as_unit(unit), type=pa.timestamp(unit))


def filter_by_time(
    ds: rd.Dataset,
    date_column: str,
    start_date=None,
    end_date=None,
) -> rd.Dataset:
    """Keep rows with ``start_date <= date_column <= end_date`` (inclusive,
    end expanded to the end of its granularity when given as a string)."""

    def apply(batch: pa.Table) -> pa.Table:
        col = batch[date_column]
        unit = col.type.unit
        mask = None
        if start_date is not None:
            mask = pc.greater_equal(col, _parse_start(start_date, unit))
        if end_date is not None:
            m2 = pc.less_equal(col, _parse_end(end_date, unit))
            mask = m2 if mask is None else pc.and_(mask, m2)
        if mask is None:
            return batch
        return batch.filter(mask)

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def filter_expression(date_column: str, start_date=None, end_date=None, unit: str = "us"):
    """Pushdown expression for ``ray.data.read_parquet(filter=...)`` — prunes
    row groups at the read (the scale path for selective time filters)."""
    expr = None
    if start_date is not None:
        e = pc.field(date_column) >= pd.Timestamp(start_date).as_unit(unit)
        expr = e
    if end_date is not None:
        end = pd.Period(end_date).end_time if isinstance(end_date, str) else pd.Timestamp(end_date)
        e = pc.field(date_column) <= end.as_unit(unit)
        expr = e if expr is None else expr & e
    return expr
