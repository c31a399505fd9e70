"""Frame utilities: glimpse, drop_zero_variance, transform_columns,
floor_date / ceil_date dataset ops.

Reference: src/pytimetk/utils/pandas_helpers.py:17-331 (glimpse,
drop_zero_variance, transform_columns) and utils/datetime_helpers.py
floor_date/ceil_date (:336-547) — the floor/ceil kernels are
pytimetk_ray.freq; here they are exposed as Dataset column transforms."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pytimetk_ray.kernels.bucket import add_bucket_column
from pytimetk_ray.selection import resolve_column_selection


def floor_date(ds: rd.Dataset, date_column: str, freq: str,
               out_column: str | None = None) -> rd.Dataset:
    """Append (or replace) a floored timestamp column."""
    return ds.map_batches(
        add_bucket_column,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        fn_kwargs=dict(date_column=date_column, freq=freq,
                       out_column=out_column or date_column),
    )


def ceil_date(ds: rd.Dataset, date_column: str, freq: str,
              out_column: str | None = None) -> rd.Dataset:
    from pytimetk_ray.freq import ceil_i64

    out = out_column or date_column

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[date_column].combine_chunks()
        i64 = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ceiled = ceil_i64(i64, col.type.unit, freq)
        arr = pa.array(ceiled).cast(pa.timestamp(col.type.unit, col.type.tz))
        if out in batch.column_names:
            return batch.set_column(batch.column_names.index(out), out, arr)
        return batch.append_column(out, arr)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def glimpse(ds: rd.Dataset, max_width: int = 76) -> str:
    """dplyr-style schema + sample preview string (driver-side)."""
    schema = ds.schema()
    sample = ds.limit(8).to_pandas()
    lines = [f"Dataset: {ds.count()} rows x {len(schema.names)} columns"]
    for name in schema.names:
        vals = ", ".join(str(v) for v in sample[name].tolist()) if name in sample else ""
        t = str(dict(zip(schema.names, schema.types))[name])
        lines.append(f"$ {name:<20} <{t}> {vals}"[:max_width])
    return "\n".join(lines)


def drop_zero_variance(ds: rd.Dataset) -> rd.Dataset:
    """Drop columns with a single distinct value (global check via per-batch
    distinct-ish partials collected driver-side — column metadata scale)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in batch.columns:
            u = batch[c].dropna().unique()
            rows.append({"col": c, "n_unique_capped": min(len(u), 2),
                         "sample": str(u[0]) if len(u) else None})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    keep = []
    for c, g in parts.groupby("col", sort=False):
        if g["n_unique_capped"].max() > 1 or g["sample"].nunique() > 1:
            keep.append(c)
    keep = [c for c in ds.schema().names if c in keep]
    return ds.select_columns(keep)


def transform_columns(ds: rd.Dataset, columns, fn: Callable[[pd.Series], pd.Series]) -> rd.Dataset:
    """Apply a vectorized transform to selected columns (tidy selectors ok)."""
    cols = resolve_column_selection(ds.schema().names, columns)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            batch[c] = fn(batch[c])
        return batch

    return ds.map_batches(apply, batch_format="pandas")


def sort_dataset(ds: rd.Dataset, group_keys: Sequence[str], date_column: str) -> rd.Dataset:
    """Canonical (group, date) global sort — reference sort_dataframe
    (pandas_helpers.py:136-198).  A full distributed sort; prefer the
    hash-partition + within-partition sort (exec.partitioned_group_map) when
    only per-group order matters."""
    return ds.sort(list(group_keys) + [date_column])
