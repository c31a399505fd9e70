"""apply_by_time — resample buckets + arbitrary named Python aggregations.

Reference: src/pytimetk/core/apply_by_time.py:54-70 (signature: ``freq`` +
``**named_funcs``), :307-356 (``resample(freq).apply``).  This is the
engine's UDF escape hatch: each named function receives the bucket's
DataFrame and returns a scalar; outputs are columns named after the kwargs.

Execution: floor to bucket (zero-copy Arrow kernel) then
``groupby(group_keys + [bucket]).map_groups`` — the UDFs ride along as
cloudpickled callables; Ray schedules one task per group with backpressure.
For built-in aggregations use ``summarize_by_time`` (vectorized hash
aggregate) instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.kernels.bucket import add_bucket_column


def apply_by_time(
    ds: rd.Dataset,
    date_column: str,
    *,
    freq: str = "D",
    by: Sequence[str] = (),
    bucket_column: str = "bucket_ts",
    **named_funcs: Callable[[pd.DataFrame], object],
) -> rd.Dataset:
    """One output row per (by..., bucket): ``{name: fn(bucket_df)}``."""
    by = list(by)
    if not named_funcs:
        raise ValueError("provide at least one named aggregation function")

    ds = ds.map_batches(
        add_bucket_column,
        batch_format="pyarrow",
        fn_kwargs=dict(date_column=date_column, freq=freq, out_column=bucket_column),
        zero_copy_batch=True,
    )

    keys = by + [bucket_column]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        row = {k: [g[k].iloc[0]] for k in keys}
        for name, fn in named_funcs.items():
            row[name] = [fn(g)]
        return pd.DataFrame(row)

    return ds.groupby(keys).map_groups(per_bucket, batch_format="pandas")
