"""apply_by_time — resample buckets + arbitrary named Python aggregations.

Reference: src/pytimetk/core/apply_by_time.py:54-70 (signature: ``freq`` +
``**named_funcs``), :307-356 (``resample(freq).apply``).  This is the
engine's UDF escape hatch: each named function receives the bucket's
DataFrame and returns a scalar; outputs are columns named after the kwargs.

Execution: floor to bucket (zero-copy Arrow kernel) then hash-partition by
the group keys — ONE task per partition iterates its buckets with a pandas
groupby-apply (the UDFs ride along as cloudpickled callables).  One task per
partition (thousands of buckets each), not one task per bucket.  For
built-in aggregations use ``summarize_by_time`` (vectorized) instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.kernels.bucket import add_bucket_column


def apply_by_time(
    ds: rd.Dataset,
    date_column: str,
    *,
    freq: str = "D",
    by: Sequence[str] = (),
    bucket_column: str = "bucket_ts",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **named_funcs: Callable[[pd.DataFrame], object],
) -> rd.Dataset:
    """One output row per (by..., bucket): ``{name: fn(bucket_df)}``."""
    by = list(by)
    if not named_funcs:
        raise ValueError("provide at least one named aggregation function")

    ds = ds.map_batches(
        add_bucket_column,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs=dict(date_column=date_column, freq=freq, out_column=bucket_column),
        zero_copy_batch=True,
    )

    keys = by + [bucket_column]
    part_keys = by if by else [bucket_column]

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        out_keys: dict[str, list] = {k: [] for k in keys}
        out_vals: dict[str, list] = {name: [] for name in named_funcs}
        for kv, g in part.groupby(keys, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            for k, v in zip(keys, kv):
                out_keys[k].append(v)
            for name, fn in named_funcs.items():
                out_vals[name].append(fn(g))
        return pd.DataFrame({**out_keys, **out_vals})

    return partitioned_group_map(
        ds, part_keys, kernel, sort_by=keys,
        num_partitions=num_partitions if by else min(num_partitions, 16),
    )
