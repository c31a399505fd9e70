"""summarize_by_time — resample to a frequency grid and aggregate (the
flagship shuffle).

Semantics of the reference's ``summarize_by_time``
(src/pytimetk/core/summarize_by_time.py:38-52; pandas core
``set_index(date).groupby(keys).resample(freq).agg(dict)`` :362-441), built
Ray-Data-first:

    read → map_batches(floor ts to bucket, zero-copy Arrow)
         → groupby(group_keys + [bucket_ts]).aggregate(Sum/Count/Min/Max/...)

Ray's hash aggregate does partial (per-block) combine before the shuffle, so
the exchange carries one row per (group, bucket) per block — the pre-aggregate
pattern that keeps this viable at 100 TB.  Empty buckets are NOT emitted
(callers wanting a dense grid compose with ``pad_by_time``); this matches
SQL ``GROUP BY date_trunc(...)`` and is the composable tier-rollup kernel:
raw→1m→1h→1d is this operator applied three times, each tier reading the
previous (sum/count/min/max re-aggregate exactly; mean derived at read).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from pytimetk_ray.kernels.bucket import add_bucket_column

_AGGS = {
    "sum": Sum,
    "mean": Mean,
    "min": Min,
    "max": Max,
    "std": Std,
    "count": Count,
}


def summarize_by_time(
    ds: rd.Dataset,
    date_column: str,
    value_column: str | Sequence[str],
    *,
    freq: str = "D",
    agg_func: str | Sequence[str] = "sum",
    by: Sequence[str] = (),
    bucket_column: str = "bucket_ts",
    wide_format: bool = False,
    fillna=0,
) -> rd.Dataset:
    """Aggregate ``value_column``(s) per (by..., floor(date_column, freq)).

    Output columns are named ``{col}_{func}`` (e.g. ``value_sum``); ``count``
    counts non-null values of the column.  ``wide_format=True`` pivots the
    (small) aggregated result driver-side like the reference's ``unstack``
    path (summarize_by_time.py:413-418) and returns a pandas DataFrame.
    """
    value_cols = [value_column] if isinstance(value_column, str) else list(value_column)
    funcs = [agg_func] if isinstance(agg_func, str) else list(agg_func)
    by = list(by)

    needed = sorted(set(by + [date_column] + value_cols))
    ds = ds.select_columns([c for c in needed if c in ds.schema().names])

    ds = ds.map_batches(
        add_bucket_column,
        batch_format="pyarrow",
        fn_kwargs=dict(date_column=date_column, freq=freq, out_column=bucket_column),
        zero_copy_batch=True,
    )

    aggs = []
    for col in value_cols:
        for f in funcs:
            if f not in _AGGS:
                raise ValueError(f"unsupported agg_func {f!r}; use groupby().map_groups for UDFs")
            cls = _AGGS[f]
            alias = f"{col}_{f}"
            aggs.append(cls(on=col, alias_name=alias))

    out = ds.groupby(by + [bucket_column]).aggregate(*aggs)

    if wide_format:
        pdf = out.to_pandas()
        if by:
            pdf = pdf.pivot_table(
                index=bucket_column,
                columns=by,
                values=[f"{c}_{f}" for c in value_cols for f in funcs],
                fill_value=fillna,
            )
            pdf.columns = ["_".join(str(p) for p in tup) for tup in pdf.columns]
            pdf = pdf.reset_index()
        return pdf
    return out


def cast_bucket_to_us(batch: pa.Table, bucket_column: str = "bucket_ts") -> pa.Table:
    """Cast a bucket column to timestamp[us] (DuckDB's native unit) so oracle
    comparisons hash identically."""
    i = batch.column_names.index(bucket_column)
    return batch.set_column(
        i, bucket_column, batch[bucket_column].cast(pa.timestamp("us"))
    )
