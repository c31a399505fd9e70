"""summarize_by_time — resample to a frequency grid and aggregate (the
flagship shuffle).

Semantics of the reference's ``summarize_by_time``
(src/pytimetk/core/summarize_by_time.py:38-52; pandas core
``set_index(date).groupby(keys).resample(freq).agg(dict)`` :362-441), built
Ray-Data-first:

    read → select_columns (prune BEFORE the shuffle)
         → map_batches(floor ts to bucket, zero-copy Arrow, whole blocks)
         → hash-partition by the group keys → ONE pandas groupby-aggregate
           per partition (complete, not partial: every group lives wholly in
           one partition, so no second reduce is needed)

Two engines:

- ``engine="partition"`` (default): the layout above.  Benchmarked ~4-8x
  faster than Ray's sort-based ``groupby().aggregate()`` on this corpus and
  — because each (group, bucket) is aggregated by pandas inside one task in
  sorted order — BIT-EQUAL to the pandas oracle (no combine-order
  nondeterminism; SURVEY.md §4 determinism row).
- ``engine="ray"``: Ray's native hash aggregate (partial+final combine).
  Useful when group keys are near-unique so no partition fits them; float
  sums then depend on combine order.

Empty buckets are NOT emitted (compose with ``pad_by_time`` for dense
grids); this matches SQL ``GROUP BY date_trunc(...)``.  The tier cascade is
this operator applied 3x (raw→1m→1h→1d), each tier reading the previous.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.kernels.bucket import add_bucket_column

_RAY_AGGS = {"sum": Sum, "mean": Mean, "min": Min, "max": Max, "std": Std, "count": Count}
_PD_FUNCS = {"sum", "mean", "min", "max", "std", "var", "count", "median", "first", "last"}


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
    engine: str = "partition",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Aggregate ``value_column``(s) per (by..., floor(date_column, freq)).

    Output columns are named ``{col}_{func}`` (e.g. ``value_sum``); ``count``
    counts non-null values.  ``wide_format=True`` pivots the (small)
    aggregated result driver-side like the reference's ``unstack`` path
    (summarize_by_time.py:413-418) and returns a pandas DataFrame.
    """
    value_cols = [value_column] if isinstance(value_column, str) else list(value_column)
    funcs = [agg_func] if isinstance(agg_func, str) else list(agg_func)
    by = list(by)

    needed = sorted(set(by + [date_column] + value_cols))
    ds = ds.select_columns([c for c in needed if c in ds.schema().names])

    ds = ds.map_batches(
        add_bucket_column,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs=dict(date_column=date_column, freq=freq, out_column=bucket_column),
        zero_copy_batch=True,
    )

    if engine == "partition":
        named = {}
        for col in value_cols:
            for f in funcs:
                if f not in _PD_FUNCS:
                    raise ValueError(f"unsupported agg_func {f!r}")
                named[f"{col}_{f}"] = (col, f)
        group_cols = by + [bucket_column]

        def kernel(part: pd.DataFrame) -> pd.DataFrame:
            return part.groupby(group_cols, sort=False).agg(**named).reset_index()

        # partition by the BY keys so each group (and all its buckets) lands
        # wholly in one task; with no keys, partition by the bucket itself
        part_keys = by if by else [bucket_column]
        out = partitioned_group_map(
            ds.drop_columns([date_column]) if date_column != bucket_column else ds,
            part_keys,
            kernel,
            sort_by=group_cols,
            num_partitions=num_partitions,
        )
    elif engine == "ray":
        aggs = []
        for col in value_cols:
            for f in funcs:
                if f not in _RAY_AGGS:
                    raise ValueError(f"unsupported agg_func {f!r} for engine='ray'")
                aggs.append(_RAY_AGGS[f](on=col, alias_name=f"{col}_{f}"))
        out = ds.groupby(by + [bucket_column]).aggregate(*aggs)
    else:
        raise ValueError(f"unknown engine {engine!r}")

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
