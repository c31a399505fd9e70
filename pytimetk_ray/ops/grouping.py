"""GROUPING SETS / ROLLUP / CUBE aggregation over categorical keys.

SQL's multi-granularity aggregates (GROUP BY GROUPING SETS / CUBE) as a
Ray Data operator: each grouping set runs the engine's standard
partial-agg combiner (per-batch distinct-group partials -> keyed reduce),
absent key columns are filled with a sentinel, and the per-set results
union into one frame — exactly the UNION ALL a SQL engine lowers grouping
sets to.

Scale: each set's exchange carries one row per distinct group per batch
(the combiner pattern), so the total cost is sum over sets of that — the
coarse sets ((), (lang,)) are nearly free.  All counts/sums are exact
integers here, so the oracle needs no rounding.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map


def cube_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """All 2**k subsets of ``keys`` (CUBE)."""
    keys = list(keys)
    out: list[tuple[str, ...]] = [()]
    for k in keys:
        out += [s + (k,) for s in out]
    return sorted(out, key=lambda s: (len(s), s))


def rollup_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """Prefix hierarchy of ``keys`` (ROLLUP)."""
    keys = list(keys)
    return [tuple(keys[:i]) for i in range(len(keys), -1, -1)]


def aggregate_grouping_sets(
    ds: rd.Dataset,
    sets: Sequence[Sequence[str]],
    value_column: str,
    *,
    fill: str = "(all)",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Count + sum ``value_column`` at every granularity in ``sets``.

    Output columns: every key appearing in any set (missing keys filled
    with ``fill`` — the COALESCE sentinel the SQL oracle also uses),
    ``n_rows`` and ``<value_column>_sum``.
    """
    sch = ds.schema()
    t = sch.types[sch.names.index(value_column)]
    if isinstance(t, pa.DataType):
        is_int = pa.types.is_integer(t)
    else:  # pandas-block schema: numpy or pandas extension dtype
        try:
            is_int = np.dtype(t).kind in "iu"
        except TypeError:
            is_int = getattr(t, "kind", "?") in "iu"
    if not is_int:
        raise TypeError(
            f"aggregate_grouping_sets requires an integer value column for "
            f"exact partial-sum combining; {value_column!r} is {t}. "
            f"Cast/round upstream, or sum floats with summarize_by_time.")
    sets = [tuple(s) for s in sets]
    all_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in all_keys:
                all_keys.append(k)
    sum_col = f"{value_column}_sum"

    def make_partial(keys: tuple[str, ...]):
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            if keys:
                g = (batch.groupby(list(keys), sort=False)[value_column]
                     .agg(["size", "sum"]).reset_index())
            else:
                g = pd.DataFrame({
                    "size": [len(batch)],
                    "sum": [int(batch[value_column].sum())]})
            g = g.rename(columns={"size": "n_rows", "sum": sum_col})
            for k in all_keys:
                if k not in keys:
                    g[k] = fill
            g["n_rows"] = g["n_rows"].astype(np.int64)
            g[sum_col] = g[sum_col].astype(np.int64)
            return g[all_keys + ["n_rows", sum_col]]

        return partial

    def reduce_sum(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby(all_keys, sort=False)[["n_rows", sum_col]]
                .sum().reset_index())

    outs = []
    for s in sets:
        partials = ds.map_batches(make_partial(s), batch_format="pandas")
        outs.append(partitioned_group_map(
            partials, all_keys, reduce_sum, sort_by=list(all_keys),
            num_partitions=num_partitions if s else 1))
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.union(o)
    return acc
