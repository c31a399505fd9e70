"""Distributed joins: broadcast hash, co-partitioned hash, and as-of.

Ray Data (2.49) has no join operator; these close the gap with the three
shapes a 100 TB pipeline actually needs, each built on primitives this
engine already trusts:

- ``broadcast_join`` — the dimension-table join: the small side is put in
  the object store ONCE (``ray.put``) and loaded per actor in ``__init__``
  (never re-shipped per batch); the big side streams through a stateless
  pandas merge per batch.  No shuffle at all.  Use when one side fits in a
  worker's heap (dimension tables, lookup maps).
- ``hash_join`` — the big-big equality join: both sides are padded to one
  common schema with a side tag, unioned, and hash-partitioned by the key
  through ``exec.partitioned_group_map`` (the co-partition-merge pattern
  from ``pipelines/dedup.ngram_jaccard_pairs``); each partition splits by
  side and runs one vectorized pandas merge.  ONE keyed exchange total —
  both sides ride the same shuffle.
- ``asof_join`` — the time-series point-in-time join (feature-store
  correctness: each left row sees the latest right row at-or-before its
  timestamp, per key).  Same co-partition shape, sorted by the time column
  inside the partition, ``pd.merge_asof`` per partition.  DuckDB's native
  ASOF JOIN is the SQL oracle.

Padding fills are typed per the OWNING side's Arrow schema (never read —
masked by the side tag — but they keep every unioned batch block-schema
identical, which Ray's streaming executor wants).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

_SIDE = "__side__"


def _fill_array(t: pa.DataType, n: int):
    """A typed never-read filler column for the non-owning side."""
    if pa.types.is_timestamp(t):
        return np.zeros(n, dtype=f"datetime64[{t.unit}]")
    if pa.types.is_floating(t):
        return np.full(n, np.nan)
    if pa.types.is_integer(t):
        return np.zeros(n, dtype=t.to_pandas_dtype())
    if pa.types.is_boolean(t):
        return np.zeros(n, dtype=bool)
    return pd.Series([""] * n, dtype=object)


def _norm_type(t) -> pa.DataType:
    """Schema types are Arrow for Arrow-block datasets but numpy dtypes for
    pandas-block ones (from_pandas) — normalize to Arrow."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == object:
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _schema_types(ds: rd.Dataset) -> dict[str, pa.DataType]:
    s = ds.schema()
    return {n: _norm_type(t) for n, t in zip(s.names, s.types)}


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def broadcast_join(
    ds: rd.Dataset,
    small,
    *,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
    max_rows: int = 2_000_000,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Join the streaming ``ds`` against a small in-memory side.

    ``small`` is a pandas DataFrame or a Dataset (materialized here, guarded
    by ``max_rows`` — exceeding it means this is not a broadcast-shaped join;
    use ``hash_join``).  Right key columns are dropped from the output when
    their names differ from the left's (the values are equal by definition).
    """
    left_on = _as_list(left_on)
    right_on = left_on if right_on is None else _as_list(right_on)
    if isinstance(small, rd.Dataset):
        n = small.count()
        if n > max_rows:
            raise ValueError(
                f"broadcast side has {n} rows > max_rows={max_rows}; "
                "use hash_join for big-big joins")
        small = small.to_pandas()
    ref = ray.put(small)
    drop = [c for c in right_on if c not in left_on]
    if concurrency is None:
        # an actor pool claiming every CPU starves upstream read tasks and
        # deadlocks the streaming pipeline (NOTES_r1) — cap at half
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 2)) // 2)

    class _Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(self.small, left_on=left_on, right_on=right_on,
                              how=how, suffixes=("", suffix))
            return out.drop(columns=[c for c in drop if c in out.columns])

    return ds.map_batches(_Joiner, batch_format="pandas",
                          concurrency=concurrency)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Big-big equality join via ONE co-partitioning exchange.

    Output columns: every left column (keys keep the LEFT names), then every
    right non-key column (suffixed on name clash).  ``how`` is ``inner`` or
    ``left``; because partitions hold every row of a key, left rows with no
    match surface with typed-null right columns from the in-partition merge.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    left_on = _as_list(left_on)
    right_on = left_on if right_on is None else _as_list(right_on)
    ltypes = _schema_types(left)
    rtypes = _schema_types(right)
    left_other = [c for c in ltypes if c not in left_on]
    right_other_src = [c for c in rtypes if c not in right_on]
    right_out = {c: (c + suffix if c in ltypes else c)
                 for c in right_other_src}

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        # .to_numpy(): a Series with a non-reset index (e.g. upstream
        # drop_duplicates) would ALIGN against the fill arrays' fresh
        # RangeIndex and crash/misplace rows (NOTES_r3 lesson)
        n = len(batch)
        out = {k: batch[k].to_numpy() for k in left_on}
        out.update({c: batch[c].to_numpy() for c in left_other})
        out.update({right_out[c]: _fill_array(rtypes[c], n)
                    for c in right_other_src})
        out[_SIDE] = np.zeros(n, dtype=np.int8)
        return pd.DataFrame(out)

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = {k: batch[rk].to_numpy() for k, rk in zip(left_on, right_on)}
        out.update({c: _fill_array(ltypes[c], n) for c in left_other})
        out.update({right_out[c]: batch[c].to_numpy()
                    for c in right_other_src})
        out[_SIDE] = np.ones(n, dtype=np.int8)
        return pd.DataFrame(out)

    unioned = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))
    rcols = [right_out[c] for c in right_other_src]

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        side = part[_SIDE].to_numpy()
        lf = part.loc[side == 0, left_on + left_other]
        rf = part.loc[side == 1, left_on + rcols]
        return lf.merge(rf, on=left_on, how=how)

    return partitioned_group_map(unioned, left_on, merge, sort_by=left_on,
                                 num_partitions=num_partitions)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str | Sequence[str],
    on: str,
    right_on: str | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    suffix: str = "_r",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Point-in-time join: each left row picks the latest right row with
    ``right.on <= left.on`` within the same ``by`` key (``direction``
    ``backward``; ``forward``/``nearest`` as in ``pd.merge_asof``).

    The matched right timestamp rides along as ``{on}{suffix}``; right value
    columns are suffixed on name clash.  Unmatched left rows keep typed
    nulls (LEFT-join semantics, like SQL ASOF LEFT JOIN).
    """
    by = _as_list(by)
    r_on = right_on or on
    ltypes = _schema_types(left)
    rtypes = _schema_types(right)
    left_other = [c for c in ltypes if c not in by and c != on]
    right_val_src = [c for c in rtypes if c not in by and c != r_on]
    right_out = {c: (c + suffix if c in ltypes else c) for c in right_val_src}
    on_r = on + suffix
    tol = pd.Timedelta(tolerance) if tolerance is not None else None

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = {k: batch[k] for k in by}
        out[on] = batch[on]
        out.update({c: batch[c] for c in left_other})
        out[on_r] = _fill_array(rtypes[r_on], n)
        out.update({right_out[c]: _fill_array(rtypes[c], n)
                    for c in right_val_src})
        out[_SIDE] = np.zeros(n, dtype=np.int8)
        return pd.DataFrame(out)

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = {k: batch[k] for k in by}
        out[on] = batch[r_on]
        out.update({c: _fill_array(ltypes[c], n) for c in left_other})
        out[on_r] = batch[r_on]
        out.update({right_out[c]: batch[c] for c in right_val_src})
        out[_SIDE] = np.ones(n, dtype=np.int8)
        return pd.DataFrame(out)

    unioned = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))
    rcols = [on_r] + [right_out[c] for c in right_val_src]

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        side = part[_SIDE].to_numpy()
        # merge_asof needs each frame globally sorted by `on` (mergesort:
        # deterministic among equal timestamps); the right frame carries the
        # match time twice — `on` is consumed by the asof, `on_r` rides along
        lf = part.loc[side == 0, by + [on] + left_other].sort_values(
            on, kind="mergesort")
        rf = part.loc[side == 1, by + [on] + rcols].sort_values(
            on, kind="mergesort")
        return pd.merge_asof(lf, rf, on=on, by=by, direction=direction,
                             tolerance=tol)

    return partitioned_group_map(unioned, by, merge, sort_by=by + [on],
                                 num_partitions=num_partitions)
