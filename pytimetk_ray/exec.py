"""Execution utilities: hash-partitioned per-group processing on Ray Data.

The engine's per-conversation ordered kernels (lags, rolling, ewm, gap-fill,
anomalize...) need each group wholly inside one task, sorted by
``(group, ts)``.  The reference does this by materializing every group on the
driver and fanning out one Ray task per group
(reference: src/pytimetk/utils/ray_helpers.py:43-93, rolling.py:568-581) —
which does not scale.  Here we instead:

1. add a deterministic hash-partition column ``__part__ = H(key) % P`` in a
   vectorized ``map_batches`` (no driver materialization),
2. ``groupby("__part__").map_groups(...)`` so ONE task receives ONE partition
   containing MANY whole groups,
3. run a segment-vectorized kernel across all groups in the partition
   (pandas ``groupby`` inside the task runs at C speed).

This keeps the task count bounded (P ≈ 2-4× cluster cores), the per-task
Python overhead amortized over thousands of groups, and the shuffle a single
all-to-all keyed exchange.  At 100 TB the same plan holds: P scales with the
cluster, not with the number of conversations.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

DEFAULT_NUM_PARTITIONS = 64
PART_COL = "__part__"


def _hash_partition_batch(batch: pd.DataFrame, keys: Sequence[str], num_partitions: int) -> pd.DataFrame:
    """Deterministic (process-independent) hash of the key columns mod P."""
    h = np.zeros(len(batch), dtype=np.uint64)
    for k in keys:
        h = h * np.uint64(1000003) + pd.util.hash_array(batch[k].to_numpy())
    batch[PART_COL] = (h % np.uint64(num_partitions)).astype(np.int64)
    return batch


def partitioned_group_map(
    ds: rd.Dataset,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    sort_by: Sequence[str] | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    batch_format: str = "pandas",
    with_partition_id: bool = False,
) -> rd.Dataset:
    """Apply ``fn`` to each hash partition (many whole groups per call).

    ``fn`` receives a DataFrame holding every row of the partition, sorted by
    ``sort_by`` (default: ``keys``) with a stable mergesort so per-group row
    order is deterministic.  ``fn`` must be segment-safe: it may assume all
    rows of any group value are present, but multiple groups are in the frame
    (use ``df.groupby(keys, sort=False)`` inside).
    """
    keys = list(keys)
    sort_cols = list(sort_by) if sort_by is not None else keys

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        return _hash_partition_batch(batch, keys, num_partitions)

    def run_partition(part: pd.DataFrame) -> pd.DataFrame:
        pid = int(part[PART_COL].iloc[0]) if len(part) else 0
        part = part.drop(columns=[PART_COL])
        if sort_cols:
            part = part.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        out = fn(part, pid) if with_partition_id else fn(part)
        return out

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby(PART_COL)
        .map_groups(run_partition, batch_format=batch_format)
    )


def group_starts(codes: np.ndarray) -> np.ndarray:
    """Start indices of each run in a sorted group-code array (first index 0)."""
    if len(codes) == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.empty(len(codes), dtype=bool)
    change[0] = True
    np.not_equal(codes[1:], codes[:-1], out=change[1:])
    return np.flatnonzero(change)


def row_number_in_group(codes: np.ndarray) -> np.ndarray:
    """0-based row index within each group for a sorted group-code array."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    starts = group_starts(codes)
    idx = np.arange(n, dtype=np.int64)
    return idx - np.repeat(starts, np.diff(np.append(starts, n)))


def ts_unit(tbl_or_schema) -> str:
    """Storage unit ('s'|'ms'|'us'|'ns') of a timestamp column's Arrow type."""
    if isinstance(tbl_or_schema, pa.DataType):
        return tbl_or_schema.unit
    raise TypeError(type(tbl_or_schema))
