"""Per-batch bucket (floor-to-frequency) kernel — the engine's hot path.

Zero-copy Arrow in / Arrow out: the timestamp column is viewed as int64 in
its own storage unit, floored with vectorized integer math
(pytimetk_ray.freq.floor_i64, semantics of the reference's ``floor_date``,
src/pytimetk/utils/datetime_helpers.py:336-465), and appended as a new
timestamp column of the same unit.  No pandas, no Python per-row work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pytimetk_ray.freq import floor_i64


def add_bucket_column(
    batch: pa.Table,
    date_column: str,
    freq: str,
    out_column: str = "bucket_ts",
) -> pa.Table:
    """Append ``out_column`` = floor(date_column, freq) to an Arrow batch."""
    col = batch[date_column]
    typ = col.type
    if not pa.types.is_timestamp(typ):
        raise TypeError(f"{date_column} must be a timestamp column, got {typ}")
    arr = col.combine_chunks()
    i64 = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    floored = floor_i64(i64, typ.unit, freq)
    out = pa.Array.from_buffers(
        pa.int64(), len(floored), [None, pa.py_buffer(np.ascontiguousarray(floored))]
    ).cast(pa.timestamp(typ.unit, typ.tz))
    if arr.null_count:
        # preserve nulls from the input timestamps
        import pyarrow.compute as pc

        out = pc.if_else(pc.is_valid(arr), out, pa.scalar(None, out.type))
    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, out)
