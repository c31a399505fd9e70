"""reduce_memory_usage — smallest-width casts + dictionary encoding.

Reference: src/pytimetk/utils/memory_helpers.py:11-145 (downcast ints and
floats, strings -> categorical).  Arrow-native: integer columns cast to the
smallest width that fits their observed range, float64 -> float32 only when
``allow_lossy``, low-cardinality strings dictionary-encoded.  Runs as a
stateless zero-copy-in ``map_batches`` (per-batch ranges; a stricter global
pass would aggregate ranges first — noted for 100 TB where cross-file width
consistency matters for concatenation)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_INT_WIDTHS = [
    (pa.int8(), -(2**7), 2**7 - 1),
    (pa.int16(), -(2**15), 2**15 - 1),
    (pa.int32(), -(2**31), 2**31 - 1),
]


def reduce_memory_usage(ds: rd.Dataset, *, allow_lossy: bool = False,
                        dict_encode_threshold: float = 0.5) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        for i, name in enumerate(batch.column_names):
            col = batch.column(i)
            t = col.type
            if pa.types.is_int64(t) and len(col):
                mm = pc.min_max(col).as_py()
                lo, hi = mm["min"], mm["max"]
                if lo is not None:
                    for tt, tlo, thi in _INT_WIDTHS:
                        if lo >= tlo and hi <= thi:
                            batch = batch.set_column(i, name, col.cast(tt))
                            break
            elif pa.types.is_float64(t) and allow_lossy:
                batch = batch.set_column(i, name, col.cast(pa.float32()))
            elif pa.types.is_string(t) and len(col):
                distinct = pc.count_distinct(col).as_py()
                if distinct / max(len(col), 1) <= dict_encode_threshold:
                    enc = col.combine_chunks().dictionary_encode()
                    batch = batch.set_column(i, name, enc)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
