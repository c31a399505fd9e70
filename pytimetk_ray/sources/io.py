"""Format-dispatching table reader/writer (CSV / JSON-lines / Parquet).

The reference's own loaders are ``pd.read_csv`` over bundled CSVs
(/root/reference/src/pytimetk/datasets/get_datasets.py:15-144); a user
switching to this engine brings the same files.  ``read_table`` maps each
format onto the matching Ray Data reader with column pruning pushed into
the read where the format supports it (parquet column projection, Arrow
CSV ``include_columns``) and timestamp coercion applied as one Arrow-native
``map_batches`` (CSV/JSON carry timestamps as strings or seconds — parquet
keeps its logical type and skips the pass entirely).

Everything returns a streaming ``ray.data.Dataset`` — no driver-side
frames, any corpus size.
"""

from __future__ import annotations

import os
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_EXT_FORMAT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
}


def _infer_format(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            e = os.path.splitext(f)[1].lower()
            if e in _EXT_FORMAT:
                return _EXT_FORMAT[e]
    raise ValueError(f"cannot infer format for {path!r}; pass format=")


def _coerce_ts(ts_columns: Sequence[str], unit: str):
    def fn(batch: pa.Table) -> pa.Table:
        for c in ts_columns:
            if c not in batch.column_names:
                continue
            col = batch[c]
            if pa.types.is_timestamp(col.type):
                out = col.cast(pa.timestamp(unit))
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                out = col.cast(pa.timestamp(unit))
            elif pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                # numeric epoch SECONDS (the common CSV/JSON export shape)
                out = pc.multiply(col.cast(pa.float64()), 1_000_000.0) \
                    .cast(pa.int64()).cast(pa.timestamp("us")).cast(pa.timestamp(unit))
            else:
                raise TypeError(f"cannot coerce column {c!r} ({col.type}) "
                                "to timestamp")
            batch = batch.set_column(batch.column_names.index(c), c, out)
        return batch

    return fn


def read_table(
    path: str,
    *,
    format: str | None = None,
    columns: Sequence[str] | None = None,
    ts_columns: Sequence[str] = (),
    ts_unit: str = "us",
    **reader_kwargs,
) -> rd.Dataset:
    """Read a table in ``parquet`` / ``csv`` / ``json`` (lines) format.

    ``columns`` prunes at the read (parquet projection; Arrow CSV
    include_columns; JSON post-select).  ``ts_columns`` are coerced to
    ``timestamp[ts_unit]`` whatever the on-disk representation (native
    timestamp, ISO string, or numeric epoch seconds).
    """
    fmt = _infer_format(path, format)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=list(columns) if columns else None,
                             **reader_kwargs)
    elif fmt == "csv":
        from pyarrow import csv as pacsv

        if columns:
            reader_kwargs.setdefault(
                "convert_options",
                pacsv.ConvertOptions(include_columns=list(columns)))
        ds = rd.read_csv(path, **reader_kwargs)
    elif fmt == "json":
        ds = rd.read_json(path, **reader_kwargs)
        if columns:
            ds = ds.select_columns(list(columns))
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    if ts_columns:
        ds = ds.map_batches(_coerce_ts(ts_columns, ts_unit),
                            batch_format="pyarrow", batch_size=None,
                            zero_copy_batch=True)
    return ds


def write_table(ds: rd.Dataset, path: str, *, format: str = "parquet",
                **writer_kwargs) -> None:
    """Write a Dataset as partitioned parquet / csv / json-lines files
    (one file per block — resumable, never one giant file).

    Precision note: the JSON writer serializes timestamps as integer epoch
    SECONDS (pandas ``to_json`` default) — sub-second detail does not
    survive a JSON round-trip; use parquet or CSV where it matters."""
    if format == "parquet":
        ds.write_parquet(path, **writer_kwargs)
    elif format == "csv":
        ds.write_csv(path, **writer_kwargs)
    elif format == "json":
        ds.write_json(path, **writer_kwargs)
    else:
        raise ValueError(f"unsupported format {format!r}")
