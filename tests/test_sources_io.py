"""Tests: format-dispatching read_table/write_table round-trips."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.sources.io import read_table, write_table

SF = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_pdf():
    return (rd.read_parquet(SF, columns=["event_id", "user_id", "ts", "value"])
            .to_pandas().sort_values("event_id").reset_index(drop=True))


def _roundtrip(tmp_path, events_pdf, fmt, ts_kwargs):
    src = read_table(SF, columns=["event_id", "user_id", "ts", "value"])
    out = str(tmp_path / f"t_{fmt}")
    write_table(src, out, format=fmt)
    back = (read_table(out, format=fmt, **ts_kwargs).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    back = back[events_pdf.columns.tolist()]
    pd.testing.assert_frame_equal(back, events_pdf, check_dtype=False)


def test_parquet_roundtrip(tmp_path, events_pdf):
    _roundtrip(tmp_path, events_pdf, "parquet", {})


def test_csv_roundtrip_ts_coercion(tmp_path, events_pdf):
    # CSV stringifies timestamps; ts_columns coerces them back
    _roundtrip(tmp_path, events_pdf, "csv", dict(ts_columns=["ts"]))


def test_json_roundtrip_ts_coercion(tmp_path, events_pdf):
    # the JSON writer keeps SECOND precision (documented in
    # write_table) — compare at s
    src = read_table(SF, columns=["event_id", "user_id", "ts", "value"])
    out = str(tmp_path / "t_json")
    write_table(src, out, format="json")
    back = (read_table(out, format="json", ts_columns=["ts"]).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    back = back[events_pdf.columns.tolist()]
    want = events_pdf.copy()
    want["ts"] = want["ts"].dt.floor("s")
    pd.testing.assert_frame_equal(back, want, check_dtype=False)


def test_csv_column_pruning(tmp_path):
    src = read_table(SF, columns=["event_id", "user_id", "ts", "value"])
    out = str(tmp_path / "pruned")
    write_table(src, out, format="csv")
    ds = read_table(out, format="csv", columns=["event_id", "value"])
    assert set(ds.schema().names) == {"event_id", "value"}


def test_epoch_seconds_coercion(tmp_path):
    pdf = pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "ts": [1704067200.0, 1704067200.5, 1704153600.0, 1704240000.25],
    })
    p = str(tmp_path / "epoch")
    write_table(rd.from_pandas(pdf), p, format="json")
    got = (read_table(p, format="json", ts_columns=["ts"]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    want = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
    assert (got["ts"] == want).all()


def test_format_inference_and_errors(tmp_path):
    with pytest.raises(ValueError, match="cannot infer"):
        read_table(str(tmp_path / "mystery.bin"))
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(SF, format="avro")
    # summarize over a CSV source equals the parquet-source result
    from pytimetk_ray.ops.summarize_by_time import summarize_by_time

    out = str(tmp_path / "ev_csv")
    write_table(read_table(SF, columns=["user_id", "ts", "value"]), out,
                format="csv")
    a = (summarize_by_time(read_table(out, format="csv", ts_columns=["ts"]),
                           "ts", "value", by=["user_id"], freq="D",
                           agg_func="sum").to_pandas()
         .sort_values(["user_id", "bucket_ts"]).reset_index(drop=True))
    b = (summarize_by_time(
            read_table(SF, columns=["user_id", "ts", "value"]),
            "ts", "value", by=["user_id"], freq="D", agg_func="sum")
         .to_pandas()
         .sort_values(["user_id", "bucket_ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
