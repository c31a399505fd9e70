"""FeatureStore cache, selectors, reduce_memory, ts_features built-ins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pytimetk_ray.ops.memory import reduce_memory_usage
from pytimetk_ray.ops.ts_features import ts_features
from pytimetk_ray.selection import (
    contains,
    ends_with,
    matches,
    resolve_column_selection,
    starts_with,
)
from pytimetk_ray.state.feature_store import FeatureStore


def test_feature_store_cache(tmp_path):
    import json
    import os

    store = FeatureStore(str(tmp_path / "store"))

    @store.register("double")
    def double(ds, factor=2):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b["y"] = b["x"] * factor
            return b

        return ds.map_batches(fn, batch_format="pandas")

    df = pd.DataFrame({"x": np.arange(100)})
    out1 = store.build("double", rd.from_pandas(df), input_fingerprint="f1", factor=3).to_pandas()
    assert (out1.sort_values("x")["y"].to_numpy() == np.arange(100) * 3).all()
    key = store.cache_key("double", "f1", {"factor": 3})
    success = os.path.join(store.root, "double", key, "_SUCCESS")
    mtime1 = os.path.getmtime(success)
    out2 = store.build("double", rd.from_pandas(df), input_fingerprint="f1", factor=3).to_pandas()
    assert os.path.getmtime(success) == mtime1  # cache hit: artifact untouched
    pd.testing.assert_frame_equal(
        out1.sort_values("x", ignore_index=True), out2.sort_values("x", ignore_index=True)
    )
    # different params -> different key -> second artifact
    store.build("double", rd.from_pandas(df), input_fingerprint="f1", factor=5)
    assert len(os.listdir(os.path.join(store.root, "double"))) == 2
    with open(store.catalog_path) as f:
        cat = json.load(f)
    assert "double" in cat and len(cat["double"]) == 2


def test_selectors():
    names = ["ts", "value", "value_lag_1", "value_lag_2", "other"]
    assert resolve_column_selection(names, "value") == ["value"]
    assert resolve_column_selection(names, starts_with("value_")) == ["value_lag_1", "value_lag_2"]
    assert resolve_column_selection(names, contains("lag")) == ["value_lag_1", "value_lag_2"]
    assert resolve_column_selection(names, ends_with("_2")) == ["value_lag_2"]
    assert resolve_column_selection(names, matches(r"^value(_lag_\d)?$")) == [
        "value", "value_lag_1", "value_lag_2"
    ]
    assert resolve_column_selection(names, ["other", "ts"]) == ["ts", "other"]
    import pytest

    with pytest.raises(KeyError):
        resolve_column_selection(names, "nope")


def test_reduce_memory_usage():
    df = pd.DataFrame(
        {
            "small_int": np.arange(100, dtype=np.int64),
            "big_int": np.arange(100, dtype=np.int64) * 10**10,
            "cat": ["a", "b"] * 50,
        }
    )
    out = reduce_memory_usage(rd.from_pandas(df))
    batches = list(out.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches)
    assert t.schema.field("small_int").type == pa.int8()
    assert t.schema.field("big_int").type == pa.int64()
    assert pa.types.is_dictionary(t.schema.field("cat").type)
    assert t.column("small_int").to_pylist() == list(range(100))


def test_ts_features_builtin():
    df = pd.DataFrame(
        {
            "g": ["a"] * 50 + ["b"] * 50,
            "ts": list(pd.date_range("2024-01-01", periods=50, freq="D")) * 2,
            "v": np.concatenate([np.arange(50, dtype=float), np.random.default_rng(0).normal(size=50)]),
        }
    )
    out = ts_features(rd.from_pandas(df), "ts", "v", by=["g"]).to_pandas().sort_values("g")
    assert len(out) == 2
    a = out[out["g"] == "a"].iloc[0]
    assert a["trend_strength"] > 0.99  # pure linear trend
    assert abs(a["mean"] - 24.5) < 1e-9
