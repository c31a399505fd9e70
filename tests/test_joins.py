"""Tests: broadcast / hash / as-of joins vs pandas reference semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.ops.joins import asof_join, broadcast_join, hash_join


def _orders(n=200, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "o_id": np.arange(n, dtype=np.int64),
        "cust": rng.integers(0, 30, n),
        "amount": np.round(rng.uniform(1, 100, n), 2),
    })


def _custs():
    return pd.DataFrame({
        "c_id": np.arange(0, 25, dtype=np.int64),  # custs 25..29 missing
        "name": [f"c{i}" for i in range(25)],
        "amount": np.arange(25, dtype=np.float64),  # clashes with orders
    })


def test_broadcast_join_inner_and_left():
    o, c = _orders(), _custs()
    ds = rd.from_pandas(o).repartition(4)
    got = broadcast_join(ds, c, left_on="cust", right_on="c_id",
                         suffix="_c").to_pandas()
    exp = o.merge(c, left_on="cust", right_on="c_id",
                  suffixes=("", "_c")).drop(columns=["c_id"])
    pd.testing.assert_frame_equal(
        got.sort_values("o_id", ignore_index=True)[exp.columns],
        exp.sort_values("o_id", ignore_index=True))
    assert "amount_c" in got.columns  # clash suffixed, left intact

    left = broadcast_join(ds, c, left_on="cust", right_on="c_id",
                          how="left").to_pandas()
    assert len(left) == len(o)
    assert left.loc[left["cust"] >= 25, "name"].isna().all()


def test_broadcast_join_max_rows_guard():
    o = _orders()
    big = rd.from_pandas(_custs())
    with pytest.raises(ValueError, match="max_rows"):
        broadcast_join(rd.from_pandas(o), big, left_on="cust",
                       right_on="c_id", max_rows=10)


def test_hash_join_matches_pandas():
    o, c = _orders(), _custs()
    got = hash_join(rd.from_pandas(o).repartition(3),
                    rd.from_pandas(c).repartition(2),
                    left_on="cust", right_on="c_id",
                    num_partitions=5).to_pandas()
    exp = (o.merge(c.rename(columns={"c_id": "cust", "amount": "amount_r"}),
                   on="cust", how="inner"))
    pd.testing.assert_frame_equal(
        got.sort_values(["o_id"], ignore_index=True)[exp.columns],
        exp.sort_values(["o_id"], ignore_index=True))

    left = hash_join(rd.from_pandas(o), rd.from_pandas(c),
                     left_on="cust", right_on="c_id", how="left",
                     num_partitions=5).to_pandas()
    assert len(left) == len(o)
    assert left.loc[left["cust"] >= 25, "name"].isna().all()

    with pytest.raises(ValueError):
        hash_join(rd.from_pandas(o), rd.from_pandas(c),
                  left_on="cust", right_on="c_id", how="outer")


def _ts_frames(seed=4):
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2025-05-01").value // 1000
    lf = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "ts": (t0 + rng.integers(0, 10_000_000, 300)).astype("datetime64[us]"),
        "v": rng.normal(size=300),
    }).drop_duplicates(["k", "ts"])
    rf = pd.DataFrame({
        "k": rng.integers(0, 6, 80),  # key 5 never appears on the left
        "ts": (t0 + rng.integers(-1_000_000, 9_000_000, 80)).astype("datetime64[us]"),
        "w": rng.normal(size=80),
        "v": rng.normal(size=80),  # clashes with the left's v
    }).drop_duplicates(["k", "ts"])
    return lf, rf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_merge_asof(direction):
    lf, rf = _ts_frames()
    got = asof_join(rd.from_pandas(lf).repartition(3),
                    rd.from_pandas(rf).repartition(2),
                    by="k", on="ts", direction=direction,
                    num_partitions=4).to_pandas()
    rf2 = rf.rename(columns={"w": "w", "v": "v_r"}).sort_values("ts")
    rf2["ts_r"] = rf2["ts"]
    exp = pd.merge_asof(lf.sort_values("ts"), rf2, on="ts", by="k",
                        direction=direction)
    key = ["k", "ts"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True)[exp.columns],
        exp.sort_values(key, ignore_index=True))
    # left rows always survive (ASOF LEFT semantics)
    assert len(got) == len(lf)


def test_asof_join_tolerance():
    lf, rf = _ts_frames()
    got = asof_join(rd.from_pandas(lf), rd.from_pandas(rf),
                    by="k", on="ts", tolerance="10 seconds",
                    num_partitions=4).to_pandas()
    rf2 = rf.rename(columns={"v": "v_r"}).sort_values("ts")
    rf2["ts_r"] = rf2["ts"]
    exp = pd.merge_asof(lf.sort_values("ts"), rf2, on="ts", by="k",
                        tolerance=pd.Timedelta("10 seconds"))
    assert got["ts_r"].notna().sum() == exp["ts_r"].notna().sum()
    assert got["ts_r"].notna().sum() < len(lf)  # tolerance actually prunes
