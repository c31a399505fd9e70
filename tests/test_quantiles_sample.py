"""Tests: distributed column quantiles / quantile filter / hash sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.kernels.text import md5_u64
from pytimetk_ray.ops.quantiles import column_quantiles, filter_by_quantile
from pytimetk_ray.pipelines.corpus import hash_sample


def test_column_quantiles_bit_equal_np_nanquantile():
    rng = np.random.default_rng(5)
    # duplicate-heavy with NaN: the histogram path must reproduce
    # np.nanquantile exactly, including its lerp formula switch
    a = np.round(rng.normal(0, 10, size=5000), 1)
    a[rng.random(5000) < 0.05] = np.nan
    b = rng.integers(0, 50, size=5000).astype(np.float64)
    df = pd.DataFrame({"a": a, "b": b})
    qs = [0.0, 0.1, 0.25, 0.5, 0.7, 0.9, 1.0]
    got = column_quantiles(rd.from_pandas(df), ["a", "b"], qs,
                           num_partitions=4)
    for c in ("a", "b"):
        exp = np.nanquantile(df[c].to_numpy(), qs)
        sub = got[got["column"] == c].sort_values("q")["value"].to_numpy()
        np.testing.assert_array_equal(sub, exp, err_msg=c)


def test_filter_by_quantile_above_below():
    df = pd.DataFrame({"doc_id": range(1000),
                       "score": np.arange(1000, dtype=np.float64)})
    ds = rd.from_pandas(df)
    kept, thr = filter_by_quantile(ds, "score", 0.9)
    assert thr == np.nanquantile(df["score"], 0.9)
    out = kept.to_pandas()
    # thr = 0.9*999 = 899.1 -> scores 900..999 survive
    assert (out["score"] >= thr).all() and len(out) == 100

    kept_lo, thr_lo = filter_by_quantile(ds, "score", 0.1, keep="below")
    out_lo = kept_lo.to_pandas()
    assert (out_lo["score"] <= thr_lo).all() and len(out_lo) == 100

    with pytest.raises(ValueError):
        filter_by_quantile(ds, "score", 0.5, keep="sideways")


def test_hash_sample_deterministic_and_salted():
    df = pd.DataFrame({"doc_id": range(2000), "x": 1.0})
    ds = rd.from_pandas(df)
    s1 = hash_sample(ds, rate_ppm=250_000).to_pandas()
    s2 = hash_sample(ds, rate_ppm=250_000).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])  # reproducible
    exp = [i for i in range(2000) if md5_u64(str(i)) % 1_000_000 < 250_000]
    assert sorted(s1["doc_id"]) == exp
    assert 0.2 < len(s1) / 2000 < 0.3  # ~25%

    salted = hash_sample(ds, rate_ppm=250_000, salt="v2").to_pandas()
    assert sorted(salted["doc_id"]) != exp  # independent sample

    assert hash_sample(ds, rate_ppm=0).count() == 0
    assert hash_sample(ds, rate_ppm=1_000_000).count() == 2000
    with pytest.raises(ValueError):
        hash_sample(ds, rate_ppm=2_000_000)
