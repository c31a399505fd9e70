"""Tests: KLL quantile sketch — rank-error envelope, merge, distributed op."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from pytimetk_ray.kernels.sketch import KLL
from pytimetk_ray.ops.quantiles import column_quantiles_sketch


def _rank_err(sk: KLL, data: np.ndarray, qs) -> float:
    """Max |true rank of sketch-quantile - q| over the probe grid."""
    s = np.sort(data)
    n = len(s)
    worst = 0.0
    for q in qs:
        est = sk.quantile(q)
        true_rank = np.searchsorted(s, est, side="right") / n
        worst = max(worst, abs(true_rank - q))
    return worst


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.parametrize("gen", [
    lambda r, n: r.normal(0, 1, n),
    lambda r, n: r.exponential(1.0, n),          # skewed
    lambda r, n: r.integers(0, 50, n).astype(float),  # heavy ties
    lambda r, n: np.arange(n, dtype=float),      # sorted stream
    lambda r, n: np.arange(n, dtype=float)[::-1],  # reverse-sorted
])
def test_kll_rank_error_within_envelope(gen):
    rng = np.random.default_rng(7)
    data = gen(rng, 200_000)
    sk = KLL(k=200)
    for chunk in np.array_split(data, 37):   # streaming updates
        sk.update_many(chunk)
    assert sk.n == len(data)
    assert _rank_err(sk, data, QS) < 0.025   # k=200 -> ~1% typical, 2.5% cap


def test_kll_merge_equals_single_stream():
    rng = np.random.default_rng(3)
    data = rng.normal(0, 10, 100_000)
    parts = np.array_split(data, 13)
    sketches = [KLL(k=128).update_many(p) for p in parts]
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    assert acc.n == len(data)
    assert _rank_err(acc, data, QS) < 0.035


def test_kll_serialization_roundtrip():
    rng = np.random.default_rng(5)
    sk = KLL(k=64).update_many(rng.normal(size=50_000))
    back = KLL.from_bytes(sk.to_bytes())
    assert back.n == sk.n
    assert back.k == sk.k
    for q in QS:
        assert back.quantile(q) == sk.quantile(q)


def test_kll_nan_and_empty():
    sk = KLL(k=32)
    assert np.isnan(sk.quantile(0.5))
    sk.update_many(np.array([np.nan, np.nan]))
    assert sk.n == 0 and np.isnan(sk.quantile(0.5))
    sk.update_many(np.array([1.0, np.nan, 3.0]))
    assert sk.n == 2
    assert sk.quantile(0.0) == 1.0 and sk.quantile(1.0) == 3.0
    with pytest.raises(ValueError):
        sk.quantile(1.5)
    with pytest.raises(ValueError):
        KLL(k=4)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=1, max_size=500))
def test_kll_small_inputs_exact(vals):
    # below the first compaction threshold the sketch holds every value:
    # quantiles must be actual data points with exact nearest-rank position
    data = np.asarray(vals)
    sk = KLL(k=512).update_many(data)
    s = np.sort(data)
    for q in [0.0, 0.25, 0.5, 0.75, 1.0]:
        est = sk.quantile(q)
        assert est in s
        target = q * len(s)
        idx = np.searchsorted(np.arange(1, len(s) + 1), target, side="left")
        assert est == s[min(idx, len(s) - 1)]


def test_kll_rank_monotone_and_bounds():
    rng = np.random.default_rng(11)
    sk = KLL(k=200).update_many(rng.uniform(0, 1, 50_000))
    xs = np.linspace(-0.1, 1.1, 25)
    ranks = [sk.rank(x) for x in xs]
    assert ranks == sorted(ranks)
    assert ranks[0] == 0.0 and ranks[-1] == 1.0


def test_column_quantiles_sketch_distributed():
    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "a": rng.normal(100, 15, 60_000),       # continuous: the sketch's case
        "b": rng.exponential(5.0, 60_000),
    })
    got = column_quantiles_sketch(
        rd.from_pandas(df).repartition(8), ["a", "b"], QS, k=200)
    assert set(got["column"]) == {"a", "b"}
    for c in ("a", "b"):
        data = np.sort(df[c].to_numpy())
        sub = got[got["column"] == c].sort_values("q")
        for q, v in zip(sub["q"], sub["value"]):
            true_rank = np.searchsorted(data, v, side="right") / len(data)
            assert abs(true_rank - q) < 0.03, (c, q)
