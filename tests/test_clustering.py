"""Distributed k-means + SemDeDup vs an independent numpy reference.

The reference here deliberately uses a DIFFERENT code path than the engine
(full broadcast distance matrix + np.argmin, single-process) so it checks
the distributed combiner/reduce logic, not a shared kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.pipelines.clustering import (
    kmeans_embed, quantize_matrix, semdedup)


def _ref_kmeans(x: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-process Lloyd reference with the same deterministic choices:
    seeds = k smallest ids, dim-sequential distance accumulation, argmin
    first-min tie-break, empty cluster keeps its previous centroid."""
    order = np.argsort(ids, kind="stable")
    cents = x[order[:k]].copy()

    def dists(m, c):
        acc = None
        for j in range(m.shape[1]):
            t = m[:, j] - c[j]
            acc = t * t if acc is None else acc + t * t
        return acc

    for _ in range(iters):
        d = np.stack([dists(x, cents[c]) for c in range(k)])
        a = np.argmin(d, axis=0)
        new = cents.copy()
        for c in range(k):
            mask = a == c
            if mask.any():
                new[c] = x[mask].sum(axis=0) / mask.sum()
        cents = new
    d = np.stack([dists(x, cents[c]) for c in range(k)])
    return np.argmin(d, axis=0), cents


def _toy(n=160, d=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, d)) * 0.3
    x32 = (centers[rng.integers(0, 4, n)]
           + rng.normal(size=(n, d)) * 0.05).astype(np.float32)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    rng.shuffle(ids)  # ids uncorrelated with storage order
    return ids, x32


def _ds_of(ids, x32, blocks=5):
    df = pd.DataFrame({"vec_id": ids, "embedding": [row for row in x32]})
    return rd.from_pandas(df).repartition(blocks)


def test_kmeans_matches_reference():
    ids, x32 = _toy()
    out = (kmeans_embed(_ds_of(ids, x32), k=4, iters=3, quantize_bits=10)
           .to_pandas().sort_values("vec_id"))
    q = quantize_matrix(x32.astype(np.float64), 10)
    ref_a, _ = _ref_kmeans(q, ids, 4, 3)
    ref = pd.Series(ref_a, index=ids).sort_index()
    assert (out["cluster"].to_numpy() == ref.to_numpy()).all()


def test_kmeans_centroids_bitequal_and_partition_invariant():
    ids, x32 = _toy(seed=11)
    q = quantize_matrix(x32.astype(np.float64), 10)
    _, ref_c = _ref_kmeans(q, ids, 4, 3)
    for blocks in (1, 7):
        _, cents = kmeans_embed(_ds_of(ids, x32, blocks), k=4, iters=3,
                                quantize_bits=10, return_centroids=True)
        # exact dyadic partial sums -> combine order free -> BIT equality
        assert (cents == ref_c).all(), f"blocks={blocks}"


def test_kmeans_empty_cluster_keeps_previous_centroid():
    # two far blobs, k=3 seeds all land in blob A (smallest ids) -> after
    # iter 1 at most 2 clusters are populated; the orphan seed must keep
    # its centroid instead of going NaN
    a = np.full((6, 4), 0.1, dtype=np.float32) \
        + np.eye(6, 4, dtype=np.float32) * 1e-3
    b = np.full((6, 4), -0.4, dtype=np.float32)
    x32 = np.vstack([a, b])
    ids = np.arange(12, dtype=np.int64)  # seeds = 3 identical-ish A rows
    out, cents = kmeans_embed(_ds_of(ids, x32, 3), k=3, iters=3,
                              quantize_bits=10, return_centroids=True)
    assert np.isfinite(cents).all()
    q = quantize_matrix(x32.astype(np.float64), 10)
    ref_a, ref_c = _ref_kmeans(q, ids, 3, 3)
    assert (cents == ref_c).all()
    got = out.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert (got == ref_a).all()


def test_semdedup_matches_bruteforce():
    ids, x32 = _toy(n=120, seed=3)
    # plant near-duplicates: rows 1,2 copy row 0 with tiny noise
    x32[1] = x32[0] + 1e-4
    x32[2] = x32[0] - 1e-4
    tau = 0.9
    out = (semdedup(_ds_of(ids, x32), k=4, iters=2, tau=tau,
                    quantize_bits=10, num_partitions=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    q = quantize_matrix(x32.astype(np.float64), 10)
    ref_a, _ = _ref_kmeans(q, ids, 4, 2)
    order = np.argsort(ids, kind="stable")
    r = np.sqrt((q * q).sum(axis=1))
    cos = (q @ q.T) / (r[:, None] * r[None, :])
    keep_ref = {}
    for i in order:
        dup = any(cos[i, j] >= tau and ref_a[j] == ref_a[i]
                  for j in order if ids[j] < ids[i])
        keep_ref[ids[i]] = 0 if dup else 1
    assert (out["keep"].to_numpy()
            == np.array([keep_ref[v] for v in out["vec_id"]])).all()
    assert (out["keep"] == 0).sum() >= 2  # the planted dups were dropped


def test_quantize_matrix_exactness():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64,)).astype(np.float32) * 0.5
    q = quantize_matrix(v[None, :].astype(np.float64), 10)[0]
    assert (q * 1024 == np.floor(v.astype(np.float64) * 1024)).all()
    assert quantize_matrix(np.array([[0.3]]), None)[0, 0] == 0.3


def test_pq_books_partition_invariant_and_codes_match_reference():
    ids, x32 = _toy(n=200, d=16, seed=19)
    from pytimetk_ray.pipelines.clustering import (
        _dists_dimseq, _pq_codes, pq_encode, pq_train)
    books1 = pq_train(_ds_of(ids, x32, 1), m=4, ksub=8, iters=2,
                      quantize_bits=10)
    books7 = pq_train(_ds_of(ids, x32, 7), m=4, ksub=8, iters=2,
                      quantize_bits=10)
    assert (books1 == books7).all()  # exact partial sums -> bit equality

    # reference: independent Lloyd per subspace on the sliced matrix
    q = quantize_matrix(x32.astype(np.float64), 10)
    for mi in range(4):
        sub = q[:, mi * 4:(mi + 1) * 4]
        _, ref_c = _ref_kmeans(sub, ids, 8, 2)
        assert (books1[mi] == ref_c).all()
    codes = (pq_encode(_ds_of(ids, x32, 3), books1, quantize_bits=10)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    ref_codes = _pq_codes(q[np.argsort(ids, kind="stable")], books1)
    for mi in range(4):
        assert (codes[f"k{mi}"].to_numpy() == ref_codes[:, mi]).all()


def test_pq_topk_orders_by_adc_distance():
    ids, x32 = _toy(n=150, d=16, seed=23)
    from pytimetk_ray.pipelines.clustering import pq_topk
    out = (pq_topk(_ds_of(ids, x32, 4), k=5, n_queries=2, m=4, ksub=8,
                   iters=2, quantize_bits=10)
           .to_pandas().sort_values(["query_id", "dist", "vec_id"]))
    assert set(out["query_id"]) == set(np.sort(ids)[:2])
    for _, g in out.groupby("query_id"):
        assert len(g) == 5
        assert (np.diff(g["dist"].to_numpy()) >= 0).all()
        assert (g["dist"].to_numpy() >= 0).all()
    # a query's own code cell should rank it near the top: its ADC distance
    # is the distance to its own centroids, small by construction
    top1 = out.groupby("query_id").first()
    assert (top1["dist"].to_numpy() < np.median(out["dist"].to_numpy())).all()


def test_kmeans_k_larger_than_rows_raises():
    ids = np.arange(3, dtype=np.int64)
    x32 = np.zeros((3, 4), dtype=np.float32)
    with pytest.raises(ValueError):
        kmeans_embed(_ds_of(ids, x32, 1), k=8, iters=1)
