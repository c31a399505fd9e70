"""Distributed k-means over an embedding column + SemDeDup-style semantic dedup.

Scale design (Lloyd's, zero data shuffle per iteration):

- the (id, vector) projection is column-pruned at the read and materialized
  ONCE; each Lloyd iteration is one ``map_batches`` pass over it that emits
  K tiny partial rows per batch (cluster, count, per-dim sums) — the
  classic combiner.  The global reduce is a ``groupby("cluster").sum`` over
  K x num_blocks tiny rows; only K rows ever reach the driver.  Centroids
  (K x D floats) are broadcast into each pass via the task closure (a few
  KiB; use ``ray.put`` if K x D grows large).
- SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  web-scale through semantic deduplication"): cluster the corpus, then prune
  near-duplicate pairs WITHIN each cluster — pair cost drops from O(n^2) to
  O(sum n_c^2), and the per-cluster work hash-partitions cleanly.  The keep
  rule here is the deterministic greedy: a vector is dropped iff some
  SMALLER-id vector in the same cluster has cosine >= tau (checked against
  all earlier vectors, kept or not, so the decision is per-pair and
  SQL-expressible as an EXISTS / anti-join).

Oracle bit-parity (the whole point of ``quantize_bits``):

- inputs are quantized to dyadic rationals: ``floor(float64(v) * 2^b) / 2^b``.
  float32 -> float64 is exact, *2^b is an exponent shift (exact), floor is
  exact, /2^b is exact — so engine and DuckDB hold bit-identical values.
- every SUM the algorithm takes over quantized values (cluster partial sums,
  dot products, squared norms) is EXACT in float64 (bounded magnitude,
  <= 2b+~20 significant bits), so combine ORDER is irrelevant — Ray's
  blockwise partial sums, numpy's pairwise sums, BLAS matmul and DuckDB's
  sequential SUM all produce the same bits.
- centroid = exact_sum / count and cosine = exact_dot /
  (sqrt(exact_norm_a) * sqrt(exact_norm_b)) are single correctly-rounded
  IEEE ops over identical operands -> identical results.
- squared distances to NON-dyadic centroids are order-dependent, so the
  kernel accumulates dimension-sequentially (left-associated, the same
  parse order as the SQL's chained ``+``), vectorized over rows.
- argmin tie-break is lowest cluster id == SQL ``ORDER BY dist, cluster``.

Reference note: pytimetk has no clustering (SURVEY §2.5 — no dedup/sampling
in the reference); this is part of the engine's training-data-pipeline
surface.  k-means follows Lloyd (1982); the quantized-exactness trick is the
same one ``ops/downsample.py`` uses for LTTB centroids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.pipelines.similarity import _arrow_matrix


def quantize_matrix(m: np.ndarray, bits: int | None) -> np.ndarray:
    """floor(v * 2^bits) / 2^bits in float64 — exact at every step (see
    module docstring), matching SQL ``floor(CAST(x AS DOUBLE)*s)/s``."""
    m = np.asarray(m, dtype=np.float64)
    if bits is None:
        return m
    s = float(1 << bits)
    return np.floor(m * s) / s


def _dists_dimseq(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(K, n) squared distances, accumulated dimension-sequentially
    (left-associated) so each value is bit-equal to the SQL chain
    ``(e0-m0)*(e0-m0) + (e1-m1)*(e1-m1) + ...`` — vectorized over rows."""
    k, d = cents.shape
    out = np.empty((k, x.shape[0]), dtype=np.float64)
    for c in range(k):
        t = x[:, 0] - cents[c, 0]
        acc = t * t
        for j in range(1, d):
            t = x[:, j] - cents[c, j]
            acc = acc + t * t
        out[c] = acc
    return out


def _seed_centroids(ds: rd.Dataset, k: int, id_column: str, vec_column: str,
                    bits: int | None) -> np.ndarray:
    """Deterministic init: the K rows with the smallest ids.  Per-batch
    k-smallest candidates (no global sort), tiny driver-side resolve."""
    def cand(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            idx = np.sort(np.argpartition(ids, k)[:k])
            return batch.take(pa.array(idx))
        return batch

    small = ds.map_batches(cand, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True).to_pandas()
    small = small.nsmallest(k, id_column).sort_values(id_column)
    if len(small) < k:
        raise ValueError(f"k={k} but only {len(small)} rows")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in small[vec_column]])
    return quantize_matrix(m, bits)


def _partial_sums_fn(cents: np.ndarray, id_column: str, vec_column: str,
                     bits: int | None):
    k, d = cents.shape

    def fn(batch: pa.Table) -> dict:
        x = quantize_matrix(_arrow_matrix(batch[vec_column]), bits)
        assign = np.argmin(_dists_dimseq(x, cents), axis=0)
        out = {"cluster": np.arange(k, dtype=np.int64),
               "n": np.bincount(assign, minlength=k).astype(np.int64)}
        # per-cluster per-dim sums: exact (dyadic bounded), order-free
        sums = np.zeros((k, d), dtype=np.float64)
        for c in np.unique(assign):
            sums[c] = x[assign == c].sum(axis=0)
        for j in range(d):
            out[f"s{j}"] = sums[:, j]
        return out

    return fn


def kmeans_embed(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 3,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    quantize_bits: int | None = 10,
    return_centroids: bool = False,
):
    """Lloyd's k-means; returns a Dataset (id, cluster[, dims kept off]).

    ``quantize_bits=10`` is the oracle-exactness mode (module docstring);
    ``None`` clusters the raw float values (no SQL parity guarantee).
    """
    d = None
    proj = ds.select_columns([id_column, vec_column]).materialize()
    cents = _seed_centroids(proj, k, id_column, vec_column, quantize_bits)
    d = cents.shape[1]
    scols = [f"s{j}" for j in range(d)]
    for _ in range(iters):
        partials = proj.map_batches(
            _partial_sums_fn(cents, id_column, vec_column, quantize_bits),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        agg = partials.groupby("cluster").sum(["n"] + scols).take_all()
        new = cents.copy()  # empty cluster -> keep previous centroid
        for row in agg:
            c = int(row["cluster"])
            n = row.get("sum(n)", row.get("n"))
            if n:
                for j in range(d):
                    s = row.get(f"sum(s{j})", row.get(f"s{j}"))
                    new[c, j] = s / n
        cents = new

    final_cents = cents

    def assign_fn(batch: pa.Table) -> dict:
        x = quantize_matrix(_arrow_matrix(batch[vec_column]), quantize_bits)
        a = np.argmin(_dists_dimseq(x, final_cents), axis=0)
        return {id_column: batch[id_column].to_numpy(zero_copy_only=False),
                "cluster": a.astype(np.int64)}

    out = proj.map_batches(assign_fn, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    if return_centroids:
        return out, final_cents
    return out


def semdedup(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 3,
    tau: float = 0.35,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    quantize_bits: int | None = 10,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Semantic dedup: k-means, then within-cluster greedy cosine prune.

    Output (id, cluster, keep:int32) — keep=0 iff some smaller-id vector in
    the same cluster has cosine >= tau.  Pairs only form within a cluster,
    so the pair stage hash-partitions by cluster through
    ``partitioned_group_map`` with chunked matmuls (never an n x n sims
    matrix).  Vectors cross the shuffle once, as fixed-width float64 blobs.
    """
    proj = ds.select_columns([id_column, vec_column]).materialize()
    assigned, cents = kmeans_embed(
        proj, k=k, iters=iters, id_column=id_column, vec_column=vec_column,
        quantize_bits=quantize_bits, return_centroids=True)
    d = cents.shape[1]

    def tag_fn(batch: pa.Table) -> dict:
        x = quantize_matrix(_arrow_matrix(batch[vec_column]), quantize_bits)
        a = np.argmin(_dists_dimseq(x, cents), axis=0)
        return {id_column: batch[id_column].to_numpy(zero_copy_only=False),
                "cluster": a.astype(np.int64),
                "_vec": [row.tobytes() for row in x]}

    tagged = proj.map_batches(tag_fn, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    def prune(part: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in part.groupby("cluster", sort=False):
            m = np.frombuffer(b"".join(g["_vec"]), dtype=np.float64)
            m = m.reshape(-1, d)
            ids = g[id_column].to_numpy()
            n = len(ids)
            # exact squared norms (dyadic products, order-free)
            r = np.sqrt((m * m).sum(axis=1))
            keep = np.ones(n, dtype=bool)
            step = max(1, int(4_000_000 // max(1, n)))
            for a0 in range(1, n, step):
                b0 = min(n, a0 + step)
                dots = m[a0:b0] @ m[:b0].T          # exact
                denom = r[a0:b0, None] * r[None, :b0]
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = dots / denom
                jlt = np.arange(b0)[None, :] < np.arange(a0, b0)[:, None]
                with np.errstate(invalid="ignore"):
                    hit = ((cos >= tau) & jlt).any(axis=1)
                keep[a0:b0] = ~hit
            frames.append(pd.DataFrame({
                id_column: ids,
                "cluster": g["cluster"].to_numpy(),
                "keep": keep.astype(np.int32)}))
        if frames:
            return pd.concat(frames, ignore_index=True)
        return pd.DataFrame({id_column: pd.Series([], dtype=np.int64),
                             "cluster": pd.Series([], dtype=np.int64),
                             "keep": pd.Series([], dtype=np.int32)})

    return partitioned_group_map(
        tagged, ["cluster"], prune, sort_by=["cluster", id_column],
        num_partitions=num_partitions)
