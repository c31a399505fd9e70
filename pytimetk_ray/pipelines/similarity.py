"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: the baseline — numpy matmul per batch against a
  BROADCAST query matrix (``ray.put`` once on the driver, ``ray.get`` once
  per actor in ``__init__``), local top-k per batch, global top-k via a
  small groupby.  The shuffle carries (queries x k) rows per batch, never
  the embeddings.
- LSH-bucketed variant (scale path): random-hyperplane sign buckets computed
  per batch; only matching buckets are scored — search cost drops by the
  bucket fan-out at a small recall cost.
- embedding-cosine near-dup: all-pairs within LSH buckets, cosine >=
  threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _arrow_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 view of an Arrow list/fixed_size_list column without a
    per-row Python loop: flatten the child values buffer and reshape (valid
    whenever every list has the same length — embeddings always do)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(n, d).astype(np.float64, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if n and np.all(widths == widths[0]) and widths[0] > 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            # offsets may not start at 0 on a sliced array
            flat = flat[: int(widths[0]) * n] if offs[0] == 0 else None
            if flat is not None:
                return flat.reshape(n, int(widths[0])).astype(np.float64, copy=False)
    return np.stack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


def _topk_tie_exact(s: np.ndarray, ids: np.ndarray, k: int):
    """Indices of the k best rows by (s desc, id asc), resolving value ties
    EXACTLY: partition for the k-th value, include every tie at the boundary,
    then order the small candidate set.  ``s`` must already be rounded to the
    precision the downstream comparison uses, else a tie-dense batch can
    prune the id-ascending winner before rounding."""
    n = len(s)
    if k >= n:
        cand = np.arange(n)
    else:
        kth = np.partition(s, n - k)[n - k]
        cand = np.flatnonzero(s >= kth)
    order = np.lexsort((ids[cand], -s[cand]))
    return cand[order[:k]]


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _Scorer:
    """Actor: holds the broadcast, pre-normalized query matrix."""

    def __init__(self, query_ref, query_ids, k: int,
                 id_column: str, vec_column: str, round_digits: int = 12):
        q = query_ref if isinstance(query_ref, np.ndarray) else ray.get(query_ref)
        self.q = _normalize(q)  # (Q, d)
        self.query_ids = np.asarray(query_ids)
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> dict:
        m = _normalize(_arrow_matrix(batch[self.vec_column]))  # (B, d)
        # round BEFORE candidate selection: the final reduce tie-breaks on
        # (rounded cosine desc, id asc) — selecting unrounded here could
        # prune the id-ascending winner of a rounding-induced tie
        sims = np.round(self.q @ m.T, self.round_digits)  # (Q, B)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        # local top-k per query (full top-k resolved in the final reduce)
        for qi in range(sims.shape[0]):
            idx = _topk_tie_exact(sims[qi], ids, k)
            out_q.extend([self.query_ids[qi]] * len(idx))
            out_id.append(ids[idx])
            out_s.append(sims[qi, idx])
        return {
            "query_id": np.asarray(out_q, dtype=self.query_ids.dtype),
            self.id_column: (np.concatenate(out_id) if out_id
                             else np.array([], dtype=ids.dtype)),
            "cosine": (np.concatenate(out_s) if out_s
                       else np.array([], dtype=np.float64)),
        }


def ann_bruteforce(
    ds: rd.Dataset,
    query_matrix: np.ndarray,
    query_ids,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    concurrency: int = 4,
    exclude_self: bool = True,
    round_digits: int = 12,
) -> rd.Dataset:
    """Exact cosine top-k of every query against the corpus.

    Output: (query_id, vec_id, cosine), k rows per query, ties broken by
    ascending id for determinism."""
    qref = ray.put(np.asarray(query_matrix, dtype=np.float64))

    scored = ds.map_batches(
        _Scorer,
        fn_constructor_kwargs=dict(
            query_ref=qref, query_ids=query_ids, k=k + (8 if exclude_self else 7),
            id_column=id_column, vec_column=vec_column, round_digits=round_digits,
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g[id_column] != g["query_id"]]
        g = g.sort_values(["cosine", id_column], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


class _BucketTagger:
    """Actor: random-hyperplane LSH bucket id per row (scale path)."""

    def __init__(self, planes_ref, vec_column: str):
        self.planes = planes_ref if isinstance(planes_ref, np.ndarray) else ray.get(planes_ref)
        self.vec_column = vec_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch[self.vec_column])
        signs = (m @ self.planes.T) > 0  # (B, nbits)
        bucket = np.zeros(len(m), dtype=np.int64)
        for bit in range(signs.shape[1]):
            bucket |= signs[:, bit].astype(np.int64) << bit
        batch = batch.copy()
        batch["bucket"] = bucket
        return batch


def lsh_bucket(ds: rd.Dataset, *, dim: int, nbits: int = 8, seed: int = 5,
               vec_column: str = "embedding", concurrency: int = 4) -> rd.Dataset:
    """Tag rows with a hyperplane-LSH bucket (2**nbits buckets)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(nbits, dim))
    pref = ray.put(planes)
    return ds.map_batches(
        _BucketTagger,
        fn_constructor_kwargs=dict(planes_ref=pref, vec_column=vec_column),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )


def embedding_neardup_pairs(
    ds: rd.Dataset,
    *,
    dim: int,
    threshold: float = 0.95,
    nbits: int = 6,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    round_digits: int = 12,
) -> rd.Dataset:
    """Near-duplicate pairs (cosine >= threshold) within LSH buckets.

    Output: (id_a, id_b, cosine) with id_a < id_b.  Bucketing bounds the
    pairwise cost; near-identical vectors collide with high probability."""
    tagged = lsh_bucket(ds, dim=dim, nbits=nbits, vec_column=vec_column)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_column, kind="mergesort")
        m = _normalize(_to_matrix(g[vec_column]))
        ids = g[id_column].to_numpy()
        sims = m @ m.T
        iu = np.triu_indices(len(g), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][mask]],
                "id_b": ids[iu[1][mask]],
                "cosine": np.round(sims[iu][mask], round_digits),
            }
        )

    return tagged.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path --------------

def _kmeans(x: np.ndarray, nlist: int, seed: int = 17, iters: int = 12) -> np.ndarray:
    """Deterministic numpy k-means on normalized vectors (spherical-ish):
    seeded random init, argmax-cosine assignment, mean re-centering."""
    rng = np.random.default_rng(seed)
    x = _normalize(x)
    init = rng.choice(len(x), size=min(nlist, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


class _IVFScorer:
    """Actor: centroids + queries broadcast once; scores each batch row only
    against the queries probing its cluster."""

    def __init__(self, centroids_ref, query_ref, query_ids, probe_sets_ref,
                 k: int, id_column: str, vec_column: str, round_digits: int):
        self.c = centroids_ref if isinstance(centroids_ref, np.ndarray) else ray.get(centroids_ref)
        q = query_ref if isinstance(query_ref, np.ndarray) else ray.get(query_ref)
        self.q = _normalize(q)
        self.query_ids = np.asarray(query_ids)
        probes = probe_sets_ref if isinstance(probe_sets_ref, np.ndarray) else ray.get(probe_sets_ref)
        self.probes = probes  # (Q, nprobe) cluster ids per query
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> dict:
        m = _normalize(_arrow_matrix(batch[self.vec_column]))
        assign = np.argmax(m @ self.c.T, axis=1)  # (B,)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.q)):
            sel = np.isin(assign, self.probes[qi])
            if not sel.any():
                continue
            # rounded before selection + exact tie handling: see _Scorer
            sims = np.round(m[sel] @ self.q[qi], self.round_digits)
            sub_ids = ids[sel]
            k = min(self.k, len(sims))
            idx = _topk_tie_exact(sims, sub_ids, k)
            out_q.extend([self.query_ids[qi]] * len(idx))
            out_id.append(sub_ids[idx])
            out_s.append(sims[idx])
        return {
            "query_id": np.asarray(out_q, dtype=self.query_ids.dtype),
            self.id_column: (np.concatenate(out_id) if out_id
                             else np.array([], dtype=ids.dtype)),
            "cosine": (np.concatenate(out_s) if out_s
                       else np.array([], dtype=np.float64)),
        }


def ann_ivf(
    ds: rd.Dataset,
    query_matrix: np.ndarray,
    query_ids,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 20000,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    concurrency: int = 4,
    exclude_self: bool = True,
    round_digits: int = 12,
    seed: int = 17,
) -> rd.Dataset:
    """Approximate cosine top-k via an IVF coarse quantizer.

    Train: k-means centroids from a driver-side sample (at 100 TB: a
    ``ds.random_sample`` pass — centroids are tiny and broadcast).  Search:
    each batch row is assigned to its nearest centroid in the actor
    (vectorized matmul) and scored ONLY against queries probing that
    cluster — compute drops by ~nlist/nprobe at a small recall cost.
    Same (query_id, id, cosine) output contract as ``ann_bruteforce``.
    """
    sample = ds.limit(train_sample).to_pandas()
    x = _to_matrix(sample[vec_column])
    centroids = _kmeans(x, nlist, seed=seed)

    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    # nprobe nearest centroids per query
    order = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]

    cref = ray.put(centroids)
    qref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    pref = ray.put(order)

    scored = ds.map_batches(
        _IVFScorer,
        fn_constructor_kwargs=dict(
            centroids_ref=cref, query_ref=qref, query_ids=query_ids,
            probe_sets_ref=pref, k=k + (8 if exclude_self else 7),
            id_column=id_column, vec_column=vec_column, round_digits=round_digits,
        ),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g[id_column] != g["query_id"]]
        g = g.sort_values(["cosine", id_column], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")
