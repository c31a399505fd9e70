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


# --- Product quantization (Jégou et al. 2011, "Product quantization for
# --- nearest neighbor search"): split D dims into M subspaces, k-means each
# --- subspace, store per-vector codes (M small ints, e.g. 8 bytes instead
# --- of 512) and score queries with asymmetric distance computation (ADC):
# --- a per-query M x ksub lookup table, dist = sum of table[m, code_m].
# --- With dyadic quantization the whole chain (sub-codebooks, codes, ADC
# --- distances) is bit-deterministic, so the SQL oracle derives the
# --- codebooks itself via the same per-subspace Lloyd CTEs and compares
# --- distances UNROUNDED (see __ray_entry__._pq_topk_sql).

def _pq_slices(d: int, m: int):
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [(j * dsub, (j + 1) * dsub) for j in range(m)]


def _smallest_rows(ds: rd.Dataset, n: int, id_column: str, vec_column: str,
                   bits: int | None):
    """(ids, quantized matrix) of the n smallest-id rows — per-batch
    candidates, tiny driver resolve (same shape as _seed_centroids)."""
    def cand(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        if len(ids) > n:
            idx = np.sort(np.argpartition(ids, n)[:n])
            return batch.take(pa.array(idx))
        return batch

    small = ds.map_batches(cand, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True).to_pandas()
    small = small.nsmallest(n, id_column).sort_values(id_column)
    if len(small) < n:
        raise ValueError(f"need {n} rows, have {len(small)}")
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in small[vec_column]])
    return small[id_column].to_numpy(), quantize_matrix(mat, bits)


def pq_train(
    ds: rd.Dataset,
    *,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    quantize_bits: int | None = 10,
) -> np.ndarray:
    """Train M sub-codebooks (m, ksub, dsub) — ALL subspaces advance in the
    same pass, so each Lloyd iteration is still one scan + one tiny keyed
    reduce (m*ksub rows).  Seeds: the ksub smallest-id rows, sub-sliced."""
    proj = ds.select_columns([id_column, vec_column]).materialize()
    _, seed_mat = _smallest_rows(proj, ksub, id_column, vec_column,
                                 quantize_bits)
    d = seed_mat.shape[1]
    slices = _pq_slices(d, m)
    dsub = d // m
    books = np.stack([seed_mat[:, a:b] for a, b in slices])  # (m, ksub, dsub)
    scols = [f"s{j}" for j in range(dsub)]

    for _ in range(iters):
        cur = books.copy()

        def partial(batch: pa.Table) -> dict:
            x = quantize_matrix(_arrow_matrix(batch[vec_column]),
                                quantize_bits)
            mc = np.repeat(np.arange(m, dtype=np.int64), ksub) * ksub \
                + np.tile(np.arange(ksub, dtype=np.int64), m)
            ns = np.zeros(m * ksub, dtype=np.int64)
            sums = np.zeros((m * ksub, dsub), dtype=np.float64)
            for mi, (a, b) in enumerate(slices):
                xs = x[:, a:b]
                assign = np.argmin(_dists_dimseq(xs, cur[mi]), axis=0)
                ns[mi * ksub: (mi + 1) * ksub] = np.bincount(
                    assign, minlength=ksub)
                for c in np.unique(assign):
                    sums[mi * ksub + c] = xs[assign == c].sum(axis=0)
            out = {"mc": mc, "n": ns}
            for j in range(dsub):
                out[scols[j]] = sums[:, j]
            return out

        agg = proj.map_batches(partial, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True) \
            .groupby("mc").sum(["n"] + scols).take_all()
        new = books.copy()
        for row in agg:
            mi, c = divmod(int(row["mc"]), ksub)
            n = row.get("sum(n)", row.get("n"))
            if n:
                for j in range(dsub):
                    s = row.get(f"sum(s{j})", row.get(scols[j]))
                    new[mi, c, j] = s / n
        books = new
    return books


def _pq_codes(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int64 codes: per-subspace argmin (first-min tie-break)."""
    m, ksub, dsub = books.shape
    codes = np.empty((x.shape[0], m), dtype=np.int64)
    for mi in range(m):
        xs = x[:, mi * dsub: (mi + 1) * dsub]
        codes[:, mi] = np.argmin(_dists_dimseq(xs, books[mi]), axis=0)
    return codes


def pq_encode(
    ds: rd.Dataset,
    books: np.ndarray,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    quantize_bits: int | None = 10,
) -> rd.Dataset:
    """(id, k0..k{m-1}) codes — the 64x-smaller searchable representation."""
    m = books.shape[0]

    def enc(batch: pa.Table) -> dict:
        x = quantize_matrix(_arrow_matrix(batch[vec_column]), quantize_bits)
        codes = _pq_codes(x, books)
        out = {id_column: batch[id_column].to_numpy(zero_copy_only=False)}
        for mi in range(m):
            out[f"k{mi}"] = codes[:, mi]
        return out

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def pq_topk(
    ds: rd.Dataset,
    *,
    k: int = 5,
    n_queries: int = 4,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    quantize_bits: int | None = 10,
) -> rd.Dataset:
    """ADC top-k: queries = the n_queries smallest-id vectors (data-derived,
    so the oracle can reproduce them).  Output (query_id, vec_id, dist),
    dist UNROUNDED (bit-deterministic), ties by ascending vec_id.

    Per batch: codes via per-subspace argmin, then dist = the per-query
    lookup-table gather summed subspace-sequentially (left-associated, the
    same order as the SQL's parenthesized per-subspace chain).  Local exact
    top-k (boundary ties kept) -> tiny global reduce per query."""
    proj = ds.select_columns([id_column, vec_column]).materialize()
    books = pq_train(proj, m=m, ksub=ksub, iters=iters, id_column=id_column,
                     vec_column=vec_column, quantize_bits=quantize_bits)
    qids, qmat = _smallest_rows(proj, n_queries, id_column, vec_column,
                                quantize_bits)
    dsub = books.shape[2]
    # (nq, m, ksub) ADC tables, dim-sequential accumulation
    tables = np.stack([
        np.stack([_dists_dimseq(qmat[:, mi * dsub: (mi + 1) * dsub],
                                books[mi])[ci]
                  for ci in range(ksub)], axis=1)
        for mi in range(m)], axis=1)

    def score(batch: pa.Table) -> dict:
        x = quantize_matrix(_arrow_matrix(batch[vec_column]), quantize_bits)
        codes = _pq_codes(x, books)
        ids = batch[id_column].to_numpy(zero_copy_only=False)
        out_q, out_id, out_d = [], [], []
        for qi in range(len(qids)):
            acc = tables[qi, 0][codes[:, 0]]
            for mi in range(1, m):
                acc = acc + tables[qi, mi][codes[:, mi]]
            n = len(acc)
            if k >= n:
                cand = np.arange(n)
            else:
                kth = np.partition(acc, k - 1)[k - 1]
                cand = np.flatnonzero(acc <= kth)  # keep boundary ties
            order = np.lexsort((ids[cand], acc[cand]))[:k]
            sel = cand[order]
            out_q.extend([qids[qi]] * len(sel))
            out_id.append(ids[sel])
            out_d.append(acc[sel])
        return {"query_id": np.asarray(out_q, dtype=qids.dtype),
                id_column: (np.concatenate(out_id) if out_id
                            else np.array([], dtype=ids.dtype)),
                "dist": (np.concatenate(out_d) if out_d
                         else np.array([], dtype=np.float64))}

    scored = proj.map_batches(score, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", id_column], ascending=[True, True],
                          kind="mergesort")
        return g.head(k)

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")
