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

from pytimetk_ray.exec import partitioned_group_map


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
    """Actor: random-hyperplane LSH bucket id per row (zero-copy Arrow)."""

    def __init__(self, planes_ref, vec_column: str):
        self.planes = planes_ref if isinstance(planes_ref, np.ndarray) else ray.get(planes_ref)
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _arrow_matrix(batch[self.vec_column])
        signs = (m @ self.planes.T) > 0  # (B, nbits)
        bucket = (signs.astype(np.int64)
                  * (np.int64(1) << np.arange(signs.shape[1]))).sum(axis=1)
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column("bucket", pa.array(bucket))


def lsh_bucket(ds: rd.Dataset, *, dim: int, nbits: int = 8, seed: int = 5,
               vec_column: str = "embedding", concurrency: int = 4) -> rd.Dataset:
    """Tag rows with a hyperplane-LSH bucket (2**nbits buckets)."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(nbits, dim))
    pref = ray.put(planes)
    return ds.map_batches(
        _BucketTagger,
        fn_constructor_kwargs=dict(planes_ref=pref, vec_column=vec_column),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def embedding_neardup_pairs(
    ds: rd.Dataset,
    *,
    dim: int,
    threshold: float = 0.95,
    nbits: int = 4,
    bands: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    round_digits: int = 12,
    seed: int = 5,
    num_partitions: int = 32,
    max_bucket: int = 100_000,
) -> rd.Dataset:
    """Near-duplicate pairs (cosine >= threshold) via BANDED hyperplane LSH
    (``bands`` independent tables of ``nbits`` hyperplane sign bits each —
    the simhash_pairs banding shape, dedup.py simhash template).

    A pair is a candidate when it shares ANY band's exact bucket — recall
    P(hit) = 1-(1-p^nbits)^bands where p = 1 - angle/pi, so many small-bucket
    tables replace one coarse table: expected bucket population is n/2^nbits
    PER BAND, and pair cost stays O(bands * sum(bucket^2)) with buckets that
    shrink as nbits grows, instead of the O(n^2/2^nbits) blowup of a single
    fixed table.  ``nbits=0`` degenerates to one global bucket = exact
    all-pairs (the SQL-checkable path).

    Execution: one Arrow map_batches computes every band key per row (one
    matmul against the broadcast planes), emits SHORT band rows
    (band_id, band_key, id, normalized-vector blob); candidate pairs are
    produced inside ``exec.partitioned_group_map`` (hash partition, NOT the
    Ray sort shuffle) with segment-vectorized chunked matmuls, thresholded
    in-task, then cross-band-deduped by a second short-row partition map.
    ``max_bucket`` caps any one bucket's membership (ids ascending,
    deterministic truncation) so a degenerate bucket — all-identical vectors
    hash together regardless of table count — cannot produce an O(n^2) task;
    capped buckets trade recall for boundedness and the cap is recorded in
    the docblock contract, not silently absorbed.

    Output: (id_a, id_b, cosine) with id_a < id_b."""
    if nbits <= 0:
        nbits, bands = 0, 1
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(max(bands * nbits, 1), dim))
    pref = ray.put(planes)

    class _BandTagger:
        """Actor: per-row (band_id, band_key) for every band + the normalized
        vector as a fixed-width float64 blob (keeps the shuffle rows flat)."""

        def __init__(self):
            self.planes = ray.get(pref) if not isinstance(pref, np.ndarray) else pref

        def __call__(self, batch: pa.Table) -> dict:
            if len(batch) == 0:
                return {id_column: np.array([], dtype=np.int64),
                        "band_id": np.array([], dtype=np.int64),
                        "band_key": np.array([], dtype=np.int64),
                        "vec": np.array([], dtype=object)}
            m = _normalize(_arrow_matrix(batch[vec_column]))
            n = len(m)
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            if nbits == 0:
                keys = np.zeros(n, dtype=np.int64)[None, :]
            else:
                signs = (m @ self.planes.T) > 0  # (n, bands*nbits)
                w = np.int64(1) << np.arange(nbits)
                keys = np.stack([
                    (signs[:, b * nbits:(b + 1) * nbits].astype(np.int64) * w).sum(axis=1)
                    for b in range(bands)
                ])  # (bands, n)
            blobs = [m[i].tobytes() for i in range(n)]
            return {
                id_column: np.tile(ids, bands),
                "band_id": np.repeat(np.arange(bands, dtype=np.int64), n),
                "band_key": keys.reshape(-1),
                "vec": np.array(blobs * bands, dtype=object),
            }

    band_rows = ds.map_batches(
        _BandTagger, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True, concurrency=2,
    )

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                              "id_b": np.array([], dtype=np.int64),
                              "cosine": np.array([], dtype=np.float64)})
        if len(part) == 0:
            return empty
        bid = part["band_id"].to_numpy()
        bk = part["band_key"].to_numpy()
        ids = part[id_column].to_numpy()
        blobs = part["vec"].to_numpy()
        change = np.empty(len(part), dtype=bool)
        change[0] = True
        np.logical_or(bid[1:] != bid[:-1], bk[1:] != bk[:-1], out=change[1:])
        bounds = np.append(np.flatnonzero(change), len(part))
        ra, rb, rc = [], [], []
        for gi in range(len(bounds) - 1):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            seg_ids = ids[lo:hi]
            keep = np.r_[True, seg_ids[1:] != seg_ids[:-1]]  # ids are sorted
            seg_ids = seg_ids[keep]
            seg_blobs = blobs[lo:hi][keep]
            n = len(seg_ids)
            if n < 2:
                continue
            if n > max_bucket:  # deterministic cap (ids ascending)
                n = max_bucket
                seg_ids, seg_blobs = seg_ids[:n], seg_blobs[:n]
            m = np.frombuffer(b"".join(seg_blobs), dtype=np.float64).reshape(n, -1)
            # chunked upper-triangle matmul: block x n, never n x n
            block = max(1, 4_000_000 // n)
            col = np.arange(n)
            for a in range(0, n - 1, block):
                b = min(a + block, n - 1)
                sims = m[a:b] @ m.T  # (b-a, n)
                rr, cc = np.nonzero(
                    (sims >= threshold) & (col[None, :] > (a + np.arange(b - a))[:, None]))
                if len(rr):
                    ra.append(seg_ids[a + rr])
                    rb.append(seg_ids[cc])
                    rc.append(np.round(sims[rr, cc], round_digits))
        if not ra:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(ra),
                             "id_b": np.concatenate(rb),
                             "cosine": np.concatenate(rc)})

    pairs = partitioned_group_map(
        band_rows, ["band_id", "band_key"], bucket_pairs,
        sort_by=["band_id", "band_key", id_column],
        num_partitions=num_partitions,
    )
    if bands == 1:
        return pairs
    # cross-band dedup: (id_a)-keyed partition, vectorized drop_duplicates
    # (duplicate rows are identical across bands — same normalized dot)
    return partitioned_group_map(
        pairs, ["id_a"],
        lambda p: p.drop_duplicates(["id_a", "id_b"]),
        sort_by=["id_a", "id_b"], num_partitions=num_partitions,
    )


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
    train_mode: str = "random",
) -> rd.Dataset:
    """Approximate cosine top-k via an IVF coarse quantizer.

    Train: k-means centroids from a seed-pinned RANDOM sample of the corpus
    (``ds.random_sample`` — a first-N ``limit`` would bias the centroids
    toward whatever storage order encodes, silently degrading recall on any
    clustered layout; ``train_mode="head"`` keeps the biased variant only
    for A/B tests).  Centroids are tiny and broadcast.  Search: each batch
    row is assigned to its nearest centroid in the actor (vectorized matmul)
    and scored ONLY against queries probing that cluster — compute drops by
    ~nlist/nprobe at a small recall cost.
    Same (query_id, id, cosine) output contract as ``ann_bruteforce``.
    """
    if train_mode == "head":
        sample = ds.limit(train_sample).to_pandas()
    else:
        n_total = ds.count()
        if n_total <= train_sample:
            sample = ds.to_pandas()
        else:
            # oversample 1.25x (random_sample is binomial), then cap
            frac = min(1.0, 1.25 * train_sample / n_total)
            sample = (ds.random_sample(frac, seed=seed)
                      .limit(train_sample).to_pandas())
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
