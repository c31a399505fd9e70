"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the ray_guide patterns, re-derived for this engine):

- exact: content-hash per batch (vectorized) -> ``groupby(hash)`` ->
  keep min id per group.  One all-to-all keyed exchange on the hash.
- MinHash-LSH: shingle+minhash per batch -> explode to (band_id, band_hash,
  doc_id) rows -> ``groupby(band)`` -> candidate pairs inside each bucket ->
  verify with signature-estimated Jaccard.  Sketches are per-row and tiny;
  the shuffle carries (bands x docs) short rows, never text.
- SimHash: 64-bit signature, banded into 4x16-bit keys -> bucket groupby ->
  Hamming-verified pairs.
- embedding near-dup: see pipelines/similarity.py (cosine >= threshold).

Duplicate-pair output convention: (id_a < id_b) pairs, deterministic.  The
"keep set" drops any doc paired with a smaller id — for full transitive
clustering run min-label propagation over the pair list (iterative groupby),
which the pair table feeds directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.kernels import text as tx


# --- exact ------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, *, text_column: str = "text", id_column: str = "doc_id") -> rd.Dataset:
    """Keep the smallest id per distinct text (hash-partitioned)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_column: batch[id_column],
                "__h__": tx.md5_fingerprint(batch[text_column].tolist()),
            }
        )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_column: [g[id_column].min()]})

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("__h__")
        .map_groups(first, batch_format="pandas")
    )


def exact_dedup_rows(ds: rd.Dataset, *, text_column: str = "text",
                     id_column: str = "doc_id") -> rd.Dataset:
    """Exact dedup returning the SURVIVING FULL ROWS (min id per text).

    Unlike ``exact_dedup`` (ids only), this shuffles whole rows by content
    hash and keeps one per group — no driver-side keep-set, so it holds at
    100 TB where the keep-set itself would be billions of ids.  The exchange
    carries each row once."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__h__"] = tx.md5_fingerprint(batch[text_column].tolist())
        return batch

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_column, kind="mergesort").head(1).drop(columns="__h__")

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("__h__")
        .map_groups(keep_min, batch_format="pandas")
    )


# --- MinHash + LSH ----------------------------------------------------------

def minhash_lsh_pairs(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 1,
) -> rd.Dataset:
    """Candidate near-duplicate pairs with estimated Jaccard >= threshold.

    Output: (id_a, id_b, est_jaccard), id_a < id_b, deduplicated."""
    a, b = tx.minhash_params(num_perm, seed)

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(batch[id_column], batch[text_column]):
            sig = tx.minhash_signature(
                tx.shingle_hashes(tx.word_hashes(text), shingle_k), a, b
            )
            for band_id, bh in enumerate(tx.minhash_bands(sig, num_bands)):
                ids.append(doc_id)
                bands.append(band_id)
                band_hashes.append(bh)
                sigs.append(sig.tobytes())
        return pd.DataFrame(
            {
                id_column: ids,
                "band_id": np.array(bands, dtype=np.int64),
                "band_hash": np.array(band_hashes, dtype=np.uint64),
                "sig": sigs,
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        g = g.sort_values(id_column, kind="mergesort").drop_duplicates(id_column)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        ids = g[id_column].to_numpy()
        S = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])  # (n, perm)
        # vectorized pairwise signature-match fraction (buckets are small)
        eq = (S[:, None, :] == S[None, :, :]).mean(axis=2)
        iu = np.triu_indices(n, k=1)
        ej = eq[iu]
        mask = ej >= threshold
        return pd.DataFrame(
            {"id_a": ids[iu[0][mask]], "id_b": ids[iu[1][mask]], "est_jaccard": ej[mask]}
        )

    pairs = (
        ds.map_batches(sketch, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # same pair can surface from multiple bands -> dedup on (id_a, id_b)
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


# --- connected components over dup pairs ------------------------------------

def dedup_components(pairs: rd.Dataset, *, id_column: str = "doc_id",
                     max_rounds: int = 10) -> rd.Dataset:
    """Transitive duplicate clusters via iterative min-label propagation.

    Input: (id_a, id_b) pair rows.  Output: (doc_id, cluster_id) where
    cluster_id = min doc id reachable through the pair graph.  Each round is
    one groupby (label <- min over neighborhood); converges in O(diameter)
    rounds — pair graphs from LSH dedup have tiny components, so a handful
    of rounds suffices (``max_rounds`` caps pathological chains)."""
    import pandas as pd

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([batch["id_a"].to_numpy(), batch["id_b"].to_numpy()]),
                "nbr": np.concatenate([batch["id_b"].to_numpy(), batch["id_a"].to_numpy()]),
            }
        )

    edges = pairs.map_batches(explode, batch_format="pandas")

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        lab = min(g["node"].iloc[0], g["lbl"].min())
        return pd.DataFrame({"node": [g["node"].iloc[0]], "label": [lab]})

    # labels start as the node ids themselves, propagated over neighbors
    labels = (
        edges.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "lbl": b["nbr"]}),
            batch_format="pandas",
        )
        .groupby("node")
        .map_groups(min_label, batch_format="pandas")
    )
    for _ in range(max_rounds - 1):
        labels_pdf = labels.to_pandas()  # small: only duplicate nodes
        lab_map = dict(zip(labels_pdf["node"], labels_pdf["label"]))
        nxt = {n: min(l, lab_map.get(l, l)) for n, l in lab_map.items()}
        if nxt == lab_map:
            break
        labels = rd.from_pandas(
            pd.DataFrame({"node": list(nxt), "label": list(nxt.values())})
        )
    return labels.map_batches(
        lambda b: pd.DataFrame({id_column: b["node"], "cluster_id": b["label"]}),
        batch_format="pandas",
    )


# --- SimHash ----------------------------------------------------------------

def simhash_pairs(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
) -> rd.Dataset:
    """Near-dup pairs by 64-bit SimHash, banded 4x16 bits (any pair within
    Hamming distance 3 shares at least one exact 16-bit band)."""

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, keys, hashes = [], [], [], []
        for doc_id, text in zip(batch[id_column], batch[text_column]):
            h = tx.simhash(text)
            for band_id in range(4):
                ids.append(doc_id)
                bands.append(band_id)
                keys.append((h >> (band_id * 16)) & 0xFFFF)
                hashes.append(h)
        return pd.DataFrame(
            {
                id_column: ids,
                "band_id": np.array(bands, dtype=np.int64),
                "band_key": np.array(keys, dtype=np.int64),
                "simhash": np.array(hashes, dtype=np.uint64),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_column, kind="mergesort").drop_duplicates(id_column)
        ids = g[id_column].to_numpy()
        hs = g["simhash"].to_numpy()
        ra, rb, rh = [], [], []
        for i in range(len(g)):
            d = tx.hamming64(np.full(len(g) - i - 1, hs[i]), hs[i + 1 :])
            for off in np.flatnonzero(d <= max_hamming):
                ra.append(ids[i])
                rb.append(ids[i + 1 + off])
                rh.append(int(d[off]))
        return pd.DataFrame({"id_a": ra, "id_b": rb, "hamming": rh})

    pairs = (
        ds.map_batches(sketch, batch_format="pandas")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --- exact n-gram Jaccard verification --------------------------------------

def ngram_jaccard_pairs(
    ds: rd.Dataset,
    candidate_pairs: pd.DataFrame,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact Jaccard over word-shingle sets for candidate pairs.

    The candidate set is small (LSH already pruned), so texts for the pair
    ids are fetched with a pushdown filter and verified driver-side.  At
    100 TB the same verify runs as a hash-partition join of pairs->texts on
    id (both sides keyed by doc id)."""
    need = set(candidate_pairs["id_a"]) | set(candidate_pairs["id_b"])
    if need:
        need_arr = np.fromiter(need, dtype=np.int64, count=len(need))

        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[id_column].isin(need_arr)][[id_column, text_column]]

        small = ds.map_batches(pick, batch_format="pandas").to_pandas()
    else:
        small = pd.DataFrame({id_column: [], text_column: []})
    texts = dict(zip(small[id_column], small[text_column]))
    out = []
    for _, row in candidate_pairs.iterrows():
        sa = tx.word_shingles(texts.get(row["id_a"], ""), shingle_k)
        sb = tx.word_shingles(texts.get(row["id_b"], ""), shingle_k)
        denom = len(sa | sb)
        j = len(sa & sb) / denom if denom else 0.0
        if j >= threshold:
            out.append({"id_a": row["id_a"], "id_b": row["id_b"], "jaccard": j})
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


def jaccard_allpairs(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.2,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Exact all-pairs word-shingle Jaccard via a distributed inverted
    index — no candidate pruning, no sketches.

    Shape: explode each doc to (shingle_hash, doc_id) rows (distinct per
    doc) -> hash-partition by shingle -> per bucket emit doc pairs ->
    per-partition PARTIAL (id_a, id_b) counts -> global count = |A∩B| ->
    Jaccard with broadcast |S| sizes.  The shuffle carries only (hash, id)
    pairs, never text.  Hot shingles (a trigram shared by b docs) cost b²
    pair rows in one bucket — at 100 TB cap bucket size or drop
    top-document-frequency shingles (standard df-cut).

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    UNROUNDED doubles (p/q of small exact ints — bit-identical across
    engines, no decimal-tie hazard)."""
    from pytimetk_ray.exec import partitioned_group_map

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, t in zip(batch[id_column], batch[text_column]):
            s = tx.word_shingles(t, shingle_k)
            if not s:
                continue
            ids.extend([i] * len(s))
            hs.extend(s)
        return pd.DataFrame({"h": np.array(hs, dtype=np.uint64).astype(np.int64),
                             id_column: np.array(ids, dtype=np.int64)})

    exploded = ds.map_batches(explode, batch_format="pandas")

    # per-doc set sizes (tiny -> driver dict; ray.put broadcast at scale)
    size_of = (
        exploded.map_batches(
            lambda b: b.groupby(id_column, as_index=False).agg(sz=("h", "count")),
            batch_format="pandas",
        ).to_pandas().groupby(id_column)["sz"].sum().to_dict()
    )

    # partition by shingle hash; a pair's shingles span partitions, so
    # per-partition pair counts are PARTIAL and re-reduced by a second
    # hash partition on id_a (all partials of a pair co-locate; pandas sums
    # them at C speed — exact int sums, order-independent), then Jaccard
    partial = partitioned_group_map(
        exploded, ["h"], _partial_pair_counts(id_column),
        sort_by=["h"], num_partitions=num_partitions,
    )

    def reduce_pairs(part: pd.DataFrame) -> pd.DataFrame:
        cnt = part.groupby(["id_a", "id_b"], as_index=False)["c"].sum()
        inter = cnt["c"].to_numpy(np.float64)
        sa = cnt["id_a"].map(size_of).to_numpy(np.float64)
        sb = cnt["id_b"].map(size_of).to_numpy(np.float64)
        j = inter / (sa + sb - inter)
        out = pd.DataFrame({"id_a": cnt["id_a"].astype(np.int64),
                            "id_b": cnt["id_b"].astype(np.int64), "jaccard": j})
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return partitioned_group_map(
        partial, ["id_a"], reduce_pairs, sort_by=["id_a", "id_b"],
        num_partitions=num_partitions,
    )


def _partial_pair_counts(id_column):
    """Per-partition kernel: rows sorted by shingle hash -> partial
    (id_a, id_b) co-occurrence counts over each shingle's doc bucket."""

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        hs = part["h"].to_numpy()
        ids = part[id_column].to_numpy()
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        bounds = np.append(starts, len(hs))
        pa_, pb_ = [], []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            bucket = np.sort(ids[lo:hi])
            iu = np.triu_indices(len(bucket), k=1)
            pa_.append(bucket[iu[0]])
            pb_.append(bucket[iu[1]])
        if not pa_:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({"id_a": np.concatenate(pa_), "id_b": np.concatenate(pb_)})
        cnt = df.groupby(["id_a", "id_b"], as_index=False).size()
        return pd.DataFrame({"id_a": cnt["id_a"].astype(np.int64),
                             "id_b": cnt["id_b"].astype(np.int64),
                             "c": cnt["size"].astype(np.int64)})

    return fn
