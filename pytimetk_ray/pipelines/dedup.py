"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the ray_guide patterns, re-derived for this engine):

- exact: content-hash per batch (vectorized) -> hash-partition by hash ->
  vectorized ``drop_duplicates`` per partition (many hash groups per task;
  NO per-group Python calls, NO Ray sort shuffle — see exec.py rationale).
- MinHash-LSH: shingle+minhash per batch -> explode to (band_id, band_hash,
  doc_id) rows -> hash-partition by band key -> candidate pairs per bucket
  segment inside each partition task -> verify with signature-estimated
  Jaccard.  Sketches are per-row and tiny; the shuffle carries
  (bands x docs) short rows, never text.
- SimHash: 64-bit signature, banded into 4x16-bit keys -> bucketed pairs as
  above -> Hamming-verified.
- embedding near-dup: see pipelines/similarity.py (cosine >= threshold).
- connected components: distributed min-label propagation with pointer
  jumping — every round is keyed co-partition merges + a scalar checksum;
  NOTHING (neither labels nor edges) is ever materialized on the driver.

Duplicate-pair output convention: (id_a < id_b) pairs, deterministic.  The
"keep set" drops any doc paired with a smaller id — for full transitive
clustering run ``dedup_components`` over the pair list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.kernels import text as tx

DEDUP_PARTITIONS = 32


def _empty_pairs(value_col: str, value_dtype=np.float64) -> pd.DataFrame:
    return pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
        value_col: pd.Series([], dtype=value_dtype),
    })


# --- exact ------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, *, text_column: str = "text",
                id_column: str = "doc_id",
                num_partitions: int = DEDUP_PARTITIONS) -> rd.Dataset:
    """Keep the smallest id per distinct text.

    Hash-partition by content hash, then ONE vectorized
    ``drop_duplicates(keep="first")`` over the id-sorted partition — every
    hash group is wholly inside one task, so "first" is the global min id.
    No per-group Python calls (a 1-row-group ``map_groups`` would pay one
    interpreter call per distinct document)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_column: batch[id_column],
                "__h__": tx.md5_fingerprint(batch[text_column].tolist()),
            }
        )

    def keep_min(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates("__h__", keep="first")[[id_column]]

    return partitioned_group_map(
        ds.map_batches(add_hash, batch_format="pandas"),
        ["__h__"], keep_min, sort_by=["__h__", id_column],
        num_partitions=num_partitions,
    )


def exact_dedup_rows(ds: rd.Dataset, *, text_column: str = "text",
                     id_column: str = "doc_id",
                     num_partitions: int = DEDUP_PARTITIONS) -> rd.Dataset:
    """Exact dedup returning the SURVIVING FULL ROWS (min id per text).

    Unlike ``exact_dedup`` (ids only), this shuffles whole rows by content
    hash and keeps one per group — no driver-side keep-set, so it holds at
    100 TB where the keep-set itself would be billions of ids.  The exchange
    carries each row once; the per-partition kernel is one vectorized
    ``drop_duplicates`` over thousands of hash groups."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__h__"] = tx.md5_fingerprint(batch[text_column].tolist())
        return batch

    def keep_min(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates("__h__", keep="first").drop(columns="__h__")

    return partitioned_group_map(
        ds.map_batches(add_hash, batch_format="pandas"),
        ["__h__"], keep_min, sort_by=["__h__", id_column],
        num_partitions=num_partitions,
    )


# --- MinHash + LSH ----------------------------------------------------------

def _cap_bucket(seg_ids: np.ndarray, seg_sigs: np.ndarray, max_bucket: int):
    """Deterministic ids-ascending bucket cap with a VISIBLE recall-loss
    warning (shows in Ray worker logs; the oracle SQL mirrors the exact
    prefix via ROW_NUMBER ... <= max_bucket, so parity is unaffected)."""
    import warnings

    warnings.warn(
        f"minhash_lsh_pairs: band bucket of {len(seg_ids)} docs truncated "
        f"to max_bucket={max_bucket} (deterministic doc-id prefix); "
        f"candidate pairs beyond the cap are dropped",
        RuntimeWarning, stacklevel=2)
    return seg_ids[:max_bucket], seg_sigs[:max_bucket]


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
    hasher: str = "md5",
    num_partitions: int = DEDUP_PARTITIONS,
    max_bucket: int = 100_000,
) -> rd.Dataset:
    """Candidate near-duplicate pairs with estimated Jaccard >= threshold.

    Output: (id_a, id_b, est_jaccard), id_a < id_b, deduplicated.  Bucket
    pair generation runs as a segment loop over each hash partition (many
    buckets per task, typical bucket size 1-2); the cross-band pair dedup is
    one vectorized ``drop_duplicates`` per (id_a,)-keyed partition — the
    estimated Jaccard of a pair is band-independent (computed from the full
    signature), so keeping any one surfaced row is deterministic.

    ``max_bucket`` caps any one band bucket's membership (ids ascending, so
    the kept prefix is deterministic): a degenerate bucket — e.g. a
    boilerplate-identical shard of the corpus — would otherwise generate
    O(bucket²·num_perm) work in a single task.  Signature comparison within
    a bucket is CHUNKED (block × n × perm, ~64 MiB ceiling) so task memory
    stays bounded no matter the bucket size, mirroring
    ``similarity.embedding_neardup_lsh``.

    ``hasher="md5"`` (default) hashes shingle STRINGS with the DuckDB-
    matchable ``md5_number_lower`` u64 and applies TRUE (a*x+b) mod (2^61-1)
    permutations — the whole sketch is reproducible in SQL (HUGEINT modmul),
    so the pipeline is oracle-checkable end to end; zero-shingle docs are
    skipped (absent from the SQL shingle expansion).  ``hasher="fast"`` is
    the cheaper pandas-hash + uint64-wrap mix (not SQL-reproducible)."""
    a, b = tx.minhash_params(num_perm, seed)

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(batch[id_column], batch[text_column]):
            if hasher == "md5":
                sh = tx.shingle_strings(text, shingle_k)
                if not sh:
                    continue
                sig = tx.minhash_signature_exact(tx.md5_u64_many(sh), a, b)
            else:
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
                id_column: np.array(ids, dtype=np.int64),
                "band_id": np.array(bands, dtype=np.int64),
                "band_hash": np.array(band_hashes, dtype=np.uint64).astype(np.int64),
                "sig": sigs,
            }
        )

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return _empty_pairs("est_jaccard")
        bid = part["band_id"].to_numpy()
        bh = part["band_hash"].to_numpy()
        ids = part[id_column].to_numpy()
        sig_col = part["sig"].to_numpy()
        change = np.empty(len(part), dtype=bool)
        change[0] = True
        np.logical_or(bid[1:] != bid[:-1], bh[1:] != bh[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        bounds = np.append(starts, len(part))
        ra, rb, rj = [], [], []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            seg_ids = ids[lo:hi]  # ascending (sort_by includes id)
            keep = np.r_[True, seg_ids[1:] != seg_ids[:-1]]
            seg_ids = seg_ids[keep]
            seg_sigs = sig_col[lo:hi][keep]
            n = len(seg_ids)
            if n < 2:
                continue
            if n > max_bucket:  # deterministic cap (ids ascending)
                seg_ids, seg_sigs = _cap_bucket(seg_ids, seg_sigs, max_bucket)
                n = max_bucket
            S = np.frombuffer(b"".join(seg_sigs), dtype=np.uint64
                              ).reshape(n, -1)
            perm = S.shape[1]
            # chunked upper-triangle compare: (block, n, perm) bool stays
            # under ~64 MiB; never materialize the full n x n x perm cube
            block = max(1, 64_000_000 // max(1, n * perm))
            col = np.arange(n)
            for s0 in range(0, n - 1, block):
                s1 = min(s0 + block, n - 1)
                ej = (S[s0:s1, None, :] == S[None, :, :]).mean(axis=2)
                rr, cc = np.nonzero(
                    (ej >= threshold)
                    & (col[None, :] > (s0 + np.arange(s1 - s0))[:, None]))
                if len(rr):
                    ra.append(seg_ids[s0 + rr])
                    rb.append(seg_ids[cc])
                    rj.append(ej[rr, cc])
        if not ra:
            return _empty_pairs("est_jaccard")
        return pd.DataFrame({
            "id_a": np.concatenate(ra).astype(np.int64),
            "id_b": np.concatenate(rb).astype(np.int64),
            "est_jaccard": np.concatenate(rj),
        })

    pairs = partitioned_group_map(
        ds.map_batches(sketch, batch_format="pandas"),
        ["band_id", "band_hash"], bucket_pairs,
        sort_by=["band_id", "band_hash", id_column],
        num_partitions=num_partitions,
    )
    return _dedup_pairs(pairs, num_partitions)


def _dedup_pairs(pairs: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Cross-band pair dedup: (id_a)-keyed partition, one vectorized
    ``drop_duplicates(["id_a","id_b"])`` per task (the duplicate rows of a
    pair are identical across bands, so any survivor is deterministic)."""
    return partitioned_group_map(
        pairs, ["id_a"],
        lambda part: part.drop_duplicates(["id_a", "id_b"]),
        sort_by=["id_a", "id_b"], num_partitions=num_partitions,
    )


# --- connected components over dup pairs ------------------------------------

_KIND = "__kind__"


def dedup_components(pairs: rd.Dataset, *, id_column: str = "doc_id",
                     max_rounds: int = 10,
                     num_partitions: int = DEDUP_PARTITIONS,
                     single_task_max_edges: int = 2_000_000) -> rd.Dataset:
    """Transitive duplicate clusters via DISTRIBUTED min-label propagation.

    Input: (id_a, id_b) pair rows.  Output: (doc_id, cluster_id) where
    cluster_id = min doc id reachable through the pair graph.

    Every round stays on the cluster — TWO keyed co-partition passes:
    (1) one merge pass answers both lookups at once — each node forwards its
    current label to every neighbor (edge requests keyed by sender) AND each
    label pointer-jumps one hop (labels re-keyed by their label value — the
    doubling trick that makes convergence O(log diameter) instead of
    O(diameter)); (2) labels <- min over {self, neighbor messages, jumped
    label} with one keyed vectorized groupby-min.  The driver only ever sees
    a scalar checksum: min-label updates are monotone decreasing, so
    sum(label) is a fixpoint detector (equal sum <=> no label changed; ids
    must not overflow int64 in aggregate — true for any realistic id space).
    Label/edge tables are materialized per round in the OBJECT STORE (the
    iteration needs a barrier), never collected.  Partition count adapts to
    the (known after materialize) edge count so tiny dup graphs don't pay
    64-task shuffle overhead per round, while 100 TB graphs spread fully."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["id_a"].to_numpy(np.int64)
        b = batch["id_b"].to_numpy(np.int64)
        return pd.DataFrame({"node": np.concatenate([a, b]),
                             "nbr": np.concatenate([b, a])})

    edges = pairs.map_batches(explode, batch_format="pandas").materialize()
    n_edges = edges.count()

    if n_edges <= single_task_max_edges:
        # Small-graph fast path: the whole (symmetric) edge list fits one
        # WORKER task — run vectorized min-label propagation with pointer
        # jumping inside it.  Still never on the driver; a dup graph above
        # the gate takes the distributed rounds below.  Per-round shuffle
        # fixed costs (~seconds each) would otherwise dominate tiny graphs.
        def local_cc(part: pd.DataFrame) -> pd.DataFrame:
            u = part["node"].to_numpy(np.int64)
            v = part["nbr"].to_numpy(np.int64)
            nodes, inv = np.unique(u, return_inverse=True)  # symmetric: u has all
            vi = np.searchsorted(nodes, v)
            lab = np.arange(len(nodes), dtype=np.int64)
            while True:
                old = lab.copy()
                np.minimum.at(lab, inv, lab[vi])
                while True:  # pointer-jump to per-round fixpoint
                    l2 = lab[lab]
                    if np.array_equal(l2, lab):
                        break
                    lab = l2
                if np.array_equal(lab, old):
                    break
            return pd.DataFrame({id_column: nodes, "cluster_id": nodes[lab]})

        return partitioned_group_map(edges, [], local_cc, sort_by=None,
                                     num_partitions=1)

    P = max(1, min(num_partitions, n_edges // 2000 + 1))

    def init_labels(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("node", as_index=False)["nbr"].min()
        return pd.DataFrame({
            "node": g["node"].to_numpy(np.int64),
            "label": np.minimum(g["node"].to_numpy(np.int64),
                                g["nbr"].to_numpy(np.int64)),
        })

    labels = partitioned_group_map(
        edges, ["node"], init_labels, sort_by=["node"], num_partitions=P,
    ).materialize()
    prev_sum = labels.sum("label")

    # request rows: k = join key (label-table node to look up), p = receiver
    def tag_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["node"].astype(np.int64),
                             "p": b["nbr"].astype(np.int64),
                             "label": np.int64(-1), _KIND: np.int8(0)})

    def tag_jump(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["label"].astype(np.int64),
                             "p": b["node"].astype(np.int64),
                             "label": np.int64(-1), _KIND: np.int8(0)})

    def tag_lab(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["node"].astype(np.int64),
                             "p": np.int64(-1),
                             "label": b["label"].astype(np.int64),
                             _KIND: np.int8(1)})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        kind = part[_KIND].to_numpy()
        lab = part.loc[kind == 1, ["k", "label"]]
        req = part.loc[kind == 0, ["k", "p"]]
        m = req.merge(lab.rename(columns={"label": "l2"}), on="k", how="inner")
        return pd.DataFrame({"node": m["p"].to_numpy(np.int64),
                             "label": m["l2"].to_numpy(np.int64)})

    def reduce_min(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("node", as_index=False)["label"].min()

    for _ in range(max_rounds - 1):
        tagged = (
            edges.map_batches(tag_edges, batch_format="pandas")
            .union(labels.map_batches(tag_jump, batch_format="pandas"))
            .union(labels.map_batches(tag_lab, batch_format="pandas"))
        )
        msgs = partitioned_group_map(tagged, ["k"], merge, sort_by=["k"],
                                     num_partitions=P)
        labels = partitioned_group_map(
            labels.union(msgs), ["node"], reduce_min,
            sort_by=["node"], num_partitions=P,
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda b: pd.DataFrame({id_column: b["node"], "cluster_id": b["label"]}),
        batch_format="pandas",
    )


def cluster_representatives(
    clusters: rd.Dataset,
    docs: rd.Dataset,
    *,
    id_column: str = "doc_id",
    length_column: str = "n_chars",
    num_partitions: int = DEDUP_PARTITIONS,
) -> rd.Dataset:
    """Elect ONE representative per duplicate cluster — the keep/drop
    decision that turns a pair graph into an actual dedup action.

    Input: ``clusters`` (doc_id, cluster_id) from ``dedup_components``;
    ``docs`` supplies the election feature.  Convention (C4 / BigQuery
    dedup practice): keep the LONGEST member, doc id ascending as the
    total-order tiebreak.  Docs outside any cluster are untouched by
    construction (absent from the input).

    Shape: one co-partitioning ``hash_join`` on doc_id attaches lengths,
    one keyed partition per cluster_id elects vectorized (factorize +
    lexsort + first-of-group) — no driver materialization at any size.

    Output: (doc_id, cluster_id, <length_column>, keep) — exactly one
    ``keep=True`` row per cluster."""
    from pytimetk_ray.exec import row_number_in_group
    from pytimetk_ray.ops.joins import hash_join

    joined = hash_join(
        clusters, docs.select_columns([id_column, length_column]),
        left_on=id_column, num_partitions=num_partitions)

    def elect(part: pd.DataFrame) -> pd.DataFrame:
        codes = pd.factorize(part["cluster_id"], sort=False)[0]
        ids = part[id_column].to_numpy()
        ln = part[length_column].to_numpy(np.int64)
        order = np.lexsort((ids, -ln, codes))
        out = part.iloc[order].reset_index(drop=True)
        out["keep"] = row_number_in_group(codes[order]) == 0
        return out

    return partitioned_group_map(joined, ["cluster_id"], elect,
                                 sort_by=["cluster_id"],
                                 num_partitions=num_partitions)


# --- SimHash ----------------------------------------------------------------

def simhash_pairs(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
    hasher: str = "md5",
    num_partitions: int = DEDUP_PARTITIONS,
) -> rd.Dataset:
    """Near-dup pairs by 64-bit SimHash, banded 4x16 bits (any pair within
    Hamming distance 3 shares at least one exact 16-bit band).  Same
    partitioned bucket-segment shape as MinHash.

    ``hasher="md5"`` (default) votes with DuckDB-matchable
    ``md5_number_lower`` word hashes — SQL-reproducible end to end (wordless
    docs skipped, mirroring the SQL word expansion); ``hasher="fast"`` uses
    the cheaper pandas word hash."""

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, keys, hashes = [], [], [], []
        for doc_id, text in zip(batch[id_column], batch[text_column]):
            if hasher == "md5":
                if not tx._WORD_RE.search((text or "").lower()):
                    continue
                h = tx.simhash_md5(text)
            else:
                h = tx.simhash(text)
            for band_id in range(4):
                ids.append(doc_id)
                bands.append(band_id)
                keys.append((h >> (band_id * 16)) & 0xFFFF)
                hashes.append(h)
        return pd.DataFrame(
            {
                id_column: np.array(ids, dtype=np.int64),
                "band_id": np.array(bands, dtype=np.int64),
                "band_key": np.array(keys, dtype=np.int64),
                "simhash": np.array(hashes, dtype=np.uint64).astype(np.int64),
            }
        )

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return _empty_pairs("hamming", np.int64)
        bid = part["band_id"].to_numpy()
        bk = part["band_key"].to_numpy()
        ids = part[id_column].to_numpy()
        hs = part["simhash"].to_numpy().astype(np.uint64)
        change = np.empty(len(part), dtype=bool)
        change[0] = True
        np.logical_or(bid[1:] != bid[:-1], bk[1:] != bk[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        bounds = np.append(starts, len(part))
        ra, rb, rh = [], [], []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            if hi - lo < 2:
                continue
            seg_ids = ids[lo:hi]
            keep = np.r_[True, seg_ids[1:] != seg_ids[:-1]]
            seg_ids = seg_ids[keep]
            seg_hs = hs[lo:hi][keep]
            n = len(seg_ids)
            if n < 2:
                continue
            iu = np.triu_indices(n, k=1)
            d = tx.hamming64(seg_hs[iu[0]], seg_hs[iu[1]])
            mask = d <= max_hamming
            ra.append(seg_ids[iu[0][mask]])
            rb.append(seg_ids[iu[1][mask]])
            rh.append(d[mask])
        if not ra:
            return _empty_pairs("hamming", np.int64)
        return pd.DataFrame({
            "id_a": np.concatenate(ra).astype(np.int64),
            "id_b": np.concatenate(rb).astype(np.int64),
            "hamming": np.concatenate(rh).astype(np.int64),
        })

    pairs = partitioned_group_map(
        ds.map_batches(sketch, batch_format="pandas"),
        ["band_id", "band_key"], bucket_pairs,
        sort_by=["band_id", "band_key", id_column],
        num_partitions=num_partitions,
    )
    return _dedup_pairs(pairs, num_partitions)


# --- exact n-gram Jaccard verification --------------------------------------

def ngram_jaccard_pairs(
    ds: rd.Dataset,
    candidate_pairs: pd.DataFrame | rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    num_partitions: int = DEDUP_PARTITIONS,
) -> rd.Dataset:
    """Exact Jaccard over word-shingle sets for candidate pairs — the
    join-based scale path: docs are reduced to sorted shingle-hash arrays
    once, then candidate pairs pick up each side's set via two keyed
    co-partition merges (pairs ⋈ sets on id_a, then on id_b).  Neither the
    texts nor the sets nor the verified pairs ever gather on the driver:
    the result is a DATASET of (id_a, id_b, jaccard) rows (verified-pair
    volume scales with the corpus duplication rate, not LSH selectivity —
    callers that want a frame call ``.to_pandas()`` on their own risk)."""
    if isinstance(candidate_pairs, pd.DataFrame):
        if len(candidate_pairs) == 0:
            return rd.from_pandas(_empty_pairs("jaccard"))
        cand = rd.from_pandas(candidate_pairs[["id_a", "id_b"]])
    else:
        cand = candidate_pairs.select_columns(["id_a", "id_b"])

    def docsets(batch: pd.DataFrame) -> pd.DataFrame:
        ids, blobs = [], []
        for i, t in zip(batch[id_column], batch[text_column]):
            s = tx.word_shingles(t, shingle_k)
            ids.append(i)
            blobs.append(np.sort(np.fromiter(
                s, dtype=np.uint64, count=len(s))).tobytes())
        return pd.DataFrame({"doc": np.array(ids, dtype=np.int64), "set": blobs})

    sets = ds.map_batches(docsets, batch_format="pandas")

    def attach(pairs_ds: rd.Dataset, pair_cols: list, key: str, out_col: str):
        """Co-partition merge of pair rows (keyed by ``key``) with the
        (doc, set) table; the two union sides carry an identical schema
        (pair columns default-filled on the set side)."""

        def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"__k__": b[key].astype(np.int64)})
            for c in pair_cols:
                out[c] = b[c]
            out["set"] = pd.Series([b""] * len(b), dtype=object)
            out[_KIND] = np.int8(0)
            return out

        def tag_set(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"__k__": b["doc"].astype(np.int64)})
            for c in pair_cols:
                out[c] = (pd.Series([b""] * len(b), dtype=object)
                          if c.startswith("set") else np.int64(-1))
            out["set"] = b["set"]
            out[_KIND] = np.int8(1)
            return out

        def merge(part: pd.DataFrame) -> pd.DataFrame:
            kind = part[_KIND].to_numpy()
            lab = part.loc[kind == 1, ["__k__", "set"]].rename(
                columns={"set": out_col})
            req = part.loc[kind == 0, ["__k__"] + pair_cols]
            return req.merge(lab, on="__k__", how="inner").drop(columns="__k__")

        return partitioned_group_map(
            pairs_ds.map_batches(tag_pair, batch_format="pandas").union(
                sets.map_batches(tag_set, batch_format="pandas")),
            ["__k__"], merge, sort_by=["__k__"], num_partitions=num_partitions,
        )

    step1 = attach(cand, ["id_a", "id_b"], "id_a", "set_a")
    step2 = attach(step1, ["id_a", "id_b", "set_a"], "id_b", "set_b")

    def verify(part: pd.DataFrame) -> pd.DataFrame:
        ja = np.empty(len(part), dtype=np.float64)
        for i, (ba, bb) in enumerate(zip(part["set_a"], part["set_b"])):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            denom = len(sa) + len(sb) - inter
            ja[i] = inter / denom if denom else 0.0
        out = pd.DataFrame({"id_a": part["id_a"].to_numpy(np.int64),
                            "id_b": part["id_b"].to_numpy(np.int64),
                            "jaccard": ja})
        return out[out["jaccard"] >= threshold]

    return step2.map_batches(verify, batch_format="pandas")


def jaccard_allpairs(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    num_partitions: int = DEDUP_PARTITIONS,
) -> rd.Dataset:
    """Exact all-pairs word-shingle Jaccard via a distributed inverted
    index — no candidate pruning, no sketches.

    Shape: explode each doc to (shingle_hash, doc_id) rows (distinct per
    doc) -> hash-partition by shingle -> per bucket emit doc pairs ->
    per-partition PARTIAL (id_a, id_b) counts -> global count = |A∩B| ->
    Jaccard with per-doc set sizes attached by two keyed co-partition
    merges (sizes ⋈ pairs on id_a, then id_b) — sizes are a DATASET, never
    a driver dict, so billions of docs don't land on one process.

    ``max_doc_freq=D`` is the standard df-cut: shingles shared by more than
    D documents are dropped BEFORE pair generation (their b² pair blowup is
    what kills the inverted-index shape at scale).  The cut is applied
    consistently — per-doc set sizes count only surviving shingles — so the
    reported Jaccard is exactly the Jaccard over the df-filtered shingle
    sets (mirrorable in SQL with a HAVING df <= D).

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    UNROUNDED doubles (p/q of small exact ints — bit-identical across
    engines, no decimal-tie hazard)."""

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

    # Partition by shingle hash: every row of a shingle co-locates, so both
    # the df-cut and the pair generation are exact per bucket.  A pair's
    # shingles span partitions, so per-partition pair counts are PARTIAL.
    # Per-doc size contributions (surviving shingles only, under a df-cut)
    # are emitted from the SAME kernel as (doc, -1, n) sentinel rows — one
    # pass over the exploded rows feeds both reduce stages (a separate sizes
    # branch would re-execute the whole explode pipeline: lazy Datasets have
    # no common-subexpression reuse).
    partial = partitioned_group_map(
        exploded, ["h"],
        _partial_pair_counts(id_column, max_doc_freq, emit_sizes=True),
        sort_by=["h"], num_partitions=num_partitions,
    )

    # Reduce stage 1 (keyed by id_a): sum pair partials -> |A∩B|, sum size
    # partials -> |A|, attach sa.  Also re-emits the reduced (doc, sz) rows
    # keyed for stage 2.
    def split_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["k"] = b["id_a"].astype(np.int64)
        b[_KIND] = np.where(b["id_b"].to_numpy() == -1, np.int8(1), np.int8(0))
        return b[["k", "id_a", "id_b", "c", _KIND]]

    stage1_in = partial.map_batches(split_partial, batch_format="pandas")

    def reduce_a(part: pd.DataFrame) -> pd.DataFrame:
        kind = part[_KIND].to_numpy()
        sz = part.loc[kind == 1].groupby("id_a", as_index=False)["c"].sum()
        pr = part.loc[kind == 0].groupby(["id_a", "id_b"], as_index=False)["c"].sum()
        m = pr.merge(sz.rename(columns={"c": "sa"}), on="id_a", how="left")
        out = pd.DataFrame({
            "k": m["id_b"].to_numpy(np.int64),
            "id_a": m["id_a"].to_numpy(np.int64),
            "id_b": m["id_b"].to_numpy(np.int64),
            "c": m["c"].to_numpy(np.int64),
            "sa": m["sa"].to_numpy(np.int64),
            _KIND: np.int8(0),
        })
        szr = pd.DataFrame({
            "k": sz["id_a"].to_numpy(np.int64),
            "id_a": sz["id_a"].to_numpy(np.int64),
            "id_b": np.int64(-1),
            "c": sz["c"].to_numpy(np.int64),
            "sa": np.int64(-1),
            _KIND: np.int8(1),
        })
        return pd.concat([out, szr], ignore_index=True)

    stage1 = partitioned_group_map(stage1_in, ["k"], reduce_a, sort_by=["k"],
                                   num_partitions=num_partitions)

    # Reduce stage 2 (keyed by id_b): attach sb, compute Jaccard, filter.
    def reduce_b(part: pd.DataFrame) -> pd.DataFrame:
        kind = part[_KIND].to_numpy()
        sz = part.loc[kind == 1, ["id_a", "c"]].rename(
            columns={"id_a": "id_b", "c": "sb"})
        pr = part.loc[kind == 0, ["id_a", "id_b", "c", "sa"]]
        m = pr.merge(sz, on="id_b", how="left")
        inter = m["c"].to_numpy(np.float64)
        j = inter / (m["sa"].to_numpy(np.float64) + m["sb"].to_numpy(np.float64) - inter)
        out = pd.DataFrame({"id_a": m["id_a"].to_numpy(np.int64),
                            "id_b": m["id_b"].to_numpy(np.int64), "jaccard": j})
        return out[out["jaccard"] >= threshold].reset_index(drop=True)

    return partitioned_group_map(stage1, ["k"], reduce_b, sort_by=["k"],
                                 num_partitions=num_partitions)


def _partial_pair_counts(id_column, max_doc_freq=None, emit_sizes=False):
    """Per-partition kernel: rows sorted by shingle hash -> partial
    (id_a, id_b) co-occurrence counts over each shingle's doc bucket.
    With a df-cut, buckets larger than ``max_doc_freq`` are dropped whole,
    and per-doc surviving-shingle counts are emitted as (doc, -1, n)
    sentinel rows (partial sizes, reduced downstream)."""

    def fn(part: pd.DataFrame) -> pd.DataFrame:
        hs = part["h"].to_numpy()
        ids = part[id_column].to_numpy()
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        bounds = np.append(starts, len(hs))
        seg_len = np.diff(bounds)
        pa_, pb_ = [], []
        if max_doc_freq is not None:
            ok = seg_len <= max_doc_freq
        else:
            ok = np.ones(len(starts), dtype=bool)
        for gi in np.flatnonzero(ok & (seg_len >= 2)):
            lo, hi = bounds[gi], bounds[gi + 1]
            bucket = np.sort(ids[lo:hi])
            iu = np.triu_indices(len(bucket), k=1)
            pa_.append(bucket[iu[0]])
            pb_.append(bucket[iu[1]])
        frames = []
        if pa_:
            df = pd.DataFrame({"id_a": np.concatenate(pa_), "id_b": np.concatenate(pb_)})
            cnt = df.groupby(["id_a", "id_b"], as_index=False).size()
            frames.append(pd.DataFrame({"id_a": cnt["id_a"].astype(np.int64),
                                        "id_b": cnt["id_b"].astype(np.int64),
                                        "c": cnt["size"].astype(np.int64)}))
        if emit_sizes:
            surv = np.repeat(ok, seg_len)
            sids = ids[surv]
            if len(sids):
                sz = pd.Series(sids).groupby(pd.Series(sids)).size()
                frames.append(pd.DataFrame({
                    "id_a": sz.index.to_numpy(np.int64),
                    "id_b": np.int64(-1),
                    "c": sz.to_numpy(np.int64),
                }))
        if not frames:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    return fn


def _levenshtein_many(pairs_a: list[str], pairs_b: list[str]) -> np.ndarray:
    """Edit distances for a list of string pairs — classic DP with the inner
    dimension vectorized in numpy (one O(len_b) array op per character of
    a, never a Python cell loop)."""
    out = np.empty(len(pairs_a), dtype=np.int64)
    for i, (a, b) in enumerate(zip(pairs_a, pairs_b)):
        if a == b:
            out[i] = 0
            continue
        if len(a) < len(b):
            a, b = b, a
        bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        n = len(bb)
        idx = np.arange(n + 1, dtype=np.int64)
        prev = idx.copy()
        cand = np.empty(n + 1, dtype=np.int64)
        for ca in np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32):
            # pre-insertion candidates: substitution/match and deletion
            cand[0] = prev[0] + 1
            np.minimum(prev[:-1] + (bb != ca), prev[1:] + 1, out=cand[1:])
            # the left-to-right insertion chain cur[j] = min(cur[j-1]+1,
            # cand[j]) has the closed form min_{k<=j}(cand[k] + (j-k))
            # = minimum.accumulate(cand - idx) + idx — no scalar loop
            prev = np.minimum.accumulate(cand - idx) + idx
        out[i] = int(prev[-1])
    return out


def editdist_verify(
    pairs: rd.Dataset,
    docs: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_norm: float = 0.4,
    num_partitions: int = DEDUP_PARTITIONS,
) -> rd.Dataset:
    """Verify candidate pairs by NORMALIZED edit distance:
    ``dist / greatest(len_a, len_b) <= max_norm``.

    Texts reach the (small) candidate-pair set through two co-partitioned
    ``hash_join`` exchanges (pairs ⋈ docs on id_a, then on id_b) — the
    document table is never collected, and the O(n·m) DP runs only on
    surviving candidates (numpy row-vectorized).  Output:
    ``(id_a, id_b, dist, norm_dist)`` — ``norm_dist`` is a ratio of exact
    integers, safe to compare unrounded (NOTES_r1 tie taxonomy).
    """
    from pytimetk_ray.ops.joins import hash_join

    def rename(to: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({to: batch[id_column].to_numpy(),
                                 f"text_{to[3:]}": batch[text_column].to_numpy()})
        return fn

    da = docs.map_batches(rename("id_a"), batch_format="pandas")
    db = docs.map_batches(rename("id_b"), batch_format="pandas")
    j = hash_join(pairs.select_columns(["id_a", "id_b"]), da,
                  left_on="id_a", num_partitions=num_partitions)
    j = hash_join(j, db, left_on="id_b", num_partitions=num_partitions)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ta = batch["text_a"].tolist()
        tb = batch["text_b"].tolist()
        dist = _levenshtein_many(ta, tb)
        ln = np.maximum(batch["text_a"].str.len().to_numpy(np.int64),
                        batch["text_b"].str.len().to_numpy(np.int64))
        ln = np.maximum(ln, 1)
        norm = dist / ln
        keep = norm <= max_norm
        return pd.DataFrame({
            "id_a": batch["id_a"].to_numpy()[keep],
            "id_b": batch["id_b"].to_numpy()[keep],
            "dist": dist[keep],
            "norm_dist": norm[keep],
        })

    return j.map_batches(score, batch_format="pandas")
