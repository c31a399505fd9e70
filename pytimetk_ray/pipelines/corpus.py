"""Corpus-level training-data operations over a documents table.

Beyond-reference components for LLM-scale data prep (the reference has no
corpus operators at all — these are first-class engine features):

- ``vocab_topk``: distributed token frequency with PARTIAL per-batch
  aggregation before the keyed exchange (the combiner pattern: the shuffle
  carries distinct (token, count) rows per batch, never token instances).
- ``hash_split``: deterministic train/val/test assignment by md5 of the id —
  reproducible across engines (DuckDB ``md5_number_lower`` parity), no RNG
  state, stable under re-runs and resume.
- ``topk_per_group``: per-group top-k with per-batch partial top-k pruning
  ahead of the shuffle (each batch forwards at most groups*k candidate rows).
- ``pack_sequences``: greedy token-budget sequence packing (the LLM context-
  window fill) — deterministic shard = id % S, greedy first-fit in id order
  within the shard; shards are independent => embarrassingly parallel.
- ``unigram_logprob``: two-pass LM quality score — distributed vocabulary
  counts, top-V table broadcast via ``ray.put`` (read once per actor), then
  a stateless scoring pass.  The broadcast side is bounded by V, never by
  corpus size.

All are oracle-checkable in DuckDB (see __ray_entry__.oracle_sql): hashing
uses md5_number_lower parity, packing is a per-shard recursive recurrence,
token extraction shares the same regex surface as the SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.kernels import text as tx

CORPUS_PARTITIONS = 32


def _word_counts(texts) -> pd.Series:
    toks: list[str] = []
    for t in texts:
        toks.extend(tx._WORD_RE.findall((t or "").lower()))
    if not toks:
        return pd.Series(dtype=np.int64)
    return pd.Series(toks).value_counts(sort=False)


def _partial_counts(text_column: str):
    """Per-batch combiner: one (token, cnt) row per DISTINCT token — the
    shared pre-aggregation for vocab_topk / token_totals / unigram_logprob
    (ONE definition so their counts can never disagree)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = _word_counts(batch[text_column].tolist())
        return pd.DataFrame({"token": vc.index.astype(object),
                             "cnt": vc.to_numpy(np.int64)})

    return partial


def _head_by_count(part: pd.DataFrame, n: int) -> pd.DataFrame:
    """Shared top-N pruning order: (cnt desc, token asc), stable."""
    return part.sort_values(["cnt", "token"], ascending=[False, True],
                            kind="mergesort").head(n).reset_index(drop=True)


def vocab_topk(ds: rd.Dataset, *, text_column: str = "text", top_n: int = 50,
               num_partitions: int = CORPUS_PARTITIONS) -> rd.Dataset:
    """Top-N corpus tokens by frequency, ties broken by token ascending.

    Per-batch partial counts (one (token, cnt) row per DISTINCT token per
    batch) -> keyed sum per token -> per-partition local top-N -> one tiny
    final reduce over <= P*N rows.  The all-to-all carries the distinct-token
    profile of each batch, not the token stream."""

    def local_topn(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("token", as_index=False, sort=False)["cnt"].sum()
        return _head_by_count(g, top_n)

    partials = ds.map_batches(_partial_counts(text_column),
                              batch_format="pandas")
    per_part = partitioned_group_map(partials, ["token"], local_topn,
                                     sort_by=["token"],
                                     num_partitions=num_partitions)
    return partitioned_group_map(per_part, [],
                                 lambda part: _head_by_count(part, top_n),
                                 sort_by=None, num_partitions=1)


def token_totals(ds: rd.Dataset, *, text_column: str = "text",
                 num_partitions: int = CORPUS_PARTITIONS) -> rd.Dataset:
    """(token, cnt) totals over the corpus (partial-agg combine shape)."""

    def reduce_sum(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("token", as_index=False, sort=False)["cnt"].sum()

    return partitioned_group_map(
        ds.map_batches(_partial_counts(text_column), batch_format="pandas"),
        ["token"], reduce_sum, sort_by=["token"],
        num_partitions=num_partitions)


def hash_split(ds: rd.Dataset, *, id_column: str = "doc_id",
               train_pct: int = 90, val_pct: int = 5) -> rd.Dataset:
    """Deterministic split assignment: bucket = md5(id_str) % 100;
    train < train_pct <= val < train_pct+val_pct <= test.

    Stateless ``map_batches`` — no RNG, no shuffle; the SAME doc always
    lands in the same split on any cluster size or resume (DuckDB
    ``md5_number_lower(CAST(id AS VARCHAR)) % 100`` parity)."""
    hi_val = train_pct + val_pct

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy()
        bucket = np.fromiter(
            (tx.md5_u64(str(int(i))) % 100 for i in ids),
            dtype=np.int64, count=len(ids))
        split = np.where(bucket < train_pct, "train",
                         np.where(bucket < hi_val, "val", "test"))
        return pd.DataFrame({id_column: ids, "bucket": bucket,
                             "split": split.astype(object)})

    return ds.map_batches(fn, batch_format="pandas")


def hash_sample(ds: rd.Dataset, *, id_column: str = "doc_id",
                rate_ppm: int = 250_000, salt: str = "") -> rd.Dataset:
    """Deterministic Bernoulli sample: keep iff md5(salt||id) % 1e6 < rate.

    The reproducible counterpart of ``Dataset.random_sample`` for corpus
    work — the SAME rows are kept on any cluster size, resume, or engine
    (DuckDB ``md5_number_lower`` parity), and different ``salt`` values
    give independent samples.  Stateless projection, no shuffle, no RNG."""
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError("rate_ppm must be within [0, 1e6]")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy()
        keep = np.fromiter(
            (tx.md5_u64(salt + str(int(i))) % 1_000_000 < rate_ppm
             for i in ids),
            dtype=bool, count=len(ids))
        return batch[keep]

    return ds.map_batches(fn, batch_format="pandas")


def sample_mixture(ds: rd.Dataset, *, group_column: str = "source",
                   rates_ppm: dict[str, int] | None = None,
                   default_ppm: int = 0, id_column: str = "doc_id",
                   salt: str = "") -> rd.Dataset:
    """Deterministic DATA-MIXTURE sampling: per-group Bernoulli keep rates
    (the "20% web, 100% books, 5% logs" recipe every pretraining mixture
    needs), applied as one stateless projection — no shuffle, no RNG, the
    SAME rows kept on any cluster size or resume.

    keep iff ``md5(salt || id) % 1e6 < rates_ppm[group]`` (groups absent
    from the map use ``default_ppm``).  The id hash is group-independent,
    so changing one group's rate never reshuffles another group's sample,
    and raising a rate strictly grows the kept set (monotone ramp-ups).
    DuckDB ``md5_number_lower`` parity keeps it oracle-checkable."""
    rates = {k: int(v) for k, v in (rates_ppm or {}).items()}
    for v in list(rates.values()) + [default_ppm]:
        if not 0 <= v <= 1_000_000:
            raise ValueError("rates must be within [0, 1e6] ppm")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy()
        thr = batch[group_column].map(rates).fillna(default_ppm)\
            .to_numpy(np.int64)
        h = np.fromiter(
            (tx.md5_u64(salt + str(int(i))) % 1_000_000 for i in ids),
            dtype=np.int64, count=len(ids))
        return batch[h < thr]

    return ds.map_batches(fn, batch_format="pandas")


def sample_stratified(ds: rd.Dataset, *, group_column: str,
                      id_column: str, frac_ppm: int = 200_000,
                      num_partitions: int = CORPUS_PARTITIONS) -> rd.Dataset:
    """Exact-fraction per-group deterministic sample (stratified sampling).

    Keeps exactly ``ceil(frac * n_g)`` rows of every group — the rows whose
    ``md5(id)`` rank inside the group is smallest (ties broken by id).
    Unlike ``hash_sample``'s Bernoulli keep, strata proportions are EXACT:
    no group is over/under-sampled by chance, tiny groups are never emptied,
    and the selection is reproducible on any cluster size or resume (DuckDB
    ``md5_number_lower`` parity, no RNG state).

    ``frac_ppm`` is parts-per-million; k is the INTEGER ceil
    ``(n*frac_ppm + 999_999) // 1_000_000`` so both engine and SQL oracle
    compute it in exact integer arithmetic.

    Shape: whole groups co-located via ``exec.partitioned_group_map`` (the
    engine's standard per-group primitive), rank election vectorized over
    all groups in the partition.  For groups too hot to co-locate, the
    md5 rank is uniform, so the same semantics distribute as a two-pass
    threshold selection (per-group k-th-smallest rank via a quantile
    sketch, then a stateless filter) — not needed at this corpus's key
    cardinality.  Payload-heavy rows would run the narrow (group, id, h)
    election first and join back by id (see ``pipelines/linedup``)."""
    if not 0 <= frac_ppm <= 1_000_000:
        raise ValueError("frac_ppm must be within [0, 1e6]")

    def elect(part: pd.DataFrame) -> pd.DataFrame:
        from pytimetk_ray.exec import group_starts, row_number_in_group
        ids = part[id_column].to_numpy()
        h = np.fromiter((tx.md5_u64(str(int(i))) for i in ids),
                        dtype=np.uint64, count=len(ids))
        codes, _ = pd.factorize(part[group_column], sort=False)
        order = np.lexsort((ids, h, codes))
        codes_sorted = codes[order]
        rn = row_number_in_group(codes_sorted)
        starts = group_starts(codes_sorted)
        sizes = np.diff(np.append(starts, len(codes_sorted)))
        k = (sizes * np.int64(frac_ppm) + 999_999) // 1_000_000
        keep_sorted = rn < np.repeat(k, sizes)
        keep = np.zeros(len(part), dtype=bool)
        keep[order] = keep_sorted
        return part.loc[keep]

    return partitioned_group_map(ds, [group_column], elect,
                                 sort_by=None,
                                 num_partitions=num_partitions)


def topk_per_group(ds: rd.Dataset, *, group_column: str = "lang",
                   score_column: str = "n_chars", id_column: str = "doc_id",
                   k: int = 5,
                   num_partitions: int = CORPUS_PARTITIONS) -> rd.Dataset:
    """Top-k rows per group by (score desc, id asc).

    Per-BATCH partial top-k prunes before the shuffle: each batch forwards
    at most (groups-in-batch * k) candidate rows, so the exchange is bounded
    by k * |groups| * num_blocks, not by corpus size."""
    cols = [group_column, id_column, score_column]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[cols].sort_values(
            [group_column, score_column, id_column],
            ascending=[True, False, True], kind="mergesort")
        return b.groupby(group_column, sort=False).head(k)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            [group_column, score_column, id_column],
            ascending=[True, False, True], kind="mergesort")
        return part.groupby(group_column, sort=False).head(k).reset_index(drop=True)

    return partitioned_group_map(ds.map_batches(partial, batch_format="pandas"),
                                 [group_column], final, sort_by=None,
                                 num_partitions=num_partitions)


def pack_sequences(ds: rd.Dataset, *, id_column: str = "doc_id",
                   text_column: str = "text", budget: int = 1024,
                   num_shards: int = 8,
                   num_partitions: int = CORPUS_PARTITIONS) -> rd.Dataset:
    """Greedy first-fit sequence packing into token-budget bins.

    shard = id % num_shards (deterministic, SQL-expressible); docs are
    packed in ascending id order within their shard: a doc joins the current
    bin iff fill + n_tokens <= budget, else opens the next bin (an oversize
    doc occupies its own bin).  Shards are independent — the packing
    parallelism knob at 100 TB is num_shards, and the output is reproducible
    on any cluster size.  Output: (doc_id, shard, bin_id, n_tokens)."""

    def tokenize(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy(np.int64)
        return pd.DataFrame({
            id_column: ids,
            "shard": ids % num_shards,
            "n_tokens": tx.token_count(batch[text_column].tolist()),
        })

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        # whole shards per task (partition key = shard); greedy scan is
        # inherently sequential per shard — O(rows) with numpy array access
        out_bin = np.empty(len(part), dtype=np.int64)
        shards = part["shard"].to_numpy()
        ns = part["n_tokens"].to_numpy()
        starts = np.flatnonzero(np.r_[True, shards[1:] != shards[:-1]])
        bounds = np.append(starts, len(part))
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            bin_id, fill = 0, 0
            first = True
            for i in range(lo, hi):
                n = ns[i]
                if first:
                    fill = n
                    first = False
                elif fill + n <= budget:
                    fill += n
                else:
                    bin_id += 1
                    fill = n
                out_bin[i] = bin_id
        part = part.copy()
        part["bin_id"] = out_bin
        return part

    return partitioned_group_map(
        ds.map_batches(tokenize, batch_format="pandas"),
        ["shard"], pack, sort_by=["shard", id_column],
        num_partitions=num_partitions,
    )


def ngram_repetition(ds: rd.Dataset, *, id_column: str = "doc_id",
                     text_column: str = "text",
                     shingle_k: int = 3) -> rd.Dataset:
    """Gopher-style intra-document repetition signal: the fraction of word
    ``shingle_k``-grams that are duplicates, ``1 - distinct/total`` per doc.
    Stateless ``map_batches`` projection — no shuffle; docs with no words
    are skipped (mirrors the SQL shingle expansion)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, tot, dup = [], [], []
        for i, t in zip(batch[id_column], batch[text_column]):
            sh = tx.shingle_strings(t, shingle_k)
            if not sh:
                continue
            ids.append(i)
            tot.append(len(sh))
            dup.append(1.0 - len(set(sh)) / len(sh))
        return pd.DataFrame({id_column: np.array(ids, dtype=np.int64),
                             "n_ngrams": np.array(tot, dtype=np.int64),
                             "dup_ratio": np.array(dup, dtype=np.float64)})

    return ds.map_batches(fn, batch_format="pandas")


def cross_split_contamination(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 8,
    train_pct: int = 90,
    test_lo: int = 95,
    num_partitions: int = CORPUS_PARTITIONS,
) -> rd.Dataset:
    """Decontamination primitive: for every TEST-split document, count how
    many of its word ``shingle_k``-grams also occur anywhere in the TRAIN
    split.  Output: (doc_id, n_shingles, n_shared, contaminated).

    Splits come from the deterministic md5 bucket (``hash_split``
    semantics): train = bucket < train_pct, test = bucket >= test_lo.
    Shape: both sides explode to distinct (shingle_hash, ...) rows ->
    hash-partition by shingle -> per-bucket containment check emits PARTIAL
    per-doc shared counts -> keyed reduce by doc.  The exchange carries
    shingle hashes, never text; per-doc totals ride along as sentinel rows
    (one pass, no second pipeline execution)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        hs, docs, kinds = [], [], []
        for i, t in zip(batch[id_column], batch[text_column]):
            b = tx.md5_u64(str(int(i))) % 100
            if b >= train_pct and b < test_lo:
                continue  # val split: not part of the containment check
            is_test = b >= test_lo
            sh = tx.shingle_strings(t, shingle_k)
            if not sh:
                continue
            u = np.unique(tx.md5_u64_many(sh))
            hs.append(u)
            docs.append(np.full(len(u), int(i) if is_test else -1,
                                dtype=np.int64))
            kinds.append(np.full(len(u), np.int8(1 if is_test else 0)))
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64),
                                 id_column: pd.Series([], dtype=np.int64),
                                 "k": pd.Series([], dtype=np.int8)})
        return pd.DataFrame({
            "h": np.concatenate(hs).astype(np.int64),
            id_column: np.concatenate(docs),
            "k": np.concatenate(kinds),
        })

    def bucket_check(part: pd.DataFrame) -> pd.DataFrame:
        k = part["k"].to_numpy()
        hs = part["h"].to_numpy()
        ids = part[id_column].to_numpy()
        train_h = np.unique(hs[k == 0])
        test = k == 1
        th, tid = hs[test], ids[test]
        shared = np.isin(th, train_h, assume_unique=False)
        # partial (doc, n_shingles_here, n_shared_here) rows
        df = pd.DataFrame({id_column: tid, "tot": np.int64(1),
                           "shr": shared.astype(np.int64)})
        g = df.groupby(id_column, as_index=False).sum()
        return g

    def reduce_doc(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(id_column, as_index=False)[["tot", "shr"]].sum()
        return pd.DataFrame({
            id_column: g[id_column].to_numpy(np.int64),
            "n_shingles": g["tot"].to_numpy(np.int64),
            "n_shared": g["shr"].to_numpy(np.int64),
            "contaminated": (g["shr"].to_numpy(np.int64) > 0),
        })

    partial = partitioned_group_map(
        ds.map_batches(explode, batch_format="pandas"), ["h"], bucket_check,
        sort_by=["h"], num_partitions=num_partitions,
    )
    return partitioned_group_map(partial, [id_column], reduce_doc,
                                 sort_by=[id_column],
                                 num_partitions=num_partitions)


def unigram_logprob(ds: rd.Dataset, *, id_column: str = "doc_id",
                    text_column: str = "text", vocab_size: int = 256,
                    num_partitions: int = CORPUS_PARTITIONS,
                    concurrency: int = 4) -> rd.Dataset:
    """Per-doc unigram LM quality score: mean ln p(token) over the doc's
    tokens, p = cnt/total for the top-V vocabulary, 1/total for OOV.

    Two passes: (1) distributed token totals (partial-agg combine), top-V +
    grand total collected (V rows — BOUNDED, independent of corpus size) and
    broadcast via ``ray.put``; (2) stateless actor-pool scoring pass reading
    the broadcast once per actor.  Docs with no tokens are dropped (mirrors
    the SQL token expansion).  Output: (doc_id, n_tokens, logprob)."""
    totals = token_totals(ds, text_column=text_column,
                          num_partitions=num_partitions).materialize()
    total_tokens = int(totals.sum("cnt"))

    # top-V selected DISTRIBUTIVELY (per-partition top-V -> one tiny final
    # reduce) — the driver only ever sees V rows, never the full vocabulary
    top = (partitioned_group_map(
        partitioned_group_map(
            totals, ["token"], lambda p: _head_by_count(p, vocab_size),
            sort_by=None, num_partitions=num_partitions),
        [], lambda p: _head_by_count(p, vocab_size),
        sort_by=None, num_partitions=1,
    ).to_pandas())
    logp = {t: float(np.log(c / total_tokens))
            for t, c in zip(top["token"], top["cnt"])}
    oov = float(np.log(1.0 / total_tokens))
    table_ref = ray.put((logp, oov))

    class Scorer:
        def __init__(self, ref):
            self.logp, self.oov = (ref if isinstance(ref, tuple)
                                   else ray.get(ref))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, nt, lp = [], [], []
            for i, t in zip(batch[id_column], batch[text_column]):
                words = tx._WORD_RE.findall((t or "").lower())
                if not words:
                    continue
                vals = np.fromiter((self.logp.get(w, self.oov) for w in words),
                                   dtype=np.float64, count=len(words))
                ids.append(i)
                nt.append(len(words))
                lp.append(vals.mean())
            return pd.DataFrame({id_column: np.array(ids, dtype=np.int64),
                                 "n_tokens": np.array(nt, dtype=np.int64),
                                 "logprob": np.array(lp, dtype=np.float64)})

    return ds.map_batches(Scorer, fn_constructor_kwargs=dict(ref=table_ref),
                          batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)


def ccnet_buckets(ds: rd.Dataset, *, id_column: str = "doc_id",
                  text_column: str = "text", lang_column: str = "lang",
                  vocab_size: int = 256,
                  num_partitions: int = CORPUS_PARTITIONS,
                  concurrency: int = 4) -> rd.Dataset:
    """CCNet-style per-language quality buckets (Wenzek et al., LREC 2020
    §4.3: split each language's documents into head/middle/tail thirds by
    LM score; only head+middle typically train).

    Shape: ``unigram_logprob`` scores (two bounded passes) ⋈ the doc's
    language via one co-partitioning ``hash_join`` on doc_id, then ONE
    keyed partition per language ranks docs and assigns
    ``bucket = 3 * rank0 // n_lang`` — exact integer arithmetic, so the
    oracle is a plain ROW_NUMBER window.  Ranking key is
    (ROUND(logprob, 6) DESC, doc_id ASC): ln-based scores differ from
    DuckDB's libm in the last ulp (NOTES_r3 — round BEFORE any selection
    or ranking), and the doc_id tiebreak makes the rank total-order
    deterministic.  Docs with no tokens are dropped (no score).

    Output: (doc_id, lang, n_tokens, logprob[rounded 6], bucket,
    bucket_label) — head is the MOST probable third."""
    from pytimetk_ray.ops.joins import hash_join

    scores = unigram_logprob(ds, id_column=id_column,
                             text_column=text_column,
                             vocab_size=vocab_size,
                             num_partitions=num_partitions,
                             concurrency=concurrency)
    langs = ds.select_columns([id_column, lang_column])
    joined = hash_join(scores, langs, left_on=id_column,
                       num_partitions=num_partitions)

    labels = np.array(["head", "middle", "tail"], dtype=object)

    def rank_kernel(part: pd.DataFrame) -> pd.DataFrame:
        lp = np.round(part["logprob"].to_numpy(np.float64), 6)
        codes = pd.factorize(part[lang_column], sort=False)[0]
        ids = part[id_column].to_numpy()
        # within language: logprob desc, doc_id asc
        order = np.lexsort((ids, -lp, codes))
        from pytimetk_ray.exec import row_number_in_group
        rank0 = row_number_in_group(codes[order])
        sizes = np.bincount(codes)[codes[order]]
        bucket = (3 * rank0) // sizes
        out = part.iloc[order].reset_index(drop=True)
        out["logprob"] = lp[order]
        out["bucket"] = bucket.astype(np.int64)
        out["bucket_label"] = labels[bucket]
        return out

    return partitioned_group_map(joined, [lang_column], rank_kernel,
                                 sort_by=[lang_column],
                                 num_partitions=num_partitions)


def bigram_logprob(ds: rd.Dataset, *, id_column: str = "doc_id",
                   text_column: str = "text", vocab_size: int = 64,
                   num_partitions: int = CORPUS_PARTITIONS,
                   concurrency: int = 2) -> rd.Dataset:
    """CCNet-style bigram LM quality score (Wenzek et al. 2020 use a KenLM
    5-gram; the distributed SHAPE is the same): per-doc mean
    ln p(w2|w1) with add-one smoothing over the top-V mapped vocabulary,
    p(w2|w1) = (c(w1,w2)+1) / (c1(w1)+V+1), OOV tokens mapped to '<unk>'.

    Scale story — the bigram table is NEVER broadcast (it grows ~V^2 /
    corpus-bounded, unlike the V-row unigram table):
      1. top-V vocab: distributed partial counts -> V rows broadcast.
      2. ONE tokenize pass emits per-doc mapped-bigram counts
         (doc, w1, w2, k) — each doc is a single row, so the per-batch
         partial is already the exact per-doc count.
      3. global counts bc(w1,w2) reduce FROM those partials (no second
         tokenize); c1(w1) = sum of bc over w2 — <= V+1 rows, broadcast.
      4. doc partials co-partition-JOIN bc on (w1,w2) (ops/joins.hash_join),
         then a per-doc keyed reduce: logprob = sum(k*ln p)/sum(k).
    Docs with < 2 tokens have no bigrams and are dropped (mirrors the SQL
    expansion).  Output (doc_id, n_bigrams, logprob) — logprob rounded by
    the caller; ln sums are order-dependent at the last-ulp level only.
    """
    from pytimetk_ray.ops.joins import hash_join

    vocab = set(vocab_topk(ds, text_column=text_column, top_n=vocab_size,
                           num_partitions=num_partitions)
                .to_pandas()["token"])
    vocab_ref = ray.put(vocab)

    class BigramPartial:
        def __init__(self, ref):
            self.vocab = ref if isinstance(ref, set) else ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, w1s, w2s, ks = [], [], [], []
            for i, t in zip(batch[id_column], batch[text_column]):
                words = tx._WORD_RE.findall((t or "").lower())
                if len(words) < 2:
                    continue
                mapped = [w if w in self.vocab else "<unk>" for w in words]
                cnt: dict[tuple[str, str], int] = {}
                for a, b in zip(mapped, mapped[1:]):
                    cnt[(a, b)] = cnt.get((a, b), 0) + 1
                for (a, b), k in cnt.items():
                    ids.append(i); w1s.append(a); w2s.append(b); ks.append(k)
            return pd.DataFrame({
                id_column: np.array(ids, dtype=np.int64),
                "w1": pd.Series(w1s, dtype=object),
                "w2": pd.Series(w2s, dtype=object),
                "k": np.array(ks, dtype=np.int64)})

    dk = ds.map_batches(BigramPartial, fn_constructor_kwargs=dict(ref=vocab_ref),
                        batch_format="pandas", batch_size=4096,
                        concurrency=concurrency).materialize()

    def reduce_bc(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["w1", "w2"], as_index=False, sort=False)["k"].sum()
        return g.rename(columns={"k": "c12"})

    bc = partitioned_group_map(
        dk.select_columns(["w1", "w2", "k"]), ["w1", "w2"], reduce_bc,
        sort_by=["w1", "w2"], num_partitions=num_partitions).materialize()

    # c1(w1) = sum of c12 over w2: <= V+1 rows -> driver-side dict broadcast
    def reduce_c1(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby("w1", as_index=False, sort=False)["c12"].sum()
                .rename(columns={"c12": "c1"}))

    c1_pdf = partitioned_group_map(
        bc, ["w1"], reduce_c1, sort_by=["w1"],
        num_partitions=num_partitions).to_pandas()
    c1 = dict(zip(c1_pdf["w1"], c1_pdf["c1"].astype(np.int64)))
    c1_ref = ray.put(c1)
    denom_add = float(vocab_size + 1)

    joined = hash_join(dk, bc, left_on=["w1", "w2"],
                       num_partitions=num_partitions)

    class Term:
        def __init__(self, ref):
            c1 = ref if isinstance(ref, dict) else ray.get(ref)
            # pd.Series lookup table: .map() runs the w1 -> c1 gather in the
            # pandas hashtable at C speed (the per-row dict loop was the one
            # non-vectorized hot-path op the round-3 audit flagged)
            self.c1 = pd.Series(c1, dtype=np.float64)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            c1v = batch["w1"].map(self.c1).to_numpy(np.float64)
            p = (batch["c12"].to_numpy(np.float64) + 1.0) / (c1v + denom_add)
            k = batch["k"].to_numpy(np.float64)
            return pd.DataFrame({id_column: batch[id_column],
                                 "k": batch["k"],
                                 "term": k * np.log(p)})

    terms = joined.map_batches(Term, fn_constructor_kwargs=dict(ref=c1_ref),
                               batch_format="pandas", batch_size=None,
                               concurrency=concurrency)

    def reduce_doc(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(id_column, sort=False)
        n = g["k"].sum()
        s = g["term"].sum()
        return pd.DataFrame({id_column: n.index.to_numpy(),
                             "n_bigrams": n.to_numpy(np.int64),
                             "logprob": (s / n).to_numpy(np.float64)})

    return partitioned_group_map(terms, [id_column], reduce_doc,
                                 sort_by=[id_column],
                                 num_partitions=num_partitions)


# --- Bloom-filter decontamination (space-bounded broadcast variant) ---------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 increment
_BLOOM_MUL = np.uint64(0xBF58476D1CE4E5B9)   # splitmix64 mixer


def _bloom_positions(h: np.ndarray, j: int, block_bits_log: int) -> np.ndarray:
    """j-th derived bit position (within a block) for 64-bit shingle hashes.

    splitmix64-style mixing of (h ^ j*C) — vectorized uint64, deterministic
    across processes; the top ``block_bits_log`` bits index into the block."""
    with np.errstate(over="ignore"):
        x = (h ^ (np.uint64(j) * _BLOOM_MIX)) * _BLOOM_MUL
        x ^= x >> np.uint64(31)
        x *= _BLOOM_MUL
    return (x >> np.uint64(64 - block_bits_log)).astype(np.int64)


def _bloom_probe(bits: np.ndarray, h: np.ndarray, blocks: int,
                 block_bits_log: int, k_hashes: int) -> np.ndarray:
    """Membership test for an array of hashes against the packed filter."""
    base = (h % np.uint64(blocks)).astype(np.int64) << np.int64(block_bits_log)
    hit = np.ones(len(h), dtype=bool)
    for j in range(k_hashes):
        pos = base + _bloom_positions(h, j, block_bits_log)
        hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
    return hit


def bloom_contamination(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_k: int = 8,
    train_pct: int = 90,
    test_lo: int = 95,
    blocks: int = 64,
    block_bits_log: int = 21,
    k_hashes: int = 4,
    num_partitions: int = CORPUS_PARTITIONS,
) -> rd.Dataset:
    """``cross_split_contamination`` with a BLOCKED BLOOM FILTER instead of
    the shingle-keyed shuffle — the space-bounded scale path.

    The exact variant's exchange grows with the TRAIN shingle stream; here
    the train side is folded into a fixed ``blocks * 2^block_bits_log``-bit
    filter (default 64 * 2M bits = 16 MiB) that is broadcast ONCE
    (``ray.put``) and probed by a stateless pass over the test side — no
    per-test-shingle shuffle at all.  Build is distributed: each shingle's
    k bit positions live inside the block ``h % blocks`` (a blocked Bloom
    filter, cache-friendly and independently constructible), so one keyed
    exchange of (block_id, h) rows lets every task build ITS blocks and the
    driver collects exactly ``blocks`` fixed-size byte rows — 16 MiB total
    regardless of corpus size.

    False positives: with load f = k*n/m per block the per-probe FP rate is
    ~(1-e^-f)^k.  At the defaults (m = 2^27 bits, k = 4) a train side of
    ~10M distinct shingles gives FP ~ 1e-5 — size m so that
    (expected probes) * FP << 1 and the output is bit-equal to the exact
    operator (the oracle SQL is the SAME as ``decontaminate``'s; any
    deviation IS a detected false positive).  Output columns match
    ``cross_split_contamination``: (doc_id, n_shingles, n_shared,
    contaminated)."""
    if blocks & (blocks - 1):
        raise ValueError("blocks must be a power of two")
    block_bytes = (1 << block_bits_log) // 8

    def explode_train(batch: pd.DataFrame) -> pd.DataFrame:
        hs = []
        for i, t in zip(batch[id_column], batch[text_column]):
            if tx.md5_u64(str(int(i))) % 100 >= train_pct:
                continue
            sh = tx.shingle_strings(t, shingle_k)
            if sh:
                hs.append(np.unique(tx.md5_u64_many(sh)))
        h = (np.unique(np.concatenate(hs)) if hs
             else np.zeros(0, dtype=np.uint64))
        return pd.DataFrame({
            "block": (h % np.uint64(blocks)).astype(np.int64),
            "h": h.astype(np.int64),
        })

    def build_blocks(part: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_bits = [], []
        for blk, grp in part.groupby("block", sort=True):
            h = grp["h"].to_numpy().astype(np.uint64)
            bits = np.zeros(block_bytes, dtype=np.uint8)
            for j in range(k_hashes):
                pos = _bloom_positions(h, j, block_bits_log)
                np.bitwise_or.at(bits, pos >> 3,
                                 np.left_shift(np.uint8(1),
                                               (pos & 7).astype(np.uint8)))
            out_ids.append(int(blk))
            out_bits.append(bits.tobytes())
        return pd.DataFrame({"block": np.array(out_ids, dtype=np.int64),
                             "bits": pd.Series(out_bits, dtype=object)})

    built = partitioned_group_map(
        ds.map_batches(explode_train, batch_format="pandas"),
        ["block"], build_blocks, sort_by=["block"],
        num_partitions=min(num_partitions, blocks)).to_pandas()
    # assemble the packed filter: blocks * block_bytes, absent blocks zero
    packed = np.zeros(blocks * block_bytes, dtype=np.uint8)
    for blk, raw in zip(built["block"], built["bits"]):
        packed[blk * block_bytes:(blk + 1) * block_bytes] = np.frombuffer(
            raw, dtype=np.uint8)
    filt_ref = ray.put(packed)

    class Prober:
        def __init__(self, ref):
            self.bits = ref if isinstance(ref, np.ndarray) else ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, tot, shr = [], [], []
            for i, t in zip(batch[id_column], batch[text_column]):
                if not (test_lo <= tx.md5_u64(str(int(i))) % 100 < 100):
                    continue
                sh = tx.shingle_strings(t, shingle_k)
                if not sh:
                    continue
                u = np.unique(tx.md5_u64_many(sh))
                hit = _bloom_probe(self.bits, u, blocks, block_bits_log,
                                   k_hashes)
                ids.append(int(i))
                tot.append(len(u))
                shr.append(int(hit.sum()))
            return pd.DataFrame({
                id_column: np.array(ids, dtype=np.int64),
                "n_shingles": np.array(tot, dtype=np.int64),
                "n_shared": np.array(shr, dtype=np.int64),
                "contaminated": np.array(shr, dtype=np.int64) > 0,
            })

    half = max(1, int(ray.cluster_resources().get("CPU", 2)) // 2)
    return ds.map_batches(Prober, fn_constructor_kwargs=dict(ref=filt_ref),
                          batch_format="pandas",
                          concurrency=min(4, half))


# --- DSIR: data selection with importance resampling ------------------------


def _gram_buckets(text: str, buckets: int) -> np.ndarray:
    """Hashed n-gram feature buckets (unigrams + bigrams of the shared
    word regex, md5_number_lower parity) — the DSIR feature map."""
    words = tx._WORD_RE.findall((text or "").lower())
    grams = words + [a + " " + b for a, b in zip(words, words[1:])]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return (tx.md5_u64_many(grams) % np.uint64(buckets)).astype(np.int64)


def _bucket_counts(ds: rd.Dataset, *, text_column: str, buckets: int,
                   num_partitions: int) -> np.ndarray:
    """Corpus-total hashed-gram bucket counts: per-batch bincount partial
    (<= B rows per batch cross the wire) -> keyed sum -> B-length vector.
    The driver only ever holds B integers, independent of corpus size."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(buckets, dtype=np.int64)
        for t in batch[text_column]:
            b = _gram_buckets(t, buckets)
            if len(b):
                acc += np.bincount(b, minlength=buckets)
        nz = np.flatnonzero(acc)
        return pd.DataFrame({"b": nz.astype(np.int64), "cnt": acc[nz]})

    def reduce_sum(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("b", as_index=False, sort=False)["cnt"].sum()

    pdf = partitioned_group_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["b"], reduce_sum, sort_by=["b"],
        num_partitions=num_partitions).to_pandas()
    out = np.zeros(buckets, dtype=np.int64)
    if len(pdf):
        out[pdf["b"].to_numpy()] = pdf["cnt"].to_numpy(np.int64)
    return out


def dsir_logweight(ds: rd.Dataset, target: rd.Dataset, *,
                   id_column: str = "doc_id", text_column: str = "text",
                   buckets: int = 256,
                   num_partitions: int = CORPUS_PARTITIONS,
                   concurrency: int = 4) -> rd.Dataset:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how target-like its hashed n-gram profile is.

    Per bucket ``b``, with add-one smoothing over ``B`` buckets:
    ``lam[b] = ln((ct[b]+1)/(Tt+B)) - ln((cr[b]+1)/(Tr+B))`` where
    ``ct``/``cr`` are target/raw gram counts.  A document's log-weight is
    ``sum_b k[b] * lam[b]`` over its own gram-bucket counts ``k`` —
    documents whose features look like the target get high weights;
    resampling by these weights is the paper's selection step (pair with
    ``hash_sample``/``quality_quantile_filter`` for the cut).

    Scale: two bounded count passes (B-integer reduces), lam broadcast via
    ``ray.put`` (read once per actor), one stateless scoring pass.  Nothing
    driver-side grows with the corpus.  Docs with no grams are dropped
    (mirrors the SQL gram expansion).  Output: (id, n_grams, logweight) —
    caller rounds; the k*lam sums are order-dependent at the last ulp only
    (same contract as ``bigram_logprob``).
    """
    ct = _bucket_counts(target, text_column=text_column, buckets=buckets,
                        num_partitions=num_partitions)
    cr = _bucket_counts(ds, text_column=text_column, buckets=buckets,
                        num_partitions=num_partitions)
    lam = (np.log((ct + 1.0) / float(ct.sum() + buckets))
           - np.log((cr + 1.0) / float(cr.sum() + buckets)))
    lam_ref = ray.put(lam)

    class Scorer:
        def __init__(self, ref):
            self.lam = ref if isinstance(ref, np.ndarray) else ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, ng, lw = [], [], []
            for i, t in zip(batch[id_column], batch[text_column]):
                b = _gram_buckets(t, buckets)
                if not len(b):
                    continue
                k = np.bincount(b, minlength=buckets).astype(np.float64)
                ids.append(i)
                ng.append(len(b))
                lw.append(float(np.sum(k * self.lam)))
            return pd.DataFrame({
                id_column: np.array(ids, dtype=np.int64),
                "n_grams": np.array(ng, dtype=np.int64),
                "logweight": np.array(lw, dtype=np.float64)})

    return ds.map_batches(Scorer, fn_constructor_kwargs=dict(ref=lam_ref),
                          batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)


def dsir_resample(ds: rd.Dataset, target: rd.Dataset, *, k: int,
                  id_column: str = "doc_id", text_column: str = "text",
                  buckets: int = 256, temperature: float = 1.0,
                  num_partitions: int = CORPUS_PARTITIONS,
                  concurrency: int = 4) -> rd.Dataset:
    """DSIR selection step: Gumbel-top-k resampling without replacement
    (Kool et al. 2019) over the importance log-weights — the documents kept
    are a weighted sample proportional to ``exp(logweight/temperature)``.

    Determinism / oracle parity: the Gumbel noise is derived from the
    document id (``u = (md5_u64(id) % 2^53 + 0.5) / 2^53``,
    ``g = -ln(-ln(u))``) — no RNG state, bit-reproducible.  ``ln`` is NOT
    bit-identical across numpy and DuckDB libm at the last ulp (measured),
    so the key ``logweight_r / T + g`` is ROUNDED to 6 digits before the
    cut (the round-before-select pattern, same as the ANN scorers); rounded
    ties break by id, so the top-k membership is deterministic.

    Scale: per-partition local top-k -> one tiny final reduce (<= P*k rows
    at the driver-side boundary, never the corpus).
    """
    two53 = float(1 << 53)
    w = dsir_logweight(ds, target, id_column=id_column,
                       text_column=text_column, buckets=buckets,
                       num_partitions=num_partitions,
                       concurrency=concurrency)

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].astype(np.int64)
        h = tx.md5_u64_many([str(i) for i in ids])
        u = ((h % np.uint64(1 << 53)).astype(np.float64) + 0.5) / two53
        g = -np.log(-np.log(u))
        lw = np.round(batch["logweight"].to_numpy(np.float64), 6)
        batch["logweight"] = lw
        batch["key"] = np.round(lw / float(temperature) + g, 6)
        return batch

    keyed = w.map_batches(add_key, batch_format="pandas")

    def local_topk(part: pd.DataFrame) -> pd.DataFrame:
        return (part.sort_values(["key", id_column],
                                 ascending=[False, True], kind="mergesort")
                .head(k).reset_index(drop=True))

    per_part = partitioned_group_map(keyed, [id_column], local_topk,
                                     sort_by=None,
                                     num_partitions=num_partitions)
    return partitioned_group_map(per_part, [], local_topk, sort_by=None,
                                 num_partitions=1)


def vocab_topk_sketch(ds: rd.Dataset, *, text_column: str = "text",
                      top_n: int = 50, capacity: int = 4096) -> rd.Dataset:
    """Top-N corpus tokens via mergeable SpaceSaving summaries — the
    bounded-memory, SHUFFLE-FREE alternative to ``vocab_topk``.

    Shape: one stateless pass builds a ``capacity``-counter SpaceSaving
    per block (fed exact per-batch value_counts, so the Python loop runs
    over distinct tokens per batch); each block emits ONE pickled-summary
    row; a single final task merges the B summaries.  No token-keyed
    exchange at all — at 100 TB the exact path's (token, cnt) shuffle is
    replaced by B * capacity counters.

    Guarantees (Metwally et al. 2005 / Agarwal et al. 2012): reported
    ``cnt`` is an upper bound, ``cnt - err`` a lower bound; any token with
    true count > N/capacity is present.  With ``capacity`` >= the distinct
    vocabulary the result is EXACT (err = 0) and equals ``vocab_topk`` —
    the oracle twin runs in that regime.
    """
    import pickle

    from pytimetk_ray.kernels.sketch import SpaceSaving

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = _word_counts(batch[text_column].tolist())
        s = SpaceSaving(capacity).update_counts(vc.index.tolist(),
                                                vc.to_numpy())
        return pd.DataFrame({"blob": pd.Series([pickle.dumps(s)],
                                               dtype=object)})

    def final(part: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in part["blob"]:
            s = pickle.loads(b)
            acc = s if acc is None else acc.merge(s)
        rows = acc.topk(top_n) if acc is not None else []
        return pd.DataFrame({
            "token": pd.Series([r[0] for r in rows], dtype=object),
            "cnt": np.array([r[1] for r in rows], dtype=np.int64),
            "err": np.array([r[2] for r in rows], dtype=np.int64),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, [], final, sort_by=None,
                                 num_partitions=1)
