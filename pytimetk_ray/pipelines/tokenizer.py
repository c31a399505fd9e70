"""Distributed BPE tokenizer training + encoding over a documents table.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") trains on a WORD FREQUENCY TABLE, not the
token stream — so the distributed part is exactly the engine's existing
partial-agg word count (``corpus.vocab_topk`` shape), the merge loop runs
on the bounded table driver-side, and encoding is a broadcast-merges
actor-pool pass with a per-actor word->length memo (Zipf makes the memo hit
rate extreme: a few thousand distinct words cover almost every token).

Scale story
-----------
- Train: ONE distributed pass produces the top-``max_words`` word table
  (per-batch distinct-word partials -> keyed sum -> distributed top-N);
  the driver sees ``max_words`` rows regardless of corpus size.  The merge
  loop is O(max_words * merges) Python over that bounded table with an
  incremental pair-count index (only words containing the merged pair are
  recounted).
- Encode: merges dict broadcast once via ``ray.put``; per-actor memo means
  each DISTINCT word is encoded once per actor, the token stream itself is
  never re-materialized.

Determinism: merge ties broken by lexicographically-greatest pair at equal
count; training from the same corpus is bit-reproducible (no RNG).

No SQL oracle (iterative merges are not SQL-expressible); correctness is
pinned by tests against an independent naive reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from pytimetk_ray.kernels import text as tx
from pytimetk_ray.pipelines.corpus import (CORPUS_PARTITIONS, _head_by_count,
                                           _partial_counts, token_totals)
from pytimetk_ray.exec import partitioned_group_map

_EOW = "</w>"


def word_table(ds: rd.Dataset, *, text_column: str = "text",
               max_words: int = 10000,
               num_partitions: int = CORPUS_PARTITIONS) -> pd.DataFrame:
    """Top-``max_words`` (word, cnt) training table, collected driver-side
    (bounded by max_words — the only thing BPE training ever needs)."""
    totals = token_totals(ds, text_column=text_column,
                          num_partitions=num_partitions)
    top = partitioned_group_map(
        partitioned_group_map(
            totals, ["token"], lambda p: _head_by_count(p, max_words),
            sort_by=None, num_partitions=num_partitions),
        [], lambda p: _head_by_count(p, max_words),
        sort_by=None, num_partitions=1)
    return top.to_pandas()


def bpe_train(ds: rd.Dataset, *, text_column: str = "text",
              num_merges: int = 100, max_words: int = 10000,
              num_partitions: int = CORPUS_PARTITIONS,
              ) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus word table.

    Words are the shared ``_WORD_RE`` lowercase tokens, spelled as
    character symbols plus a terminal ``</w>`` marker.  Each step merges
    the most frequent adjacent symbol pair (ties -> lexicographically
    greatest pair); pair counts weight by word frequency and count ALL
    adjacent occurrences within a word.
    """
    tbl = word_table(ds, text_column=text_column, max_words=max_words,
                     num_partitions=num_partitions)
    syms: list[tuple[str, ...]] = [tuple(w) + (_EOW,) for w in tbl["token"]]
    cnts = tbl["cnt"].to_numpy(np.int64)

    def pairs_of(s: tuple[str, ...]):
        return zip(s, s[1:])

    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, s in enumerate(syms):
        c = int(cnts[wi])
        for p in pairs_of(s):
            pair_count[p] = pair_count.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_count:
            break
        best = max(pair_count.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] <= 0:
            break
        pair = best[0]
        merges.append(pair)
        affected = list(pair_words.get(pair, ()))
        for wi in affected:
            old = syms[wi]
            c = int(cnts[wi])
            for p in pairs_of(old):
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    pair_count.pop(p, None)
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop(p, None)
            new = _merge_all(old, pair)
            syms[wi] = new
            for p in pairs_of(new):
                pair_count[p] = pair_count.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def _merge_all(s: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge every left-to-right adjacent occurrence of ``pair`` in one pass."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if i + 1 < n and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return tuple(out)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Encode one word by applying merges in rank order (lowest-rank
    adjacent pair first, all its occurrences at once) — the standard BPE
    inference procedure."""
    s: tuple[str, ...] = tuple(word) + (_EOW,)
    while len(s) > 1:
        best_rank, best_pair = None, None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        s = _merge_all(s, best_pair)
    return s


def bpe_token_counts(ds: rd.Dataset, merges: list[tuple[str, str]], *,
                     id_column: str = "doc_id", text_column: str = "text",
                     concurrency: int = 4) -> rd.Dataset:
    """Per-document BPE token counts under a trained merge list.

    Merges ride a single ``ray.put`` broadcast; each actor memoizes
    word -> encoded length, so distinct words are encoded once per actor.
    Output: (id, n_words, n_tokens); docs with no words are dropped.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    ranks_ref = ray.put(ranks)

    class Encoder:
        def __init__(self, ref):
            self.ranks = ref if isinstance(ref, dict) else ray.get(ref)
            self.memo: dict[str, int] = {}

        def _wlen(self, w: str) -> int:
            n = self.memo.get(w)
            if n is None:
                n = len(encode_word(w, self.ranks))
                self.memo[w] = n
            return n

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, nw, nt = [], [], []
            for i, t in zip(batch[id_column], batch[text_column]):
                words = tx._WORD_RE.findall((t or "").lower())
                if not words:
                    continue
                ids.append(i)
                nw.append(len(words))
                nt.append(sum(self._wlen(w) for w in words))
            return pd.DataFrame({
                id_column: np.array(ids, dtype=np.int64),
                "n_words": np.array(nw, dtype=np.int64),
                "n_tokens": np.array(nt, dtype=np.int64)})

    return ds.map_batches(Encoder, fn_constructor_kwargs=dict(ref=ranks_ref),
                          batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)
