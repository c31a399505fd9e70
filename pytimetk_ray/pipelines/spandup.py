"""Exact duplicate-SPAN removal over a documents table.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) remove every *substring* of >= 50 tokens that appears more than
once in the corpus — their ExactSubstr dedup, built on a suffix array.
This module implements the same semantics on Ray Data with a
hash-partitioned election instead of a monolithic suffix array: a span is
approximated as the UNION of all duplicated fixed-width W-word windows
(every window of a duplicated >=W-word substring is itself duplicated, so
the union of duplicated windows IS the union of duplicated >=W-word
substrings — the window decomposition is exact for this policy, not an
approximation).

Differs from ``pipelines/linedup.dedup_lines``: lines are DISJOINT W-word
blocks and keep a first occurrence; spans are windows at EVERY offset and
remove ALL occurrences (the paper's default — dropping every copy of
duplicated text is what stops the model from memorizing it).

Scale shape
-----------
1. **Explode narrow**: stateless ``map_batches`` emits ``(doc_id, s, h)``
   per window start ``s`` — ``h`` is a 64-bit window hash
   (``pd.util.hash_array``; engine-internal, the oracle compares
   reconstructed TEXT).  ~n rows per n-word doc, text never shuffles.
2. **One keyed exchange by h**: every task sees all instances of its
   hashes; runs with ``count >= min_count`` emit ALL their ``(doc_id, s)``
   rows as removals (no election needed — policy removes every copy).
3. **One keyed exchange by doc_id**: removals co-partition with the
   documents (side-tagged union, the ``dedup_lines`` shape); the kept-token
   mask per doc is a vectorized interval union (diff array + cumsum).

At 64-bit hashing, ~10^11 distinct windows give ~3e-2 corpus-wide collision
probability (birthday bound); a collision removes one innocent window.
``wide_hash=True`` keys by the full 128-bit md5 digest instead (two u64
columns) — collision probability ~1e-14 at 10^12 windows.

Oracle: pure SQL — windows via list_slice over the split word array,
duplicated window strings via GROUP BY HAVING, coverage via a range join,
reconstruction via string_agg (see __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import group_starts, partitioned_group_map
from pytimetk_ray.kernels import text as tx

_SIDE = "__side__"


def _window_strings(words: list[str], w: int) -> list[str]:
    return [" ".join(words[s:s + w]) for s in range(len(words) - w + 1)]


def dedup_spans(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    window_words: int = 8,
    min_count: int = 2,
    num_partitions: int = 32,
    wide_hash: bool = False,
) -> rd.Dataset:
    """Remove every token covered by a corpus-duplicated W-word window.

    A window (``window_words`` consecutive space-split words, at every
    offset) occurring ``>= min_count`` times corpus-wide marks ALL its
    token positions for removal in ALL documents.  Returns one row per
    input document: ``(id, text_dedup, n_tokens, n_removed)`` —
    ``text_dedup`` is the surviving words re-joined (byte-identical to the
    input when nothing was removed and the text is single-spaced).
    Documents shorter than ``window_words`` words have no windows and pass
    through untouched.

    ``wide_hash=True`` keys windows by the full 128-bit md5 digest (two
    u64 columns, DuckDB ``md5_number_upper/lower``-matchable) instead of
    the 64-bit ``pd.util.hash_array`` — at 10^11+ distinct windows the
    64-bit birthday bound (~3e-2 corpus-wide) starts removing innocent
    text on collision; 128 bits makes that ~1e-14.  ~2x window hashing
    cost, identical shuffle shape (one extra int64 column).
    """
    w = int(window_words)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        ss: list[int] = []
        wins: list[str] = []
        for i, t in zip(batch[id_column].tolist(),
                        batch[text_column].tolist()):
            words = (t or "").split(" ")
            ws = _window_strings(words, w)
            ids.extend([i] * len(ws))
            ss.extend(range(len(ws)))
            wins.extend(ws)
        out = pd.DataFrame({
            id_column: pd.Series(ids, dtype=batch[id_column].dtype),
            "s": np.asarray(ss, dtype=np.int64),
        })
        if wide_hash:
            hi, lo = tx.md5_u64_pair_many(wins)
            out["h"] = hi.view(np.int64)
            out["h2"] = lo.view(np.int64)
        else:
            out["h"] = pd.util.hash_array(np.asarray(wins, dtype=object))
        return out

    def elect_removals(part: pd.DataFrame) -> pd.DataFrame:
        h = part["h"].to_numpy()
        if wide_hash:
            h2 = part["h2"].to_numpy()
            change = np.empty(len(h), dtype=bool)
            change[0] = True
            np.logical_or(h[1:] != h[:-1], h2[1:] != h2[:-1], out=change[1:])
            starts = np.flatnonzero(change)
        else:
            starts = group_starts(h)
        sizes = np.diff(np.append(starts, len(h)))
        in_dup = np.repeat(sizes >= min_count, sizes)
        return part.loc[in_dup, [id_column, "s"]].reset_index(drop=True)

    sort_cols = ["h", "h2"] if wide_hash else ["h"]
    removals = partitioned_group_map(
        ds.map_batches(explode, batch_format="pandas"),
        ["h"], elect_removals, sort_by=sort_cols,
        num_partitions=num_partitions)

    def tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_column: batch[id_column].to_numpy(),
            text_column: batch[text_column].to_numpy(),
            "s": np.full(len(batch), -1, dtype=np.int64),
            _SIDE: np.zeros(len(batch), dtype=np.int8),
        })

    def tag_removals(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_column: batch[id_column].to_numpy(),
            text_column: pd.Series([""] * len(batch), dtype=object),
            "s": batch["s"].to_numpy(np.int64),
            _SIDE: np.ones(len(batch), dtype=np.int8),
        })

    unioned = ds.map_batches(tag_docs, batch_format="pandas").union(
        removals.map_batches(tag_removals, batch_format="pandas"))

    def rebuild(part: pd.DataFrame) -> pd.DataFrame:
        side = part[_SIDE].to_numpy()
        docs = part.loc[side == 0]
        rem = part.loc[side == 1, [id_column, "s"]]
        starts_by_doc: dict = {k: v.to_numpy()
                               for k, v in rem.groupby(id_column,
                                                       sort=False)["s"]}
        out_ids, out_text, n_tok, n_rm = [], [], [], []
        for i, t in zip(docs[id_column].tolist(),
                        docs[text_column].tolist()):
            words = (t or "").split(" ")
            n = len(words)
            rs = starts_by_doc.get(i)
            if rs is None or n < w:
                out_text.append(t)
                n_rm.append(0)
            else:
                # interval union of [s, s+w) via a difference array
                diff = np.zeros(n + 1, dtype=np.int64)
                np.add.at(diff, rs, 1)
                np.add.at(diff, rs + w, -1)
                covered = np.cumsum(diff[:n]) > 0
                kept = [wd for wd, c in zip(words, covered) if not c]
                out_text.append(" ".join(kept))
                n_rm.append(int(covered.sum()))
            out_ids.append(i)
            n_tok.append(n)
        return pd.DataFrame({
            id_column: pd.Series(out_ids, dtype=docs[id_column].dtype),
            "text_dedup": pd.Series(out_text, dtype=object),
            "n_tokens": np.asarray(n_tok, dtype=np.int64),
            "n_removed": np.asarray(n_rm, dtype=np.int64),
        })

    return partitioned_group_map(unioned, [id_column], rebuild,
                                 sort_by=[id_column, _SIDE, "s"],
                                 num_partitions=num_partitions)
