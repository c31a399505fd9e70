"""C4-style corpus-level LINE deduplication over a documents table.

The C4 / MassiveText prep pipelines remove *lines* (sentences, paragraphs)
that repeat across the corpus — boilerplate headers, navigation chrome,
license blurbs — keeping only the globally-first occurrence.  The reference
engine has no corpus operators at all; this is a first-class LLM-prep stage
of this engine (same family as ``pipelines/corpus.decontaminate``).

Line unit
---------
``words_per_line=None`` splits on newlines (real web corpora);
``words_per_line=W`` uses fixed W-word windows (``i // W`` over the
space-split word stream) — the unit that makes sense for the synthetic
single-line documents table, and the same "span" idea C4 applies at
three-sentence granularity.  Reconstruction joins kept lines with the
matching separator, so a document with no duplicated lines round-trips
byte-identical (the per-row text invariant).

Scale shape (the part that must survive 100 TB)
-----------------------------------------------
1. **Explode narrow**: a stateless ``map_batches`` turns each document into
   ``(doc_id, ln, h)`` rows where ``h`` is a vectorized 64-bit line hash
   (``pd.util.hash_array`` — process-independent, C-speed; engine-internal
   only, the oracle compares reconstructed TEXT, never the hash).  The
   text column itself never enters this exchange.
2. **One keyed exchange by h**: ``exec.partitioned_group_map`` gives every
   task ALL instances of its hashes, sorted ``(h, doc_id, ln)`` — count and
   first-occurrence election are local and segment-vectorized.  Only the
   REMOVAL set ``(doc_id, ln)`` comes out (duplicate instances minus the
   keeper), a tiny fraction of the line stream.
3. **One keyed exchange by doc_id**: documents and removals ride the same
   side-tagged union shuffle (the ``ops/joins.hash_join`` co-partition
   pattern); each task drops the removed line ordinals and re-joins the
   survivors.  Text crosses the wire exactly once.

At 64-bit hashing a corpus of ~10^10 distinct lines has ~3e-3 collision
probability corpus-wide (birthday bound); a collision deletes one innocent
line.  For exact-equality guarantees at that scale switch ``h`` to the
128-bit md5 digest bytes — same plan, wider key.

Oracle: pure SQL — window ``count(*) / row_number() OVER (PARTITION BY
line)`` then ``string_agg(line ORDER BY ln)`` (see __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import group_starts, partitioned_group_map

_SIDE = "__side__"


def _split_lines(text: str, words_per_line: int | None) -> list[str]:
    """The single line-unit definition shared by explode and reconstruct."""
    if words_per_line is None:
        return (text or "").split("\n")
    w = (text or "").split(" ")
    return [" ".join(w[i:i + words_per_line])
            for i in range(0, len(w), words_per_line)]


def _sep(words_per_line: int | None) -> str:
    return "\n" if words_per_line is None else " "


def dedup_lines(
    ds: rd.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    words_per_line: int | None = 8,
    min_count: int = 2,
    keep: str = "first",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Remove corpus-duplicated lines from every document.

    A line occurring ``>= min_count`` times corpus-wide is dropped from all
    documents except its globally-first instance (min ``(doc_id, ln)``) when
    ``keep="first"``, or from ALL documents when ``keep="none"``.

    Returns one row per input document:
    ``(id, text_dedup, n_lines, n_removed)`` — ``text_dedup`` is the
    surviving lines re-joined in original order (byte-identical to the
    input when nothing was removed).
    """
    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        lns: list[int] = []
        lines: list[str] = []
        for i, t in zip(batch[id_column].tolist(),
                        batch[text_column].tolist()):
            ls = _split_lines(t, words_per_line)
            ids.extend([i] * len(ls))
            lns.extend(range(len(ls)))
            lines.extend(ls)
        return pd.DataFrame({
            id_column: pd.Series(ids, dtype=batch[id_column].dtype),
            "ln": np.asarray(lns, dtype=np.int64),
            "h": pd.util.hash_array(np.asarray(lines, dtype=object)),
        })

    def elect_removals(part: pd.DataFrame) -> pd.DataFrame:
        # sorted (h, doc_id, ln): run starts are the first occurrences
        h = part["h"].to_numpy()
        starts = group_starts(h)
        sizes = np.diff(np.append(starts, len(h)))
        dup_runs = sizes >= min_count
        first = np.zeros(len(h), dtype=bool)
        first[starts] = True
        in_dup = np.repeat(dup_runs, sizes)
        removed = in_dup if keep == "none" else (in_dup & ~first)
        return part.loc[removed, [id_column, "ln"]].reset_index(drop=True)

    removals = partitioned_group_map(
        ds.map_batches(explode, batch_format="pandas"),
        ["h"], elect_removals, sort_by=["h", id_column, "ln"],
        num_partitions=num_partitions)

    def tag_docs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_column: batch[id_column].to_numpy(),
            text_column: batch[text_column].to_numpy(),
            "ln": np.full(len(batch), -1, dtype=np.int64),
            _SIDE: np.zeros(len(batch), dtype=np.int8),
        })

    def tag_removals(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_column: batch[id_column].to_numpy(),
            text_column: pd.Series([""] * len(batch), dtype=object),
            "ln": batch["ln"].to_numpy(np.int64),
            _SIDE: np.ones(len(batch), dtype=np.int8),
        })

    unioned = ds.map_batches(tag_docs, batch_format="pandas").union(
        removals.map_batches(tag_removals, batch_format="pandas"))
    sep = _sep(words_per_line)

    def rebuild(part: pd.DataFrame) -> pd.DataFrame:
        side = part[_SIDE].to_numpy()
        docs = part.loc[side == 0]
        rem = part.loc[side == 1, [id_column, "ln"]]
        drop: dict = {k: set(v.tolist()) for k, v in
                      rem.groupby(id_column, sort=False)["ln"]}
        out_ids, out_text, n_lines, n_removed = [], [], [], []
        for i, t in zip(docs[id_column].tolist(),
                        docs[text_column].tolist()):
            ls = _split_lines(t, words_per_line)
            gone = drop.get(i)
            if gone:
                kept = [l for j, l in enumerate(ls) if j not in gone]
                out_text.append(sep.join(kept))
                n_removed.append(len(gone))
            else:
                out_text.append(t)
                n_removed.append(0)
            out_ids.append(i)
            n_lines.append(len(ls))
        return pd.DataFrame({
            id_column: pd.Series(out_ids, dtype=docs[id_column].dtype),
            "text_dedup": pd.Series(out_text, dtype=object),
            "n_lines": np.asarray(n_lines, dtype=np.int64),
            "n_removed": np.asarray(n_removed, dtype=np.int64),
        })

    return partitioned_group_map(unioned, [id_column], rebuild,
                                 sort_by=[id_column, _SIDE, "ln"],
                                 num_partitions=num_partitions)
