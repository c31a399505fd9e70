"""TF-IDF keyword extraction over a documents corpus (fully distributed).

Beyond-reference corpus operator (the reference has no corpus ops): surfaces
the top-k highest-scoring terms per document — the standard building block
for corpus diagnostics, topic labeling and quality filtering.

Scale shape — NO driver-side vocabulary materialization and NO unbounded
broadcast (the tf-idf vocabulary grows with the corpus, so the broadcast
pattern that works for top-V unigram_logprob would be a 100 TB killer here):

1. **explode** — one ``(token, doc_id, tf)`` row per DISTINCT (doc, token)
   pair (per-batch Python tokenization, the same ``_WORD_RE`` surface as
   vocab_topk so the SQL oracle shares the regex).
2. **df annotate** — hash-partition by token; within a partition every row
   of a token is present, so df(token) == group size (a vectorized
   ``groupby().transform('size')``).  The df "join" costs nothing beyond
   the one keyed exchange the exploded rows already need.
3. **score + top-k** — hash-partition by doc_id; score = tf * ln(N/df)
   vectorized, rounded to 6 BEFORE ranking (round-before-select), top-k per
   doc via lexsort + cumcount.  Ties broken by token ascending.

Both shuffles ride ``exec.partitioned_group_map`` (hash partition, whole
groups per task).  Float parity with the DuckDB oracle: ln/div/mul are IEEE
double ops in both engines; a transcendental ln never lands exactly on a
rounding boundary (unlike the dyadic-divisor means in NOTES_r1's tie
taxonomy), so round-6 is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.kernels import text as tx

TFIDF_PARTITIONS = 32


def _explode_tf(text_column: str, id_column: str):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        toks: list[str] = []
        tfs: list[int] = []
        for doc_id, t in zip(batch[id_column], batch[text_column]):
            tf: dict[str, int] = {}
            for w in tx._WORD_RE.findall((t or "").lower()):
                tf[w] = tf.get(w, 0) + 1
            ids.extend([doc_id] * len(tf))
            toks.extend(tf.keys())
            tfs.extend(tf.values())
        return pd.DataFrame({
            id_column: np.asarray(ids, dtype=np.int64),
            "token": np.asarray(toks, dtype=object),
            "tf": np.asarray(tfs, dtype=np.int64),
        })

    return fn


def document_frequencies(ds: rd.Dataset, *, text_column: str = "text",
                         id_column: str = "doc_id", min_df: int = 1,
                         num_partitions: int = TFIDF_PARTITIONS) -> rd.Dataset:
    """(token, df) rows: how many documents contain each token.

    Standalone utility (vocab diagnostics, df-cut tables).  Per-batch
    combiner (one row per distinct token per batch) -> keyed sum."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[str, int] = {}
        for t in batch[text_column].tolist():
            for tok in set(tx._WORD_RE.findall((t or "").lower())):
                cnt[tok] = cnt.get(tok, 0) + 1
        return pd.DataFrame({"token": np.array(list(cnt.keys()), dtype=object),
                             "df": np.fromiter(cnt.values(), np.int64,
                                               count=len(cnt))})

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("token", as_index=False, sort=False)["df"].sum()
        if min_df > 1:
            g = g[g["df"] >= min_df]
        return g.reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, ["token"], reduce_part,
                                 sort_by=["token"],
                                 num_partitions=num_partitions)


def tfidf_topk(ds: rd.Dataset, *, text_column: str = "text",
               id_column: str = "doc_id", k: int = 3, min_df: int = 1,
               num_partitions: int = TFIDF_PARTITIONS) -> rd.Dataset:
    """Top-k TF-IDF terms per document: (doc_id, rank, token, tfidf).

    ``min_df`` drops rare tokens before scoring (at corpus scale, hapax
    tokens are noise and dominate the exploded row count)."""
    n_docs = float(ds.count())

    exploded = ds.map_batches(_explode_tf(text_column, id_column),
                              batch_format="pandas")

    def annotate_df(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy()
        part["df"] = part.groupby("token", sort=False)["tf"].transform("size")
        if min_df > 1:
            part = part[part["df"] >= min_df]
        return part.reset_index(drop=True)

    with_df = partitioned_group_map(exploded, ["token"], annotate_df,
                                    sort_by=["token"],
                                    num_partitions=num_partitions)

    def score_topk(part: pd.DataFrame) -> pd.DataFrame:
        score = np.round(
            part["tf"].to_numpy(np.float64)
            * np.log(n_docs / part["df"].to_numpy(np.float64)),
            6,
        )
        part = part.assign(tfidf=score)
        part = part.sort_values([id_column, "tfidf", "token"],
                                ascending=[True, False, True],
                                kind="mergesort").reset_index(drop=True)
        part["rank"] = part.groupby(id_column, sort=False).cumcount() + 1
        part = part[part["rank"] <= k]
        return part[[id_column, "rank", "token", "tfidf"]].reset_index(drop=True)

    return partitioned_group_map(with_df, [id_column], score_topk,
                                 sort_by=[id_column],
                                 num_partitions=num_partitions)
