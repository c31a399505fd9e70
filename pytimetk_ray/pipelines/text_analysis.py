"""Text-analysis stages for training-data pipelines over a documents table.

Each stage is a vectorized ``map_batches`` transform (actor pool where state
— compiled regexes, language profiles — pays off).  Designed for the
``documents`` corpus shape (doc_id, text, ...) at 100 TB: stateless
projections, no shuffle.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from pytimetk_ray.kernels import text as tx


class TextScorer:
    """Actor-pool stage: quality features + token counts + language ID.

    Regexes/profiles are compiled once per actor in ``__init__`` (the
    reference pattern for stateful map stages)."""

    def __init__(self, with_lang: bool = True, with_fingerprint: bool = True):
        # touch the module-level compiled regexes so import cost is paid here
        self.with_lang = with_lang
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        feats = tx.quality_features(texts)
        for k, v in feats.items():
            batch[f"q_{k}"] = v
        batch["token_count"] = tx.token_count(texts)
        if self.with_lang:
            batch["lang_pred"] = tx.detect_language(texts)
        if self.with_fingerprint:
            batch["fingerprint_md5"] = tx.md5_fingerprint(texts)
            batch["fingerprint_roll"] = tx.rolling_fingerprint(texts).astype("uint64")
        return batch


def score_documents(ds: rd.Dataset, *, concurrency: int = 4, batch_size: int = 4096,
                    **kw) -> rd.Dataset:
    return ds.map_batches(
        TextScorer,
        fn_constructor_kwargs=kw,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    """doc_id + whitespace token count (oracle-SQL-matched query)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "token_count": tx.token_count(batch["text"].tolist())}
        )

    return ds.map_batches(fn, batch_format="pandas")
