"""End-to-end training-data preparation pipeline over a documents corpus.

Composes the engine's pieces the way a 100 TB pre-training pipeline would:

    read documents
      -> TextScorer actor pool (quality features, token counts, lang id)
      -> quality filter (vectorized predicate)
      -> exact dedup (content-hash groupby, keep min id)
      -> near-dup dedup (MinHash-LSH pairs -> connected components ->
         drop non-cluster-representatives)
      -> write partitioned parquet + a run manifest

Every stage streams; the only driver-side materializations are the (tiny)
duplicate-id sets, which are broadcast back into a vectorized filter.
Returns the kept Dataset and a stats dict.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.pipelines.dedup import (
    dedup_components,
    exact_dedup_rows,
    minhash_lsh_pairs,
)
from pytimetk_ray.pipelines.text_analysis import score_documents


def prepare_training_data(
    ds: rd.Dataset,
    *,
    out_dir: str | None = None,
    id_column: str = "doc_id",
    text_column: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.5,
    neardup_threshold: float = 0.7,
    concurrency: int = 4,
) -> tuple[rd.Dataset, dict]:
    stats: dict = {}
    stats["input_rows"] = ds.count()

    scored = score_documents(ds, concurrency=concurrency, with_lang=True,
                             with_fingerprint=True)

    def quality_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["token_count"] >= min_tokens) & (
            batch["q_punct_ratio"] <= max_punct_ratio
        )
        return batch[keep]

    filtered = scored.map_batches(quality_filter, batch_format="pandas")

    # exact dedup: one shuffle of full rows by content hash, keep min id per
    # text — no driver-side keep-set, so this stage holds at 100 TB
    stats["after_quality"] = filtered.count()
    deduped = exact_dedup_rows(filtered, text_column=text_column, id_column=id_column)
    stats["exact_unique"] = deduped.count()

    # near-dup: LSH pairs -> components -> drop non-representatives
    pairs = minhash_lsh_pairs(
        deduped, text_column=text_column, id_column=id_column,
        threshold=neardup_threshold,
    )
    comp = dedup_components(pairs, id_column=id_column).to_pandas()
    drop_near = set(comp[comp[id_column] != comp["cluster_id"]][id_column])
    stats["neardup_dropped"] = len(drop_near)

    if drop_near:
        drop_arr = np.fromiter(drop_near, dtype=np.int64, count=len(drop_near))

        def drop_near_filter(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch[id_column].isin(drop_arr)]

        deduped = deduped.map_batches(drop_near_filter, batch_format="pandas")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        deduped.write_parquet(os.path.join(out_dir, "documents"))
        stats["output_rows"] = rd.read_parquet(os.path.join(out_dir, "documents")).count()
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(stats, f, indent=1)
    else:
        stats["output_rows"] = deduped.count()
    return deduped, stats
