"""End-to-end training-data preparation pipeline over a documents corpus.

Composes the engine's pieces the way a 100 TB pre-training pipeline would:

    read documents
      -> TextScorer actor pool (quality features, token counts, lang id)
      -> quality filter (vectorized predicate)
      -> exact dedup (content-hash shuffle, keep min id)   [ONE execution,
         materialized in the OBJECT STORE — the dedup output is consumed
         twice (near-dup sketching + final anti-join), and the object store
         spills to disk at scale instead of recomputing the scorer pool]
      -> near-dup dedup (MinHash-LSH pairs -> connected components ->
         ANTI-JOIN out non-representatives; both sides hash-partitioned on
         doc_id — no driver-side drop-set)
      -> write partitioned parquet + a run manifest

Stats are collected by a tiny Ray counter actor incremented per batch inside
the single execution — the driver never re-executes the pipeline per stat
and never materializes data locally.  (Task retries could double-count the
stage counters; the row counts that gate correctness — exact_unique,
output_rows — come from Dataset metadata, not the actor.)
"""

from __future__ import annotations

import json
import os

import pandas as pd

import ray
import ray.data as rd

from pytimetk_ray.pipelines.dedup import (
    dedup_components,
    exact_dedup_rows,
    minhash_lsh_pairs,
)
from pytimetk_ray.pipelines.text_analysis import score_documents


@ray.remote(num_cpus=0)
class _StageCounter:
    """Per-stage (rows_in, rows_out) tallies, incremented from worker tasks."""

    def __init__(self):
        self.counts = {}

    def add(self, stage: str, rows_in: int, rows_out: int) -> None:
        a, b = self.counts.get(stage, (0, 0))
        self.counts[stage] = (a + rows_in, b + rows_out)

    def get(self) -> dict:
        return dict(self.counts)


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
    counter = _StageCounter.remote()

    scored = score_documents(ds, concurrency=concurrency, with_lang=True,
                             with_fingerprint=True)

    def quality_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["token_count"] >= min_tokens) & (
            batch["q_punct_ratio"] <= max_punct_ratio
        )
        out = batch[keep]
        counter.add.remote("quality", len(batch), len(out))
        return out

    filtered = scored.map_batches(quality_filter, batch_format="pandas")

    # exact dedup: one shuffle of full rows by content hash, keep min id per
    # text — no driver-side keep-set.  materialize() is the pipeline's ONLY
    # barrier: everything upstream (scorer actor pool included) runs exactly
    # once, and the output blocks live in the object store for the two
    # downstream consumers.
    deduped = exact_dedup_rows(
        filtered, text_column=text_column, id_column=id_column
    ).materialize()
    stats["exact_unique"] = deduped.count()  # metadata on materialized blocks

    stage = ray.get(counter.get.remote())
    stats["input_rows"] = stage.get("quality", (0, 0))[0]
    stats["after_quality"] = stage.get("quality", (0, 0))[1]

    # near-dup: LSH pairs -> components -> anti-join non-representatives.
    # Both join sides are hash-partitioned on doc_id by Ray's join operator;
    # the drop side never lands on the driver.
    pairs = minhash_lsh_pairs(
        deduped, text_column=text_column, id_column=id_column,
        threshold=neardup_threshold,
    )
    comp = dedup_components(pairs, id_column=id_column)
    drops = comp.map_batches(
        lambda b: b.loc[b[id_column] != b["cluster_id"], [id_column]]
        .assign(__dup__=1),
        batch_format="pandas",
    ).materialize()
    stats["neardup_dropped"] = drops.count()

    if stats["neardup_dropped"]:
        joined = deduped.join(
            drops, join_type="left_outer", num_partitions=16, on=(id_column,),
        )
        kept = joined.map_batches(
            lambda b: b[b["__dup__"].isna()].drop(columns="__dup__"),
            batch_format="pandas",
        )
    else:
        kept = deduped

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        kept.write_parquet(os.path.join(out_dir, "documents"))
        stats["output_rows"] = rd.read_parquet(os.path.join(out_dir, "documents")).count()
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(stats, f, indent=1)
    else:
        stats["output_rows"] = kept.count()
    return kept, stats
