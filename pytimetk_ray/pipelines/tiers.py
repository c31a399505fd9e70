"""The flagship pipeline: raw -> 1m -> 1h -> 1d retention-tier rollup with
checkpointed, resumable, per-partition Parquet outputs.

Semantics: each tier is the reference's ``summarize_by_time`` applied to the
previous tier (reference: src/pytimetk/core/summarize_by_time.py:362-441)
with COMPOSITIONAL aggregates only — sum/count/min/max re-aggregate exactly
tier-over-tier (sum of sums, min of mins...); mean/std are derived at read
(mean = sum/count), never stored, so tiers stay losslessly composable and
bit-equal to a single-pass pandas oracle over the raw data.

Execution plan per tier (all streaming, no driver materialization):

    read previous tier (Parquet, column-pruned)
      -> map_batches: hash-partition column H(conv_id) % P   [vectorized]
      -> groupby(__part__).map_groups:                        [the shuffle]
           sort partition by (conv_id, ts)
           floor ts to the tier grid (numpy int64 kernel)
           pandas groupby(conv, bucket) aggregate IN SORTED ORDER
              (pandas-identical accumulation -> bit-equality, SURVEY §4)
           commit partition parquet + lineage manifest (skip if committed)
      -> manifest rows (tiny) collected on the driver

Determinism note: every (conv_id, bucket) lands wholly inside one partition
task because partitioning is by conv_id, so float accumulation order is the
sorted per-group order — identical to the pandas oracle, sidestepping
combine-order nondeterminism entirely.

Skew: P partitions of many conversations each; a hot conversation caps a
partition at its own size, and because aggregation happens inside the
partition task (a partial aggregate), the data volume leaving any task is
proportional to buckets, not rows.  For pathological single-conv skew see
``salt`` in ops/summarize_by_time (sum/count/min/max compose across salts).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.freq import parse_freq
from pytimetk_ray.kernels.gapfill import pad_groups
from pytimetk_ray.state import manifest as mf

TIER_FREQS = ("1min", "1h", "1D")
TIER_NAMES = {"1min": "1m", "1h": "1h", "1D": "1d"}
_AGG_COLS = ["value_sum", "value_count", "value_min", "value_max"]


def _np_unit(arr) -> str:
    s = str(arr.dtype)
    return s[s.index("[") + 1 : s.index("]")]


def _floor_series(ts: pd.Series, freq: str) -> np.ndarray:
    from pytimetk_ray.freq import floor_i64

    arr = ts.to_numpy()
    unit = _np_unit(arr)
    return floor_i64(arr.astype(np.int64), unit, freq).astype(f"datetime64[{unit}]")


def rollup_tiers(
    ds: rd.Dataset,
    *,
    out_dir: str,
    key: str = "conv_id",
    date_column: str = "ts",
    value_column: str = "value",
    tiers: Sequence[str] = TIER_FREQS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    input_fingerprint: str = "",
    resume: bool = True,
    gap_fill: bool = False,
) -> dict[str, pd.DataFrame]:
    """Run the tier cascade; returns {tier_name: manifest frame}.

    ``gap_fill=True`` regularizes the first tier onto its dense grid
    (pad_by_time semantics, zero-filled buckets) before rollup, per the
    north_rule's "gap-filled on regularized ts grids".
    """
    results: dict[str, pd.DataFrame] = {}
    prev_path: str | None = None
    prev_name: str | None = None

    for i, freq in enumerate(tiers):
        name = TIER_NAMES.get(freq, freq)
        fp = f"{input_fingerprint}|{prev_name or 'raw'}->{name}"
        committed = mf.committed_partitions(out_dir, name, fp) if resume else set()

        if i == 0:
            src = ds
            kernel = _raw_kernel(
                key, date_column, value_column, freq, out_dir, name, fp, committed, gap_fill
            )
        else:
            src = rd.read_parquet(os.path.join(out_dir, f"tier={prev_name}"))
            kernel = _tier_kernel(key, freq, out_dir, name, fp, committed)

        manifests = partitioned_group_map(
            src,
            [key],
            kernel,
            sort_by=[key, date_column if i == 0 else "bucket_ts"],
            num_partitions=num_partitions,
            with_partition_id=True,
        ).to_pandas()  # tiny: one row per partition
        results[name] = manifests
        prev_path, prev_name = os.path.join(out_dir, f"tier={name}"), name
    _ = prev_path
    return results


def _manifest_df(m: dict) -> pd.DataFrame:
    return pd.DataFrame([m])


def _raw_kernel(key, date_column, value_column, freq, out_dir, name, fp, committed, gap_fill):
    def kernel(part: pd.DataFrame, pid: int) -> pd.DataFrame:
        if pid in committed:
            import json

            with open(mf.manifest_path(out_dir, name, pid)) as f:
                return _manifest_df(json.load(f))
        part = part[[key, date_column, value_column]]
        bucket = _floor_series(part[date_column], freq)
        part = pd.DataFrame(
            {key: part[key].to_numpy(), "bucket_ts": bucket, value_column: part[value_column].to_numpy()}
        )
        agg = (
            part.groupby([key, "bucket_ts"], sort=True)[value_column]
            .agg(value_sum="sum", value_count="count", value_min="min", value_max="max")
            .reset_index()
        )
        if gap_fill:
            agg = pad_groups(
                agg.sort_values([key, "bucket_ts"], kind="mergesort", ignore_index=True),
                [key],
                "bucket_ts",
                freq,
                fillna=None,
            )
            zero = {"value_sum": 0.0, "value_count": 0, "value_min": np.nan, "value_max": np.nan}
            for c, z in zero.items():
                agg[c] = agg[c].fillna(z)
            agg["value_count"] = agg["value_count"].astype(np.int64)
        return _manifest_df(mf.commit_partition(out_dir, name, pid, agg, fp))

    return kernel


def _tier_kernel(key, freq, out_dir, name, fp, committed):
    def kernel(part: pd.DataFrame, pid: int) -> pd.DataFrame:
        if pid in committed:
            import json

            with open(mf.manifest_path(out_dir, name, pid)) as f:
                return _manifest_df(json.load(f))
        bucket = _floor_series(part["bucket_ts"], freq)
        part = part.assign(bucket_ts=bucket)
        agg = (
            part.groupby([key, "bucket_ts"], sort=True)
            .agg(
                value_sum=("value_sum", "sum"),
                value_count=("value_count", "sum"),
                value_min=("value_min", "min"),
                value_max=("value_max", "max"),
            )
            .reset_index()
        )
        return _manifest_df(mf.commit_partition(out_dir, name, pid, agg, fp))

    return kernel


def read_tier(out_dir: str, tier: str) -> rd.Dataset:
    """Read one tier back as a Dataset, deriving ``value_mean`` at read
    (mean is never stored — tiers hold only composable aggregates)."""
    ds = rd.read_parquet(os.path.join(out_dir, f"tier={tier}"))

    def add_mean(batch: pd.DataFrame) -> pd.DataFrame:
        if "tier" in batch.columns:  # hive-partition column from the path
            batch = batch.drop(columns=["tier"])
        batch["value_mean"] = batch["value_sum"] / batch["value_count"]
        return batch

    return ds.map_batches(add_mean, batch_format="pandas")


def oracle_rollup(
    df: pd.DataFrame,
    *,
    key: str = "conv_id",
    date_column: str = "ts",
    value_column: str = "value",
    freq: str = "1min",
) -> pd.DataFrame:
    """Single-process pandas oracle (pytimetk summarize_by_time semantics:
    set_index(date).groupby(key).resample(freq).agg, reference
    summarize_by_time.py:382-411) for bit-equality tests."""
    out = (
        df.set_index(date_column)
        .groupby(key)
        .resample(freq)[value_column]
        .agg(value_sum="sum", value_count="count", value_min="min", value_max="max")
        .reset_index()
        .rename(columns={date_column: "bucket_ts"})
    )
    # resample emits empty buckets between min/max; the sparse tier doesn't
    out = out[out["value_count"] > 0].reset_index(drop=True)
    return out
