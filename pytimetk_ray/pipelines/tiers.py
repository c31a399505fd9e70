"""The flagship pipeline: raw -> 1m -> 1h -> 1d retention-tier rollup with
checkpointed, resumable, per-partition Parquet outputs.

Semantics: each tier is the reference's ``summarize_by_time`` applied to the
previous tier (reference: src/pytimetk/core/summarize_by_time.py:362-441)
with COMPOSITIONAL aggregates only — sum/count/min/max re-aggregate exactly
tier-over-tier (sum of sums, min of mins...); mean/std are derived at read
(mean = sum/count), never stored, so tiers stay losslessly composable and
bit-equal to a single-pass pandas oracle over the raw data.

Execution plan (ONE shuffle for the whole cascade — fused):

    read raw (Parquet, column-pruned to key/ts/value)
      -> map_batches: hash-partition column H(conv_id) % P   [Arrow, vectorized]
      -> groupby(__part__).map_groups:                        [the only shuffle]
           sort partition by (conv_id, ts)
           floor ts to tier-1 grid (numpy int64 kernel), pandas aggregate
              IN SORTED ORDER (pandas-identical accumulation -> bit-equality)
           re-aggregate tier-over-tier (1m->1h->1d) inside the same task
           commit each tier's partition parquet + lineage manifest
      -> manifest rows (tiny) collected on the driver

Determinism note: every (conv_id, bucket) lands wholly inside one partition
task because partitioning is by conv_id, so float accumulation order is the
sorted per-group order — identical to the pandas oracle, sidestepping
combine-order nondeterminism entirely.

Skew: P partitions of many conversations each; a hot conversation caps a
partition at its own size, and because aggregation happens inside the
partition task (a partial aggregate), the data volume leaving any task is
proportional to buckets, not rows.  For pathological single-conv skew pass
``salt=S`` — explicit hot-conversation salting by tier-1 bucket hash (see
the rollup_tiers docstring; bit-equality preserved).
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


def _segment_rollup(codes, bucket, sums, counts, mins, maxs):
    """Segment reduction over sorted (codes, bucket) runs — pure numpy
    ``reduceat``.  Sequential left-to-right accumulation within each segment
    is the SAME order pandas' cython groupby uses over sorted rows, so float
    sums stay bit-equal to the pandas oracle.  Returns per-segment
    (codes, bucket, sum, count, min, max).  Caller guarantees no NaNs
    (reduceat does not skip NaN like pandas does)."""
    n = len(codes)
    if n == 0:
        e = np.array([])
        return (codes, bucket, e, e.astype(np.int64), e, e)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or(codes[1:] != codes[:-1], bucket[1:] != bucket[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    return (
        codes[starts],
        bucket[starts],
        np.add.reduceat(sums, starts),
        np.add.reduceat(counts, starts),
        np.minimum.reduceat(mins, starts),
        np.maximum.reduceat(maxs, starts),
    )


def _tier_fingerprints(input_fingerprint: str, tier_names: Sequence[str],
                       num_partitions: int, gap_fill: bool) -> dict[str, str]:
    """The per-tier fingerprint chain (semantics-affecting params included so
    checkpoints self-invalidate — see rollup_tiers).  Single source of truth
    for rollup_tiers AND the incremental-ingest compatibility pre-check."""
    fps = {}
    prev = "raw"
    for name in tier_names:
        fps[name] = f"{input_fingerprint}|P{num_partitions}|{prev}->{name}" + (
            "|gapfill" if gap_fill else "")
        prev = name
    return fps


def _committed_outside_increment(out_dir: str, tier: str, fp: str,
                                 num_partitions: int,
                                 pids: set[int]) -> set[int]:
    """Resume set for an incremental recompute whose dataset covers ONLY the
    partitions in ``pids``.  Partitions outside the increment are trusted
    when their manifest fingerprint is the expected one OR an
    ``|expire@``-suffixed descendant of it (valid retention state — expiry
    only removes rows, the lineage is still this store's).  Any OTHER
    mismatch (different num_partitions / gap_fill / input fingerprint) means
    the stored layout is incompatible; the increment recompute would never
    rewrite those partitions, so purging them loses data permanently — fail
    loudly instead and require a full rollup."""
    committed: set[int] = set()
    for pid, got in mf.partition_fingerprints(out_dir, tier).items():
        if pid in pids:
            continue  # invalidated by the caller; recomputed from raw
        if pid >= num_partitions or not (
                got == fp or got.startswith(fp + "|expire@")):
            raise ValueError(
                f"tier={tier} partition {pid} carries fingerprint {got!r} "
                f"(expected {fp!r} or an |expire@ descendant): the store was "
                f"written under different params — run a full rollup over "
                f"the complete raw store instead of an incremental ingest")
        committed.add(pid)
    return committed


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
    salt: int | None = None,
    _from_tier: bool = False,
    _part_keys: Sequence[str] | None = None,
    _increment_pids: set[int] | None = None,
) -> dict[str, pd.DataFrame]:
    """Run the tier cascade; returns {tier_name: manifest frame}.

    FUSED execution: because partitioning is by conv_id, every tier of a
    conversation is derivable inside the SAME partition task — so the whole
    raw→1m→1h→1d cascade runs with ONE hash-partition shuffle.  Each task:
    aggregates raw rows to tier 1 (pandas, sorted order → bit-equal), then
    re-aggregates tier-over-tier, committing each tier's partition parquet +
    lineage manifest as it goes.  Resume: a committed (tier, partition) is
    read back from its parquet (cheap) to seed the next tier instead of
    recomputing; its write is skipped.

    ``gap_fill=True`` regularizes tier 1 onto its dense grid (pad_by_time
    semantics, zero-filled buckets) before rollup, per the north_rule's
    "gap-filled on regularized ts grids".

    ``salt=S`` enables EXPLICIT HOT-CONVERSATION SALTING (north_rule): the
    raw→tier-1 stage partitions by ``(conv_id, hash(minute_bucket) % S)`` so
    a single hot conversation spreads over up to S partitions instead of
    capping one task.  Because the salt is a function of the tier-1 BUCKET,
    every (conv, bucket) still lands wholly in one partition — so tier-1
    float accumulation order is unchanged and bit-equality holds.  Upper
    tiers re-gather by conv_id alone (tier-1 output is tiny relative to
    raw), which also preserves the sorted accumulation order tier-over-tier.
    """
    if salt and salt > 1 and not _from_tier:
        return _rollup_salted(
            ds, out_dir=out_dir, key=key, date_column=date_column,
            value_column=value_column, tiers=tuple(tiers),
            num_partitions=num_partitions, input_fingerprint=input_fingerprint,
            resume=resume, salt=salt, gap_fill=gap_fill,
        )
    tier_names = [TIER_NAMES.get(f, f) for f in tiers]
    if not resume:
        # resume=False means "replace the checkpoint state": reset the tier
        # dirs being recomputed so partitions the new input does NOT
        # populate cannot linger as stale committed data (a later resume
        # under the same fingerprint would otherwise trust them)
        import shutil

        for name in tier_names:
            shutil.rmtree(os.path.join(out_dir, f"tier={name}"),
                          ignore_errors=True)
            shutil.rmtree(os.path.join(out_dir, "_manifests", name),
                          ignore_errors=True)
    # semantics-affecting params are part of the fingerprint so checkpoints
    # self-invalidate when they change: gap_fill toggles the sparse/dense
    # layout, and num_partitions changes row->partition placement (a resume
    # or ingest under a different P would otherwise silently mix layouts —
    # skip-pruning by NEW pid against OLD-layout files drops and duplicates
    # buckets)
    fps = _tier_fingerprints(input_fingerprint, tier_names, num_partitions,
                             gap_fill)
    committed = {}
    for name in tier_names:
        if resume and _increment_pids is not None:
            # incremental recompute: the dataset covers ONLY the increment's
            # partitions, so purging a fingerprint-mismatched partition
            # outside the increment would delete data the recompute never
            # rewrites (silent permanent loss after expire -> ingest).
            # Trust-or-raise instead of purge:
            committed[name] = _committed_outside_increment(
                out_dir, name, fps[name], num_partitions, _increment_pids)
        elif resume:
            # purge STALE partitions (manifest fingerprint from other
            # params/inputs, or pid outside the current layout): their data
            # files would otherwise sit beside the new layout and be
            # double-read by the glob-based tier readers
            mf.purge_stale_partitions(out_dir, name, fps[name],
                                      num_partitions)
            committed[name] = mf.committed_partitions(out_dir, name, fps[name])
        else:
            committed[name] = set()

    if resume and all(len(committed[n]) >= num_partitions for n in tier_names):
        # every (tier, partition) already committed for this fingerprint:
        # skip the read + shuffle entirely and return the stored manifests
        import json

        frames = {}
        for name in tier_names:
            rows = []
            for pid in sorted(committed[name]):
                with open(mf.manifest_path(out_dir, name, pid)) as f:
                    rows.append(json.load(f))
            frames[name] = pd.DataFrame(rows)
        return frames

    def kernel(part: pd.DataFrame, pid: int) -> pd.DataFrame:
        import json

        from pytimetk_ray.freq import floor_i64

        manifests = []
        # sorted-run factorize once; reused across every tier
        ts_np = part[date_column].to_numpy()
        unit = _np_unit(ts_np)
        codes, uniques = pd.factorize(part[key], sort=False)
        if _from_tier:
            vals, has_nan = None, False
        else:
            vals = part[value_column].to_numpy(dtype=np.float64)
            has_nan = bool(np.isnan(vals).any())
        agg = None  # (codes, bucket_i64, sum, count, min, max)
        for i, (freq, name) in enumerate(zip(tiers, tier_names)):
            if pid in committed[name]:
                with open(mf.manifest_path(out_dir, name, pid)) as f:
                    manifests.append(json.load(f))
                df = pd.read_parquet(mf.partition_path(out_dir, name, pid))
                codes2 = pd.Index(uniques).get_indexer(df[key])
                mn_ld = df["value_min"].to_numpy(dtype=np.float64)
                mx_ld = df["value_max"].to_numpy(dtype=np.float64)
                if gap_fill:
                    # gap rows were committed with NaN min/max; re-seed with
                    # identity sentinels so upper-tier reduceat skips them
                    mn_ld = np.where(np.isnan(mn_ld), np.inf, mn_ld)
                    mx_ld = np.where(np.isnan(mx_ld), -np.inf, mx_ld)
                agg = (codes2, df["bucket_ts"].to_numpy().astype(np.int64),
                       df["value_sum"].to_numpy(), df["value_count"].to_numpy(),
                       mn_ld, mx_ld)
                continue
            if i == 0:
                bucket = floor_i64(ts_np.astype(np.int64), unit, freq)
                if _from_tier:
                    # input rows are already tier aggregates: re-aggregate
                    c, b, s_, cnt, mn, mx = _segment_rollup(
                        codes, bucket,
                        part["value_sum"].to_numpy(dtype=np.float64),
                        part["value_count"].to_numpy(dtype=np.int64),
                        part["value_min"].to_numpy(dtype=np.float64),
                        part["value_max"].to_numpy(dtype=np.float64),
                    )
                    agg = (c, b, s_, cnt, mn, mx)
                elif has_nan:
                    src = pd.DataFrame({"c": codes, "b": bucket, "v": vals})
                    g = src.groupby(["c", "b"], sort=False)["v"].agg(
                        value_sum="sum", value_count="count",
                        value_min="min", value_max="max").reset_index()
                    agg = (g["c"].to_numpy(), g["b"].to_numpy(),
                           g["value_sum"].to_numpy(), g["value_count"].to_numpy(),
                           g["value_min"].to_numpy(), g["value_max"].to_numpy())
                else:
                    c, b, s, cnt, mn, mx = _segment_rollup(
                        codes, bucket, vals, np.ones(len(vals), dtype=np.int64),
                        vals, vals,
                    )
                    agg = (c, b, s, cnt, mn, mx)
            else:
                c0, b0, s0, cnt0, mn0, mx0 = agg
                b = floor_i64(np.asarray(b0, dtype=np.int64), unit, freq)
                c, b, s, cnt, mn, mx = _segment_rollup(
                    np.asarray(c0), b, np.asarray(s0, dtype=np.float64),
                    np.asarray(cnt0, dtype=np.int64),
                    np.asarray(mn0, dtype=np.float64),
                    np.asarray(mx0, dtype=np.float64),
                )
                agg = (c, b, s, cnt, mn, mx)
            c, b, s, cnt, mn, mx = agg
            if gap_fill and i > 0:
                # ±inf sentinels (gap rows) back to NaN in the stored tier
                mn = np.where(np.isinf(mn), np.nan, mn)
                mx = np.where(np.isinf(mx), np.nan, mx)
            df = pd.DataFrame(
                {
                    key: uniques[c] if len(c) else np.array([], dtype=object),
                    "bucket_ts": np.asarray(b, dtype=np.int64).astype(f"datetime64[{unit}]"),
                    "value_sum": s,
                    "value_count": cnt,
                    "value_min": mn,
                    "value_max": mx,
                }
            )
            if gap_fill and i == 0:
                # const_ffill=False: gap rows must stay NaN in EVERY aggregate
                # column (pad_by_time's constant-column ffill would copy a
                # group-constant value_count/min/max onto gap rows, inflating
                # upper-tier counts and turning gap means into 0 instead of NaN)
                df = pad_groups(df, [key], "bucket_ts", freq, fillna=None,
                                const_ffill=False)
                df["value_sum"] = df["value_sum"].fillna(0.0)
                df["value_count"] = df["value_count"].fillna(0).astype(np.int64)
                codes2 = pd.Index(uniques).get_indexer(df[key])
                mn_p = df["value_min"].to_numpy(dtype=np.float64)
                mx_p = df["value_max"].to_numpy(dtype=np.float64)
                agg = (codes2, df["bucket_ts"].to_numpy().astype(np.int64),
                       df["value_sum"].to_numpy(), df["value_count"].to_numpy(),
                       np.where(np.isnan(mn_p), np.inf, mn_p),
                       np.where(np.isnan(mx_p), -np.inf, mx_p))
            # (for gap_fill at i > 0, ``agg`` still holds the sentinel
            # min/max arrays — only the stored frame gets the NaN view)
            manifests.append(mf.commit_partition(out_dir, name, pid, df, fps[name]))
        return pd.DataFrame(manifests)

    # resume fast path: partitions committed in EVERY tier are pruned at the
    # read — their rows never enter the shuffle; manifests come from disk
    fully = set.intersection(*[committed[n] for n in tier_names]) if resume else set()
    all_manifests = partitioned_group_map(
        ds,
        list(_part_keys) if _part_keys else [key],
        kernel,
        sort_by=[key, date_column],
        num_partitions=num_partitions,
        with_partition_id=True,
        skip_partitions=fully,
    ).to_pandas()  # tiny: one row per (tier, partition)
    if fully:
        import json

        rows = []
        for name in tier_names:
            for pid in sorted(fully):
                with open(mf.manifest_path(out_dir, name, pid)) as f:
                    rows.append(json.load(f))
        all_manifests = pd.concat(
            [all_manifests, pd.DataFrame(rows)], ignore_index=True
        )
    return {
        name: all_manifests[all_manifests["tier"] == name].reset_index(drop=True)
        for name in tier_names
    }


def _rollup_salted(ds, *, out_dir, key, date_column, value_column, tiers,
                   num_partitions, input_fingerprint, resume, salt,
                   gap_fill=False):
    """Two-stage salted cascade (see rollup_tiers docstring).

    With ``gap_fill`` the grid pad needs each conversation's GLOBAL
    (min, max) tier-1 span, which a salted stage-A task does not see — so
    stage A writes the sparse tier-1 under ``out_dir/_presalt`` and stage B
    (regathered by conv_id alone, whole conversations per task) gap-fills and
    re-commits the dense tier-1 plus all upper tiers under ``out_dir``."""
    import pyarrow as pa

    from pytimetk_ray.freq import floor_i64

    tier0 = tiers[0]
    name0 = TIER_NAMES.get(tier0, tier0)

    def add_salt(batch: pa.Table) -> pa.Table:
        col = batch[date_column]
        unit = col.type.unit
        i64 = col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = floor_i64(i64, unit, tier0)
        sv = (pd.util.hash_array(b) % np.uint64(salt)).astype(np.int64)
        if "__salt__" in batch.column_names:
            batch = batch.drop_columns(["__salt__"])
        return batch.append_column("__salt__", pa.array(sv))

    tagged = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None,
                            zero_copy_batch=True)
    stage_a_dir = os.path.join(out_dir, "_presalt") if gap_fill else out_dir
    res_a = rollup_tiers(
        tagged, out_dir=stage_a_dir, key=key, date_column=date_column,
        value_column=value_column, tiers=(tier0,),
        num_partitions=num_partitions,
        input_fingerprint=f"{input_fingerprint}|salt{salt}", resume=resume,
        _part_keys=[key, "__salt__"],
    )
    if len(tiers) == 1 and not gap_fill:
        return res_a
    src_b = rd.read_parquet(
        os.path.join(stage_a_dir, f"tier={name0}"),
        columns=[key, "bucket_ts", "value_sum", "value_count", "value_min", "value_max"],
    )
    tiers_b = tuple(tiers) if gap_fill else tuple(tiers[1:])
    res_b = rollup_tiers(
        src_b, out_dir=out_dir, key=key, date_column="bucket_ts",
        value_column=value_column, tiers=tiers_b,
        num_partitions=num_partitions,
        input_fingerprint=f"{input_fingerprint}|salt{salt}|from_{name0}",
        resume=resume, _from_tier=True, gap_fill=gap_fill,
    )
    if gap_fill:
        return res_b
    return {name0: res_a[name0], **res_b}


def affected_partitions(new_ds: rd.Dataset, *, key: str = "conv_id",
                        num_partitions: int = DEFAULT_NUM_PARTITIONS) -> set[int]:
    """Partition ids an increment's rows hash into — the SAME hash chain as
    exec._add_part_arrow, so invalidation matches the shuffle exactly.
    Output is <= num_partitions values regardless of increment size."""

    def pids(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(np.asarray(batch[key]))
        return pd.DataFrame({"__part__": np.unique(
            (h % np.uint64(num_partitions)).astype(np.int64))})

    out = new_ds.map_batches(pids, batch_format="pandas").unique("__part__")
    return {int(p) for p in out}


def affected_partitions_salted(
        new_ds: rd.Dataset, *, key: str = "conv_id", date_column: str = "ts",
        salt: int, tier0: str = TIER_FREQS[0],
        num_partitions: int = DEFAULT_NUM_PARTITIONS) -> set[int]:
    """Stage-A partition ids of an increment in a SALTED store: the salted
    shuffle keys on (conv_id, hash(tier-1 bucket) % salt), so invalidation
    must hash the SAME (conv, salt-value) chain — keep in sync with
    _rollup_salted.add_salt and exec._add_part_arrow (h = H(conv)*1000003 +
    H(salt), mod P)."""
    from pytimetk_ray.freq import floor_i64

    def pids(batch: pd.DataFrame) -> pd.DataFrame:
        arr = batch[date_column].to_numpy()
        unit = _np_unit(arr)
        b = floor_i64(arr.astype(np.int64), unit, tier0)
        sv = (pd.util.hash_array(b) % np.uint64(salt)).astype(np.int64)
        h = (pd.util.hash_array(np.asarray(batch[key])) * np.uint64(1000003)
             + pd.util.hash_array(sv))
        return pd.DataFrame({"__part__": np.unique(
            (h % np.uint64(num_partitions)).astype(np.int64))})

    out = new_ds.map_batches(pids, batch_format="pandas").unique("__part__")
    return {int(p) for p in out}


def ingest_increment_salted(
    base_ds: rd.Dataset,
    new_ds: rd.Dataset,
    *,
    out_dir: str,
    key: str = "conv_id",
    date_column: str = "ts",
    value_column: str = "value",
    tiers: Sequence[str] = TIER_FREQS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    input_fingerprint: str = "",
    salt: int,
    gap_fill: bool = False,
) -> dict[str, pd.DataFrame]:
    """Incremental ingest into a SALTED tier store (rollup_tiers(salt=S)):

    - stage A (raw -> tier 1, partitioned by (conv, bucket-hash salt)) is
      invalidated by ``affected_partitions_salted`` — the increment's
      (conv, salt-value) pairs, NOT plain conv hashing;
    - stage B (tier 1 -> upper tiers, regathered by conv alone) is
      invalidated by the plain-conv ``affected_partitions`` chain;
    - the salted cascade then resumes over base ∪ increment: committed
      partitions are pruned at the read, invalidated ones recompute from raw
      in full — the same bit-equality contract as ``ingest_increment``.

    ``input_fingerprint``/``salt``/``num_partitions``/``gap_fill`` must match
    the base run (they are embedded in the store's fingerprints; a mismatch
    recomputes everything rather than mixing layouts)."""
    tier0 = tiers[0]
    name0 = TIER_NAMES.get(tier0, tier0)
    stage_a_dir = os.path.join(out_dir, "_presalt") if gap_fill else out_dir
    pids_a = affected_partitions_salted(
        new_ds, key=key, date_column=date_column, salt=salt, tier0=tier0,
        num_partitions=num_partitions)
    mf.invalidate_partitions(stage_a_dir, [name0], pids_a)
    pids_b = affected_partitions(new_ds, key=key,
                                 num_partitions=num_partitions)
    names_b = [TIER_NAMES.get(f, f)
               for f in (tiers if gap_fill else tuple(tiers)[1:])]
    mf.invalidate_partitions(out_dir, names_b, pids_b)
    return rollup_tiers(
        base_ds.union(new_ds), out_dir=out_dir, key=key,
        date_column=date_column, value_column=value_column, tiers=tiers,
        num_partitions=num_partitions, input_fingerprint=input_fingerprint,
        resume=True, gap_fill=gap_fill, salt=salt,
    )


def ingest_increment(
    base_ds: rd.Dataset,
    new_ds: rd.Dataset,
    *,
    out_dir: str,
    key: str = "conv_id",
    date_column: str = "ts",
    value_column: str = "value",
    tiers: Sequence[str] = TIER_FREQS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    input_fingerprint: str = "",
    gap_fill: bool = False,
) -> dict[str, pd.DataFrame]:
    """Incremental tier update: fold ``new_ds`` rows into an existing tier
    store WITHOUT recomputing untouched partitions.

    Partition-level invalidation keeps the bit-equality contract: the ids
    the new rows hash into are invalidated (manifests dropped) and those
    partitions are recomputed FROM RAW over ``base_ds.union(new_ds)`` —
    each recomputed task sees exactly the rows a full recompute would, in
    the same sorted order, so the result is bit-equal to rerunning the whole
    cascade (compositional float merging of old+new aggregates would NOT
    be).  Untouched partitions are pruned at the read by the resume path —
    their rows never enter the shuffle and their parquet is not rewritten.

    Uses the SAME ``input_fingerprint`` as the base run: the fingerprint
    names the logical tier store; its content advances via the manifest
    rewrite of the recomputed partitions.  For stores built with ``salt=S``
    use ``ingest_increment_salted`` (stage-A partitions key on
    (conv, bucket-hash), so invalidation hashes a different chain)."""
    pids = affected_partitions(new_ds, key=key, num_partitions=num_partitions)
    tier_names = [TIER_NAMES.get(f, f) for f in tiers]
    mf.invalidate_partitions(out_dir, tier_names, pids)
    return rollup_tiers(
        base_ds.union(new_ds), out_dir=out_dir, key=key,
        date_column=date_column, value_column=value_column, tiers=tiers,
        num_partitions=num_partitions, input_fingerprint=input_fingerprint,
        resume=True, gap_fill=gap_fill,
    )


def write_partitioned_raw(ds: rd.Dataset, raw_dir: str, *,
                          key: str = "conv_id",
                          num_partitions: int = DEFAULT_NUM_PARTITIONS) -> None:
    """Lay the raw corpus out hash-partitioned by the SAME chain the tier
    shuffle uses (`raw_dir/__part__=<pid>/...parquet`).  This is the layout
    that makes incremental ingest O(touched partitions): the recompute can
    open only the affected `__part__=` directories instead of scanning every
    raw file for rows that hash elsewhere."""
    from pytimetk_ray.exec import PART_COL, _add_part_arrow

    tagged = ds.map_batches(
        _add_part_arrow, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        fn_kwargs=dict(keys=[key], num_partitions=num_partitions, skip=None),
    )
    tagged.write_parquet(raw_dir, partition_cols=[PART_COL])


def read_partitioned_raw(raw_dir: str, *, pids: Sequence[int] | None = None,
                         columns: Sequence[str] | None = None) -> rd.Dataset:
    """Read a ``write_partitioned_raw`` store — all partitions or only
    ``pids`` (file-level pruning: unlisted ``__part__=`` directories are
    never opened).  Explicit subdirectory listing sidesteps Ray's root-dir
    hive inference, which mis-handles column pruning on this layout."""
    from pytimetk_ray.exec import PART_COL

    import glob

    if pids is None:
        dirs = sorted(
            os.path.join(raw_dir, d) for d in os.listdir(raw_dir)
            if d.startswith(f"{PART_COL}=")
        )
    else:
        dirs = [os.path.join(raw_dir, f"{PART_COL}={pid}")
                for pid in sorted(pids)]
    files = sorted(f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))
    return rd.read_parquet(files, columns=list(columns) if columns else None)


def ingest_increment_partitioned(
    raw_dir: str,
    new_ds: rd.Dataset,
    *,
    out_dir: str,
    key: str = "conv_id",
    date_column: str = "ts",
    value_column: str = "value",
    tiers: Sequence[str] = TIER_FREQS,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    input_fingerprint: str = "",
    gap_fill: bool = False,
) -> dict[str, pd.DataFrame]:
    """Incremental ingest against a ``write_partitioned_raw`` store: the
    increment is (1) appended into the raw store's affected ``__part__=``
    directories (raw stays the complete source of truth), then (2) ONLY
    those directories are read back and re-rolled — file-level pruning, so
    ingest cost scales with the touched partitions, not the corpus.  Same
    bit-equality contract as ``ingest_increment`` (recompute from raw).
    ``num_partitions`` must match the raw layout's.

    Interaction with ``expire_tiers``: raw is the source of truth, so the
    AFFECTED partitions are recomputed in full — any rows a prior expiry
    removed from them come back; re-apply the expiry after ingesting.
    Partitions OUTSIDE the increment keep their (possibly expired) content
    untouched: their ``|expire@``-suffixed fingerprints are treated as valid
    resume state, never purged (purging them would be permanent data loss —
    this path's recompute only covers the affected ``__part__=`` dirs).  A
    fingerprint mismatch outside the increment that is NOT an expiry suffix
    raises instead of purging."""
    from pytimetk_ray.exec import PART_COL, _add_part_arrow

    pids = affected_partitions(new_ds, key=key, num_partitions=num_partitions)
    tier_names = [TIER_NAMES.get(f, f) for f in tiers]
    # compatibility pre-check BEFORE mutating the raw store or manifests: a
    # store written under different params must fail loudly here, not after
    # the increment was appended
    for name, fp in _tier_fingerprints(
            input_fingerprint, tier_names, num_partitions, gap_fill).items():
        _committed_outside_increment(out_dir, name, fp, num_partitions, pids)
    tagged = new_ds.map_batches(
        _add_part_arrow, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
        fn_kwargs=dict(keys=[key], num_partitions=num_partitions, skip=None),
    )
    tagged.write_parquet(raw_dir, partition_cols=[PART_COL])

    mf.invalidate_partitions(out_dir, tier_names, pids)
    affected = read_partitioned_raw(
        raw_dir, pids=pids, columns=[key, date_column, value_column])
    return rollup_tiers(
        affected, out_dir=out_dir, key=key, date_column=date_column,
        value_column=value_column, tiers=tiers,
        num_partitions=num_partitions, input_fingerprint=input_fingerprint,
        resume=True, gap_fill=gap_fill, _increment_pids=pids,
    )


def expire_tiers(out_dir: str, cutoffs: dict[str, object],
                 *, max_parallel: int = 16) -> dict[str, pd.DataFrame]:
    """Retention expiry: drop buckets older than each tier's cutoff from the
    stored partitions, atomically rewriting parquet + manifest per
    partition.

    ``cutoffs``: {tier_name: timestamp-like} — rows with
    ``bucket_ts < cutoff`` are removed from that tier (tiers absent from the
    dict are untouched, so "raw 7d / 1m 90d / 1h 1y / 1d forever" policies
    are one call).  Each (tier, partition) rewrite is an independent Ray
    task (a per-FILE rewrite with its own manifest commit — the one shape
    the Dataset API doesn't express); the manifest's fingerprint gains an
    ``|expire@cutoff`` suffix so a later resume of the base job knows the
    stored content no longer matches the raw input and recomputes instead
    of silently resuming from expired data.  Returns the rewritten manifest
    frames per tier."""
    import json

    import ray

    @ray.remote
    def _expire_one(tier: str, pid: int, cutoff_ns: int, unit: str) -> dict:
        path = mf.partition_path(out_dir, tier, pid)
        with open(mf.manifest_path(out_dir, tier, pid)) as f:
            old = json.load(f)
        df = pd.read_parquet(path)
        cutoff = np.int64(cutoff_ns).astype("datetime64[ns]").astype(
            f"datetime64[{unit}]")
        kept = df[df["bucket_ts"].to_numpy() >= cutoff].reset_index(drop=True)
        if len(kept) == len(df):
            # no-op cutoff for this partition: keep the parquet AND the
            # fingerprint untouched so resume stays valid and the rewrite
            # I/O is skipped (an expiry that drops nothing must not
            # invalidate the whole store)
            return old
        fp = f"{old['input_fingerprint']}|expire@{cutoff_ns}"
        return mf.commit_partition(out_dir, tier, pid, kept, fp)

    results: dict[str, pd.DataFrame] = {}
    for tier, cutoff in cutoffs.items():
        pids = sorted(mf.committed_partitions(out_dir, tier))
        if not pids:
            results[tier] = pd.DataFrame()
            continue
        sample = pd.read_parquet(mf.partition_path(out_dir, tier, pids[0]),
                                 columns=["bucket_ts"])
        unit = _np_unit(sample["bucket_ts"].to_numpy())
        cutoff_ns = int(pd.Timestamp(cutoff).value)
        refs = []
        rows = []
        for pid in pids:
            refs.append(_expire_one.remote(tier, pid, cutoff_ns, unit))
            if len(refs) >= max_parallel:
                rows.extend(ray.get(refs))
                refs = []
        rows.extend(ray.get(refs))
        results[tier] = pd.DataFrame(rows)
    return results


TIER_RESOLUTION_NS = {"1m": 60_000_000_000, "1h": 3_600_000_000_000,
                      "1d": 86_400_000_000_000}


def query_tiers(out_dir: str, *, start=None, end=None,
                resolution: str | None = None,
                tiers_present: Sequence[str] = ("1m", "1h", "1d")) -> rd.Dataset:
    """The retention store's read path: pick the COARSEST stored tier whose
    grain still satisfies ``resolution`` (fewest rows to scan — the whole
    point of keeping rollup tiers), filter to [start, end) on bucket_ts with
    a vectorized predicate, and derive value_mean at read.

    ``resolution``: a tier name ('1m'/'1h'/'1d') or None (finest stored).
    A dashboard asking for daily numbers over a year reads the 1d tier
    (~365 rows/conv), never the raw or 1m data."""
    stored = [t for t in tiers_present
              if os.path.isdir(os.path.join(out_dir, f"tier={t}"))]
    if not stored:
        raise FileNotFoundError(f"no tier directories under {out_dir}")
    if resolution is None:
        tier = min(stored, key=lambda t: TIER_RESOLUTION_NS.get(t, 0))
    else:
        want = TIER_RESOLUTION_NS.get(resolution)
        if want is None:
            raise ValueError(f"unknown resolution {resolution!r}")
        ok = [t for t in stored if TIER_RESOLUTION_NS.get(t, 10**30) <= want]
        if not ok:
            raise ValueError(
                f"no stored tier is fine enough for resolution {resolution!r}"
                f" (stored: {stored})")
        tier = max(ok, key=lambda t: TIER_RESOLUTION_NS[t])
    ds = read_tier(out_dir, tier)
    if start is not None or end is not None:
        lo = pd.Timestamp(start) if start is not None else None
        hi = pd.Timestamp(end) if end is not None else None

        def clip(batch: pd.DataFrame) -> pd.DataFrame:
            ts = batch["bucket_ts"]
            mask = pd.Series(True, index=batch.index)
            if lo is not None:
                mask &= ts >= lo
            if hi is not None:
                mask &= ts < hi
            return batch[mask]

        ds = ds.map_batches(clip, batch_format="pandas")
    return ds


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
