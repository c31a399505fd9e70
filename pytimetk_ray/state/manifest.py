"""Per-partition lineage manifests: checkpointed tier outputs + resume.

Same spirit as the reference FeatureStore's sha256 cache-key short-circuit
(reference: src/pytimetk/feature_store/store.py:99-103,381-398 — a build is
skipped when the fingerprint matches), re-designed for partitioned Parquet:

- each tier writes ``{out}/tier={tier}/part={pid:05d}.parquet`` atomically
  (temp file + ``os.replace``), then commits
  ``{out}/_manifests/{tier}/part={pid:05d}.json`` with
  ``{partition_id, tier, input_fingerprint, row_count, content_hash,
  status="committed"}``
- resume = read the manifest dir, skip partitions whose manifest is committed
  AND whose input fingerprint matches (a changed input invalidates the
  checkpoint)
- the manifest is written LAST, so a crash mid-write leaves an uncommitted
  partition that simply recomputes — idempotent because the data path is
  deterministic for a given (partition, input fingerprint)

Failed runs therefore skip finished partitions; nothing is ever one giant
file (BASELINE.md resume criterion).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable

import pandas as pd


def _manifest_dir(out_dir: str, tier: str) -> str:
    return os.path.join(out_dir, "_manifests", tier)


def partition_path(out_dir: str, tier: str, pid: int) -> str:
    return os.path.join(out_dir, f"tier={tier}", f"part={pid:05d}.parquet")


def manifest_path(out_dir: str, tier: str, pid: int) -> str:
    return os.path.join(_manifest_dir(out_dir, tier), f"part={pid:05d}.json")


def content_hash(df: pd.DataFrame) -> str:
    """Order-insensitive content hash of a partition's rows."""
    h = pd.util.hash_pandas_object(
        df.reset_index(drop=True), index=False
    ).to_numpy()
    return hashlib.sha256(
        int(pd.Series(h).sum() % (2**64)).to_bytes(8, "little") + len(df).to_bytes(8, "little")
    ).hexdigest()


def committed_partitions(out_dir: str, tier: str, input_fingerprint: str | None = None) -> set[int]:
    """Partition ids already committed (optionally only those matching the
    input fingerprint)."""
    d = _manifest_dir(out_dir, tier)
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write -> recompute
        if m.get("status") != "committed":
            continue
        if input_fingerprint is not None and m.get("input_fingerprint") != input_fingerprint:
            continue
        done.add(int(m["partition_id"]))
    return done


def partition_fingerprints(out_dir: str, tier: str) -> dict[int, str]:
    """{pid: input_fingerprint} of every committed manifest in a tier
    (torn/uncommitted manifests are skipped, same as committed_partitions)."""
    d = _manifest_dir(out_dir, tier)
    if not os.path.isdir(d):
        return {}
    out: dict[int, str] = {}
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("status") != "committed":
            continue
        out[int(m["partition_id"])] = m.get("input_fingerprint", "")
    return out


def invalidate_partitions(out_dir: str, tiers: Iterable[str],
                          pids: Iterable[int]) -> int:
    """Drop the manifests of the given (tier, partition) pairs so a resumed
    run recomputes them (incremental-ingest invalidation).  The parquet is
    left in place — it is overwritten atomically on recompute, and an
    unmanifested partition is never trusted by resume.  Returns the number
    of manifests removed."""
    n = 0
    pids = list(pids)
    for tier in tiers:
        for pid in pids:
            p = manifest_path(out_dir, tier, pid)
            if os.path.exists(p):
                os.remove(p)
                n += 1
    return n


def purge_stale_partitions(out_dir: str, tier: str, current_fingerprint: str,
                           num_partitions: int) -> int:
    """Remove (data + manifest of) partitions that do NOT belong to the
    current run's layout: manifest fingerprint differs (params/inputs
    changed), or pid >= num_partitions (an old larger layout — those pids
    would never be overwritten and the glob-based tier readers would
    double-read them), or a data file with no manifest and an out-of-range
    pid.  In-range unmanifested files are left alone — they are overwritten
    atomically on recompute.  Returns the number of partitions purged."""
    n = 0
    tier_dir = os.path.join(out_dir, f"tier={tier}")
    mdir = _manifest_dir(out_dir, tier)
    seen_pids = set()
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if not name.endswith(".json"):
                continue
            p = os.path.join(mdir, name)
            try:
                with open(p) as f:
                    m = json.load(f)
                pid = int(m["partition_id"])
            except (json.JSONDecodeError, OSError, KeyError, ValueError):
                os.remove(p)
                continue
            seen_pids.add(pid)
            if m.get("input_fingerprint") != current_fingerprint or pid >= num_partitions:
                os.remove(p)
                data = partition_path(out_dir, tier, pid)
                if os.path.exists(data):
                    os.remove(data)
                n += 1
    if os.path.isdir(tier_dir):
        for name in os.listdir(tier_dir):
            if not (name.startswith("part=") and name.endswith(".parquet")):
                continue
            try:
                pid = int(name[len("part="):-len(".parquet")])
            except ValueError:
                continue
            if pid >= num_partitions:
                os.remove(os.path.join(tier_dir, name))
                if pid not in seen_pids:
                    n += 1
    return n


def commit_partition(
    out_dir: str,
    tier: str,
    pid: int,
    df: pd.DataFrame,
    input_fingerprint: str,
) -> dict:
    """Atomically write one partition's parquet + manifest; returns the
    manifest row."""
    data_path = partition_path(out_dir, tier, pid)
    os.makedirs(os.path.dirname(data_path), exist_ok=True)
    os.makedirs(_manifest_dir(out_dir, tier), exist_ok=True)
    tmp = data_path + ".tmp"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, data_path)
    manifest = {
        "partition_id": pid,
        "tier": tier,
        "input_fingerprint": input_fingerprint,
        "row_count": int(len(df)),
        "content_hash": content_hash(df),
        "status": "committed",
    }
    mtmp = manifest_path(out_dir, tier, pid) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, manifest_path(out_dir, tier, pid))
    return manifest


def fingerprint_inputs(paths: Iterable[str], params: dict | None = None) -> str:
    """Fingerprint = sha256 over (sorted input file names+sizes+mtimes,
    params) — cheap, deterministic, invalidates on input change."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:{int(st.st_mtime)}".encode())
    if params:
        h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()
