"""Retention-engine extensions: incremental ingest + tier expiry."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.pipelines.tiers import (
    affected_partitions,
    expire_tiers,
    ingest_increment,
    read_tier,
    rollup_tiers,
)
from pytimetk_ray.sources.transcripts import add_value_column, make_transcripts
from pytimetk_ray.state import manifest as mf

P = 8
TIERS = ("1min", "1h")


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return add_value_column(make_transcripts(60, seed=7))


def _tier_files(out_dir, tier):
    return sorted(glob.glob(os.path.join(out_dir, f"tier={tier}", "*.parquet")))


def _read_all(out_dir, tier):
    return pd.concat([pd.read_parquet(f) for f in _tier_files(out_dir, tier)],
                     ignore_index=True).sort_values(
        ["conv_id", "bucket_ts"], ignore_index=True)


def _split(corpus):
    cut = corpus["ts"].quantile(0.7)
    return corpus[corpus.ts < cut], corpus[corpus.ts >= cut]


def _rollup(df, out_dir, fp):
    return rollup_tiers(rd.from_pandas(df), out_dir=out_dir, key="conv_id",
                        date_column="ts", value_column="value", tiers=TIERS,
                        num_partitions=P, input_fingerprint=fp, resume=True)


def test_ingest_bit_equal_to_full_recompute(corpus, tmp_path):
    base, inc = _split(corpus)
    full_dir = str(tmp_path / "full")
    inc_dir = str(tmp_path / "inc")
    _rollup(corpus, full_dir, "v1")
    _rollup(base, inc_dir, "v1")

    # record mtimes to prove untouched partitions are NOT rewritten
    pids_touched = affected_partitions(rd.from_pandas(inc), key="conv_id",
                                       num_partitions=P)
    assert 0 < len(pids_touched) <= P
    before = {f: os.path.getmtime(f) for f in _tier_files(inc_dir, "1m")}

    ingest_increment(rd.from_pandas(base), rd.from_pandas(inc),
                     out_dir=inc_dir, key="conv_id", date_column="ts",
                     value_column="value", tiers=TIERS, num_partitions=P,
                     input_fingerprint="v1")

    for tier in ("1m", "1h"):
        a, b = _read_all(full_dir, tier), _read_all(inc_dir, tier)
        assert len(a) == len(b)
        np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy(np.float64).view(np.uint64),
                b[col].to_numpy(np.float64).view(np.uint64), err_msg=col)
        np.testing.assert_array_equal(a["value_count"], b["value_count"])

    untouched = set(range(P)) - pids_touched
    for pid in untouched:
        f = mf.partition_path(inc_dir, "1m", pid)
        assert os.path.getmtime(f) == before[f], "untouched partition rewritten"


def test_ingest_is_idempotent(corpus, tmp_path):
    base, inc = _split(corpus)
    d = str(tmp_path / "t")
    _rollup(base, d, "v1")
    ingest_increment(rd.from_pandas(base), rd.from_pandas(inc), out_dir=d,
                     key="conv_id", date_column="ts", value_column="value",
                     tiers=TIERS, num_partitions=P, input_fingerprint="v1")
    first = _read_all(d, "1h")
    # re-ingesting the same increment over the same union is a no-op result
    ingest_increment(rd.from_pandas(base), rd.from_pandas(inc), out_dir=d,
                     key="conv_id", date_column="ts", value_column="value",
                     tiers=TIERS, num_partitions=P, input_fingerprint="v1")
    pd.testing.assert_frame_equal(first, _read_all(d, "1h"))


def test_partitioned_raw_ingest_file_pruning(corpus, tmp_path):
    from pytimetk_ray.pipelines.tiers import (
        ingest_increment_partitioned,
        read_partitioned_raw,
        write_partitioned_raw,
    )

    base, inc = _split(corpus)
    raw_dir = str(tmp_path / "raw")
    out_dir = str(tmp_path / "tiers")
    full_dir = str(tmp_path / "full")
    write_partitioned_raw(rd.from_pandas(base), raw_dir, key="conv_id",
                          num_partitions=P)
    # initial rollup from the partitioned raw store
    src = read_partitioned_raw(raw_dir, columns=["conv_id", "ts", "value"])
    rollup_tiers(src, out_dir=out_dir, key="conv_id", date_column="ts",
                 value_column="value", tiers=TIERS, num_partitions=P,
                 input_fingerprint="v1")
    before = {f: os.path.getmtime(f) for f in _tier_files(out_dir, "1m")}

    ingest_increment_partitioned(
        raw_dir, rd.from_pandas(inc), out_dir=out_dir, key="conv_id",
        date_column="ts", value_column="value", tiers=TIERS,
        num_partitions=P, input_fingerprint="v1")

    # bit-equal to a full recompute over base+inc
    _rollup(corpus, full_dir, "v1")
    for tier in ("1m", "1h"):
        a, b = _read_all(full_dir, tier), _read_all(out_dir, tier)
        assert len(a) == len(b)
        np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy(np.float64).view(np.uint64),
                b[col].to_numpy(np.float64).view(np.uint64), err_msg=col)

    # the raw store absorbed the increment (complete source of truth)
    total = read_partitioned_raw(raw_dir, columns=["conv_id"]).count()
    assert total == len(corpus)
    # untouched tier partitions were never rewritten
    touched = affected_partitions(rd.from_pandas(inc), key="conv_id",
                                  num_partitions=P)
    for pid in set(range(P)) - touched:
        f = mf.partition_path(out_dir, "1m", pid)
        assert os.path.getmtime(f) == before[f]


def test_expire_drops_old_buckets_and_updates_manifests(corpus, tmp_path):
    d = str(tmp_path / "t")
    _rollup(corpus, d, "v1")
    all_1m = _read_all(d, "1m")
    cutoff = pd.Timestamp(all_1m["bucket_ts"].quantile(0.5)).ceil("1min")
    res = expire_tiers(d, {"1m": cutoff})
    kept = _read_all(d, "1m")
    ref = all_1m[all_1m["bucket_ts"] >= cutoff].reset_index(drop=True)
    pd.testing.assert_frame_equal(kept, ref)
    # 1h tier untouched
    assert len(_read_all(d, "1h")) > 0
    # manifests advanced: fingerprint carries the expiry, row counts match
    assert res["1m"]["row_count"].sum() == len(ref)
    for pid in mf.committed_partitions(d, "1m"):
        with open(mf.manifest_path(d, "1m", pid)) as f:
            m = json.load(f)
        assert "|expire@" in m["input_fingerprint"]
    # read_tier still works over the expired store
    assert read_tier(d, "1m").count() == len(ref)


def test_partition_count_change_self_invalidates(corpus, tmp_path):
    # resuming with a different num_partitions must NOT mix layouts: the
    # fingerprint embeds P, so nothing is trusted and the store recomputes
    d = str(tmp_path / "t")
    _rollup(corpus, d, "v1")  # P = 8
    full = _read_all(d, "1m")
    res = rollup_tiers(rd.from_pandas(corpus), out_dir=d, key="conv_id",
                       date_column="ts", value_column="value", tiers=TIERS,
                       num_partitions=4, input_fingerprint="v1", resume=True)
    assert (res["1m"]["input_fingerprint"].str.contains(r"\|P4\|")).all()
    # stale P=8 partitions are PURGED (files + manifests) so glob-based
    # readers see exactly the new layout — no duplicates, full coverage
    assert len(_tier_files(d, "1m")) == 4
    pd.testing.assert_frame_equal(_read_all(d, "1m"), full)
    assert mf.committed_partitions(d, "1m") == {0, 1, 2, 3}


def test_query_tiers_picks_coarsest_sufficient(corpus, tmp_path):
    from pytimetk_ray.pipelines.tiers import query_tiers

    d = str(tmp_path / "t")
    _rollup(corpus, d, "v1")  # tiers 1m + 1h
    all_1h = _read_all(d, "1h")
    # resolution='1d' has no stored tier coarse... 1h <= 1d so 1h serves it
    got = query_tiers(d, resolution="1d").to_pandas()
    assert len(got) == len(all_1h)
    assert "value_mean" in got.columns
    # finest default = 1m
    assert query_tiers(d).count() == len(_read_all(d, "1m"))
    # range clip on the coarse tier
    cut = pd.Timestamp(all_1h["bucket_ts"].quantile(0.5)).ceil("1h")
    got2 = query_tiers(d, start=cut, resolution="1h").to_pandas()
    assert len(got2) == (all_1h["bucket_ts"] >= cut).sum()
    with pytest.raises(ValueError):
        query_tiers(d, resolution="bogus")


def test_ingest_crash_between_invalidate_and_recompute(corpus, tmp_path):
    # simulate a crash AFTER manifests were invalidated but BEFORE the
    # recompute ran: the store has stale parquet without manifests; simply
    # re-running the ingest must produce the full correct result
    base, inc = _split(corpus)
    d = str(tmp_path / "t")
    full_dir = str(tmp_path / "full")
    _rollup(base, d, "v1")
    pids = affected_partitions(rd.from_pandas(inc), key="conv_id",
                               num_partitions=P)
    # the "crash": invalidation happened, recompute never ran
    mf.invalidate_partitions(d, ["1m", "1h"], pids)
    # retry the whole ingest (idempotent by construction)
    ingest_increment(rd.from_pandas(base), rd.from_pandas(inc), out_dir=d,
                     key="conv_id", date_column="ts", value_column="value",
                     tiers=TIERS, num_partitions=P, input_fingerprint="v1")
    _rollup(corpus, full_dir, "v1")
    for tier in ("1m", "1h"):
        a, b = _read_all(full_dir, tier), _read_all(d, tier)
        assert len(a) == len(b)
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy(np.float64).view(np.uint64),
                b[col].to_numpy(np.float64).view(np.uint64), err_msg=col)


def test_expire_then_partitioned_ingest_preserves_unaffected(corpus, tmp_path):
    # regression: expire suffixes every partition's fingerprint; a later
    # partitioned ingest recomputes ONLY the affected __part__ dirs, so the
    # resume purge must NOT delete fingerprint-mismatched partitions outside
    # the increment (they would never be recomputed -> permanent data loss)
    from pytimetk_ray.pipelines.tiers import (
        ingest_increment_partitioned,
        read_partitioned_raw,
        write_partitioned_raw,
    )

    # conversation-scoped increment so only a few partitions are touched
    convs = sorted(corpus["conv_id"].unique())[:3]
    cut = corpus["ts"].quantile(0.7)
    inc_mask = corpus["conv_id"].isin(convs) & (corpus["ts"] >= cut)
    base, inc = corpus[~inc_mask], corpus[inc_mask]
    assert len(inc) > 0
    raw_dir = str(tmp_path / "raw")
    d = str(tmp_path / "tiers")
    write_partitioned_raw(rd.from_pandas(base), raw_dir, key="conv_id",
                          num_partitions=P)
    src = read_partitioned_raw(raw_dir, columns=["conv_id", "ts", "value"])
    rollup_tiers(src, out_dir=d, key="conv_id", date_column="ts",
                 value_column="value", tiers=TIERS, num_partitions=P,
                 input_fingerprint="v1")
    all_1m = _read_all(d, "1m")
    cutoff = pd.Timestamp(all_1m["bucket_ts"].quantile(0.3)).ceil("1min")
    expire_tiers(d, {"1m": cutoff})
    expired_by_pid = {pid: pd.read_parquet(mf.partition_path(d, "1m", pid))
                      for pid in range(P)}

    touched = affected_partitions(rd.from_pandas(inc), key="conv_id",
                                  num_partitions=P)
    assert touched != set(range(P)), "fixture must leave untouched partitions"
    ingest_increment_partitioned(
        raw_dir, rd.from_pandas(inc), out_dir=d, key="conv_id",
        date_column="ts", value_column="value", tiers=TIERS,
        num_partitions=P, input_fingerprint="v1")

    # every partition file still exists — nothing was purged
    for pid in range(P):
        assert os.path.exists(mf.partition_path(d, "1m", pid)), pid
    # untouched partitions keep their EXPIRED content byte-for-byte
    for pid in set(range(P)) - touched:
        got = pd.read_parquet(mf.partition_path(d, "1m", pid))
        pd.testing.assert_frame_equal(got, expired_by_pid[pid])
    # affected partitions were recomputed from raw (expiry undone there —
    # documented: raw is the source of truth, re-apply expiry after ingest)
    full_dir = str(tmp_path / "full")
    _rollup(corpus, full_dir, "v1")
    for pid in touched:
        # order among groups within a partition is unspecified -> sort
        a = pd.read_parquet(mf.partition_path(full_dir, "1m", pid)).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        b = pd.read_parquet(mf.partition_path(d, "1m", pid)).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
    # a second expiry restores the uniform retention state
    expire_tiers(d, {"1m": cutoff})
    kept = _read_all(d, "1m")
    assert (kept["bucket_ts"] >= cutoff).all()


def test_partitioned_ingest_raises_on_incompatible_store(corpus, tmp_path):
    # a fingerprint mismatch outside the increment that is NOT an expiry
    # (e.g. the store was built under a different input fingerprint) must
    # raise, not purge
    from pytimetk_ray.pipelines.tiers import (
        ingest_increment_partitioned,
        read_partitioned_raw,
        write_partitioned_raw,
    )

    convs = sorted(corpus["conv_id"].unique())[:3]
    inc_mask = corpus["conv_id"].isin(convs) & (corpus["ts"] >= corpus["ts"].quantile(0.7))
    base, inc = corpus[~inc_mask], corpus[inc_mask]
    raw_dir = str(tmp_path / "raw")
    d = str(tmp_path / "tiers")
    write_partitioned_raw(rd.from_pandas(base), raw_dir, key="conv_id",
                          num_partitions=P)
    src = read_partitioned_raw(raw_dir, columns=["conv_id", "ts", "value"])
    rollup_tiers(src, out_dir=d, key="conv_id", date_column="ts",
                 value_column="value", tiers=TIERS, num_partitions=P,
                 input_fingerprint="OTHER")
    with pytest.raises(ValueError, match="different params"):
        ingest_increment_partitioned(
            raw_dir, rd.from_pandas(inc), out_dir=d, key="conv_id",
            date_column="ts", value_column="value", tiers=TIERS,
            num_partitions=P, input_fingerprint="v1")


def test_expired_store_does_not_resume_as_committed(corpus, tmp_path):
    d = str(tmp_path / "t")
    _rollup(corpus, d, "v1")
    full = _read_all(d, "1m")
    cutoff = pd.Timestamp(full["bucket_ts"].quantile(0.5)).ceil("1min")
    expire_tiers(d, {"1m": cutoff, "1h": cutoff})
    # resume of the ORIGINAL job sees mismatched fingerprints -> recomputes
    _rollup(corpus, d, "v1")
    pd.testing.assert_frame_equal(_read_all(d, "1m"), full)
