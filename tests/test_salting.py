"""Hot-conversation salting: bit-equality with the unsalted cascade and
actual spreading of the hot conversation across partitions."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data as rd

from pytimetk_ray.pipelines.tiers import rollup_tiers
from pytimetk_ray.sources.transcripts import add_value_column, make_transcripts


def read_tier_pandas(out_dir, tier):
    files = sorted(glob.glob(os.path.join(out_dir, f"tier={tier}", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def test_salted_cascade_bit_equal(tmp_path):
    # conv000000 is hot (hot_conv_factor multiplies its turn count)
    corpus = add_value_column(make_transcripts(40, seed=13, hot_conv_factor=100))
    base, salted = str(tmp_path / "base"), str(tmp_path / "salted")
    rollup_tiers(rd.from_pandas(corpus), out_dir=base, num_partitions=8,
                 input_fingerprint="b", resume=False)
    rollup_tiers(rd.from_pandas(corpus), out_dir=salted, num_partitions=8,
                 input_fingerprint="s", resume=False, salt=4)

    for tier in ("1m", "1h", "1d"):
        a = read_tier_pandas(base, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        b = read_tier_pandas(salted, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        assert len(a) == len(b), tier
        np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
        np.testing.assert_array_equal(
            a["bucket_ts"].to_numpy(), b["bucket_ts"].to_numpy())
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy().view(np.uint64), b[col].to_numpy().view(np.uint64),
                err_msg=f"{tier}:{col}")
        np.testing.assert_array_equal(a["value_count"], b["value_count"])

    # the hot conversation's tier-1 rows actually SPREAD across partitions
    hot_parts = 0
    for f in glob.glob(os.path.join(salted, "tier=1m", "*.parquet")):
        if (pd.read_parquet(f, columns=["conv_id"])["conv_id"] == "conv000000").any():
            hot_parts += 1
    assert hot_parts >= 2, "hot conv should span multiple salted partitions"


def test_salted_resume(tmp_path):
    corpus = add_value_column(make_transcripts(20, seed=3))
    out = str(tmp_path / "t")
    r1 = rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4,
                      input_fingerprint="x", salt=3)
    before = read_tier_pandas(out, "1d")
    r2 = rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4,
                      input_fingerprint="x", salt=3)
    after = read_tier_pandas(out, "1d")
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "bucket_ts"], ignore_index=True),
        after.sort_values(["conv_id", "bucket_ts"], ignore_index=True),
    )
    assert set(r1) == set(r2) == {"1m", "1h", "1d"}


def test_salted_gap_fill_bit_equal(tmp_path):
    """gap_fill + salt: stage B regathers whole conversations, pads, and the
    dense cascade is bit-equal to the unsalted gap-filled cascade."""
    corpus = add_value_column(make_transcripts(30, seed=5, hot_conv_factor=50))
    base, salted = str(tmp_path / "gbase"), str(tmp_path / "gsalted")
    rollup_tiers(rd.from_pandas(corpus), out_dir=base, num_partitions=8,
                 input_fingerprint="gb", resume=False, gap_fill=True)
    rollup_tiers(rd.from_pandas(corpus), out_dir=salted, num_partitions=8,
                 input_fingerprint="gs", resume=False, gap_fill=True, salt=4)

    for tier in ("1m", "1h", "1d"):
        a = read_tier_pandas(base, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        b = read_tier_pandas(salted, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        assert len(a) == len(b), tier
        np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
        np.testing.assert_array_equal(
            a["bucket_ts"].to_numpy(), b["bucket_ts"].to_numpy())
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy(np.float64).view(np.uint64),
                b[col].to_numpy(np.float64).view(np.uint64),
                err_msg=f"{tier}:{col}")
        np.testing.assert_array_equal(a["value_count"], b["value_count"])

    # tier-1 grid is dense per conversation
    t = read_tier_pandas(salted, "1m").sort_values(["conv_id", "bucket_ts"])
    d = t.groupby("conv_id")["bucket_ts"].diff().dropna()
    assert (d == pd.Timedelta("1min")).all()
    # upper tiers keep the dense grid too (gap buckets carried upward)
    th = read_tier_pandas(salted, "1h").sort_values(["conv_id", "bucket_ts"])
    dh = th.groupby("conv_id")["bucket_ts"].diff().dropna()
    assert (dh == pd.Timedelta("1h")).all()
    # gap rows: zero sum/count, NaN min/max
    gaps = t[t["value_count"] == 0]
    assert (gaps["value_sum"] == 0).all()
    assert gaps["value_min"].isna().all() and gaps["value_max"].isna().all()


def test_salted_ingest_bit_equal_and_pruned(tmp_path):
    """Incremental ingest into a salted store: stage-A invalidation by the
    (conv, bucket-hash) chain, stage-B by conv; result bit-equal to a full
    salted recompute; untouched stage-A partitions never rewritten."""
    from pytimetk_ray.pipelines.tiers import (
        affected_partitions_salted,
        ingest_increment_salted,
    )
    from pytimetk_ray.state import manifest as mf

    corpus = add_value_column(make_transcripts(40, seed=13, hot_conv_factor=100))
    # conversation-scoped late increment (few touched partitions)
    convs = sorted(corpus["conv_id"].unique())[:3]
    cut = corpus["ts"].quantile(0.8)
    inc_mask = corpus["conv_id"].isin(convs) & (corpus["ts"] >= cut)
    base, inc = corpus[~inc_mask], corpus[inc_mask]
    assert len(inc) > 0

    P, S = 8, 4
    inc_dir, full_dir = str(tmp_path / "inc"), str(tmp_path / "full")
    rollup_tiers(rd.from_pandas(base), out_dir=inc_dir, num_partitions=P,
                 input_fingerprint="v1", salt=S)
    pids_a = affected_partitions_salted(
        rd.from_pandas(inc), salt=S, num_partitions=P)
    assert 0 < len(pids_a) < P, pids_a
    before = {pid: os.path.getmtime(mf.partition_path(inc_dir, "1m", pid))
              for pid in range(P)
              if os.path.exists(mf.partition_path(inc_dir, "1m", pid))}

    ingest_increment_salted(
        rd.from_pandas(base), rd.from_pandas(inc), out_dir=inc_dir,
        num_partitions=P, input_fingerprint="v1", salt=S)
    rollup_tiers(rd.from_pandas(corpus), out_dir=full_dir, num_partitions=P,
                 input_fingerprint="v1", salt=S)

    for tier in ("1m", "1h", "1d"):
        a = read_tier_pandas(full_dir, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        b = read_tier_pandas(inc_dir, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        assert len(a) == len(b), tier
        np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
        for col in ("value_sum", "value_min", "value_max"):
            np.testing.assert_array_equal(
                a[col].to_numpy(np.float64).view(np.uint64),
                b[col].to_numpy(np.float64).view(np.uint64),
                err_msg=f"{tier}:{col}")
        np.testing.assert_array_equal(a["value_count"], b["value_count"])

    # untouched stage-A (1m) partitions were never rewritten
    for pid in set(before) - pids_a:
        assert os.path.getmtime(
            mf.partition_path(inc_dir, "1m", pid)) == before[pid], pid


def test_rolling_hot_split_matches_unsplit(tmp_path):
    """split_rows: a hot conversation processed as overlapped contiguous
    ranges produces the same rolling windows as the whole-group path."""
    corpus = add_value_column(make_transcripts(10, seed=21, hot_conv_factor=200))
    import pytimetk_ray as tk

    base = tk.augment_rolling(
        rd.from_pandas(corpus), ["conv_id"], ["turn_idx"], "value",
        window=8, window_func=["mean", "sum", "min", "max"], num_partitions=4,
    ).to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    split = tk.augment_rolling(
        rd.from_pandas(corpus), ["conv_id"], ["turn_idx"], "value",
        window=8, window_func=["mean", "sum", "min", "max"], num_partitions=4,
        split_rows=64,
    ).to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert len(base) == len(split) == len(corpus)
    # min/max/window membership identical; sum/mean allclose (accumulation
    # history differs across the split boundary by design)
    for c in ("value_rolling_min_win_8", "value_rolling_max_win_8"):
        np.testing.assert_array_equal(base[c].to_numpy(), split[c].to_numpy())
    for c in ("value_rolling_mean_win_8", "value_rolling_sum_win_8"):
        np.testing.assert_allclose(base[c].to_numpy(), split[c].to_numpy(),
                                   rtol=1e-9, equal_nan=True)
    # and the hot conversation really did split across range ids
    hot_rows = int((corpus["conv_id"] == "conv000000").sum())
    assert hot_rows > 64


def test_lags_hot_split_exact(tmp_path):
    """split_rows for lags/diffs is EXACT (shifts copy values)."""
    corpus = add_value_column(make_transcripts(10, seed=22, hot_conv_factor=150))
    import pytimetk_ray as tk

    base = tk.augment_lags(
        rd.from_pandas(corpus), ["conv_id"], ["turn_idx"], "value",
        lags=3, num_partitions=4,
    ).to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    split = tk.augment_lags(
        rd.from_pandas(corpus), ["conv_id"], ["turn_idx"], "value",
        lags=3, num_partitions=4, split_rows=50,
    ).to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert len(base) == len(split) == len(corpus)
    for k in (1, 2, 3):
        c = f"value_lag_{k}"
        np.testing.assert_array_equal(
            base[c].to_numpy(np.float64).view(np.uint64),
            split[c].to_numpy(np.float64).view(np.uint64))
