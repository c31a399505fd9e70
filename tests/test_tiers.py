"""Tier cascade: bit-equality vs the pandas/pytimetk-semantics oracle,
checkpoint/resume, codec round-trip, text byte-identity."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pytimetk_ray.pipelines.tiers import oracle_rollup, read_tier, rollup_tiers
from pytimetk_ray.sources.transcripts import add_value_column, make_transcripts
from pytimetk_ray.stages.tier_encoder import TierEncoder, decode_chunks
from pytimetk_ray.state import manifest as mf


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return add_value_column(make_transcripts(60, seed=7))


def assert_tier_bit_equal(tier_df: pd.DataFrame, oracle: pd.DataFrame):
    a = tier_df.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    b = oracle.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["conv_id"], b["conv_id"])
    np.testing.assert_array_equal(
        a["bucket_ts"].to_numpy().astype("datetime64[us]"),
        b["bucket_ts"].to_numpy().astype("datetime64[us]"),
    )
    # BIT equality on the float aggregates (view as uint64)
    for col in ("value_sum", "value_min", "value_max"):
        np.testing.assert_array_equal(
            a[col].to_numpy(np.float64).view(np.uint64),
            b[col].to_numpy(np.float64).view(np.uint64),
            err_msg=col,
        )
    np.testing.assert_array_equal(a["value_count"], b["value_count"])


def read_tier_pandas(out_dir, tier):
    files = sorted(glob.glob(os.path.join(out_dir, f"tier={tier}", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def test_cascade_bit_equal_and_resume(corpus, tmp_path):
    out = str(tmp_path / "tiers")
    ds = rd.from_pandas(corpus)
    res = rollup_tiers(ds, out_dir=out, num_partitions=8, input_fingerprint="t1")
    assert set(res) == {"1m", "1h", "1d"}
    assert all((m["status"] == "committed").all() for m in res.values())

    t1m = read_tier_pandas(out, "1m")
    oracle_1m = oracle_rollup(corpus, freq="1min")
    assert_tier_bit_equal(t1m, oracle_1m)

    # cascaded oracle: reference summarize_by_time applied tier-over-tier
    o1h = (
        oracle_1m.set_index("bucket_ts").groupby("conv_id")
        .resample("1h")
        .agg(value_sum=("value_sum", "sum"), value_count=("value_count", "sum"),
             value_min=("value_min", "min"), value_max=("value_max", "max"))
        .reset_index()
    )
    o1h = o1h[o1h["value_count"] > 0].reset_index(drop=True)
    assert_tier_bit_equal(read_tier_pandas(out, "1h"), o1h)

    o1d = (
        o1h.set_index("bucket_ts").groupby("conv_id")
        .resample("1D")
        .agg(value_sum=("value_sum", "sum"), value_count=("value_count", "sum"),
             value_min=("value_min", "min"), value_max=("value_max", "max"))
        .reset_index()
    )
    o1d = o1d[o1d["value_count"] > 0].reset_index(drop=True)
    assert_tier_bit_equal(read_tier_pandas(out, "1d"), o1d)

    # --- resume: delete one partition's data+manifest, re-run, identical ---
    victim_data = sorted(glob.glob(os.path.join(out, "tier=1h", "*.parquet")))[0]
    pid = int(os.path.basename(victim_data).split("=")[1].split(".")[0])
    os.remove(victim_data)
    os.remove(mf.manifest_path(out, "1h", pid))
    before = read_tier_pandas(out, "1d")
    committed_before = mf.committed_partitions(out, "1m", "t1|raw->1m")
    res2 = rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=8, input_fingerprint="t1")
    assert mf.committed_partitions(out, "1m", "t1|raw->1m") == committed_before  # 1m untouched
    assert_tier_bit_equal(read_tier_pandas(out, "1h"), o1h)  # recomputed partition identical
    assert_tier_bit_equal(read_tier_pandas(out, "1d"), before)
    assert (res2["1h"]["status"] == "committed").all()


def test_read_tier_mean(corpus, tmp_path):
    out = str(tmp_path / "tiers2")
    rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4, input_fingerprint="t2")
    df = read_tier(out, "1h").to_pandas()
    np.testing.assert_allclose(df["value_mean"], df["value_sum"] / df["value_count"])


def test_gap_fill_tier(corpus, tmp_path):
    out = str(tmp_path / "tiers3")
    rollup_tiers(
        rd.from_pandas(corpus), out_dir=out, num_partitions=4,
        input_fingerprint="t3", gap_fill=True, tiers=["1h"],
    )
    t = read_tier_pandas(out, "1h").sort_values(["conv_id", "bucket_ts"])
    # dense grid: hourly diffs within each conv are exactly 1h
    d = t.groupby("conv_id")["bucket_ts"].diff().dropna()
    assert (d == pd.Timedelta("1h")).all()
    # gap rows are zero-filled sums/counts
    assert (t[t["value_count"] == 0]["value_sum"] == 0).all()


def test_gap_fill_constant_count_group(tmp_path):
    """Regression (ADVICE r1): a conversation with EXACTLY one event per
    occupied minute bucket has value_count constant (=1) within the group;
    pad_by_time's constant-column ffill would copy count=1 (and min/max)
    onto gap rows.  Gap rows are identified here from the GRID (buckets
    absent pre-pad), not from count==0, so an ffill leak cannot hide."""
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:05",
         "2024-01-01 00:07"]
    ).astype("datetime64[us]")
    df = pd.DataFrame({
        "conv_id": 1, "ts": ts, "value": [2.0, 3.0, 5.0, 7.0],
    })
    out = str(tmp_path / "tiers_cc")
    rollup_tiers(rd.from_pandas(df), out_dir=out, num_partitions=1,
                 input_fingerprint="cc", gap_fill=True, tiers=["1min", "1h"])
    t = read_tier_pandas(out, "1m").sort_values("bucket_ts", ignore_index=True)
    occupied = set(ts)  # every event is its own minute bucket
    gap = ~t["bucket_ts"].isin(occupied)
    assert gap.sum() == 4  # minutes 2,3,4,6
    assert (t.loc[gap, "value_sum"] == 0).all()
    assert (t.loc[gap, "value_count"] == 0).all()
    assert t.loc[gap, "value_min"].isna().all()
    assert t.loc[gap, "value_max"].isna().all()
    assert (t.loc[~gap, "value_count"] == 1).all()
    # upper tier: counts NOT inflated by gap rows, mean well-defined
    h = read_tier_pandas(out, "1h")
    assert h["value_count"].tolist() == [4]
    assert h["value_sum"].tolist() == [17.0]


def test_encoder_roundtrip_bit_equal(corpus, tmp_path):
    out = str(tmp_path / "tiers4")
    rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4, input_fingerprint="t4")
    t1m = read_tier_pandas(out, "1m")
    # small chunk size forces multi-chunk streams (batch-split survival)
    enc = TierEncoder("1m", max_points_per_chunk=16)
    chunks = enc(t1m)
    assert enc.n_points_encoded == len(t1m)
    dec = decode_chunks(chunks)
    a = t1m.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    b = dec.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    np.testing.assert_array_equal(
        a["bucket_ts"].to_numpy().astype("datetime64[us]"),
        b["bucket_ts"].to_numpy().astype("datetime64[us]"),
    )
    for col in ("value_sum", "value_count", "value_min", "value_max"):
        np.testing.assert_array_equal(
            a[col].to_numpy(np.float64).view(np.uint64),
            b[col].to_numpy(np.float64).view(np.uint64),
            err_msg=col,
        )
    # compression does compress the regular (grid-aligned) timestamp stream
    assert chunks["ts_blob"].map(len).sum() < 8 * len(t1m)
    # count column is near-constant -> Gorilla compresses well below raw
    assert chunks["value_count_blob"].map(len).sum() < 8 * len(t1m)


def test_encoder_as_actor_pool(corpus, tmp_path):
    out = str(tmp_path / "tiers5")
    rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4, input_fingerprint="t5")
    ds = rd.read_parquet(os.path.join(out, "tier=1m"))
    chunks = ds.map_batches(
        TierEncoder,
        fn_constructor_kwargs=dict(tier="1m", max_points_per_chunk=512),
        batch_format="pandas",
        concurrency=2,
        batch_size=1024,
    ).to_pandas()
    t1m = read_tier_pandas(out, "1m")
    dec = decode_chunks(chunks)
    assert len(dec) == len(t1m)
    a = t1m.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    b = dec.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    np.testing.assert_array_equal(
        a["value_sum"].to_numpy().view(np.uint64), b["value_sum"].to_numpy().view(np.uint64)
    )


def test_text_byte_identity_roundtrip(corpus, tmp_path):
    """Per-turn text must survive the pipeline byte-identical under stable
    (conv_id, turn_idx) ordering (BASELINE.json input_hint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "transcripts.parquet")
    pq.write_table(pa.Table.from_pandas(corpus, preserve_index=False), p)
    ds = rd.read_parquet(p)
    from pytimetk_ray.exec import partitioned_group_map

    out = partitioned_group_map(
        ds, ["conv_id"], lambda df: df, sort_by=["conv_id", "turn_idx"], num_partitions=8
    ).to_pandas()
    a = corpus.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    b = out.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert a["text"].tolist() == b["text"].tolist()  # byte-identical strings
    assert [x.encode() for x in a["text"]] == [x.encode() for x in b["text"]]


def test_partial_resume_prunes_committed_partitions(corpus, tmp_path):
    """Resume with SOME partitions committed: fully-committed partitions are
    pruned at the read (their rows never shuffle, files untouched); only the
    victim partition is recomputed."""
    import time as _time

    out = str(tmp_path / "tiers_prune")
    rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=8,
                 input_fingerprint="pr")
    victim = sorted(glob.glob(os.path.join(out, "tier=1h", "*.parquet")))[0]
    pid = int(os.path.basename(victim).split("=")[1].split(".")[0])
    os.remove(victim)
    os.remove(mf.manifest_path(out, "1h", pid))
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "tier=*", "*.parquet"))}
    _time.sleep(0.05)
    res = rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=8,
                       input_fingerprint="pr")
    # every tier's manifest set is complete again
    assert all(len(m) == 8 for m in res.values())
    assert all((m["status"] == "committed").all() for m in res.values())
    # untouched partitions were NOT rewritten (pruned before the shuffle)
    for f, t0 in mtimes.items():
        base = os.path.basename(f)
        this_pid = int(base.split("=")[1].split(".")[0])
        if this_pid == pid:
            continue  # same conv partition in other tiers is re-read/rewritten
        assert os.path.getmtime(f) == t0, f"{f} rewritten despite commit"


def test_encoder_auto_tier(corpus, tmp_path):
    """tier='auto' takes the tier label from the batch's hive column: one
    actor pool encodes every tier; per-tier chunk streams decode bit-equal."""
    out = str(tmp_path / "tiers_auto")
    rollup_tiers(rd.from_pandas(corpus), out_dir=out, num_partitions=4,
                 input_fingerprint="ta")
    frames = []
    for tier in ("1m", "1h", "1d"):
        df = read_tier_pandas(out, tier)
        df["tier"] = tier
        frames.append(df)
    mixed = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=3)
    enc = TierEncoder("auto")
    chunks = enc(mixed)
    assert set(chunks["tier"]) == {"1m", "1h", "1d"}
    for tier in ("1m", "1h", "1d"):
        dec = decode_chunks(chunks[chunks["tier"] == tier]).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        a = read_tier_pandas(out, tier).sort_values(
            ["conv_id", "bucket_ts"], ignore_index=True)
        assert len(a) == len(dec)
        np.testing.assert_array_equal(
            a["value_sum"].to_numpy().view(np.uint64),
            dec["value_sum"].to_numpy().view(np.uint64))
