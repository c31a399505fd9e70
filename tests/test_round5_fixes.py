"""Round-5 ADVICE fixes: compact_chunks key_column plumbing, manual-exchange
empty-partition schema, minhash bucket-cap truncation warning."""

import warnings

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _mk_tier_rows(key_name: str, n_convs: int = 5, pts: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(7)
    rows = []
    for c in range(n_convs):
        ts = np.arange(pts, dtype=np.int64) * 3_600_000_000 + c
        rows.append(pd.DataFrame({
            key_name: f"conv-{c}",
            "bucket_ts": ts.astype("datetime64[us]"),
            "value_sum": rng.normal(size=pts),
            "value_count": rng.integers(1, 9, size=pts).astype(np.float64),
        }))
    return pd.concat(rows, ignore_index=True)


def test_compact_chunks_non_default_key_column(ray_session):
    # ADVICE r4: key_column was exposed but decode_chunks/TierEncoder
    # hardcoded 'conv_id' -> KeyError.  Round-trip under key 'stream_id'.
    from pytimetk_ray.stages.tier_encoder import (
        TierEncoder, compact_chunks, decode_chunks)

    rows = _mk_tier_rows("stream_id")
    rows["tier"] = "1h"
    enc = TierEncoder(tier="auto", value_columns=["value_sum", "value_count"],
                      key_column="stream_id", max_points_per_chunk=7)
    chunks = enc(rows.copy())
    assert "stream_id" in chunks.columns and "conv_id" not in chunks.columns
    assert (chunks["n_points"] <= 7).all()

    compacted = compact_chunks(
        rd.from_pandas(chunks), key_column="stream_id",
        max_points_per_chunk=4096, num_partitions=4).to_pandas()
    # all 40 points of each stream now in one chunk
    assert compacted.groupby("stream_id").size().eq(1).all()

    dec = decode_chunks(compacted, key_column="stream_id").sort_values(
        ["stream_id", "bucket_ts"]).reset_index(drop=True)
    want = rows.drop(columns=["tier"]).sort_values(
        ["stream_id", "bucket_ts"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        dec["value_sum"].to_numpy().view(np.uint64),
        want["value_sum"].to_numpy().view(np.uint64))
    np.testing.assert_array_equal(dec["bucket_ts"].to_numpy(),
                                  want["bucket_ts"].to_numpy())


def test_manual_exchange_empty_partition_schema(ray_session, monkeypatch):
    # ADVICE r4: an empty partition produced a zero-column pd.DataFrame()
    # block; downstream select_columns over mixed blocks then failed.
    from pytimetk_ray.exec import partitioned_group_map

    monkeypatch.setenv("GRAFT_EXCHANGE", "manual")
    df = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 2,
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})

    def kern(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby("k", sort=False, as_index=False)["v"].sum()

    # num_partitions far above the key count -> most partitions empty
    out = partitioned_group_map(rd.from_pandas(df), ["k"], kern,
                                num_partitions=16)
    res = out.select_columns(["k", "v"]).to_pandas().sort_values(
        "k").reset_index(drop=True)
    assert res["k"].tolist() == ["a", "b"]
    np.testing.assert_allclose(res["v"].to_numpy(), [6.0, 9.0])


def test_ingest_chunks_auto_compaction(tmp_path, ray_session):
    # round-5 policy: N small increments fragment the encoded store until
    # mean fill drops below frag_threshold, then ONE ingest triggers the
    # compaction rewrite; decoded rows stay bit-equal throughout
    from pytimetk_ray.stages.tier_encoder import decode_chunks, ingest_chunks

    store = str(tmp_path / "chunks")
    rows = _mk_tier_rows("conv_id", n_convs=4, pts=96)
    rows["tier"] = "1h"
    pieces = np.array_split(np.arange(96), 12)  # 12 increments of 8 points

    compact_events = []
    for i, idx in enumerate(pieces):
        inc = pd.concat(
            [g.iloc[idx] for _, g in rows.groupby("conv_id", sort=False)],
            ignore_index=True)
        res = ingest_chunks(store, rd.from_pandas(inc),
                            value_columns=["value_sum", "value_count"],
                            max_points_per_chunk=64, frag_threshold=0.25,
                            num_partitions=4, encode_concurrency=1)
        if res["compacted"]:
            compact_events.append(i)
    # 8/64 fill = 0.125 < 0.25 -> the very first ingest already compacts;
    # after a compaction the store is 1-2 chunks/conv (fill >= 0.25 once
    # enough points accumulate), so compaction fires on SOME but not all
    assert compact_events, "no ingest ever triggered auto-compaction"
    assert len(compact_events) < 12, "every ingest compacted (threshold dead)"

    final = pd.read_parquet(store)
    dec = decode_chunks(final).sort_values(
        ["conv_id", "bucket_ts"]).reset_index(drop=True)
    want = rows.drop(columns=["tier"]).sort_values(
        ["conv_id", "bucket_ts"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        dec["value_sum"].to_numpy().view(np.uint64),
        want["value_sum"].to_numpy().view(np.uint64))
    np.testing.assert_array_equal(dec["bucket_ts"].to_numpy(),
                                  want["bucket_ts"].to_numpy())
    # near-minimal modulo the appends after the LAST compaction: at most
    # 2 compacted chunks (96 pts / 64 cap) + one append chunk per
    # post-compaction increment — far below the 12 of a never-compacted
    # store
    per_conv = final.groupby("conv_id").size()
    assert per_conv.max() <= 2 + (11 - compact_events[-1])
    assert per_conv.max() < 12


def test_ingest_chunks_crash_recovery(tmp_path, ray_session):
    # a crashed swap leaves only the .old directory; the next call restores
    import os
    import shutil

    from pytimetk_ray.stages.tier_encoder import ingest_chunks

    store = str(tmp_path / "chunks")
    rows = _mk_tier_rows("conv_id", n_convs=2, pts=16)
    rows["tier"] = "1h"
    ingest_chunks(store, rd.from_pandas(rows),
                  value_columns=["value_sum", "value_count"],
                  max_points_per_chunk=64, frag_threshold=0.0,  # no compact
                  num_partitions=2, encode_concurrency=1)
    os.rename(store, store + ".old")  # simulate crash mid-swap
    res = ingest_chunks(store, rd.from_pandas(rows.iloc[:4]),
                        value_columns=["value_sum", "value_count"],
                        max_points_per_chunk=64, frag_threshold=0.0,
                        num_partitions=2, encode_concurrency=1)
    assert not os.path.isdir(store + ".old")
    assert res["points"] == 2 * 16 + 4
    shutil.rmtree(store)


@pytest.mark.parametrize("mode", ["manual", "twolevel"])
def test_raw_exchanges_schema_changing_kernel(ray_session, monkeypatch, mode):
    # empty partitions must produce NO block (sort-path semantics): a
    # kernel that CHANGES the schema would otherwise emit an input-schema
    # empty block and poison downstream unification (round-5 twolevel bug)
    from pytimetk_ray.exec import partitioned_group_map

    monkeypatch.setenv("GRAFT_EXCHANGE", mode)
    monkeypatch.setenv("GRAFT_COARSE", "3")
    monkeypatch.setenv("GRAFT_MERGE_GROUP", "2")
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 4, 200), "v": rng.normal(size=200)})

    def kern(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("k", sort=False)["v"]
        return pd.DataFrame({"k": g.sum().index.to_numpy(),
                             "total": g.sum().to_numpy(),
                             "n": g.size().to_numpy()})

    out = partitioned_group_map(
        rd.from_pandas(df, override_num_blocks=7), ["k"], kern,
        num_partitions=32)  # 4 keys over 32 partitions -> mostly empty
    res = out.select_columns(["k", "total", "n"]).to_pandas().sort_values(
        "k").reset_index(drop=True)
    want = df.groupby("k", as_index=False).agg(total=("v", "sum"),
                                               n=("v", "size"))
    np.testing.assert_array_equal(res["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_array_equal(res["n"].to_numpy(), want["n"].to_numpy())
    # no total-order sort column here, so summation order is exchange-
    # dependent — value equality only (the oracle queries sort by (key, ts)
    # and ARE bit-checked across all three exchanges by check_oracle)
    np.testing.assert_allclose(res["total"].to_numpy(), want["total"].to_numpy())


def test_minhash_bucket_cap_warns(ray_session):
    # the cap helper warns (Ray forwards worker warnings to its logs; pin
    # the warning at the helper level where pytest can observe it)
    from pytimetk_ray.pipelines.dedup import _cap_bucket, minhash_lsh_pairs

    ids = np.arange(30, dtype=np.int64)
    sigs = np.array([b"x"] * 30, dtype=object)
    with pytest.warns(RuntimeWarning, match="truncated to max_bucket=10"):
        kept_ids, kept_sigs = _cap_bucket(ids, sigs, 10)
    assert kept_ids.tolist() == list(range(10)) and len(kept_sigs) == 10

    # end-to-end: 30 identical docs, cap 10 -> exactly C(10,2) pairs among
    # the deterministic ids-ascending prefix
    docs = pd.DataFrame({
        "doc_id": ids,
        "text": ["the same boilerplate text repeated for every doc"] * 30,
    })
    pairs = minhash_lsh_pairs(rd.from_pandas(docs), max_bucket=10,
                              num_partitions=2).to_pandas()
    assert pairs["id_b"].max() < 10
    assert len(pairs) == 45  # C(10,2)


@pytest.mark.parametrize("coarse,group", [
    ("1", "1"),    # level 1 degenerates to a no-op; every merge is 1 map
    ("1", "64"),   # one merge task sees ALL maps
    ("64", "8"),   # N > P: must clamp to P fine=1-slot buckets
    (None, "8"),   # GRAFT_COARSE unset: cluster-aware default branch
])
def test_twolevel_knob_edges(ray_session, monkeypatch, coarse, group):
    # every (N, G) corner must agree bit-for-bit with the sort path on a
    # total-order kernel (sorted inside the kernel -> summation order fixed)
    from pytimetk_ray.exec import partitioned_group_map

    monkeypatch.setenv("GRAFT_EXCHANGE", "twolevel")
    if coarse is None:
        monkeypatch.delenv("GRAFT_COARSE", raising=False)
    else:
        monkeypatch.setenv("GRAFT_COARSE", coarse)
    monkeypatch.setenv("GRAFT_MERGE_GROUP", group)
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 500),
        "t": rng.permutation(500),
        "v": rng.normal(size=500),
    })

    def kern(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["k", "t"])
        g = part.groupby("k", sort=True)["v"]
        return pd.DataFrame({"k": g.sum().index.to_numpy(),
                             "total": g.sum().to_numpy()})

    out = partitioned_group_map(
        rd.from_pandas(df, override_num_blocks=7), ["k"], kern,
        num_partitions=16,
    ).select_columns(["k", "total"]).to_pandas().sort_values(
        "k").reset_index(drop=True)

    monkeypatch.setenv("GRAFT_EXCHANGE", "sort")
    want = partitioned_group_map(
        rd.from_pandas(df, override_num_blocks=7), ["k"], kern,
        num_partitions=16,
    ).select_columns(["k", "total"]).to_pandas().sort_values(
        "k").reset_index(drop=True)

    np.testing.assert_array_equal(out["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_array_equal(
        out["total"].to_numpy().view(np.uint64),
        want["total"].to_numpy().view(np.uint64))
