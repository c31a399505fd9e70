"""Round-4 fixes: null-key hashing, SpaceSaving merge bound, grouping-sets
dtype contract, wide-hash span dedup, MinHash bucket cap, and block-order
determinism of the three queries the round-3 driver window flagged."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from pytimetk_ray.exec import _add_part_arrow, partitioned_group_map
from pytimetk_ray.kernels.sketch import SpaceSaving

SF = "/root/testdata/sf0.001"


# --- _add_part_arrow null string keys (ADVICE r3, medium) -------------------


def test_add_part_arrow_null_string_keys_match_legacy_hash():
    col = pa.array(["a", None, "b", "a", None, "c", None])
    tbl = pa.table({"k": col, "v": pa.array(range(7))})
    out = _add_part_arrow(tbl, ["k"], 16)
    # legacy path: hash the full pandas object column
    h = pd.util.hash_array(col.to_pandas().to_numpy())
    want = ((np.zeros(7, dtype=np.uint64) * np.uint64(1000003) + h)
            % np.uint64(16)).astype(np.int64)
    assert out["__part__"].to_pylist() == want.tolist()


def test_partitioned_group_map_nullable_string_key():
    df = pd.DataFrame({
        "k": pd.array(["x", None, "y", "x", None, "y", "x", None],
                      dtype="string"),
        "v": np.arange(8, dtype=np.int64),
    })
    out = partitioned_group_map(
        rd.from_pandas(df),
        ["k"],
        lambda p: p.groupby("k", sort=False, dropna=False)["v"]
        .sum().reset_index(),
        num_partitions=4,
    ).to_pandas()
    got = {(None if pd.isna(k) else k): v
           for k, v in zip(out["k"], out["v"])}
    assert got == {"x": 0 + 3 + 6, None: 1 + 4 + 7, "y": 2 + 5}


# --- SpaceSaving merge keeps count >= true_count (ADVICE r3) ----------------


def test_spacesaving_merge_upper_bound_approx_regime():
    rng = np.random.default_rng(11)
    s1 = (rng.zipf(1.3, 60_000) % 2500).astype(np.int64)
    s2 = ((rng.zipf(1.3, 60_000) % 2500) + 1000).astype(np.int64)
    true = collections.Counter(s1.tolist()) + collections.Counter(s2.tolist())
    summaries = []
    for stream in (s1, s2):
        s = SpaceSaving(150)  # far below 2500+ distinct -> approximate
        for chunk in np.array_split(stream, 7):
            v, c = np.unique(chunk, return_counts=True)
            s.update_counts(v.tolist(), c)
        summaries.append(s)
    merged = summaries[0].merge(summaries[1])
    for it, cnt, err in merged.topk(150):
        assert cnt >= true[it], f"upper bound violated for {it}"
        assert cnt - err <= true[it], f"lower bound violated for {it}"


# --- aggregate_grouping_sets rejects float value columns (ADVICE r3) --------


def test_grouping_sets_rejects_float_value_column():
    from pytimetk_ray.ops.grouping import aggregate_grouping_sets

    ds = rd.from_pandas(pd.DataFrame({
        "g": ["a", "b"], "v": [1.5, 2.5]}))
    with pytest.raises(TypeError, match="integer value column"):
        aggregate_grouping_sets(ds, [("g",), ()], "v")


# --- dedup_spans wide-hash mode (ADVICE r3) ---------------------------------


def test_dedup_spans_wide_hash_matches_default():
    from pytimetk_ray.pipelines.spandup import dedup_spans

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            f"unique preamble {i} word salad {dup} trailing tokens {i} here"
            for i in range(3)
        ] + [" ".join(f"tok{i}x{j}" for j in range(14)) for i in range(3)],
    })
    a = (dedup_spans(rd.from_pandas(docs), window_words=8)
         .to_pandas().sort_values("doc_id", ignore_index=True))
    b = (dedup_spans(rd.from_pandas(docs), window_words=8, wide_hash=True)
         .to_pandas().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a.loc[:2, "n_removed"] > 0).all()
    assert (a.loc[3:, "n_removed"] == 0).all()


def test_md5_u64_pair_matches_duckdb():
    import duckdb

    from pytimetk_ray.kernels.text import md5_u64_pair_many

    strs = ["abc", "", "hello world", "ünïcödé"]
    hi, lo = md5_u64_pair_many(strs)
    con = duckdb.connect()
    for s, h, l in zip(strs, hi, lo):
        u, w = con.execute(
            "SELECT md5_number_upper(?), md5_number_lower(?)", [s, s]
        ).fetchone()
        assert int(h) == u and int(l) == w


# --- MinHash degenerate-bucket cap (VERDICT r3 #2) --------------------------


def test_minhash_identical_text_bucket_is_capped():
    from pytimetk_ray.pipelines.dedup import minhash_lsh_pairs

    n, cap = 5_000, 200
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["identical boilerplate text repeated across the corpus "
                 "shard for the pathological bucket case"] * n,
    })
    pairs = minhash_lsh_pairs(
        rd.from_pandas(docs), hasher="fast", max_bucket=cap,
        num_partitions=4,
    ).to_pandas()
    # identical docs -> identical signatures -> every band bucket holds all
    # n docs, capped to the deterministic first `cap` ids; all bands emit
    # the same C(cap, 2) pairs, deduped once
    assert len(pairs) == cap * (cap - 1) // 2
    assert (pairs["est_jaccard"] == 1.0).all()
    assert pairs["id_a"].max() < cap and pairs["id_b"].max() < cap


def test_minhash_chunked_pairs_match_reference_small():
    """Chunked upper-triangle compare gives the same pairs as the r3
    all-at-once cube on a mixed corpus (exercises multiple buckets)."""
    from pytimetk_ray.pipelines.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(3)
    words = np.array([f"w{i}" for i in range(60)])
    texts = []
    for i in range(40):
        base = " ".join(rng.choice(words, size=20))
        texts.append(base)
        texts.append(base + " tail extra")  # near-dup partner
    docs = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    pairs = minhash_lsh_pairs(
        rd.from_pandas(docs), threshold=0.5, num_partitions=4
    ).to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    found = set(zip(pairs.id_a, pairs.id_b))
    hits = sum((2 * i, 2 * i + 1) in found for i in range(40))
    assert hits >= 30  # LSH at 8 bands catches nearly all 0.5+ pairs
    assert ((pairs.est_jaccard >= 0.5) & (pairs.est_jaccard <= 1.0)).all()


# --- pd_quantile configurable window functions (VERDICT r3 #6) --------------


def test_pd_quantile_configurable_rolling_and_expanding():
    from pytimetk_ray.ops.expanding import augment_expanding
    from pytimetk_ray.ops.rolling import augment_rolling, pd_quantile

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": np.repeat([1, 2], 25),
        "t": np.tile(np.arange(25), 2),
        "v": rng.normal(100, 20, 50),
    })
    out = augment_rolling(
        rd.from_pandas(df), ["g"], ["t"], "v", window=5,
        window_func=[("quantile_75", pd_quantile(q=0.75)), "quantile"],
        num_partitions=2,
    ).to_pandas().sort_values(["g", "t"], ignore_index=True)
    # reference naming: tuple name verbatim; string 'quantile' -> _50
    assert "v_rolling_quantile_75_win_5" in out.columns
    assert "v_rolling_quantile_50_win_5" in out.columns
    ref = df.sort_values(["g", "t"], ignore_index=True)
    gr = ref.groupby("g", group_keys=False)["v"]
    want75 = gr.rolling(5, min_periods=5).quantile(
        0.75, interpolation="midpoint").reset_index(drop=True)
    want50 = gr.rolling(5, min_periods=5).quantile(0.5)  # linear default
    np.testing.assert_array_equal(
        out["v_rolling_quantile_75_win_5"].to_numpy(), want75.to_numpy())
    np.testing.assert_array_equal(
        out["v_rolling_quantile_50_win_5"].to_numpy(), want50.to_numpy())

    exp = augment_expanding(
        rd.from_pandas(df), ["g"], ["t"], "v",
        window_func=[("quantile_25", pd_quantile(q=0.25))],
        num_partitions=2,
    ).to_pandas().sort_values(["g", "t"], ignore_index=True)
    wante = gr.expanding(min_periods=1).quantile(
        0.25, interpolation="midpoint").reset_index(drop=True)
    np.testing.assert_array_equal(
        exp["v_expanding_quantile_25"].to_numpy(), wante.to_numpy())


# --- round-4 new operators ---------------------------------------------------


def test_ccnet_buckets_thirds_and_order():
    from pytimetk_ray.pipelines.corpus import ccnet_buckets

    rng = np.random.default_rng(5)
    common = "the quick brown fox"
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [common if i % 3 == 0 else
                 f"{common} rare{i} " + " ".join(
                     rng.choice([f"w{j}" for j in range(40)], size=6))
                 for i in range(60)],
        "lang": ["en"] * 30 + ["de"] * 30,
    })
    out = ccnet_buckets(rd.from_pandas(docs), vocab_size=16,
                        num_partitions=4).to_pandas()
    assert len(out) == 60
    for lang, g in out.groupby("lang"):
        counts = g["bucket"].value_counts().sort_index()
        assert counts.tolist() == [10, 10, 10]  # exact thirds of 30
        # head logprobs >= middle >= tail (ranking is by rounded logprob)
        h = g.loc[g.bucket == 0, "logprob"].min()
        m = g.loc[g.bucket == 1, "logprob"]
        t = g.loc[g.bucket == 2, "logprob"].max()
        assert h >= m.max() - 1e-9 and m.min() >= t - 1e-9
    assert set(out["bucket_label"]) == {"head", "middle", "tail"}


def test_sample_mixture_rates_and_monotone_ramp():
    from pytimetk_ray.pipelines.corpus import hash_sample, sample_mixture

    docs = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        "source": np.tile(["a", "b", "c", "d"], 1000),
        "text": ["x"] * 4000,
    })
    ds = rd.from_pandas(docs)
    out = sample_mixture(ds, group_column="source",
                         rates_ppm={"a": 1_000_000, "b": 500_000, "c": 0},
                         default_ppm=250_000).to_pandas()
    by = out.groupby("source").size()
    assert by.get("a", 0) == 1000          # rate 1.0 keeps everything
    assert "c" not in by.index             # rate 0 drops everything
    assert 380 <= by["b"] <= 620           # ~0.5 of 1000
    assert 170 <= by.get("d", 0) <= 340    # default ~0.25
    # monotone ramp: raising b's rate strictly grows b's kept set
    lo = set(sample_mixture(ds, group_column="source",
                            rates_ppm={"b": 200_000}, default_ppm=0)
             .to_pandas()["doc_id"])
    hi = set(sample_mixture(ds, group_column="source",
                            rates_ppm={"b": 500_000}, default_ppm=0)
             .to_pandas()["doc_id"])
    assert lo < hi
    # group-independence: at equal rate, mixture == plain hash_sample
    mix = set(sample_mixture(ds, group_column="source", rates_ppm={},
                             default_ppm=250_000).to_pandas()["doc_id"])
    plain = set(hash_sample(ds, rate_ppm=250_000).to_pandas()["doc_id"])
    assert mix == plain


def test_cluster_representatives_keep_longest():
    from pytimetk_ray.pipelines.dedup import cluster_representatives

    clusters = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 10, 11], dtype=np.int64),
        "cluster_id": np.array([1, 1, 1, 10, 10], dtype=np.int64)}))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 10, 11, 99], dtype=np.int64),
        "n_chars": np.array([5, 9, 9, 4, 2, 100], dtype=np.int64),
        "text": ["x"] * 6}))
    out = (cluster_representatives(clusters, docs, num_partitions=2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert len(out) == 5  # doc 99 is unclustered -> absent
    kept = set(out.loc[out.keep, "doc_id"])
    # cluster 1: longest is tie 2/3 -> min doc_id 2; cluster 10: doc 10
    assert kept == {2, 10}
    assert out.groupby("cluster_id")["keep"].sum().tolist() == [1, 1]


def test_manual_exchange_matches_sort_exchange(monkeypatch):
    """GRAFT_EXCHANGE=manual (raw-Ray split/concat) must produce the same
    rows as the default sort shuffle — including empty and string-keyed
    partitions."""
    df = pd.DataFrame({
        "k": np.repeat([f"g{i}" for i in range(23)], 40),
        "t": np.tile(np.arange(40), 23),
        "v": np.arange(920, dtype=np.float64),
    })

    def run():
        return partitioned_group_map(
            rd.from_pandas(df), ["k"],
            lambda p: p.assign(c=p.groupby("k", sort=False)["v"].cumsum()),
            sort_by=["k", "t"], num_partitions=7,
        ).to_pandas().sort_values(["k", "t"], ignore_index=True)

    base = run()
    monkeypatch.setenv("GRAFT_EXCHANGE", "manual")
    manual = run()
    pd.testing.assert_frame_equal(base, manual)


def test_compact_chunks_row_bit_equality_and_chunk_reduction():
    from pytimetk_ray.stages.tier_encoder import (
        TierEncoder, compact_chunks, decode_chunks)

    rng = np.random.default_rng(9)
    nconv, pts = 40, 90
    rows = pd.DataFrame({
        "conv_id": np.repeat([f"c{i}" for i in range(nconv)], pts),
        "tier": "1h",
        "bucket_ts": np.tile(
            pd.date_range("2024-01-01", periods=pts, freq="h")
            .astype("datetime64[us]"), nconv),
        "value_sum": np.round(rng.normal(100, 30, nconv * pts), 6),
        "value_count": rng.integers(1, 50, nconv * pts).astype(np.float64),
    })
    enc = TierEncoder(tier="auto", value_columns=["value_sum", "value_count"],
                      max_points_per_chunk=7)
    # split rows into 5 uneven arrival batches -> many small chunks/conv
    parts = np.array_split(rng.permutation(len(rows)), 5)
    chunks = pd.concat([enc(rows.iloc[p]) for p in parts], ignore_index=True)
    assert len(chunks) > nconv * 5  # genuinely fragmented

    compacted = compact_chunks(
        rd.from_pandas(chunks), max_points_per_chunk=4096, num_partitions=4
    ).to_pandas()
    assert len(compacted) == nconv  # one chunk per (conv, tier) stream
    assert list(compacted.columns) == list(chunks.columns)

    dec = decode_chunks(compacted).sort_values(
        ["conv_id", "bucket_ts"], ignore_index=True)
    want = rows.sort_values(["conv_id", "bucket_ts"], ignore_index=True)
    assert (dec["bucket_ts"].to_numpy() == want["bucket_ts"].to_numpy()).all()
    for c in ("value_sum", "value_count"):
        assert (dec[c].to_numpy().view(np.uint64)
                == want[c].to_numpy().view(np.uint64)).all(), c

    # idempotence + passthrough: compacting a compacted store is a no-op
    # on decoded rows and keeps single-chunk streams verbatim
    again = compact_chunks(rd.from_pandas(compacted),
                           max_points_per_chunk=4096,
                           num_partitions=4).to_pandas()
    a = again.sort_values(["conv_id", "start_ts"], ignore_index=True)
    b = compacted.sort_values(["conv_id", "start_ts"], ignore_index=True)
    assert (a["ts_blob"] == b["ts_blob"]).all()
    assert (a["value_sum_blob"] == b["value_sum_blob"]).all()


# --- block-order determinism of the round-3 driver-window reds --------------


def _shuffled_blocks(df: pd.DataFrame, seed: int, nblocks: int = 7):
    """Dataset from `df` split into shuffled, uneven blocks."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(df))
    parts = np.array_split(perm, nblocks)
    return rd.from_pandas([df.iloc[p].reset_index(drop=True) for p in parts])


def _hash_frame(df: pd.DataFrame) -> int:
    df = df[sorted(df.columns)].sort_values(
        list(sorted(df.columns)), ignore_index=True, na_position="last")
    total = 0
    for c in df.columns:
        v = df[c].to_numpy()
        if v.dtype.kind == "f":
            v = v.copy()
            v[np.isnan(v)] = np.nan
            total += int(v.view(np.uint64).sum())
        else:
            total += int(pd.util.hash_pandas_object(df[c], index=False).sum())
    return total


@pytest.mark.parametrize("seed", [1, 2])
def test_sessions_block_order_deterministic(seed):
    from pytimetk_ray.ops.sessions import augment_sessions

    ev = pd.read_parquet(f"{SF}/events.parquet")
    # inject tied timestamps so the tiebreaker actually decides something
    ev = pd.concat([ev, ev.head(200).assign(
        event_id=ev.head(200).event_id + 10_000_000)], ignore_index=True)

    def run(ds):
        return augment_sessions(
            ds, ["user_id"], "ts", gap="2 hours", tiebreakers=["event_id"]
        ).select_columns(["event_id", "user_id", "session_id"]).to_pandas()

    h1 = _hash_frame(run(_shuffled_blocks(ev, seed)))
    h2 = _hash_frame(run(_shuffled_blocks(ev, seed + 100)))
    assert h1 == h2


def test_spline_and_ts_features_block_order_deterministic():
    import __ray_entry__ as e

    qs = e.queries()
    for name in ("spline_sql", "ts_features"):
        a = qs[name](SF)
        b = qs[name](SF)
        a = a.to_pandas() if isinstance(a, rd.Dataset) else a
        b = b.to_pandas() if isinstance(b, rd.Dataset) else b
        assert _hash_frame(a) == _hash_frame(b), name
