"""Corpus training-data ops (pipelines/corpus.py) vs single-process oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.kernels import text as tx
from pytimetk_ray.pipelines.corpus import (
    hash_split,
    pack_sequences,
    token_totals,
    topk_per_group,
    unigram_logprob,
    vocab_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _all_words(docs_df):
    toks = []
    for t in docs_df["text"]:
        toks.extend(tx._WORD_RE.findall((t or "").lower()))
    return toks


def test_vocab_topk_matches_counter(docs_df):
    out = vocab_topk(rd.from_pandas(docs_df), top_n=20).to_pandas()
    vc = pd.Series(_all_words(docs_df)).value_counts()
    ref = (vc.rename_axis("token").reset_index(name="cnt")
           .sort_values(["cnt", "token"], ascending=[False, True],
                        kind="mergesort").head(20).reset_index(drop=True))
    got = out.sort_values(["cnt", "token"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_token_totals_sum_equals_stream_length(docs_df):
    tot = token_totals(rd.from_pandas(docs_df)).to_pandas()
    assert tot["cnt"].sum() == len(_all_words(docs_df))
    assert tot["token"].is_unique


def test_hash_split_deterministic_and_proportioned(docs_df):
    out = hash_split(rd.from_pandas(docs_df)).to_pandas()
    assert len(out) == len(docs_df)
    # exact per-row parity with the md5 definition
    for _, r in out.head(25).iterrows():
        b = tx.md5_u64(str(int(r["doc_id"]))) % 100
        assert r["bucket"] == b
        assert r["split"] == ("train" if b < 90 else "val" if b < 95 else "test")
    frac = (out["split"] == "train").mean()
    assert 0.8 < frac < 0.97  # ~90% with hash noise at 500 docs
    # re-run gives the identical assignment (no RNG state anywhere)
    out2 = hash_split(rd.from_pandas(docs_df)).to_pandas()
    pd.testing.assert_frame_equal(out.sort_values("doc_id", ignore_index=True),
                                  out2.sort_values("doc_id", ignore_index=True))


def test_topk_per_group_matches_pandas(docs_df):
    out = topk_per_group(rd.from_pandas(docs_df), k=3).to_pandas()
    ref = (docs_df[["lang", "doc_id", "n_chars"]]
           .sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
           .groupby("lang", sort=False).head(3))
    got = out.sort_values(["lang", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.reset_index(drop=True),
                                  check_dtype=False)


def test_pack_sequences_greedy_invariants(docs_df):
    budget = 256
    out = pack_sequences(rd.from_pandas(docs_df), budget=budget,
                         num_shards=4).to_pandas()
    assert len(out) == len(docs_df)
    assert (out["shard"] == out["doc_id"] % 4).all()
    for shard, g in out.groupby("shard"):
        g = g.sort_values("doc_id")
        bins = g["bin_id"].to_numpy()
        ns = g["n_tokens"].to_numpy()
        # bin ids start at 0 and are non-decreasing with steps of 1
        assert bins[0] == 0
        steps = np.diff(bins)
        assert set(steps.tolist()) <= {0, 1}
        # every bin fill respects the budget unless it is a single oversize doc
        fills = pd.Series(ns).groupby(bins).sum()
        sizes = pd.Series(ns).groupby(bins).size()
        bad = fills[(fills > budget) & (sizes > 1)]
        assert bad.empty
        # greedy: a doc that OPENS bin b+1 would not have fit in bin b
        open_idx = np.flatnonzero(steps == 1) + 1
        for i in open_idx:
            prev_bin = bins[i] - 1
            prev_fill = ns[bins == prev_bin].sum()
            assert prev_fill + ns[i] > budget


def test_cross_split_contamination_planted():
    from pytimetk_ray.pipelines.corpus import cross_split_contamination

    # find ids landing in train (<90) and test (>=95) buckets
    train_ids = [i for i in range(1000) if tx.md5_u64(str(i)) % 100 < 90][:3]
    test_ids = [i for i in range(1000) if tx.md5_u64(str(i)) % 100 >= 95][:2]
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    rows = [{"doc_id": train_ids[0], "text": f"{shared} plus unrelated tail words here"},
            {"doc_id": train_ids[1], "text": "totally different content " * 4},
            {"doc_id": train_ids[2], "text": "yet more train only stuff " * 4},
            # contaminated test doc: contains the shared 8-gram
            {"doc_id": test_ids[0], "text": f"prefix words then {shared} and suffix"},
            # clean test doc
            {"doc_id": test_ids[1], "text": "clean evaluation document nothing shared " * 3}]
    df = pd.DataFrame(rows)
    out = cross_split_contamination(rd.from_pandas(df), shingle_k=8
                                    ).to_pandas().set_index("doc_id")
    assert bool(out.loc[test_ids[0], "contaminated"])
    assert out.loc[test_ids[0], "n_shared"] >= 1
    assert not bool(out.loc[test_ids[1], "contaminated"])
    assert set(out.index) == set(test_ids)  # train/val docs never emitted


def test_unigram_logprob_matches_local(docs_df):
    out = unigram_logprob(rd.from_pandas(docs_df), vocab_size=64).to_pandas()
    words_per_doc = {
        int(i): tx._WORD_RE.findall((t or "").lower())
        for i, t in zip(docs_df["doc_id"], docs_df["text"])
    }
    all_words = [w for ws in words_per_doc.values() for w in ws]
    vc = pd.Series(all_words).value_counts()
    top = (vc.rename_axis("token").reset_index(name="cnt")
           .sort_values(["cnt", "token"], ascending=[False, True],
                        kind="mergesort").head(64))
    total = len(all_words)
    logp = {t: np.log(c / total) for t, c in zip(top["token"], top["cnt"])}
    oov = np.log(1.0 / total)
    got = out.set_index("doc_id")
    for did, ws in list(words_per_doc.items())[:50]:
        if not ws:
            assert did not in got.index
            continue
        exp = np.mean([logp.get(w, oov) for w in ws])
        assert got.loc[did, "n_tokens"] == len(ws)
        assert abs(got.loc[did, "logprob"] - exp) < 1e-9


def test_bigram_logprob_matches_local(docs_df):
    from collections import Counter

    from pytimetk_ray.pipelines.corpus import bigram_logprob

    V = 32
    out = (bigram_logprob(rd.from_pandas(docs_df), vocab_size=V,
                          num_partitions=4)
           .to_pandas().set_index("doc_id"))
    words_per_doc = {
        int(i): tx._WORD_RE.findall((t or "").lower())
        for i, t in zip(docs_df["doc_id"], docs_df["text"])
    }
    all_words = [w for ws in words_per_doc.values() for w in ws]
    vc = pd.Series(all_words).value_counts()
    vocab = set(vc.rename_axis("token").reset_index(name="cnt")
                .sort_values(["cnt", "token"], ascending=[False, True],
                             kind="mergesort").head(V)["token"])
    mapped = {d: [w if w in vocab else "<unk>" for w in ws]
              for d, ws in words_per_doc.items()}
    bc = Counter((a, b) for ws in mapped.values()
                 for a, b in zip(ws, ws[1:]))
    c1 = Counter()
    for (a, _), c in bc.items():
        c1[a] += c
    for did, ws in list(mapped.items())[:50]:
        if len(ws) < 2:
            assert did not in out.index
            continue
        terms = [np.log((bc[(a, b)] + 1.0) / (c1[a] + V + 1.0))
                 for a, b in zip(ws, ws[1:])]
        assert out.loc[did, "n_bigrams"] == len(ws) - 1
        assert abs(out.loc[did, "logprob"] - np.mean(terms)) < 1e-9


def test_bloom_contamination_matches_exact():
    from pytimetk_ray.pipelines.corpus import (bloom_contamination,
                                               cross_split_contamination)

    # a corpus with planted cross-split 8-grams AND clean docs; the Bloom
    # variant (sized for ~zero expected FPs) must be bit-equal to exact
    rng = np.random.default_rng(19)
    words = [f"w{k}" for k in range(200)]
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(300):
        body = " ".join(rng.choice(words, size=30))
        if i % 17 == 0:
            body = f"{body} {shared}"  # planted leak in some docs
        rows.append({"doc_id": i, "text": body})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df)
    exact = (cross_split_contamination(ds, shingle_k=8)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    bloom = (bloom_contamination(rd.from_pandas(df), shingle_k=8,
                                 blocks=16, block_bits_log=18)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bloom, exact)
    assert exact["contaminated"].any()  # the fixture actually plants leaks


def test_bloom_probe_no_false_negatives():
    from pytimetk_ray.pipelines.corpus import (_bloom_positions, _bloom_probe)

    rng = np.random.default_rng(3)
    h = rng.integers(0, 2**63, size=5000).astype(np.uint64)
    blocks, bbl, k = 8, 16, 4
    block_bytes = (1 << bbl) // 8
    bits = np.zeros(blocks * block_bytes, dtype=np.uint8)
    for j in range(k):
        pos = ((h % np.uint64(blocks)).astype(np.int64) << np.int64(bbl)) \
            + _bloom_positions(h, j, bbl)
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
    assert _bloom_probe(bits, h, blocks, bbl, k).all()  # every member hits
    probe = rng.integers(0, 2**63, size=20000).astype(np.uint64)
    fresh = probe[~np.isin(probe, h)]
    fp = _bloom_probe(bits, fresh, blocks, bbl, k).mean()
    # load f = k*n/m = 4*5000/2^19 ~ 0.038 -> FP ~ (1-e^-f)^4 ~ 2e-6
    assert fp < 1e-3


def test_sample_stratified_registered_nothing_else_changed():
    # guard: frac_ppm=1e6 keeps EVERY row (k = n) — identity sample
    df = pd.DataFrame({"event_id": np.arange(50, dtype=np.int64),
                       "event_type": ["x"] * 25 + ["y"] * 25,
                       "value": np.arange(50, dtype=np.float64)})
    from pytimetk_ray.pipelines.corpus import sample_stratified
    got = (sample_stratified(rd.from_pandas(df), group_column="event_type",
                             id_column="event_id", frac_ppm=1_000_000,
                             num_partitions=3)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)
