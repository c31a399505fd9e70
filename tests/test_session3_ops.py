"""Tests: span dedup, DSIR weights, text normalization, linear
interpolation, and BPE tokenizer training/encoding (round-3 session-3 ops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.kernels.text import _WORD_RE, md5_u64
from pytimetk_ray.ops.interpolate import interpolate_by_time
from pytimetk_ray.pipelines.corpus import dsir_logweight
from pytimetk_ray.pipelines.spandup import dedup_spans
from pytimetk_ray.pipelines.text_analysis import normalize_text
from pytimetk_ray.pipelines.tokenizer import (bpe_token_counts, bpe_train,
                                              encode_word)


# --- dedup_spans -------------------------------------------------------------


def _naive_span_dedup(df: pd.DataFrame, w: int, min_count: int) -> pd.DataFrame:
    wins: dict[str, int] = {}
    split = {i: (t or "").split(" ") for i, t in zip(df.doc_id, df.text)}
    for words in split.values():
        for s in range(len(words) - w + 1):
            k = " ".join(words[s:s + w])
            wins[k] = wins.get(k, 0) + 1
    rows = []
    for i, words in split.items():
        n = len(words)
        covered = np.zeros(n, dtype=bool)
        for s in range(n - w + 1):
            if wins[" ".join(words[s:s + w])] >= min_count:
                covered[s:s + w] = True
        kept = [wd for wd, c in zip(words, covered) if not c]
        rows.append((i, " ".join(kept), n, int(covered.sum())))
    return pd.DataFrame(rows, columns=["doc_id", "text_dedup", "n_tokens",
                                       "n_removed"])


def test_dedup_spans_matches_naive():
    phrase = "the quick brown fox jumps over the lazy dog tonight"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            f"alpha beta {phrase} gamma delta epsilon zeta eta theta",
            f"one two three four {phrase} five six seven eight nine",
            "totally unique words without any repeated window here at all ok",
            f"{phrase} leading occurrence of the shared phrase here now",
            "short doc",                       # < w words: untouched
            "x y " + phrase,                   # duplicate at the very end
        ],
    })
    got = (dedup_spans(rd.from_pandas(docs), window_words=8, min_count=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _naive_span_dedup(docs, 8, 2).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # the shared 10-word phrase appears in 4 docs -> all copies removed
    assert (got.loc[got.doc_id.isin([0, 1, 3, 5]), "n_removed"] >= 10).all()
    # untouched docs round-trip byte-identical
    assert got.loc[got.doc_id == 2, "text_dedup"].iloc[0] == docs.text[2]
    assert got.loc[got.doc_id == 4, "text_dedup"].iloc[0] == "short doc"


def test_dedup_spans_overlapping_windows_union():
    # 9-word duplicated run -> two overlapping 8-word dup windows; the
    # removal is their UNION (all 9 tokens), not double-counted
    run = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": [f"pre {run} post", f"{run} tail1 tail2 tail3"],
    })
    got = (dedup_spans(rd.from_pandas(docs), window_words=8, min_count=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.n_removed.tolist() == [9, 9]
    assert got.text_dedup.tolist() == ["pre post", "tail1 tail2 tail3"]


# --- dsir_logweight ----------------------------------------------------------


def _naive_dsir(raw: pd.DataFrame, tgt_mask: pd.Series, buckets: int) -> pd.DataFrame:
    def gb(text):
        ws = _WORD_RE.findall((text or "").lower())
        grams = ws + [a + " " + b for a, b in zip(ws, ws[1:])]
        return np.array([md5_u64(g) % buckets for g in grams], dtype=np.int64)

    ct = np.zeros(buckets)
    cr = np.zeros(buckets)
    for t, is_t in zip(raw.text, tgt_mask):
        b = gb(t)
        if len(b):
            cr += np.bincount(b, minlength=buckets)
            if is_t:
                ct += np.bincount(b, minlength=buckets)
    lam = (np.log((ct + 1.0) / (ct.sum() + buckets))
           - np.log((cr + 1.0) / (cr.sum() + buckets)))
    rows = []
    for i, t in zip(raw.doc_id, raw.text):
        b = gb(t)
        if not len(b):
            continue
        k = np.bincount(b, minlength=buckets).astype(float)
        rows.append((i, len(b), float(k @ lam)))
    return pd.DataFrame(rows, columns=["doc_id", "n_grams", "logweight"])


def test_dsir_logweight_matches_naive_and_ranks_targetlike_higher():
    rng = np.random.default_rng(7)
    tgt_vocab = ["solar", "panel", "energy", "grid", "inverter", "watt"]
    raw_vocab = ["random", "text", "words", "filler", "noise", "stuff"]
    texts, is_tgt = [], []
    for i in range(40):
        v = tgt_vocab if i % 2 == 0 else raw_vocab
        texts.append(" ".join(rng.choice(v, size=12)))
        is_tgt.append(i % 4 == 0)  # a target-flagged subset of the tgt-like
    docs = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs)
    tgt = rd.from_pandas(docs[np.array(is_tgt)])
    got = (dsir_logweight(ds, tgt, buckets=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (_naive_dsir(docs, pd.Series(is_tgt), 64)
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, rtol=0, atol=1e-9)
    m = got.merge(pd.DataFrame({"doc_id": docs.doc_id,
                                "tgtlike": [i % 2 == 0 for i in range(40)]}))
    assert (m[m.tgtlike].logweight.mean()
            > m[~m.tgtlike].logweight.mean() + 1.0)


def test_dsir_empty_docs_dropped():
    docs = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                         "text": ["hello world", ""]})
    ds = rd.from_pandas(docs)
    got = dsir_logweight(ds, ds, buckets=16).to_pandas()
    assert got.doc_id.tolist() == [1]
    assert got.n_grams.iloc[0] == 3  # 2 unigrams + 1 bigram


# --- normalize_text ----------------------------------------------------------


def test_normalize_text_nfc_control_whitespace():
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "already clean text",
            "  leading and   inner\t\truns\n\nand trailing  ",
            "ctrl\x00chars\x07are\x1fstripped",
            "étude nfc",          # combining acute -> precomposed
            "tabs\tand\nnewlines\rmix",
        ],
    })
    got = (normalize_text(rd.from_pandas(docs)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.text_norm.tolist() == [
        "already clean text",
        "leading and inner runs and trailing",
        "ctrlcharsarestripped",
        "étude nfc",
        "tabs and newlines mix",
    ]
    assert got.changed.tolist() == [False, True, True, True, True]
    assert (got.n_chars_norm == got.text_norm.str.len()).all()
    # idempotence: normalizing the normalized text changes nothing
    again = normalize_text(
        rd.from_pandas(got.rename(columns={"text_norm": "text"})
                       [["doc_id", "text"]])).to_pandas()
    assert not again.changed.any()


# --- interpolate_by_time -----------------------------------------------------


def test_interpolate_linear_interior_and_edges():
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 03:00",   # 2-hour interior gap
        "2024-01-01 04:00",
    ])
    df = pd.DataFrame({"g": np.int64(1), "ts": ts,
                       "v": [1.0, 7.0, 9.0]})
    got = (interpolate_by_time(rd.from_pandas(df), "ts", "v", freq="h",
                               by=["g"]).to_pandas()
           .sort_values("ts").reset_index(drop=True))
    # grid = 00,01,02,03,04; 01 and 02 interpolate between 1.0 and 7.0
    assert len(got) == 5
    exact = [1.0,
             1.0 + 6.0 * (1.0 / 3.0),
             1.0 + 6.0 * (2.0 / 3.0),
             7.0, 9.0]
    np.testing.assert_array_equal(got.v.to_numpy(), np.array(exact))


def test_interpolate_edge_gaps_stay_null_and_groups_isolated():
    ts = pd.to_datetime(["2024-01-02", "2024-01-04"])
    df = pd.DataFrame({
        "g": np.array([1, 1, 2, 2], dtype=np.int64),
        "ts": list(ts) + list(ts),
        "v": [np.nan, 4.0, 2.0, np.nan],
    })
    got = (interpolate_by_time(rd.from_pandas(df), "ts", "v", freq="D",
                               by=["g"]).to_pandas()
           .sort_values(["g", "ts"]).reset_index(drop=True))
    # g=1: leading NaN has no prev -> stays NaN (and so does the padded
    # 01-03 row between a NaN and a known? no: prev unknown -> NaN)
    g1 = got[got.g == 1].v.tolist()
    g2 = got[got.g == 2].v.tolist()
    assert np.isnan(g1[0]) and np.isnan(g1[1]) and g1[2] == 4.0
    assert g2[0] == 2.0 and np.isnan(g2[1]) and np.isnan(g2[2])
    # group 2's known value never leaks into group 1's interpolation
    assert len(got) == 6


def test_interpolate_exact_expression():
    # fill must be pv + (nv-pv) * ((t-pt)/(nt-pt)) — divide-first
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 05:00"])
    df = pd.DataFrame({"g": np.int64(1), "ts": ts, "v": [0.123456, 9.87654]})
    got = (interpolate_by_time(rd.from_pandas(df), "ts", "v", freq="h",
                               by=["g"]).to_pandas()
           .sort_values("ts").reset_index(drop=True))
    pv, nv = 0.123456, 9.87654
    for i in range(1, 5):
        frac = (i * 3600e6) / (5 * 3600e6)
        assert got.v[i] == pv + (nv - pv) * frac


# --- BPE tokenizer -----------------------------------------------------------


def test_bpe_train_classic_example():
    # Sennrich's running example shape: 'low' family
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["low low low low low",
                 "lower lower",
                 "newest newest newest newest newest newest",
                 "widest widest widest"],
    })
    merges = bpe_train(rd.from_pandas(docs), num_merges=10, max_words=100)
    assert len(merges) == 10
    # the 'est</w>' suffix (9 occurrences) and the 'low' stem (7) must be
    # assembled by the first 10 merges, whatever the tie-break path
    joined = ["".join(p) for p in merges]
    assert "est</w>" in joined
    assert "low" in joined
    # training is deterministic
    merges2 = bpe_train(rd.from_pandas(docs), num_merges=10, max_words=100)
    assert merges == merges2


def test_bpe_encode_word_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"),
              ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ("low", "est</w>")
    assert encode_word("low", ranks) == ("low", "</w>")
    assert encode_word("xyz", ranks) == ("x", "y", "z", "</w>")


def test_bpe_token_counts_matches_per_word_encoding():
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["low lower lowest", "newest news", "unseen zz qq"],
    })
    ds = rd.from_pandas(docs)
    merges = bpe_train(ds, num_merges=8, max_words=100)
    got = (bpe_token_counts(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ranks = {p: i for i, p in enumerate(merges)}
    for _, row in got.iterrows():
        text = docs.loc[docs.doc_id == row.doc_id, "text"].iloc[0]
        words = _WORD_RE.findall(text.lower())
        assert row.n_words == len(words)
        assert row.n_tokens == sum(len(encode_word(w, ranks)) for w in words)
    # fewer merges can only lengthen encodings
    got_short = (bpe_token_counts(ds, merges[:2]).to_pandas()
                 .sort_values("doc_id").reset_index(drop=True))
    assert (got_short.n_tokens >= got.n_tokens).all()


def test_dsir_resample_gumbel_topk():
    from pytimetk_ray.pipelines.corpus import dsir_resample

    rng = np.random.default_rng(3)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["omega", "sigma", "kappa", "theta"]
    texts = [" ".join(rng.choice(vocab_a if i % 2 == 0 else vocab_b, size=10))
             for i in range(30)]
    docs = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs)
    tgt = rd.from_pandas(docs[docs.doc_id % 2 == 0])
    got = (dsir_resample(ds, tgt, k=10, buckets=32)
           .to_pandas().reset_index(drop=True))
    assert len(got) == 10
    # deterministic: identical second run
    got2 = dsir_resample(ds, tgt, k=10, buckets=32).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)
    # key really is round6(round6(logweight)/T + md5 Gumbel)
    for _, r in got.iterrows():
        h = md5_u64(str(int(r.doc_id)))
        u = ((h % (1 << 53)) + 0.5) / float(1 << 53)
        g = -np.log(-np.log(u))
        assert r.key == np.round(round(r.logweight, 6) / 1.0 + g, 6)
    # the selected set is exactly the global top-10 by (key desc, id)
    full = dsir_resample(ds, tgt, k=30, buckets=32).to_pandas()
    want = (full.sort_values(["key", "doc_id"], ascending=[False, True])
            .head(10).doc_id.tolist())
    assert got.doc_id.tolist() == want
