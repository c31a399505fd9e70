"""Tests: PII scrubbing, TF-IDF top-k, conversation stats/windows."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.ops.conv_stats import conversation_stats, conversation_windows
from pytimetk_ray.pipelines.scrub import DEFAULT_PII_PATTERNS, redact_pii
from pytimetk_ray.pipelines.tfidf import document_frequencies, tfidf_topk


# --- scrub -------------------------------------------------------------------

def test_redact_pii_matches_python_re():
    texts = [
        "mail me at a.b-c_d@ex-1.co.uk or x@y.io thanks",
        "call 415-555-0142 or 415.555.0143 now",
        "ssn 123-45-6789 ip 10.0.0.1 mixed 999-88-7777",
        "no pii here at all",
        "",
    ]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(5), "text": texts}))
    out = redact_pii(ds, text_column="text").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    exp = list(texts)
    counts = {name: [0] * 5 for name, _, _ in DEFAULT_PII_PATTERNS}
    for name, pat, repl in DEFAULT_PII_PATTERNS:
        for i, t in enumerate(texts):
            counts[name][i] = len(re.findall(pat, t))
        exp = [re.sub(pat, repl, t) for t in exp]
    assert out["text"].tolist() == exp
    assert "<EMAIL>" in out["text"][0] and "<PHONE>" in out["text"][1]
    assert "<ID>" in out["text"][2] and "<IP>" in out["text"][2]
    for name, _, _ in DEFAULT_PII_PATTERNS:
        assert out[f"n_{name}"].tolist() == counts[name], name


def test_redact_pii_out_column_and_no_counts():
    ds = rd.from_pandas(pd.DataFrame({"text": ["hit a@b.io", "clean"]}))
    out = redact_pii(ds, out_column="scrubbed", with_counts=False).to_pandas()
    assert out["text"].tolist() == ["hit a@b.io", "clean"]  # original intact
    assert out["scrubbed"].tolist() == ["hit <EMAIL>", "clean"]
    assert not any(c.startswith("n_") for c in out.columns)


# --- tfidf -------------------------------------------------------------------

def _tfidf_expected(docs: dict[int, str], k: int, min_df: int = 1):
    from pytimetk_ray.kernels.text import _WORD_RE

    toks = {d: _WORD_RE.findall(t.lower()) for d, t in docs.items()}
    df: dict[str, int] = {}
    for words in toks.values():
        for w in set(words):
            df[w] = df.get(w, 0) + 1
    n = float(len(docs))
    rows = []
    for d, words in toks.items():
        tf: dict[str, int] = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((w, round(c * np.log(n / df[w]), 6)) for w, c in tf.items()
             if df[w] >= min_df),
            key=lambda x: (-x[1], x[0]),
        )
        for r, (w, s) in enumerate(scored[:k], start=1):
            rows.append((d, r, w, s))
    return pd.DataFrame(rows, columns=["doc_id", "rank", "token", "tfidf"])


def test_tfidf_topk_matches_reference_computation():
    docs = {
        0: "apple banana apple cherry",
        1: "banana cherry cherry dates",
        2: "apple dates eggs eggs eggs",
        3: "figs",
    }
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = tfidf_topk(ds, k=2, num_partitions=4).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    exp = _tfidf_expected(docs, k=2).sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # 'figs' is unique to doc 3: highest possible idf
    assert got[got["doc_id"] == 3].iloc[0]["token"] == "figs"


def test_tfidf_min_df_drops_rare_tokens():
    docs = {0: "aa bb", 1: "aa cc", 2: "aa dd"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = tfidf_topk(ds, k=5, min_df=2, num_partitions=2).to_pandas()
    # bb/cc/dd have df=1 -> dropped; only 'aa' (df=3, idf=0) remains
    assert set(got["token"]) == {"aa"}
    assert np.allclose(got["tfidf"], 0.0)

    dftbl = document_frequencies(ds, min_df=2, num_partitions=2).to_pandas()
    assert dftbl["token"].tolist() == ["aa"] and dftbl["df"].tolist() == [3]


# --- conversation stats / windows ---------------------------------------------

def _conv_frame():
    rows = []
    # conv A: 4 turns, gaps 60s / 7200s+1us (break) / 30s
    t = pd.Timestamp("2025-03-01").value // 1000
    gaps = [0, 60_000_000, 7_200_000_001, 30_000_000]
    ts = np.cumsum(gaps) + t
    for i, x in enumerate(ts):
        rows.append(("A", x, float(i + 1)))
    # conv B: single turn
    rows.append(("B", t + 5, 10.0))
    # conv C: 2 turns, tiny gap
    rows.append(("C", t, 1.5))
    rows.append(("C", t + 1_000_000, 2.5))
    df = pd.DataFrame(rows, columns=["conv_id", "us", "value"])
    df["ts"] = df["us"].astype("datetime64[us]")
    return df.drop(columns=["us"]).sample(frac=1.0, random_state=3)


def test_conversation_stats():
    df = _conv_frame()
    got = conversation_stats(
        rd.from_pandas(df), ["conv_id"], "ts", "value",
        session_gap="2 hours", num_partitions=3,
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    assert got["conv_id"].tolist() == ["A", "B", "C"]
    assert got["n_turns"].tolist() == [4, 1, 2]
    assert got["max_gap_us"].tolist() == [7_200_000_001, 0, 1_000_000]
    assert got["n_sessions"].tolist() == [2, 1, 1]
    assert got["duration_us"].tolist() == [7_290_000_001, 0, 1_000_000]
    assert got["value_sum"].tolist() == [10.0, 10.0, 4.0]
    a = got.iloc[0]
    assert a["t_max"] - a["t_min"] == pd.Timedelta(microseconds=7_290_000_001)


def test_conversation_windows_respect_boundaries():
    df = _conv_frame()
    got = conversation_windows(
        rd.from_pandas(df), ["conv_id"], "ts", "value",
        window=2, num_partitions=3,
    ).to_pandas().sort_values(["conv_id", "w_start_ts"]).reset_index(drop=True)

    # A: 3 windows (of 4 turns); B: none; C: 1 window
    assert got["conv_id"].tolist() == ["A", "A", "A", "C"]
    assert got["w_sum"].tolist() == [3.0, 5.0, 7.0, 4.0]
    assert got["w_max"].tolist() == [2.0, 3.0, 4.0, 2.5]

    none = conversation_windows(
        rd.from_pandas(df), ["conv_id"], "ts", "value",
        window=10, num_partitions=3,
    ).to_pandas()
    assert len(none) == 0


def test_conversation_windows_bad_window():
    df = _conv_frame()
    with pytest.raises(ValueError):
        conversation_windows(rd.from_pandas(df), ["conv_id"], "ts", "value",
                             window=0)
