"""Tests: C4-style corpus line dedup + exact-fraction stratified sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.kernels.text import md5_u64
from pytimetk_ray.pipelines.corpus import sample_stratified
from pytimetk_ray.pipelines.linedup import dedup_lines


def _pandas_line_dedup(df: pd.DataFrame, w: int | None, min_count: int,
                       keep: str) -> pd.DataFrame:
    """Reference implementation: explicit per-line election in pandas."""
    rows = []
    for i, t in zip(df["doc_id"], df["text"]):
        if w is None:
            ls = t.split("\n")
        else:
            words = t.split(" ")
            ls = [" ".join(words[j:j + w]) for j in range(0, len(words), w)]
        for ln, line in enumerate(ls):
            rows.append((i, ln, line))
    lines = pd.DataFrame(rows, columns=["doc_id", "ln", "line"])
    counts = lines.groupby("line")["line"].transform("size")
    first = ~lines.sort_values(["doc_id", "ln"]).duplicated("line")
    first = first.reindex(lines.index)
    if keep == "first":
        kept = lines[(counts < min_count) | first]
    else:
        kept = lines[counts < min_count]
    sep = "\n" if w is None else " "
    agg = (kept.sort_values(["doc_id", "ln"])
           .groupby("doc_id")["line"].agg(sep.join))
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["text_dedup"] = out["doc_id"].map(agg).fillna("")
    n_lines = lines.groupby("doc_id").size()
    n_kept = kept.groupby("doc_id").size()
    out["n_lines"] = out["doc_id"].map(n_lines).astype(np.int64)
    out["n_removed"] = (out["n_lines"]
                        - out["doc_id"].map(n_kept).fillna(0)).astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _corpus(n_docs: int = 60, seed: int = 3) -> pd.DataFrame:
    """Multi-line docs with heavy cross-doc line repetition (boilerplate)."""
    rng = np.random.default_rng(seed)
    boiler = [f"boiler plate line {k}" for k in range(5)]
    texts = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.integers(1, 8)):
            if rng.random() < 0.4:
                lines.append(boiler[rng.integers(0, len(boiler))])
            else:
                lines.append(f"unique content {i} " +
                             " ".join(map(str, rng.integers(0, 9, size=4))))
        texts.append("\n".join(lines))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def test_dedup_lines_newline_keep_first_matches_pandas():
    df = _corpus()
    got = (dedup_lines(rd.from_pandas(df), words_per_line=None,
                       min_count=2, keep="first", num_partitions=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _pandas_line_dedup(df, None, 2, "first")
    pd.testing.assert_frame_equal(got, exp)
    # boilerplate survives exactly once corpus-wide
    all_lines = "\n".join(got["text_dedup"]).split("\n")
    for b in ["boiler plate line 0", "boiler plate line 1"]:
        assert all_lines.count(b) <= 1


def test_dedup_lines_keep_none_drops_all_instances():
    df = _corpus(seed=7)
    got = (dedup_lines(rd.from_pandas(df), words_per_line=None,
                       min_count=2, keep="none", num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _pandas_line_dedup(df, None, 2, "none")
    pd.testing.assert_frame_equal(got, exp)
    joined = "\n".join(got["text_dedup"])
    assert "boiler plate line" not in joined


def test_dedup_lines_word_windows_roundtrip_and_removal():
    # word-window mode: unique docs round-trip byte-identical; duplicated
    # windows collapse to the first instance
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "a b c d e f",            # unique -> identical round-trip
            "x y z q r s t u",        # window "x y z q" duplicated below
            "x y z q only once more",
            "completely different words here now",
        ],
    })
    got = (dedup_lines(rd.from_pandas(df), words_per_line=4, min_count=2,
                       keep="first", num_partitions=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _pandas_line_dedup(df, 4, 2, "first")
    pd.testing.assert_frame_equal(got, exp)
    assert got.loc[0, "text_dedup"] == "a b c d e f"
    assert got.loc[1, "text_dedup"] == "x y z q r s t u"
    assert got.loc[2, "text_dedup"] == "only once more"
    assert got.loc[2, "n_removed"] == 1


def test_dedup_lines_doc_fully_removed_yields_empty_text():
    df = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                       "text": ["same line", "same line"]})
    got = (dedup_lines(rd.from_pandas(df), words_per_line=None, min_count=2,
                       keep="first", num_partitions=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "text_dedup"] == "same line"
    assert got.loc[1, "text_dedup"] == ""
    assert got.loc[1, "n_removed"] == 1


def test_dedup_lines_rejects_bad_keep():
    df = pd.DataFrame({"doc_id": [1], "text": ["x"]})
    with pytest.raises(ValueError):
        dedup_lines(rd.from_pandas(df), keep="last")


def test_sample_stratified_exact_fraction_per_group():
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c", "rare"],
                                 p=[0.5, 0.3, 0.19, 0.01], size=n),
        "value": rng.normal(size=n),
    })
    frac_ppm = 200_000
    got = (sample_stratified(rd.from_pandas(df), group_column="event_type",
                             id_column="event_id", frac_ppm=frac_ppm,
                             num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # exact per-group k and exact member set (md5 rank election)
    for g, grp in df.groupby("event_type"):
        k = (len(grp) * frac_ppm + 999_999) // 1_000_000
        sub = got[got["event_type"] == g]
        assert len(sub) == k, g
        ranks = sorted((md5_u64(str(int(i))), int(i))
                       for i in grp["event_id"])
        exp_ids = sorted(i for _, i in ranks[:k])
        assert sorted(sub["event_id"].tolist()) == exp_ids, g
    # rows pass through untouched
    merged = got.merge(df, on=["event_id", "event_type"], suffixes=("", "_o"))
    assert np.array_equal(merged["value"].to_numpy(),
                          merged["value_o"].to_numpy())


def test_sample_stratified_tiny_groups_never_emptied():
    df = pd.DataFrame({"event_id": np.arange(10, dtype=np.int64),
                       "event_type": ["solo"] + ["big"] * 9,
                       "value": np.ones(10)})
    got = sample_stratified(rd.from_pandas(df), group_column="event_type",
                            id_column="event_id", frac_ppm=100_000,
                            num_partitions=2).to_pandas()
    assert (got["event_type"] == "solo").sum() == 1  # ceil(0.1 * 1) = 1
    assert (got["event_type"] == "big").sum() == 1   # ceil(0.1 * 9) = 1
    with pytest.raises(ValueError):
        sample_stratified(rd.from_pandas(df), group_column="event_type",
                          id_column="event_id", frac_ppm=2_000_000)
