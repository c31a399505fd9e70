"""Tests: HyperLogLog, SpaceSaving heavy hitters, cohort retention."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.kernels.sketch import HLL, SpaceSaving
from pytimetk_ray.ops.cohort import cohort_retention
from pytimetk_ray.ops.distinct import approx_ndistinct
from pytimetk_ray.pipelines.corpus import (token_totals, vocab_topk,
                                           vocab_topk_sketch)


# --- HLL ---------------------------------------------------------------------


@pytest.mark.parametrize("n", [50, 2000, 100_000])
def test_hll_error_within_envelope(n):
    rng = np.random.default_rng(n)
    vals = np.unique(rng.integers(0, 1 << 62, size=n).astype(np.uint64))
    h = pd.util.hash_array(np.concatenate([vals, vals[: n // 3]]))
    est = HLL(12).update_hashes(h).estimate()
    # nominal sigma = 1.04/sqrt(4096) ~ 1.6%; allow 5 sigma
    assert abs(est - len(vals)) / len(vals) < 0.085


def test_hll_merge_equals_single_pass_and_roundtrip():
    rng = np.random.default_rng(9)
    h = pd.util.hash_array(rng.integers(0, 1 << 62, size=60_000).astype(np.uint64))
    whole = HLL(10).update_hashes(h)
    parts = [HLL(10).update_hashes(c) for c in np.array_split(h, 7)]
    acc = HLL.from_bytes(parts[0].to_bytes())
    for s in parts[1:]:
        acc.merge(HLL.from_bytes(s.to_bytes()))
    assert (acc.regs == whole.regs).all()          # merge == single pass
    assert acc.estimate() == whole.estimate()
    # merge order does not matter (commutative/associative register max)
    acc2 = parts[3]
    for s in parts[:3] + parts[4:]:
        acc2.merge(s)
    assert (acc2.regs == whole.regs).all()


def test_hll_small_range_linear_counting():
    h = pd.util.hash_array(np.arange(17, dtype=np.int64))
    est = HLL(12).update_hashes(h).estimate()
    assert abs(est - 17) < 2


# --- SpaceSaving -------------------------------------------------------------


def test_spacesaving_bounds_and_guarantee():
    rng = np.random.default_rng(4)
    stream = (rng.zipf(1.4, 150_000) % 3000).astype(np.int64)
    true = collections.Counter(stream.tolist())
    s = SpaceSaving(200)
    for chunk in np.array_split(stream, 13):
        v, c = np.unique(chunk, return_counts=True)
        s.update_counts(v.tolist(), c)
    for it, cnt, err in s.topk(50):
        assert cnt - err <= true[it] <= cnt
    # guarantee: any item with true count > N/capacity is tracked
    thresh = len(stream) / 200
    for it, c in true.items():
        if c > thresh:
            assert it in s.counts


def test_spacesaving_merge_exact_regime():
    rng = np.random.default_rng(5)
    stream = rng.integers(0, 500, size=40_000)
    true = collections.Counter(stream.tolist())
    parts = []
    for chunk in np.array_split(stream, 6):
        v, c = np.unique(chunk, return_counts=True)
        parts.append(SpaceSaving(10_000).update_counts(v.tolist(), c))
    acc = parts[0]
    for s in parts[1:]:
        acc.merge(s)
    assert all(acc.counts[it] == c and acc.errs[it] == 0
               for it, c in true.items())


def test_vocab_topk_sketch_exact_regime_matches_exact(tmp_path):
    docs = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [f"alpha beta gamma{i % 7} delta word{i % 13}"
                 for i in range(50)],
    })
    ds = rd.from_pandas(docs)
    a = vocab_topk(ds, top_n=20).to_pandas()
    b = vocab_topk_sketch(ds, top_n=20, capacity=10_000).to_pandas()
    assert a.token.tolist() == b.token.tolist()
    assert (a.cnt.to_numpy() == b.cnt.to_numpy()).all()
    assert (b.err == 0).all()


def test_vocab_topk_sketch_bounds_in_tight_regime():
    docs = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "text": [f"common words here plus rare{i}" for i in range(200)],
    })
    ds = rd.from_pandas(docs)
    tot = token_totals(ds).to_pandas().set_index("token")["cnt"]
    out = vocab_topk_sketch(ds, top_n=5, capacity=16).to_pandas()
    for row in out.itertuples():
        assert row.cnt - row.err <= tot[row.token] <= row.cnt
    # the four always-present words dominate and must be reported first
    assert set(out.token.head(4)) == {"common", "words", "here", "plus"}


# --- approx_ndistinct --------------------------------------------------------


def test_approx_ndistinct_grouped_accuracy():
    rng = np.random.default_rng(11)
    n = 30_000
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], n // 3),
        "v": np.concatenate([
            rng.integers(0, 500, n // 3),        # ~500 distinct
            rng.integers(0, 5_000, n // 3),      # ~5k distinct
            np.arange(n // 3),                   # all distinct
        ]),
    })
    got = (approx_ndistinct(rd.from_pandas(df), "v", by=["g"]).to_pandas()
           .set_index("g")["ndistinct_est"])
    true = df.groupby("g")["v"].nunique()
    for g in ["a", "b", "c"]:
        assert abs(got[g] - true[g]) / true[g] < 0.085


# --- cohort_retention --------------------------------------------------------


def test_cohort_retention_matches_pandas():
    rng = np.random.default_rng(2)
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 120, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 60 * 86400, n), unit="s"),
    })
    got = (cohort_retention(rd.from_pandas(df), freq="W").to_pandas()
           .sort_values(["cohort_ts", "bucket_ts"]).reset_index(drop=True))
    wk = df.assign(b=df.ts.dt.to_period("W-SUN").dt.start_time)
    first = wk.groupby("user_id")["b"].min().rename("cohort")
    pairs = wk[["user_id", "b"]].drop_duplicates().join(first, on="user_id")
    want = (pairs.groupby(["cohort", "b"]).size().reset_index(name="n_users")
            .sort_values(["cohort", "b"]).reset_index(drop=True))
    assert got.n_users.tolist() == want.n_users.tolist()
    assert (got.cohort_ts.to_numpy().astype("datetime64[us]")
            == want.cohort.to_numpy().astype("datetime64[us]")).all()
    assert (got.bucket_ts.to_numpy().astype("datetime64[us]")
            == want.b.to_numpy().astype("datetime64[us]")).all()
    # diagonal rows are cohort sizes and cover every user exactly once
    diag = got[got.cohort_ts == got.bucket_ts]
    assert diag.n_users.sum() == df.user_id.nunique()
    # no activity can precede its cohort
    assert (got.bucket_ts >= got.cohort_ts).all()


# --- funnel ------------------------------------------------------------------


def test_funnel_stages_greedy_earliest_and_window():
    from pytimetk_ray.ops.funnel import funnel_counts, funnel_stages

    t = pd.to_datetime
    df = pd.DataFrame([
        # u1 completes in order
        (1, "view", t("2024-01-01 00:00")),
        (1, "click", t("2024-01-01 01:00")),
        (1, "purchase", t("2024-01-01 02:00")),
        # u2: click BEFORE view -> stops at stage 1 (strictly-after rule)
        (2, "click", t("2024-01-01 00:00")),
        (2, "view", t("2024-01-01 01:00")),
        # u3: completes but purchase outside the 3h window of first view
        (3, "view", t("2024-01-01 00:00")),
        (3, "click", t("2024-01-01 00:30")),
        (3, "purchase", t("2024-01-01 05:00")),
        # u4: no view at all -> stage 0
        (4, "click", t("2024-01-01 00:00")),
        # u5: greedy-earliest — the EARLIEST view anchors the window, so a
        # later view + fast click pair is not considered
        (5, "view", t("2024-01-01 00:00")),
        (5, "view", t("2024-01-01 10:00")),
        (5, "click", t("2024-01-01 10:30")),
    ], columns=["user_id", "event_type", "ts"])
    got = (funnel_stages(rd.from_pandas(df), ["view", "click", "purchase"],
                         within="3h").to_pandas()
           .set_index("user_id").sort_index())
    assert got.stage.to_dict() == {1: 3, 2: 1, 3: 2, 4: 0, 5: 1}
    assert got.loc[1, "t_last"] == t("2024-01-01 02:00")
    assert got.loc[3, "t_last"] == t("2024-01-01 00:30")
    assert pd.isna(got.loc[4, "t_first"])
    counts = (funnel_counts(
        funnel_stages(rd.from_pandas(df), ["view", "click", "purchase"],
                      within="3h"), 3).to_pandas()
        .set_index("stage")["n_users"].to_dict())
    assert counts == {0: 1, 1: 2, 2: 1, 3: 1}


def test_funnel_no_window_matches_naive():
    from pytimetk_ray.ops.funnel import funnel_stages

    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 80, n),
        "event_type": rng.choice(["view", "click", "purchase", "other"], n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 30 * 86400, n), unit="s"),
    })
    got = (funnel_stages(rd.from_pandas(df), ["view", "click", "purchase"])
           .to_pandas().set_index("user_id").sort_index())

    def naive(g):
        stage, prev = 0, pd.Timestamp.min
        for step in ["view", "click", "purchase"]:
            cand = g[(g.event_type == step) & (g.ts > prev)]
            if cand.empty:
                break
            prev = cand.ts.min()
            stage += 1
        return stage

    steps = {"view", "click", "purchase"}
    for uid, g in df[df.event_type.isin(steps)].groupby("user_id"):
        assert got.loc[uid, "stage"] == naive(g), uid


# --- grouping sets -----------------------------------------------------------


def test_cube_and_rollup_sets():
    from pytimetk_ray.ops.grouping import cube_sets, rollup_sets

    assert cube_sets(["a", "b"]) == [(), ("a",), ("b",), ("a", "b")]
    assert rollup_sets(["a", "b"]) == [("a", "b"), ("a",), ()]


def test_aggregate_grouping_sets_matches_pandas():
    from pytimetk_ray.ops.grouping import aggregate_grouping_sets, cube_sets

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], 1000),
        "source": rng.choice(["web", "chat"], 1000),
        "n": rng.integers(1, 100, 1000).astype(np.int64),
    })
    got = (aggregate_grouping_sets(rd.from_pandas(df),
                                   cube_sets(["lang", "source"]), "n")
           .to_pandas().sort_values(["lang", "source"])
           .reset_index(drop=True))
    # 3*2 + 3 + 2 + 1 rows
    assert len(got) == 12
    full = df.groupby(["lang", "source"]).agg(
        n_rows=("n", "size"), n_sum=("n", "sum")).reset_index()
    for row in full.itertuples():
        m = got[(got.lang == row.lang) & (got.source == row.source)]
        assert m.n_rows.iloc[0] == row.n_rows and m["n_sum"].iloc[0] == row.n_sum
    g_all = got[(got.lang == "(all)") & (got.source == "(all)")]
    assert g_all.n_rows.iloc[0] == 1000 and g_all.n_sum.iloc[0] == df.n.sum()
    per_lang = got[(got.source == "(all)") & (got.lang != "(all)")]
    assert per_lang.n_rows.sum() == 1000


# --- edit-distance pair verification ------------------------------------------


def test_editdist_verify_filters_by_normalized_distance():
    from pytimetk_ray.pipelines.dedup import _levenshtein_many, editdist_verify

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumped over the lazy dog",   # 2 edits
            "a completely different sentence about nothing here",
            "the quick brown fox jumps over the lazy dog",    # exact dup of 1
        ],
    })
    pairs = pd.DataFrame({
        "id_a": np.array([1, 1, 1], dtype=np.int64),
        "id_b": np.array([2, 3, 4], dtype=np.int64),
    })
    got = (editdist_verify(rd.from_pandas(pairs), rd.from_pandas(docs),
                           max_norm=0.2).to_pandas()
           .sort_values("id_b").reset_index(drop=True))
    # (1,2) close, (1,4) identical survive; (1,3) is far and dropped
    assert got.id_b.tolist() == [2, 4]
    assert got.dist.tolist() == [2, 0]
    assert got.norm_dist.iloc[1] == 0.0
    d = _levenshtein_many([docs.text[0]], [docs.text[1]])[0]
    assert got.dist.iloc[0] == d
