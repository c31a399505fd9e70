"""Tests: M4 and LTTB visualization downsampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.ops.downsample import _lttb_one, lttb_downsample, m4_downsample


def _series(n_groups=6, n=400, seed=2) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    frames = []
    eid = 0
    for g in range(n_groups):
        ts = (np.datetime64("2024-01-01", "us")
              + np.cumsum(rng.integers(1, 10_000_000, size=n)).astype(
                  "timedelta64[us]"))
        frames.append(pd.DataFrame({
            "event_id": np.arange(eid, eid + n, dtype=np.int64),
            "g": f"u{g}",
            "ts": ts,
            "value": np.round(rng.normal(0, 5, size=n), 2),
        }))
        eid += n
    return pd.concat(frames, ignore_index=True)


def test_m4_keeps_extremes_and_boundaries():
    df = _series()
    out = (m4_downsample(rd.from_pandas(df), ["g"], "ts", "value",
                         freq="1D", tie_breaker="event_id",
                         num_partitions=4)
           .to_pandas())
    assert len(out) < len(df)
    day = df["ts"].dt.floor("D")
    for (g, d), grp in df.groupby(["g", day], sort=False):
        sub = out[(out["g"] == g) & (out["ts"].dt.floor("D") == d)]
        # min/max values and first/last timestamps all survive
        assert grp["value"].min() in sub["value"].values
        assert grp["value"].max() in sub["value"].values
        assert grp["ts"].min() in sub["ts"].values
        assert grp["ts"].max() in sub["ts"].values
        assert len(sub) <= 4
    # kept rows are verbatim input rows
    merged = out.merge(df, on=["event_id", "g", "ts", "value"])
    assert len(merged) == len(out)


def test_m4_min_tie_goes_to_first_occurrence():
    ts = pd.to_datetime(["2024-01-01 00:01", "2024-01-01 00:02",
                         "2024-01-01 00:03", "2024-01-01 00:04"])
    df = pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                       "g": "a", "ts": ts,
                       "value": [5.0, 1.0, 1.0, 5.0]})
    out = (m4_downsample(rd.from_pandas(df), ["g"], "ts", "value",
                         freq="1D", tie_breaker="event_id",
                         num_partitions=2).to_pandas())
    # first/last/(min tie -> earlier row)/max(first occurrence=row 0)
    assert sorted(out["event_id"].tolist()) == [0, 1, 3]


def _lttb_reference(x, y, n_out):
    """Straightforward reading of Steinarsson's pseudocode (sequential)."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return list(range(n))
    m = n_out - 2
    edges = [1 + (k * (n - 2)) // m for k in range(m + 1)]
    kept = [0]
    a = 0
    for k in range(m):
        lo, hi = edges[k], edges[k + 1]
        if k + 1 < m:
            nlo, nhi = edges[k + 1], edges[k + 2]
            cx = sum(x[nlo:nhi]) / (nhi - nlo)
            cy = sum(y[nlo:nhi]) / (nhi - nlo)
        else:
            cx, cy = x[n - 1], y[n - 1]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((x[a] - cx) * (y[i] - y[a])
                       - (x[a] - x[i]) * (cy - y[a]))
            if area > best_area:
                best, best_area = i, area
        kept.append(best)
        a = best
    kept.append(n - 1)
    return kept


def test_lttb_one_matches_reference_pseudocode():
    rng = np.random.default_rng(9)
    for n, n_out in [(100, 10), (57, 13), (1000, 50), (21, 20), (20, 20)]:
        x = np.sort(rng.uniform(0, 1e6, size=n))
        y = rng.normal(size=n)
        got = _lttb_one(x, y, n_out).tolist()
        exp = _lttb_reference(list(x), list(y), n_out)
        assert got == exp, (n, n_out)


def test_lttb_endpoints_and_exact_count():
    df = _series(n_groups=4, n=300, seed=5)
    out = (lttb_downsample(rd.from_pandas(df), ["g"], "ts", "value",
                           n_out=25, num_partitions=3)
           .to_pandas())
    for g, grp in df.groupby("g"):
        sub = out[out["g"] == g].sort_values("ts")
        assert len(sub) == 25
        assert sub["ts"].iloc[0] == grp["ts"].min()
        assert sub["ts"].iloc[-1] == grp["ts"].max()
    merged = out.merge(df, on=["event_id", "g", "ts", "value"])
    assert len(merged) == len(out)   # verbatim input rows


def test_lttb_small_groups_pass_through():
    df = _series(n_groups=2, n=10, seed=1)
    out = (lttb_downsample(rd.from_pandas(df), ["g"], "ts", "value",
                           n_out=25, num_partitions=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out, df.sort_values("event_id").reset_index(drop=True))
    with pytest.raises(ValueError):
        lttb_downsample(rd.from_pandas(df), ["g"], "ts", "value", n_out=2)


def test_lttb_preserves_spike():
    # a lone extreme spike must survive any reasonable reduction
    n = 500
    ts = (np.datetime64("2024-01-01", "us")
          + (np.arange(n) * 60_000_000).astype("timedelta64[us]"))
    v = np.sin(np.arange(n) / 20.0)
    v[137] = 80.0
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "g": "a",
                       "ts": ts, "value": v})
    out = (lttb_downsample(rd.from_pandas(df), ["g"], "ts", "value",
                           n_out=30, num_partitions=2).to_pandas())
    assert 80.0 in out["value"].values


def test_gopher_rules_thresholds():
    from pytimetk_ray.pipelines.text_analysis import gopher_rules

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "the quick brown fox jumps with energy " * 10,   # good doc
            "short text",                                    # too few words
            "# " * 60 + "the end with that",                 # symbol-heavy
            "\n".join("- bullet item the with" for _ in range(10)),  # bullets
            "a " * 80,                                       # mean wlen < 3
        ],
    })
    out = (gopher_rules(rd.from_pandas(docs), min_stop_words=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert bool(out.loc[0, "keep"])
    assert not bool(out.loc[1, "keep"])          # n_words < 50
    assert not bool(out.loc[2, "keep"])          # symbol_ratio >= 0.1
    assert out.loc[2, "symbol_ratio"] >= 0.1
    assert not bool(out.loc[3, "keep"])          # bullet_ratio = 1.0 >= 0.9
    assert out.loc[3, "bullet_ratio"] == 1.0
    assert not bool(out.loc[4, "keep"])          # mean word length too small
    assert out.loc[4, "mean_word_len"] < 3.0
    # signal columns are exact rationals of the underlying counts
    assert out.loc[0, "n_words"] == 70
    assert out.loc[0, "alpha_ratio"] == 1.0
    assert out.loc[0, "n_stop_words"] == 2       # 'the' + 'with'
