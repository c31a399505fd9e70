"""Property-based check: the vectorized cross-group gap-fill kernel vs a
straight per-group pandas reindex oracle (reference pad semantics)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pytimetk_ray.kernels.gapfill import pad_groups


def oracle_pad(df, group_keys, date_column, freq, fillna):
    frames = []
    for keys, gdf in df.groupby(group_keys, sort=False):
        if not isinstance(keys, tuple):
            keys = (keys,)
        grid = pd.date_range(gdf[date_column].min(), gdf[date_column].max(), freq=freq)
        padded = (
            gdf.set_index(date_column).reindex(grid).reset_index()
            .rename(columns={"index": date_column})
        )
        for k, v in zip(group_keys, keys):
            padded[k] = v
        other = [c for c in df.columns if c != date_column and c not in group_keys]
        if fillna is not None:
            padded[other] = padded[other].fillna(fillna)
        else:
            const = [c for c in other if gdf[c].nunique(dropna=False) == 1]
            if const:
                padded[const] = padded[const].ffill()
        frames.append(padded[list(df.columns)])
    return pd.concat(frames, ignore_index=True)


@settings(max_examples=40, deadline=None)
@given(
    n_groups=st.integers(1, 4),
    seed=st.integers(0, 10_000),
    freq_min=st.sampled_from([1, 5, 15]),
    fillna=st.sampled_from([None, 0]),
    with_offgrid=st.booleans(),
)
def test_pad_groups_matches_pandas_reindex(n_groups, seed, freq_min, fillna, with_offgrid):
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2024-03-01")
    for g in range(n_groups):
        n = int(rng.integers(1, 12))
        # on-grid points, optionally with duplicates dropped
        offs = np.unique(rng.integers(0, 40, size=n))
        for o in offs:
            rows.append(
                {
                    "g": f"g{g}",
                    "ts": base + pd.Timedelta(minutes=freq_min * int(o)),
                    "v": float(rng.normal()),
                    "lbl": f"L{g}" if rng.random() < 0.7 else f"X{rng.integers(2)}",
                }
            )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    if with_offgrid and len(df) > 2:
        # an off-grid row: dropped by reindex on both sides
        df.loc[df.index[-1], "ts"] = df["ts"].iloc[-1] + pd.Timedelta(seconds=7)
    df = df.sort_values(["g", "ts"], kind="mergesort", ignore_index=True)

    freq = f"{freq_min}min"
    mine = pad_groups(df, ["g"], "ts", freq, fillna=fillna)
    # oracle drops off-grid rows via reindex; recompute bounds from raw data
    exp = oracle_pad(df, ["g"], "ts", freq, fillna)

    mine = mine.sort_values(["g", "ts"], ignore_index=True)
    exp = exp.sort_values(["g", "ts"], ignore_index=True)
    assert len(mine) == len(exp)
    pd.testing.assert_series_equal(
        mine["ts"].astype("datetime64[us]"), exp["ts"].astype("datetime64[us]"),
        check_names=False,
    )
    np.testing.assert_array_equal(mine["g"].to_numpy(), exp["g"].to_numpy())
    np.testing.assert_allclose(
        mine["v"].to_numpy(np.float64), exp["v"].to_numpy(np.float64), equal_nan=True
    )
    a = mine["lbl"].where(mine["lbl"].notna(), "__NA__")
    b = exp["lbl"].where(exp["lbl"].notna(), "__NA__")
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


@settings(max_examples=40, deadline=None)
@given(
    n_groups=st.integers(1, 4),
    seed=st.integers(0, 10_000),
    cal=st.sampled_from(["MS", "QS", "YS", "3MS", "2QS"]),
    fillna=st.sampled_from([None, 0]),
    midperiod=st.booleans(),
)
def test_pad_groups_calendar_matches_pandas_reindex(n_groups, seed, cal, fillna, midperiod):
    """Calendar-unit grids (month/quarter/year starts, incl. multiples) in
    the vectorized month-index path vs per-group pandas date_range reindex."""
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        n = int(rng.integers(1, 10))
        months = np.unique(rng.integers(0, 40, size=n))
        for m in months:
            ts = pd.Timestamp("2022-01-01") + pd.DateOffset(months=int(m))
            if midperiod and rng.random() < 0.3:
                ts = ts + pd.Timedelta(days=int(rng.integers(1, 20)))  # off-grid
            rows.append({"g": f"g{g}", "ts": ts, "v": float(rng.normal()),
                         "lbl": f"L{g}" if rng.random() < 0.7 else f"X{rng.integers(2)}"})
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df = df.drop_duplicates(["g", "ts"]).sort_values(["g", "ts"], kind="mergesort",
                                                     ignore_index=True)

    # freq string mapping: our parse_freq takes '3M' style for 3-month starts
    ours = cal.replace("MS", "M").replace("QS", "Q").replace("YS", "Y")
    mine = pad_groups(df, ["g"], "ts", ours, fillna=fillna)
    exp = oracle_pad(df, ["g"], "ts", cal, fillna)

    mine = mine.sort_values(["g", "ts"], ignore_index=True)
    exp = exp.sort_values(["g", "ts"], ignore_index=True)
    assert len(mine) == len(exp), (len(mine), len(exp))
    pd.testing.assert_series_equal(
        mine["ts"].astype("datetime64[us]"), exp["ts"].astype("datetime64[us]"),
        check_names=False,
    )
    np.testing.assert_array_equal(mine["g"].to_numpy(), exp["g"].to_numpy())
    np.testing.assert_allclose(
        mine["v"].to_numpy(np.float64), exp["v"].to_numpy(np.float64), equal_nan=True
    )
    np.testing.assert_array_equal(
        mine["lbl"].fillna("~N~").to_numpy(), exp["lbl"].fillna("~N~").to_numpy()
    )
