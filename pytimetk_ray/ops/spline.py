"""augment_spline — B-spline basis columns from a date or value column.

Reference: src/pytimetk/feature_engineering/spline.py:59-71 (df / degree /
knots params; one basis column per function).  The reference uses patsy;
neither patsy nor scipy is in this environment, so the basis is computed
with the textbook Cox-de Boor recursion in numpy.

Knot placement (patsy ``bs`` convention): ``knots`` are INTERIOR knots;
boundary knots default to the column's min/max.  The pre-pass is scale-safe:
min/max come from a Ray aggregate, and default quantile knots come from a
BOUNDED random sample (exact when the dataset is smaller than the sample
cap) — the full column never lands on the driver.  Basis evaluation is a
stateless vectorized ``map_batches``."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def bspline_basis(x: np.ndarray, knots: np.ndarray, degree: int) -> np.ndarray:
    """Cox-de Boor B-spline basis matrix (n_points x n_basis).

    ``knots`` is the FULL breakpoint sequence including the boundary values
    (first/last); boundaries are repeated degree+1 times internally
    (patsy/splines convention).  Partition of unity holds on
    [knots[0], knots[-1]]."""
    knots = np.asarray(knots, dtype=np.float64)
    lo, hi = knots[0], knots[-1]
    interior = knots[1:-1]
    t = np.concatenate([[lo] * (degree + 1), interior, [hi] * (degree + 1)])
    n_basis = len(t) - degree - 1
    # degree-0 indicator functions (last nonzero-width interval right-closed)
    nz = np.flatnonzero(t[1:] > t[:-1])
    last_nz = nz[-1] if len(nz) else len(t) - 2
    B = np.zeros((len(x), len(t) - 1))
    for j in range(len(t) - 1):
        if j == last_nz:
            B[:, j] = (x >= t[j]) & (x <= t[j + 1])
        else:
            B[:, j] = (x >= t[j]) & (x < t[j + 1])
    # recursion
    for d in range(1, degree + 1):
        nb = len(t) - d - 1
        Bn = np.zeros((len(x), nb))
        for j in range(nb):
            left_den = t[j + d] - t[j]
            right_den = t[j + d + 1] - t[j + 1]
            term = 0.0
            if left_den > 0:
                term = (x - t[j]) / left_den * B[:, j]
            if right_den > 0:
                term = term + (t[j + d + 1] - x) / right_den * B[:, j + 1]
            Bn[:, j] = term
        B = Bn
    return B[:, :n_basis]


def augment_spline(
    ds: rd.Dataset,
    column: str,
    *,
    df: int = 5,
    degree: int = 3,
    knots: np.ndarray | list | None = None,
    boundary_knots: tuple[float, float] | None = None,
    sample_cap: int = 250_000,
) -> rd.Dataset:
    """Append ``{column}_spline_{i}`` basis columns (i = 1..df).

    ``df`` sets the number of basis functions; ``knots`` are INTERIOR knots
    (patsy bs convention) defaulting to quantiles of the column; boundary
    knots default to the column min/max (timestamps are converted to epoch
    seconds first)."""
    n_interior = max(df - degree - 1, 0) if knots is None else len(knots)

    def to_float(s: pd.Series) -> np.ndarray:
        if np.issubdtype(s.dtype, np.datetime64):
            return s.astype("datetime64[ns]").astype(np.int64) / 1e9
        return s.to_numpy(dtype=np.float64)

    def _scalar(v) -> float:
        if isinstance(v, (np.datetime64, pd.Timestamp)):
            return float(pd.Timestamp(v).value) / 1e9
        return float(v)

    if knots is None or boundary_knots is None:
        if boundary_knots is None:
            from ray.data.aggregate import Max, Min

            stats = ds.aggregate(Min(column), Max(column))
            lo = _scalar(stats[f"min({column})"])
            hi = _scalar(stats[f"max({column})"])
        else:
            lo, hi = float(boundary_knots[0]), float(boundary_knots[1])
        if knots is None and n_interior > 0:
            # bounded sample for quantile knots (exact when n <= sample_cap)
            n = ds.count()
            col_ds = ds.select_columns([column])
            if n > sample_cap:
                col_ds = col_ds.random_sample(sample_cap / n, seed=0)
            x_all = to_float(col_ds.to_pandas()[column])
            qs = np.linspace(0, 1, n_interior + 2)[1:-1]
            knots_arr = np.quantile(x_all, qs)
        elif knots is None:
            knots_arr = np.array([])
        else:
            knots_arr = np.asarray(knots, dtype=np.float64)
    else:
        knots_arr = np.asarray(knots, dtype=np.float64)
        lo, hi = float(boundary_knots[0]), float(boundary_knots[1])

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.clip(to_float(batch[column]), lo, hi)
        B = bspline_basis(x, np.concatenate([[lo], knots_arr, [hi]]), degree)
        for i in range(min(df, B.shape[1])):
            batch[f"{column}_spline_{i + 1}"] = B[:, i]
        return batch

    return ds.map_batches(apply, batch_format="pandas")
