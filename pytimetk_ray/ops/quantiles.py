"""Distributed column quantiles + quantile-threshold filtering.

The corpus-scale "keep the top X% by quality score" primitive: a filter
whose threshold is a GLOBAL quantile of a score column.  The threshold
comes from the same distributed (value, count)-histogram pre-pass that
``ops/correlationfunnel.binarize`` uses (per-batch partial histograms ->
keyed reduce; the driver only ever sees one row per global DISTINCT value,
never the table), and `_weighted_np_quantiles` recovers np.nanquantile
BIT-equal from the merged histogram.

Distinct-value cardinality caveat: for continuous scores the histogram is
as big as the distinct-value count.  Quality scores in practice are ratios
of small integers or bounded-precision floats (and can be pre-rounded via
``round_to``), which keeps the histogram tiny; for truly continuous data at
100 TB use ``column_quantiles_sketch`` below (mergeable KLL,
``kernels/sketch.py``) and accept eps-rank-approximate edges.

Float-parity note (oracle): with INTEGER-valued scores the interpolated
quantile is exact in double arithmetic on both engines (d = hi-lo is an
exact int; lo + d*frac and hi - d*(1-frac) agree bit-for-bit or land
strictly between two integers, so a >=-threshold filter can never flip) —
integer scores are therefore safe at ANY q, while continuous scores carry
the usual last-ulp risk.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.ops.correlationfunnel import _weighted_np_quantiles


def column_quantiles(ds: rd.Dataset, columns: Sequence[str],
                     qs: Sequence[float], *,
                     round_to: int | None = None,
                     num_partitions: int = 8) -> pd.DataFrame:
    """Exact np.nanquantile per column from a distributed histogram.

    Returns a small frame (column, q, value).  ``round_to`` optionally
    rounds values before counting (bounds histogram cardinality for
    continuous scores, at the cost of matching quantiles-of-rounded)."""
    columns = list(columns)
    qarr = np.asarray(list(qs), dtype=np.float64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in columns:
            v = batch[c].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            if round_to is not None:
                v = np.round(v, round_to)
            vals, cnts = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({"col": c, "nval": vals,
                                        "cnt": cnts.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"col": pd.Series(dtype=object),
                          "nval": pd.Series(dtype=np.float64),
                          "cnt": pd.Series(dtype=np.int64)})

    def reduce_counts(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(["col", "nval"], as_index=False,
                            sort=False)["cnt"].sum()

    merged = partitioned_group_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["col", "nval"], reduce_counts,
        sort_by=["col", "nval"], num_partitions=num_partitions,
    ).to_pandas()

    rows = []
    for c in columns:
        h = merged[merged["col"] == c]
        vals = _weighted_np_quantiles(h["nval"].to_numpy(np.float64),
                                      h["cnt"].to_numpy(np.int64), qarr)
        for q, v in zip(qarr, vals):
            rows.append((c, float(q), float(v)))
    return pd.DataFrame(rows, columns=["column", "q", "value"])


def filter_by_quantile(ds: rd.Dataset, score_column: str, q: float, *,
                       keep: str = "above", round_to: int | None = None,
                       num_partitions: int = 8) -> tuple[rd.Dataset, float]:
    """Keep rows whose ``score_column`` is >= (``keep="above"``) or <=
    (``keep="below"``) the global q-quantile.  Returns (dataset, threshold).

    The filter itself is a stateless Arrow ``map_batches`` with the scalar
    threshold closed over — no shuffle, no broadcast table."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    thr = float(column_quantiles(ds, [score_column], [q], round_to=round_to,
                                 num_partitions=num_partitions)["value"].iloc[0])

    import pyarrow.compute as pc

    def fn(batch):
        col = batch[score_column]
        mask = pc.greater_equal(col, thr) if keep == "above" \
            else pc.less_equal(col, thr)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True), thr


def column_quantiles_sketch(ds: rd.Dataset, columns: Sequence[str],
                            qs: Sequence[float], *, k: int = 200,
                            num_partitions: int = 8) -> pd.DataFrame:
    """Approximate per-column quantiles via mergeable KLL sketches —
    the bounded-memory path for CONTINUOUS high-cardinality scores where
    the exact histogram of ``column_quantiles`` would grow with the
    distinct-value count (see module docstring caveat).

    Shape: one KLL per (block, column) built vectorized in ``map_batches``
    (the partial), serialized sketches reduced by a tiny keyed merge (one
    group per column), quantiles read off the merged sketch.  State per
    column is O(k log(n/k)) bytes INDEPENDENT of cardinality; rank error is
    the KLL eps ~ O(1/k) (k=200 => ~1% of n).  Returns (column, q, value)
    like ``column_quantiles``."""
    from pytimetk_ray.kernels.sketch import KLL

    columns = list(columns)
    qarr = [float(q) for q in qs]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            sk = KLL(k=k).update_many(batch[c].to_numpy(np.float64))
            rows.append((c, sk.to_bytes()))
        return pd.DataFrame(rows, columns=["col", "sk"])

    def merge_col(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for c, grp in part.groupby("col", sort=False):
            it = iter(grp["sk"])
            acc = KLL.from_bytes(next(it))
            for raw in it:
                acc.merge(KLL.from_bytes(raw))
            out.append((c, acc.to_bytes()))
        return pd.DataFrame(out, columns=["col", "sk"])

    merged = partitioned_group_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["col"], merge_col, sort_by=["col"],
        num_partitions=min(num_partitions, max(1, len(columns))),
    ).to_pandas()

    rows = []
    for c, raw in zip(merged["col"], merged["sk"]):
        sk = KLL.from_bytes(raw)
        for q, v in zip(qarr, sk.quantiles(qarr)):
            rows.append((c, q, float(v)))
    return pd.DataFrame(rows, columns=["column", "q", "value"])
