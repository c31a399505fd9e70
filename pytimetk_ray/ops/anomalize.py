"""anomalize — per-series decomposition + IQR anomaly detection.

Reference: src/pytimetk/core/anomalize.py:37-60 (signature), :479-602
(pipeline: decompose -> IQR on remainder -> recompose bands -> clean).
Output columns per group: the group keys, date, and ``observed seasonal
seasadj trend remainder anomaly anomaly_score anomaly_direction
recomposed_l1 recomposed_l2 observed_clean``.

Execution: the CPU-heavy per-series model path.  Groups are hash-partitioned
and each partition task loops its (whole, sorted) groups through the numpy
decomposition kernel — one task per partition, thousands of conversations per
task, streaming with backpressure.  With statsmodels installed the ``stl``
method uses real STL; here the classical decomposition stands in (same
column contract)."""

from __future__ import annotations

from typing import Sequence

import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.kernels.decomp import anomalize_frame


def anomalize(
    ds: rd.Dataset,
    date_column: str,
    value_column: str,
    *,
    by: Sequence[str] = (),
    period: int | None = None,
    trend: int | None = None,
    method: str = "twitter",
    decomp: str = "additive",
    clean: str = "min_max",
    iqr_alpha: float = 0.05,
    clean_alpha: float = 0.75,
    bind_data: bool = False,
    stl_robust: bool = True,
    stl_inner: int | None = None,
    stl_outer: int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """``bind_data=True`` keeps the input's other columns alongside the 11
    diagnostic columns (reference anomalize.py:596-599)."""
    by = list(by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        frames = []
        groups = part.groupby(by, sort=False) if by else [((), part)]
        for keys, gdf in groups:
            if not isinstance(keys, tuple):
                keys = (keys,)
            res = anomalize_frame(
                gdf,
                date_column,
                value_column,
                period=period,
                trend=trend,
                method=method,
                decomp=decomp,
                clean=clean,
                iqr_alpha=iqr_alpha,
                clean_alpha=clean_alpha,
                stl_robust=stl_robust,
                stl_inner=stl_inner,
                stl_outer=stl_outer,
            )
            if bind_data:
                res = pd.concat(
                    [gdf.reset_index(drop=True), res.drop(columns=[date_column])],
                    axis=1,
                )
            else:
                for k, val in zip(by, keys):
                    res.insert(0, k, val)
            frames.append(res)
        if not frames:
            return part.head(0)
        return pd.concat(frames, ignore_index=True)

    return partitioned_group_map(
        ds, by, kernel, sort_by=by + [date_column],
        num_partitions=num_partitions if by else 1,
    )
