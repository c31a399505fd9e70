"""Signal-processing augments: Hilbert transform and wavelet (CWT) features.

Reference: src/pytimetk/feature_engineering/hilbert.py:26-63 (``{col}_hilbert_
real`` / ``{col}_hilbert_imag`` via the analytic signal) and wavelet.py:27-95
(morlet CWT, one column per scale).  The reference uses scipy; scipy is not
in this environment so both are implemented on numpy FFT directly (the
analytic-signal construction is the textbook one scipy.signal.hilbert uses).

Per-group whole-series kernels — each conversation's full series must be in
one task (hash partitioning guarantees it)."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map


def hilbert_analytic(x: np.ndarray) -> np.ndarray:
    """Analytic signal via FFT (scipy.signal.hilbert construction)."""
    n = len(x)
    f = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1 : n // 2] = 2
    else:
        h[0] = 1
        h[1 : (n + 1) // 2] = 2
    return np.fft.ifft(f * h)


def augment_hilbert(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_columns: str | Sequence[str],
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``{col}_hilbert_real`` / ``{col}_hilbert_imag``."""
    cols = [value_columns] if isinstance(value_columns, str) else list(value_columns)
    group_keys, order_by = list(group_keys), list(order_by)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        for col in cols:
            re = np.empty(len(part))
            im = np.empty(len(part))
            pos = 0
            for _, g in part.groupby(group_keys, sort=False):
                a = hilbert_analytic(g[col].to_numpy(dtype=np.float64))
                re[pos : pos + len(g)] = a.real
                im[pos : pos + len(g)] = a.imag
                pos += len(g)
            part[f"{col}_hilbert_real"] = re
            part[f"{col}_hilbert_imag"] = im
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )


def _morlet(n_points: int, scale: float, w0: float = 5.0) -> np.ndarray:
    t = np.arange(-(n_points // 2), n_points - n_points // 2) / scale
    wave = np.exp(1j * w0 * t) * np.exp(-(t**2) / 2)
    return wave / np.sqrt(scale)


def augment_wavelet(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    value_column: str,
    *,
    scales: Sequence[float] = (2, 4, 8),
    method: str = "morlet",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``{col}_wavelet_{method}_scale_{s}`` magnitude columns."""
    group_keys, order_by = list(group_keys), list(order_by)
    scales = list(scales)

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        outs = {s: np.empty(len(part)) for s in scales}
        pos = 0
        for _, g in part.groupby(group_keys, sort=False):
            x = g[value_column].to_numpy(dtype=np.float64)
            n = len(x)
            for s in scales:
                width = min(max(int(10 * s), 3), max(n, 3))
                kernel_w = _morlet(width, s)
                conv = np.convolve(x, kernel_w, mode="same")
                outs[s][pos : pos + n] = np.abs(conv)
            pos += n
        for s in scales:
            part[f"{value_column}_wavelet_{method}_scale_{s}"] = outs[s]
        return part

    return partitioned_group_map(
        ds, group_keys, kernel, sort_by=group_keys + order_by, num_partitions=num_partitions
    )
