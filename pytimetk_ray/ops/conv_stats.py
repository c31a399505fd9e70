"""Conversation-level analytics over a transcripts/events stream.

Transcript-axis operators (the north-star input is a conversation turn
stream — BASELINE.json ``input_hint``): per-conversation summary stats and
sliding turn-window extraction, the two shapes a training-data pipeline
needs to (a) filter conversations by behavior and (b) cut fixed-size
training examples that respect conversation boundaries.

Both ride ``exec.partitioned_group_map`` (ONE hash-partition shuffle by the
conversation key, whole conversations per task, reduceat segment kernels —
the ``_segment_rollup`` convention, so sums are sequential left-to-right in
sorted order).  The partitioning key is the same one every other
per-conversation stage uses, so composed pipelines reuse the exchange.

Timestamp arithmetic stays in int64 microseconds (exact, no float
rounding); float value sums are rounded to 6 for oracle parity (plain sums
are safe at round-6, dyadic-divisor means are not — NOTES_r1 tie taxonomy —
so means are NOT emitted: consumers divide the exact pieces themselves).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.freq import parse_freq


def _group_codes(part: pd.DataFrame, by: list[str]) -> np.ndarray:
    return pd.factorize(
        part[by[0]] if len(by) == 1 else pd.MultiIndex.from_frame(part[by]),
        sort=False,
    )[0]


def conversation_stats(
    ds: rd.Dataset,
    by: Sequence[str],
    date_column: str,
    value_column: str,
    *,
    session_gap: str = "2 hours",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Per-conversation summary: turn counts, duration, gap profile, value.

    Output per group: ``n_turns``, ``t_min``/``t_max``, ``duration_us``,
    ``max_gap_us`` (0 for single-turn conversations), ``n_sessions``
    (gaps > ``session_gap`` split sessions; always >= 1), ``value_sum``
    (rounded 6).
    """
    by = list(by)
    gap_us = parse_freq(session_gap).step_ns() // 1000

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        n = len(part)
        codes = _group_codes(part, by)
        us = part[date_column].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = part[value_column].to_numpy(np.float64)
        gap = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = codes[1:] == codes[:-1]
            gap[1:] = np.where(same, us[1:] - us[:-1], 0)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.append(starts[1:], n)
        out = part.iloc[starts][by].reset_index(drop=True)
        out["n_turns"] = (ends - starts).astype(np.int64)
        out["t_min"] = us[starts].view("datetime64[us]")
        out["t_max"] = us[ends - 1].view("datetime64[us]")
        out["duration_us"] = us[ends - 1] - us[starts]
        out["max_gap_us"] = np.maximum.reduceat(gap, starts)
        out["n_sessions"] = np.add.reduceat(
            (gap > gap_us).astype(np.int64), starts) + 1
        out["value_sum"] = np.round(np.add.reduceat(vals, starts), 6)
        return out

    return partitioned_group_map(ds, by, per_part,
                                 sort_by=by + [date_column],
                                 num_partitions=num_partitions)


def conversation_windows(
    ds: rd.Dataset,
    by: Sequence[str],
    date_column: str,
    value_column: str,
    *,
    window: int = 4,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Sliding full windows of ``window`` consecutive turns per conversation.

    One row per window START turn that has ``window-1`` same-conversation
    followers: the key columns, ``w_start_ts`` (start turn's timestamp),
    ``w_sum`` (value sum over the window, rounded 6), ``w_max`` (exact).
    Conversations shorter than ``window`` emit nothing — the training-example
    cut never crosses a conversation boundary.

    Vectorized across the whole partition: one sliding_window_view over the
    sorted value column; windows crossing a group boundary are masked out by
    comparing factorized group codes at the window's two ends.
    """
    by = list(by)
    if window < 1:
        raise ValueError("window must be >= 1")

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        n = len(part)
        if n < window:
            out = part.iloc[:0][by].reset_index(drop=True)
            out["w_start_ts"] = pd.Series(dtype="datetime64[us]")
            out["w_sum"] = pd.Series(dtype=np.float64)
            out["w_max"] = pd.Series(dtype=np.float64)
            return out
        codes = _group_codes(part, by)
        v = part[value_column].to_numpy(np.float64)
        sw = np.lib.stride_tricks.sliding_window_view(v, window)
        idx = np.nonzero(codes[: n - window + 1] == codes[window - 1:])[0]
        head = part.iloc[idx]
        out = head[by].reset_index(drop=True)
        out["w_start_ts"] = head[date_column].astype(
            "datetime64[us]").reset_index(drop=True)
        # np.cumsum-diff would cancel; per-window left-to-right add keeps
        # the sum order identical to the SQL window's sequential frame
        out["w_sum"] = np.round(np.add.reduce(sw[idx], axis=1), 6)
        out["w_max"] = np.max(sw[idx], axis=1)
        return out

    return partitioned_group_map(ds, by, per_part,
                                 sort_by=by + [date_column],
                                 num_partitions=num_partitions)
