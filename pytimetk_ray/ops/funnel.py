"""Funnel analysis over an event stream (earliest-occurrence semantics).

Counts how many users progress through an ordered sequence of event types
— the standard product-analytics funnel: step k matches the EARLIEST event
of its type strictly after the matched step k-1 event (greedy-earliest,
the semantics of every mainstream funnel tool and of the chained
``MIN(ts) > prev`` SQL the oracle uses).  An optional ``within`` bound
requires the whole funnel to complete inside a time window of the step-1
event.

Scale shape: whole user histories co-locate via ONE
``exec.partitioned_group_map`` keyed exchange (events project to
``(user, type_code, ts)`` — narrow rows); the per-partition kernel walks
the steps vectorized across all users at once (per-step
``np.minimum.reduceat``-style segment mins, no per-user Python loop).
Output is one row per user (stage reached + step timestamps) — summarize
with a tiny count.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import group_starts, partitioned_group_map


def funnel_stages(
    ds: rd.Dataset,
    steps: Sequence[str],
    *,
    user_column: str = "user_id",
    type_column: str = "event_type",
    date_column: str = "ts",
    within=None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-user funnel progression.

    Output: ``(user, stage, t_first, t_last)`` — ``stage`` = number of
    steps completed (0..len(steps)), ``t_first``/``t_last`` the matched
    step-1 / step-``stage`` timestamps (NaT when stage == 0).  ``within``:
    optional pandas-offset/Timedelta; step k only matches while
    ``ts - t_first <= within``.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    within_us = (None if within is None
                 else int(pd.Timedelta(within).value // 1000))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        et = batch[type_column].to_numpy()
        keep = np.isin(et, steps)
        code = np.full(len(batch), -1, dtype=np.int8)
        for i, s in enumerate(steps):
            code[et == s] = i
        ts = batch[date_column].to_numpy().astype("datetime64[us]")
        return pd.DataFrame({
            user_column: batch[user_column].to_numpy()[keep],
            "code": code[keep],
            "ts": ts[keep],
        })

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        users = part[user_column].to_numpy()
        code = part["code"].to_numpy()
        ts = part["ts"].to_numpy().astype(np.int64)
        starts = group_starts(users)
        n_g = len(starts)
        ends = np.append(starts[1:], len(part))
        cur = np.full(n_g, -(2 ** 62), dtype=np.int64)   # matched step ts
        t1 = np.full(n_g, -(2 ** 62), dtype=np.int64)
        stage = np.zeros(n_g, dtype=np.int64)
        alive = np.ones(n_g, dtype=bool)
        # rows are sorted (user, ts); for each step pick, per user, the
        # earliest qualifying row — vectorized with a masked segment-min
        for k in range(len(steps)):
            mask = code == k
            cand_ts = np.where(mask, ts, np.int64(2 ** 62))
            # strictly after the previous matched event
            cand_ts = np.where(
                cand_ts > np.repeat(cur, ends - starts), cand_ts,
                np.int64(2 ** 62))
            if within_us is not None and k > 0:
                lim = np.repeat(t1 + within_us, ends - starts)
                cand_ts = np.where(cand_ts <= lim, cand_ts, np.int64(2 ** 62))
            seg_min = np.minimum.reduceat(cand_ts, starts)
            hit = alive & (seg_min < 2 ** 62)
            cur = np.where(hit, seg_min, cur)
            if k == 0:
                t1 = np.where(hit, seg_min, t1)
            stage += hit.astype(np.int64)
            alive = hit
            if not alive.any():
                break
        uniq_users = users[starts]
        t_first = np.where(stage >= 1, t1, np.int64(-2 ** 62))
        t_last = np.where(stage >= 1, cur, np.int64(-2 ** 62))
        out = pd.DataFrame({
            user_column: uniq_users,
            "stage": stage,
            "t_first": pd.Series(t_first).where(stage >= 1).astype("datetime64[us]"),
            "t_last": pd.Series(t_last).where(stage >= 1).astype("datetime64[us]"),
        })
        return out

    projected = ds.map_batches(project, batch_format="pandas")
    return partitioned_group_map(projected, [user_column], kernel,
                                 sort_by=[user_column, "ts", "code"],
                                 num_partitions=num_partitions)


def funnel_counts(stages: rd.Dataset, n_steps: int) -> rd.Dataset:
    """Collapse per-user stages into (stage, n_users) — one tiny reduce.
    Counts are CUMULATIVE-exclusive (users whose final stage is exactly k)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("stage", sort=False).size().reset_index(name="n")
        return g

    def final(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("stage", sort=False)["n"].sum().reset_index()
        return g.rename(columns={"n": "n_users"})

    partials = stages.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, [], final, sort_by=None,
                                 num_partitions=1)
