"""Cohort retention analysis over an event stream.

The classic continuous-aggregate companion to ``summarize_by_time`` /
``sessions``: bucket every user by their FIRST event period (the cohort),
then count how many of each cohort's users were active in every later
period — the retention triangle product analytics teams run over exactly
this kind of event table.

Scale shape: two keyed exchanges, both combiner-prefixed —
1. cohort pass: per-batch (user, min_ts) partials -> keyed min per user
   (state = one row per user per batch, never the event stream);
2. activity pass: per-batch DISTINCT (user, period) pairs ride the same
   user-keyed exchange, join their cohort inside the partition, and emit
   (cohort, period) pairs PER USER exactly once;
3. a tiny keyed count over (cohort, period) — output is bounded by the
   number of period pairs, independent of corpus size.

All counts are exact integers — the SQL oracle matches with no rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.freq import floor_i64

_SIDE = "__side__"


def cohort_retention(
    ds: rd.Dataset,
    *,
    user_column: str = "user_id",
    date_column: str = "ts",
    freq: str = "W",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Retention counts per (cohort period, activity period).

    Output: ``(cohort_ts, bucket_ts, n_users)`` — ``n_users`` = distinct
    users whose first-ever event falls in ``cohort_ts`` and who have at
    least one event in ``bucket_ts``.  The ``cohort_ts == bucket_ts`` row
    is the cohort size.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[date_column].to_numpy()
        unit = str(ts.dtype).split("[")[1].rstrip("]")
        b = floor_i64(ts.astype(np.int64), unit, freq)
        df = pd.DataFrame({user_column: batch[user_column].to_numpy(),
                           "bucket": b})
        g = df.groupby(user_column, sort=False)["bucket"]
        firsts = g.min().reset_index().rename(columns={"bucket": "first_b"})
        pairs = df.drop_duplicates()
        out_f = pd.DataFrame({
            user_column: firsts[user_column],
            "b": firsts["first_b"].to_numpy(np.int64),
            _SIDE: np.zeros(len(firsts), dtype=np.int8)})
        out_p = pd.DataFrame({
            user_column: pairs[user_column].to_numpy(),
            "b": pairs["bucket"].to_numpy(np.int64),
            _SIDE: np.ones(len(pairs), dtype=np.int8)})
        out = pd.concat([out_f, out_p], ignore_index=True)
        out["__unit__"] = unit
        return out

    def per_user(part: pd.DataFrame) -> pd.DataFrame:
        unit = part["__unit__"].iloc[0]
        side = part[_SIDE].to_numpy()
        mins = (part.loc[side == 0].groupby(user_column, sort=False)["b"]
                .min())
        acts = part.loc[side == 1, [user_column, "b"]].drop_duplicates()
        cohort = acts[user_column].map(mins).to_numpy(np.int64)
        out = pd.DataFrame({"cohort": cohort,
                            "b": acts["b"].to_numpy(np.int64)})
        g = (out.groupby(["cohort", "b"], sort=False).size()
             .reset_index(name="n_users"))
        g["__unit__"] = unit
        return g

    def final(part: pd.DataFrame) -> pd.DataFrame:
        unit = part["__unit__"].iloc[0]
        g = (part.groupby(["cohort", "b"], sort=False)["n_users"].sum()
             .reset_index())
        return pd.DataFrame({
            "cohort_ts": g["cohort"].to_numpy(np.int64)
                .astype(f"datetime64[{unit}]"),
            "bucket_ts": g["b"].to_numpy(np.int64)
                .astype(f"datetime64[{unit}]"),
            "n_users": g["n_users"].to_numpy(np.int64),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    user_pairs = partitioned_group_map(partials, [user_column], per_user,
                                       sort_by=[user_column, _SIDE, "b"],
                                       num_partitions=num_partitions)
    return partitioned_group_map(user_pairs, ["cohort", "b"], final,
                                 sort_by=["cohort", "b"],
                                 num_partitions=num_partitions)
