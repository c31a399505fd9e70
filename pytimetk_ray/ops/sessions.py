"""augment_sessions — gap-based session ids within (group, time-ordered)
streams.

Not in the reference (pytimetk has no session windows — SURVEY.md §1.3);
added for transcript corpora: a conversation's turns split into sessions
wherever the gap to the previous turn exceeds ``gap``.  The standard
streaming-SQL identity makes it one vectorized pass:

    session_id = cumulative count of (gap > threshold) within the group

Execution: hash-partitioned per-group kernel (whole conversations per task),
pure numpy cumsum — no Python per-row work."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map
from pytimetk_ray.freq import parse_freq


def augment_sessions(
    ds: rd.Dataset,
    group_keys: Sequence[str],
    date_column: str,
    *,
    gap: str = "30 minutes",
    session_column: str = "session_id",
    tiebreakers: Sequence[str] = (),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> rd.Dataset:
    """Append ``session_column``: 0-based session index within each group
    (a new session starts when the time since the previous row > ``gap``).

    ``tiebreakers``: extra sort columns applied after ``date_column``.  With
    tied timestamps the row that carries a ``gap > threshold`` break depends
    on row order; np.lexsort is stable w.r.t. *block arrival order*, which is
    nondeterministic across runs — pass a unique column (e.g. an event id)
    to make session assignment total-order deterministic."""
    group_keys = list(group_keys)
    gap_ns = parse_freq(gap).step_ns()

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        ns = part[date_column].astype("datetime64[ns]").astype(np.int64).to_numpy()
        if group_keys:
            codes = pd.factorize(
                part[group_keys[0]] if len(group_keys) == 1
                else pd.MultiIndex.from_frame(part[group_keys]),
                sort=False,
            )[0]
        else:
            codes = np.zeros(len(part), dtype=np.int64)
        n = len(part)
        new_sess = np.zeros(n, dtype=np.int64)
        if n > 1:
            gap_break = (ns[1:] - ns[:-1]) > gap_ns
            same_group = codes[1:] == codes[:-1]
            new_sess[1:] = (gap_break & same_group).astype(np.int64)
        cum = np.cumsum(new_sess)
        # subtract each group's starting cumsum so ids restart at 0 per group
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        base = np.repeat(cum[starts], np.diff(np.append(starts, n)))
        part[session_column] = cum - base
        return part

    return partitioned_group_map(
        ds, group_keys, kernel,
        sort_by=group_keys + [date_column] + list(tiebreakers),
        num_partitions=num_partitions if group_keys else 1,
    )
