"""Approximate distinct counting (HyperLogLog) — bounded-memory NDV.

The engine's exact paths (``ds.groupby(...).count()`` over pre-deduped
rows, or ``drop_duplicates`` inside ``map_batches``) carry state that grows
with the number of distinct values — unbounded at 100 TB.  This operator is
the standard space-bounded alternative: per-block HLL partials (4 KiB at
p=12, ~1.6% standard error), merged by a tiny keyed reduce.  Register max
is associative and commutative, so the estimate is bit-reproducible across
block layouts — stronger than KLL's layout-dependent determinism.

SQL oracle: values hash via md5-of-string-repr (== DuckDB
``md5_number_lower(CAST(v AS VARCHAR))``, the same parity chain proven for
MinHash/SimHash), and ``HLL.estimate`` accumulates the register sum as an
EXACT integer, so the whole register state — and the final estimate up to
one last-ULP ``ln`` difference in the linear-counting branch — is
reproducible in DuckDB from the same rows (see ``events_ndistinct`` in
``__ray_entry__.oracle_sql``).  Error bounds and merge-equivalence remain
pytest-pinned, and each query row carries the sketch's nominal standard
error so downstream consumers know the contract.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map
from pytimetk_ray.kernels.sketch import HLL
from pytimetk_ray.kernels.text import md5_u64_many


def _hash_col(s: pd.Series) -> np.ndarray:
    """md5-of-string-repr, uint64 — engine-independent (DuckDB
    ``md5_number_lower`` parity) so the sketch is SQL-checkable.  Hash
    uniques only and gather: md5 is the per-row cost here, and batches
    repeat keys heavily."""
    codes, uniques = pd.factorize(s, sort=False, use_na_sentinel=False)
    uh = md5_u64_many([str(v) for v in uniques])
    return uh[codes]


def approx_ndistinct(
    ds: rd.Dataset,
    column: str,
    *,
    by: Sequence[str] = (),
    p: int = 12,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Approximate count of distinct ``column`` values per ``by``-group
    (global when ``by`` is empty).

    Shape: one stateless pass emits (group, sketch_bytes) rows — one row
    per group PER BATCH, each 2**p + 1 bytes — then a keyed reduce merges
    registers per group and reads off the estimate.  Output:
    ``(*by, ndistinct_est, rel_err)`` where ``rel_err`` is the nominal
    1.04/sqrt(2**p) standard error.
    """
    by = list(by)
    rel = 1.04 / np.sqrt(float(1 << p))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_col(batch[column])
        if by:
            out_keys: list[tuple] = []
            blobs: list[bytes] = []
            codes, uniques = pd.factorize(
                pd.MultiIndex.from_frame(batch[by]) if len(by) > 1
                else batch[by[0]], sort=False)
            order = np.argsort(codes, kind="stable")
            bounds = np.flatnonzero(np.diff(codes[order])) + 1
            for seg in np.split(order, bounds):
                g = codes[seg[0]]
                out_keys.append(uniques[g] if len(by) > 1 else (uniques[g],))
                blobs.append(HLL(p).update_hashes(h[seg]).to_bytes())
            cols = {k: pd.Series([t[i] for t in out_keys])
                    for i, k in enumerate(by)}
            cols["sketch"] = pd.Series(blobs, dtype=object)
            return pd.DataFrame(cols)
        return pd.DataFrame({"sketch": pd.Series(
            [HLL(p).update_hashes(h).to_bytes()], dtype=object)})

    def reduce_est(part: pd.DataFrame) -> pd.DataFrame:
        def est(blobs) -> float:
            acc = HLL.from_bytes(blobs.iloc[0])
            for b in blobs.iloc[1:]:
                acc.merge(HLL.from_bytes(b))
            return acc.estimate()

        if by:
            g = part.groupby(by, sort=False)["sketch"].apply(est)
            out = g.reset_index()
            out = out.rename(columns={"sketch": "ndistinct_est"})
        else:
            out = pd.DataFrame({"ndistinct_est": [est(part["sketch"])]})
        out["ndistinct_est"] = out["ndistinct_est"].astype(np.float64)
        out["rel_err"] = rel
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return partitioned_group_map(partials, by, reduce_est, sort_by=by or None,
                                 num_partitions=num_partitions if by else 1)
