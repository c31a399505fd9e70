"""TierEncoder — actor-pool stage compressing tier rows into Gorilla/DoD
chunks (the retention-tier storage format, BASELINE.json north_rule).

Used as ``map_batches(TierEncoder, concurrency=N, batch_format="pandas")``
after hash-partitioning by conv_id and sorting by (conv_id, bucket_ts):
``__init__`` runs once per actor (codec setup, scratch buffers, counters);
``__call__`` encodes every conversation segment in the batch.

Chunk layout: ONE row per (conv, chunk) holding the shared delta-of-delta
timestamp blob plus one Gorilla blob per value column.  Timestamps are
divided by ``ts_scale`` (the chunk's GCD — tier buckets are grid-aligned, so
the tier step divides every timestamp) before DoD encoding, which turns a
regular 1-minute grid into a constant-delta stream of ~1 bit/point.

Chunk-stream composition: a (conv_id, tier) series may be stored as MULTIPLE
chunks — decode reads all of them, decodes each, and concatenates by
``start_ts``.  That is what makes tier boundaries survive batch splits in a
streaming executor: correctness never depends on which actor saw which
batch, because chunk streams compose; actor state amortizes setup and tracks
encode statistics.  (Buffering undecoded rows across batches in actor state
would lose data at end-of-stream — map_batches actors have no flush hook —
so composition, not buffering, is the scale-safe design.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pytimetk_ray.codec import dod_decode, dod_encode, gorilla_decode, gorilla_encode

DEFAULT_VALUE_COLUMNS = ["value_sum", "value_count", "value_min", "value_max"]


class TierEncoder:
    """Callable class for ``map_batches``: tier rows -> chunk rows."""

    def __init__(self, tier: str, value_columns: list[str] | None = None,
                 date_column: str = "bucket_ts", key_column: str = "conv_id",
                 max_points_per_chunk: int = 4096):
        self.tier = tier
        self.value_columns = value_columns or list(DEFAULT_VALUE_COLUMNS)
        self.date_column = date_column
        self.key_column = key_column
        self.max_points = max_points_per_chunk
        self.n_points_encoded = 0  # per-actor statistic

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {
            "conv_id": [], "tier": [], "start_ts": [], "n_points": [],
            "ts_scale": [], "ts_blob": [],
        }
        for col in self.value_columns:
            rows[f"{col}_blob"] = []
        batch = batch.sort_values([self.key_column, self.date_column], kind="mergesort")
        ts_all = batch[self.date_column].to_numpy()
        unit = str(ts_all.dtype)
        unit = unit[unit.index("[") + 1 : unit.index("]")]
        vals_all = {c: batch[c].to_numpy().astype(np.float64) for c in self.value_columns}
        ts_i64 = ts_all.astype(np.int64)
        codes, uniques = pd.factorize(batch[self.key_column], sort=False)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(batch) else np.empty(0, int)
        bounds = np.append(starts, len(batch))
        for gi in range(len(starts)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            conv = uniques[codes[starts[gi]]]
            for s in range(lo, hi, self.max_points):
                e = min(s + self.max_points, hi)
                ts = ts_i64[s:e]
                scale = int(np.gcd.reduce(np.abs(ts))) if (ts != 0).any() else 1
                scale = max(scale, 1)
                rows["conv_id"].append(conv)
                rows["tier"].append(self.tier)
                rows["start_ts"].append(ts_all[s])
                rows["n_points"].append(e - s)
                rows["ts_scale"].append(scale)
                rows["ts_blob"].append(dod_encode(ts // scale))
                for col in self.value_columns:
                    rows[f"{col}_blob"].append(gorilla_encode(vals_all[col][s:e]))
                self.n_points_encoded += e - s
        out = pd.DataFrame(rows)
        if len(out):
            out["start_ts"] = out["start_ts"].astype(f"datetime64[{unit}]")
            out["n_points"] = out["n_points"].astype(np.int64)
            out["ts_scale"] = out["ts_scale"].astype(np.int64)
        return out


def decode_chunks(chunks: pd.DataFrame, unit: str = "us") -> pd.DataFrame:
    """Decode chunk rows back to tier rows (bit-equality check path).

    Accepts any number of chunks per (conv); concatenates by start_ts so
    split streams recompose exactly."""
    value_cols = [c[: -len("_blob")] for c in chunks.columns if c.endswith("_blob") and c != "ts_blob"]
    frames = []
    for (conv, tier), g in chunks.groupby(["conv_id", "tier"], sort=False):
        g = g.sort_values("start_ts", kind="mergesort")
        ts = np.concatenate(
            [dod_decode(b, n) * s for b, n, s in zip(g["ts_blob"], g["n_points"], g["ts_scale"])]
        ) if len(g) else np.empty(0, dtype=np.int64)
        data = {"conv_id": conv, "bucket_ts": ts.astype(f"datetime64[{unit}]")}
        for col in value_cols:
            data[col] = np.concatenate(
                [gorilla_decode(b, n) for b, n in zip(g[f"{col}_blob"], g["n_points"])]
            ) if len(g) else np.empty(0)
        frames.append(pd.DataFrame(data))
        _ = tier
    if not frames:
        return pd.DataFrame(columns=["conv_id", "bucket_ts"])
    return pd.concat(frames, ignore_index=True)
