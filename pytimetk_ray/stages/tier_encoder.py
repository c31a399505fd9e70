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

from pytimetk_ray.codec.vectorized import dod_decode_fast as dod_decode
from pytimetk_ray.codec.vectorized import gorilla_decode_fast as gorilla_decode

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
        from pytimetk_ray.codec.vectorized import dod_encode_many, gorilla_encode_many

        n = len(batch)
        if n == 0:
            cols = {self.key_column: [], "tier": [], "start_ts": [],
                    "n_points": [], "ts_scale": [], "ts_blob": []}
            for col in self.value_columns:
                cols[f"{col}_blob"] = []
            return pd.DataFrame(cols)
        # tier="auto": take the tier label from the batch's hive-partition
        # column (one actor pool encodes every tier in a single pass).
        # Ordering via factorize+lexsort on integer codes — same stable
        # (keys, ts) order as a string mergesort at a fraction of the cost
        # (the exec.py fast-sort pattern).
        auto_tier = self.tier == "auto"
        ts_raw = batch[self.date_column].to_numpy()
        unit = str(ts_raw.dtype)
        unit = unit[unit.index("[") + 1 : unit.index("]")]
        conv_codes, conv_uniq = pd.factorize(batch[self.key_column], sort=True)
        if auto_tier:
            tier_codes, tier_uniq = pd.factorize(batch["tier"], sort=True)
            order = np.lexsort((ts_raw.astype(np.int64), conv_codes, tier_codes))
        else:
            order = np.lexsort((ts_raw.astype(np.int64), conv_codes))
        batch = batch.take(order)
        ts_all = ts_raw[order]
        ts_i64 = ts_all.astype(np.int64)
        cc = conv_codes[order]
        if auto_tier:
            tc = tier_codes[order]
            change = np.r_[True, (cc[1:] != cc[:-1]) | (tc[1:] != tc[:-1])]
        else:
            change = np.r_[True, cc[1:] != cc[:-1]]
        starts = np.flatnonzero(change)
        bounds = np.append(starts, n)

        # chunk bounds: conversation starts split every max_points rows
        mp = self.max_points
        chunk_starts: list[int] = []
        for gi in range(len(starts)):
            chunk_starts.extend(range(int(bounds[gi]), int(bounds[gi + 1]), mp))
        cs = np.append(np.asarray(chunk_starts, dtype=np.int64), n)
        npts = np.diff(cs)

        # per-chunk GCD scale (grid-aligned buckets -> tier step divides ts)
        scales = np.gcd.reduceat(np.abs(ts_i64), cs[:-1])
        np.maximum(scales, 1, out=scales)
        scaled = ts_i64 // np.repeat(scales, npts)

        chunk_codes = cs[:-1]
        out = {
            self.key_column: np.asarray(conv_uniq, dtype=object)[cc[chunk_codes]],
            "tier": (np.asarray(tier_uniq, dtype=object)[tc[chunk_codes]]
                     if auto_tier else self.tier),
            "start_ts": ts_all[cs[:-1]],
            "n_points": npts.astype(np.int64),
            "ts_scale": scales.astype(np.int64),
            "ts_blob": dod_encode_many(scaled, cs),
        }
        for col in self.value_columns:
            out[f"{col}_blob"] = gorilla_encode_many(
                batch[col].to_numpy().astype(np.float64), cs
            )
        self.n_points_encoded += n
        df = pd.DataFrame(out)
        df["start_ts"] = df["start_ts"].astype(f"datetime64[{unit}]")
        return df


def decode_chunks(chunks: pd.DataFrame, unit: str = "us",
                  keep_tier: bool = False,
                  key_column: str = "conv_id") -> pd.DataFrame:
    """Decode chunk rows back to tier rows (bit-equality check path).

    Accepts any number of chunks per (conv); one lexsort by
    (conv, tier, start_ts) puts every chunk stream in composition order,
    then ALL blobs in the batch decode in one ``*_decode_many`` call each
    (the per-chunk Python loop was the decode read path's bottleneck:
    26-point tier chunks paid per-blob setup ~60x the payload work)."""
    from pytimetk_ray.codec.vectorized import dod_decode_many, gorilla_decode_many

    value_cols = [c[: -len("_blob")] for c in chunks.columns
                  if c.endswith("_blob") and c != "ts_blob"]
    if not len(chunks):
        return pd.DataFrame(columns=[key_column, "bucket_ts"] + value_cols)
    order = np.lexsort((
        chunks["start_ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
        pd.factorize(chunks["tier"], sort=False)[0],
        pd.factorize(chunks[key_column], sort=False)[0],
    ))
    g = chunks.iloc[order]
    ns = g["n_points"].to_numpy(np.int64)
    ts = dod_decode_many(g["ts_blob"].tolist(), ns)
    ts *= np.repeat(g["ts_scale"].to_numpy(np.int64), ns)
    data = {
        key_column: np.repeat(g[key_column].to_numpy(), ns),
        "bucket_ts": ts.astype(f"datetime64[{unit}]"),
    }
    if keep_tier:
        data["tier"] = np.repeat(g["tier"].to_numpy(), ns)
    for col in value_cols:
        data[col] = gorilla_decode_many(g[f"{col}_blob"].tolist(), ns)
    return pd.DataFrame(data)


def compact_chunks(
    chunks,
    *,
    key_column: str = "conv_id",
    max_points_per_chunk: int = 4096,
    num_partitions: int | None = None,
):
    """Storage maintenance for the encoded tier store: re-chunk every
    (conv, tier) stream into maximal chunks.

    Incremental ingest appends one small chunk per increment (chunk
    streams compose — module docstring), so a long-lived store accumulates
    many tiny chunks per conversation: read amplification (one blob header
    per handful of points) and manifest growth.  Compaction is ONE keyed
    exchange by conv: each partition decodes its chunk streams with the
    batch decoders and re-encodes at full chunk size via
    ``TierEncoder(tier="auto")``.

    Invariant: DECODED ROWS are bit-equal before/after (the oracle-checked
    guarantee); blob BYTES may differ — the merged stream's GCD timestamp
    scale can be coarser than per-chunk scales.  Fast path: a (conv, tier)
    stream already stored as one chunk within the size limit passes
    through VERBATIM (no decode).

    Returns a Dataset of chunk rows with the same schema as the input."""
    import ray.data as rd  # noqa: F401  (type only)

    from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS, partitioned_group_map

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        codes = pd.factorize(
            pd.MultiIndex.from_arrays(
                [part[key_column], part["tier"]]), sort=False)[0]
        sizes = np.bincount(codes)
        n_chunks = sizes[codes]
        ok_alone = (n_chunks == 1) & (part["n_points"].to_numpy() <=
                                      max_points_per_chunk)
        passthrough = part.loc[ok_alone]
        todo = part.loc[~ok_alone]
        if not len(todo):
            return passthrough.reset_index(drop=True)
        value_cols = [c[: -len("_blob")] for c in part.columns
                      if c.endswith("_blob") and c != "ts_blob"]
        unit = str(todo["start_ts"].to_numpy().dtype)
        unit = unit[unit.index("[") + 1: unit.index("]")]
        rows = decode_chunks(todo, unit=unit, keep_tier=True,
                             key_column=key_column)
        enc = TierEncoder(tier="auto", value_columns=value_cols,
                          key_column=key_column,
                          max_points_per_chunk=max_points_per_chunk)
        out = enc(rows)
        return pd.concat([passthrough, out],
                         ignore_index=True)[list(part.columns)]

    return partitioned_group_map(
        chunks, [key_column], kernel,
        sort_by=[key_column, "tier", "start_ts"],
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS)


def ingest_chunks(
    chunks_dir: str,
    new_rows,
    *,
    key_column: str = "conv_id",
    value_columns: list[str] | None = None,
    max_points_per_chunk: int = 4096,
    frag_threshold: float = 0.25,
    num_partitions: int | None = None,
    encode_concurrency: int = 2,
) -> dict:
    """Incremental ingest into an ENCODED chunk store with auto-compaction
    (round-5 policy: long-lived stores self-heal instead of waiting for a
    manual ``compact_chunks`` run).

    1. Encode ``new_rows`` (tier rows: key/tier/bucket_ts/values) into
       chunk rows and APPEND them to ``chunks_dir`` — chunk streams
       compose, so an append is always correct, just fragmenting.
    2. Probe fragmentation from the ``n_points`` column alone (column-
       pruned read — two global sums, no per-stream state, scale-
       independent driver memory): ``fill = points / (chunks * max)``.
    3. If ``fill < frag_threshold``, rewrite the store through
       ``compact_chunks`` into a sibling directory and swap it in
       (old dir is renamed aside first, so a crash leaves either the old
       or the new complete store; a leftover ``.old`` from a crashed swap
       is restored on the next call before anything else).

    Mean fill is a conservative trigger: streams shorter than
    ``max_points_per_chunk`` can never reach fill 1.0, so 0.25 means
    "roughly 4x more chunks than a full rewrite would produce".  The
    decoded-rows bit-equality invariant of ``compact_chunks`` applies.

    Returns ``{"fill": float, "compacted": bool, "chunks": int,
    "points": int}`` (post-ingest, pre-compaction numbers).

    The PARQUET tier store needs no analogue: ``ingest_increment``
    recomputes whole partitions from raw, so it never fragments."""
    import os
    import shutil

    import ray.data as rd

    from pytimetk_ray.exec import DEFAULT_NUM_PARTITIONS

    nparts = num_partitions or DEFAULT_NUM_PARTITIONS
    old_dir = chunks_dir.rstrip("/") + ".old"
    tmp_dir = chunks_dir.rstrip("/") + ".compacting"
    if not os.path.isdir(chunks_dir) and os.path.isdir(old_dir):
        os.rename(old_dir, chunks_dir)  # recover a crashed swap
    shutil.rmtree(tmp_dir, ignore_errors=True)

    enc = new_rows.map_batches(
        TierEncoder,
        fn_constructor_kwargs=dict(
            tier="auto", key_column=key_column, value_columns=value_columns,
            max_points_per_chunk=max_points_per_chunk),
        batch_format="pandas", batch_size=None,
        concurrency=encode_concurrency)
    enc.write_parquet(chunks_dir)

    stats = rd.read_parquet(chunks_dir, columns=["n_points"]).aggregate(
        rd.aggregate.Sum("n_points", alias_name="points"),
        rd.aggregate.Count(alias_name="chunks"))
    points = int(stats["points"])
    n_chunks = int(stats["chunks"])
    fill = points / (n_chunks * max_points_per_chunk) if n_chunks else 1.0
    out = {"fill": fill, "compacted": False, "chunks": n_chunks,
           "points": points}
    if fill >= frag_threshold:
        return out
    compacted = compact_chunks(
        rd.read_parquet(chunks_dir), key_column=key_column,
        max_points_per_chunk=max_points_per_chunk, num_partitions=nparts)
    compacted.write_parquet(tmp_dir)
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    os.rename(chunks_dir, old_dir)
    os.rename(tmp_dir, chunks_dir)
    shutil.rmtree(old_dir)
    out["compacted"] = True
    return out
