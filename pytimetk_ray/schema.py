"""Canonical Arrow schemas for the engine.

The north-star input (BASELINE.json ``input_hint``) is a Parquet transcript
table ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.  Tier tables and checkpoint (codec) tables are
derived here.  The reference (pytimetk) has no schema system — it infers
pandas dtypes per call (see SURVEY.md §1.2); we fix Arrow schemas up front so
every stage is zero-copy Arrow.
"""

from __future__ import annotations

import pyarrow as pa

# North-star input table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# One rollup tier (raw -> 1m -> 1h -> 1d).  Compositional aggregates only:
# sum/count/min/max re-aggregate exactly tier-over-tier; mean = sum/count is
# derived at read time (never stored, so tiers stay losslessly composable).
TIER_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("bucket_ts", pa.timestamp("us")),
        pa.field("value_sum", pa.float64()),
        pa.field("value_count", pa.int64()),
        pa.field("value_min", pa.float64()),
        pa.field("value_max", pa.float64()),
    ]
)

# Compressed checkpoint chunk: one row per (conv_id, tier) series chunk.
# ts_blob = delta-of-delta bitstream over ts // ts_scale; one Gorilla XOR
# bitstream per value column (public algorithms: Pelkonen et al., "Gorilla",
# VLDB 2015 §4.1).  Multiple chunks per conv compose by start_ts.
CHUNK_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("tier", pa.string()),
        pa.field("start_ts", pa.timestamp("us")),
        pa.field("n_points", pa.int64()),
        pa.field("ts_scale", pa.int64()),
        pa.field("ts_blob", pa.binary()),
        pa.field("value_sum_blob", pa.binary()),
        pa.field("value_count_blob", pa.binary()),
        pa.field("value_min_blob", pa.binary()),
        pa.field("value_max_blob", pa.binary()),
    ]
)

# Per-partition lineage manifest row (state/manifest.py writes these as JSON).
MANIFEST_FIELDS = (
    "partition_id",
    "tier",
    "input_fingerprint",
    "row_count",
    "content_hash",
    "status",
)
