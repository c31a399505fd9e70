"""PII scrubbing for training-data pipelines: vectorized regex redaction.

A first-class LLM-prep stage (emails, phone numbers, IP addresses,
SSN-shaped ids) expressed as a stateless ``map_batches`` transform over
Arrow string batches — ``pyarrow.compute.replace_substring_regex`` runs RE2
over the whole column with zero Python-loop involvement, so the stage is a
pure projection that streams at 100 TB (no shuffle, no state).

Dialect parity: Arrow's regex engine is RE2 and so is DuckDB's, so the SAME
pattern strings drive both the engine and the SQL oracle
(``regexp_replace(..., 'g')`` / ``regexp_extract_all``).  Patterns therefore
must stay within RE2 syntax (no lookbehind, no backreferences).

Match counts are taken per pattern on the ORIGINAL text (before any
replacement) so they are order-independent; replacements are then applied
sequentially in list order.  With the default non-overlapping patterns the
two views agree; overlapping custom patterns should count on their own.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# (name, RE2 pattern, replacement) — ordered; names become n_<name> columns.
# Patterns are deliberately simple/structural (shape-based, not validating):
# at corpus scale recall beats precision for scrubbing.
DEFAULT_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(
    ds: rd.Dataset,
    *,
    text_column: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    out_column: str | None = None,
    with_counts: bool = True,
) -> rd.Dataset:
    """Redact PII-shaped substrings; optionally count matches per pattern.

    Adds ``out_column`` (default: replaces ``text_column`` in place) plus,
    when ``with_counts``, one ``n_<name>`` int64 column per pattern (matches
    in the ORIGINAL text).  Zero-copy Arrow batches; one RE2 pass per
    pattern per batch.
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    out = out_column or text_column

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[text_column], pa.string())
        red = col
        counts = {}
        for name, pat, repl in pats:
            if with_counts:
                counts[f"n_{name}"] = pc.cast(
                    pc.count_substring_regex(col, pat), pa.int64())
            red = pc.replace_substring_regex(red, pat, repl)
        if out in batch.column_names:
            batch = batch.set_column(batch.column_names.index(out), out, red)
        else:
            batch = batch.append_column(out, red)
        for cname, arr in counts.items():
            batch = batch.append_column(cname, arr)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
