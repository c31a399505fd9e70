"""Deterministic synthetic transcript corpus (FIXTURES.md F1).

The north-star input table (BASELINE.json ``input_hint``):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``.  Generated with a fixed seed, no wall clock:

- Zipf-ish turn counts so a few conversations are *hot* (exercises salting)
- rows emitted in shuffled order (the engine must restore stable turn order)
- text includes non-ASCII, embedded newlines and quotes (byte-identity target)
- per-conv ts = t0 + cumsum(gaps), log-uniform 2s..15min gaps with seeded
  dropout windows > 1h so 1-minute grids have holes (exercises pad_by_time)

A derived numeric ``value = f(text_len, role)`` feeds the aggregate kernels,
mirroring pytimetk's value_column convention
(reference: src/pytimetk/core/summarize_by_time.py:46).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["", "bash", "search", "browser", "python", "editor", "fetch", "calc", "sql"])
_WORDS = np.array(
    [
        "the", "agent", "ran", "query", "résumé", "naïve", "data", "Straße",
        "shuffle", 'said "ok"', "line\nbreak", "token", "λ-calculus", "日本語",
        "tab\there", "O'Brien", "emoji✨", "null", "backslash\\path", "quote'd",
    ]
)


def make_transcripts(
    n_convs: int = 200,
    *,
    seed: int = 7,
    mean_turns: int = 40,
    hot_conv_factor: int = 50,
    fast_text: bool = False,
) -> pd.DataFrame:
    """Deterministic transcript frame; row order is shuffled.

    ``fast_text=True`` builds text by vectorized concatenation of a few
    word columns (for multi-10M-row bench corpora); the default token-soup
    path keeps the full length distribution for correctness fixtures."""
    rng = np.random.default_rng(seed)
    # Zipf-ish turn counts; conv 0 is the hot one
    turns = np.maximum(rng.zipf(1.5, size=n_convs) * 2, 3)
    turns = np.minimum(turns, mean_turns * 10)
    turns[0] = mean_turns * hot_conv_factor  # hot conversation
    total = int(turns.sum())

    conv_ids = np.repeat([f"conv{i:06d}" for i in range(n_convs)], turns)
    turn_idx = np.concatenate([np.arange(t, dtype=np.int32) for t in turns])

    roles = _ROLES[rng.integers(0, 3, size=total)]
    tools = _TOOLS[rng.integers(0, len(_TOOLS), size=total)]

    if fast_text:
        # vectorized via Arrow string kernels: 4 word columns + seeded filler
        import pyarrow.compute as pc

        cols = [pa.array(_WORDS[rng.integers(0, len(_WORDS), size=total)]) for _ in range(4)]
        filler = pa.array(np.array(["tok " * r for r in range(6)])[rng.integers(0, 6, size=total)])
        texts = pc.binary_join_element_wise(*cols, filler, " ").to_numpy(
            zero_copy_only=False
        )
    else:
        # seeded token soup with non-ASCII / newlines / quotes
        n_words = np.maximum((rng.normal(12, 8, size=total)).astype(int), 1)
        word_idx = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
        bounds = np.cumsum(n_words)[:-1]
        texts = [" ".join(chunk) for chunk in np.split(_WORDS[word_idx], bounds)]

    # ts: per-conv cumsum of log-uniform gaps (2s..15min) + dropout >1h
    gaps = np.exp(rng.uniform(np.log(2.0), np.log(900.0), size=total))
    dropout = rng.random(total) < 0.02
    gaps[dropout] += rng.uniform(3600, 4 * 3600, size=int(dropout.sum()))
    gaps_us = (gaps * 1e6).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    cum = np.cumsum(gaps_us)
    base = np.repeat(cum[starts] - gaps_us[starts], turns)
    rel = cum - base
    t0 = np.int64(pd.Timestamp("2025-01-01").value // 1000)  # us
    conv_offset = np.repeat(rng.integers(0, 30 * 86_400_000_000, size=n_convs), turns)
    ts = t0 + conv_offset + rel

    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )
    # shuffled arrival order — engine must restore (conv_id, turn_idx) order
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def add_value_column(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic numeric value column: f(text length, role)."""
    role_w = df["role"].map({"user": 1.0, "assistant": 2.5, "tool": 0.5})
    df = df.copy()
    df["value"] = df["text"].str.len().astype(np.float64) * role_w
    return df


def write_transcripts(path: str, n_convs: int = 200, seed: int = 7,
                      num_files: int = 1, **kw) -> str:
    """Write the corpus as one file (num_files=1) or a directory of
    ``num_files`` parquet shards with small row groups — the sharded layout
    is what a real 100 TB corpus looks like, and it parallelizes the read."""
    import pyarrow.parquet as pq

    df = add_value_column(make_transcripts(n_convs, seed=seed, **kw))
    if num_files <= 1:
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                       row_group_size=200_000)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    shards = np.array_split(np.arange(len(df)), num_files)
    for i, idx in enumerate(shards):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[idx], preserve_index=False),
            os.path.join(path, f"part-{i:04d}.parquet"),
            row_group_size=100_000,
        )
    return path


def make_transcripts_table(n_convs: int, *, seed: int = 7,
                           mean_turns: int = 40, hot_conv_factor: int = 50,
                           id_prefix: str = "") -> pa.Table:
    """Arrow-native corpus generator for BIG bench inputs: same schema and
    distributions as ``make_transcripts(fast_text=True)`` but built entirely
    from Arrow compute kernels + numpy — no pandas object-string columns
    anywhere (DataFrame construction/sanitize/consolidate of tens of millions
    of Python strings dominated the old path ~20x).  Rows are emitted in
    shuffled order, value = utf8_len(text) * role_weight, as elsewhere."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    turns = np.maximum(rng.zipf(1.5, size=n_convs) * 2, 3)
    turns = np.minimum(turns, mean_turns * 10)
    turns[0] = mean_turns * hot_conv_factor
    total = int(turns.sum())

    conv_names = pa.array([f"{id_prefix}conv{i:06d}" for i in range(n_convs)])
    conv_idx = np.repeat(np.arange(n_convs, dtype=np.int64), turns)
    turn_idx = np.concatenate([np.arange(t, dtype=np.int32) for t in turns])

    role_idx = rng.integers(0, 3, size=total)
    tool_idx = rng.integers(0, len(_TOOLS), size=total)

    word_cols = [
        pc.take(pa.array(_WORDS), pa.array(rng.integers(0, len(_WORDS), size=total)))
        for _ in range(4)
    ]
    fillers = pa.array(["tok " * r for r in range(6)])
    filler = pc.take(fillers, pa.array(rng.integers(0, 6, size=total)))
    texts = pc.binary_join_element_wise(*word_cols, filler, " ")

    gaps = np.exp(rng.uniform(np.log(2.0), np.log(900.0), size=total))
    dropout = rng.random(total) < 0.02
    gaps[dropout] += rng.uniform(3600, 4 * 3600, size=int(dropout.sum()))
    gaps_us = (gaps * 1e6).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    cum = np.cumsum(gaps_us)
    base = np.repeat(cum[starts] - gaps_us[starts], turns)
    rel = cum - base
    t0 = np.int64(pd.Timestamp("2025-01-01").value // 1000)
    conv_offset = np.repeat(rng.integers(0, 30 * 86_400_000_000, size=n_convs), turns)
    ts = (t0 + conv_offset + rel).view("datetime64[us]")

    role_w = np.array([1.0, 2.5, 0.5])
    value = (pc.utf8_length(texts).to_numpy().astype(np.float64)
             * role_w[role_idx])

    perm = rng.permutation(total)
    tbl = pa.table({
        "conv_id": pc.take(conv_names, pa.array(conv_idx)),
        "turn_idx": pa.array(turn_idx),
        "role": pc.take(pa.array(_ROLES), pa.array(role_idx)),
        "text": texts,
        "tool": pc.take(pa.array(_TOOLS), pa.array(tool_idx)),
        "ts": pa.array(ts),
        "value": pa.array(value),
    })
    return tbl.take(pa.array(perm))


def write_transcripts_chunked(path: str, n_convs: int, *, seed: int = 11,
                              n_chunks: int = 10, files_per_chunk: int = 8,
                              **kw) -> str:
    """Big-corpus writer (the sf1 / quarter-billion-turn bench input): the
    corpus is generated in ``n_chunks`` independent deterministic chunks —
    each its own seed and a ``c{k}``-prefixed conv-id namespace — so peak
    generator memory is one chunk, never the whole corpus.  Each chunk lands
    as ``files_per_chunk`` parquet shards; a real 100 TB corpus is exactly
    this many-shards layout."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    per = n_convs // n_chunks
    for k in range(n_chunks):
        tbl = make_transcripts_table(per, seed=seed + 1000 * k,
                                     id_prefix=f"c{k:02d}", **kw)
        n = len(tbl)
        bounds = np.linspace(0, n, files_per_chunk + 1).astype(np.int64)
        for i in range(files_per_chunk):
            pq.write_table(
                tbl.slice(bounds[i], bounds[i + 1] - bounds[i]),
                os.path.join(path, f"part-{k:02d}-{i:04d}.parquet"),
                row_group_size=200_000,
            )
        del tbl
    return path
