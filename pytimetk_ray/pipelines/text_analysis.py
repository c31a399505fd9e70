"""Text-analysis stages for training-data pipelines over a documents table.

Each stage is a vectorized ``map_batches`` transform (actor pool where state
— compiled regexes, language profiles — pays off).  Designed for the
``documents`` corpus shape (doc_id, text, ...) at 100 TB: stateless
projections, no shuffle.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from pytimetk_ray.kernels import text as tx


class TextScorer:
    """Actor-pool stage: quality features + token counts + language ID.

    Regexes/profiles are compiled once per actor in ``__init__`` (the
    reference pattern for stateful map stages)."""

    def __init__(self, with_lang: bool = True, with_fingerprint: bool = True):
        # touch the module-level compiled regexes so import cost is paid here
        self.with_lang = with_lang
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        feats = tx.quality_features(texts)
        for k, v in feats.items():
            batch[f"q_{k}"] = v
        batch["token_count"] = tx.token_count(texts)
        if self.with_lang:
            batch["lang_pred"] = tx.detect_language(texts)
        if self.with_fingerprint:
            batch["fingerprint_md5"] = tx.md5_fingerprint(texts)
            batch["fingerprint_roll"] = tx.rolling_fingerprint(texts).astype("uint64")
        return batch


def score_documents(ds: rd.Dataset, *, concurrency: int = 4, batch_size: int = 4096,
                    **kw) -> rd.Dataset:
    return ds.map_batches(
        TextScorer,
        fn_constructor_kwargs=kw,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    """doc_id + whitespace token count (oracle-SQL-matched query)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "token_count": tx.token_count(batch["text"].tolist())}
        )

    return ds.map_batches(fn, batch_format="pandas")


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A — public heuristics).  All are
# ratios/counts of identically-computed integers, so the SQL oracle
# compares them UNROUNDED (NOTES_r1.md tie taxonomy).
GOPHER_DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_ratio=0.1,       # '#' or '...' per word
    max_bullet_ratio=0.9,       # lines starting with a bullet
    max_ellipsis_ratio=0.3,     # lines ending with '...'
    min_alpha_ratio=0.8,        # words containing >= 1 alphabetic char
    min_stop_words=2,           # of the 8 Gopher required stop words
)

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("-", "*", "•")


def gopher_rules(ds: rd.Dataset, *, id_column: str = "doc_id",
                 text_column: str = "text", **thresholds) -> rd.Dataset:
    """Gopher repetition-free quality rules as a stateless projection.

    Emits the per-document rule inputs (word count, mean word length,
    symbol/bullet/ellipsis ratios, alphabetic-word ratio, required-stop-word
    count) plus the composite ``keep`` flag.  Tokens are ``\\S+`` (the
    engine's whitespace-token surface, shared with the SQL oracle); '...'
    occurrences are counted non-overlapping left-to-right (``str.count`` ==
    replace-based SQL counting).  No shuffle; streams at any scale."""
    th = {**GOPHER_DEFAULTS, **thresholds}
    import re

    import numpy as np

    # ASCII-alpha on purpose: the SQL oracle's '[A-Za-z]' and this regex are
    # the same predicate on any input (str.isalpha would be Unicode-wider)
    alpha_re = re.compile(r"[A-Za-z]")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_column].to_numpy()
        n = len(batch)
        n_words = np.zeros(n, dtype=np.int64)
        sum_wlen = np.zeros(n, dtype=np.int64)
        n_alpha = np.zeros(n, dtype=np.int64)
        n_sym = np.zeros(n, dtype=np.int64)
        n_lines = np.zeros(n, dtype=np.int64)
        n_bullet = np.zeros(n, dtype=np.int64)
        n_ellip = np.zeros(n, dtype=np.int64)
        n_stop = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(batch[text_column].tolist()):
            t = t or ""
            ws = tx._TOKEN_RE.findall(t)
            n_words[i] = len(ws)
            sum_wlen[i] = sum(len(w) for w in ws)
            n_alpha[i] = sum(alpha_re.search(w) is not None for w in ws)
            n_sym[i] = t.count("#") + t.count("...")
            lines = t.split("\n")
            n_lines[i] = len(lines)
            n_bullet[i] = sum(l.startswith(_BULLETS) for l in lines)
            n_ellip[i] = sum(l.endswith("...") for l in lines)
            lower = {w.lower() for w in ws}
            n_stop[i] = sum(s in lower for s in _GOPHER_STOPS)
        nw = np.maximum(n_words, 1)
        mean_wlen = sum_wlen / nw
        symbol_ratio = n_sym / nw
        bullet_ratio = n_bullet / np.maximum(n_lines, 1)
        ellipsis_ratio = n_ellip / np.maximum(n_lines, 1)
        alpha_ratio = n_alpha / nw
        keep = ((n_words >= th["min_words"]) & (n_words <= th["max_words"])
                & (mean_wlen >= th["min_mean_word_len"])
                & (mean_wlen <= th["max_mean_word_len"])
                & (symbol_ratio < th["max_symbol_ratio"])
                & (bullet_ratio < th["max_bullet_ratio"])
                & (ellipsis_ratio < th["max_ellipsis_ratio"])
                & (alpha_ratio >= th["min_alpha_ratio"])
                & (n_stop >= th["min_stop_words"]))
        return pd.DataFrame({
            id_column: ids, "n_words": n_words,
            "mean_word_len": mean_wlen, "symbol_ratio": symbol_ratio,
            "bullet_ratio": bullet_ratio, "ellipsis_ratio": ellipsis_ratio,
            "alpha_ratio": alpha_ratio, "n_stop_words": n_stop,
            "keep": keep,
        })

    return ds.map_batches(fn, batch_format="pandas")


def normalize_text(ds: rd.Dataset, *, id_column: str = "doc_id",
                   text_column: str = "text") -> rd.Dataset:
    """Unicode + whitespace normalization (the ftfy-lite cleanup every web
    corpus gets before hashing/dedup): NFC-normalize, strip control
    characters, collapse whitespace runs to single spaces, trim.

    Parity notes (oracle = nfc_normalize + regexp_replace in DuckDB): the
    whitespace class is pinned to the explicit ASCII set ``[ \\t\\n\\r\\f\\v]``
    on both sides (Python ``\\s`` is Unicode-wide, RE2 ``\\s`` is ASCII —
    never use bare ``\\s`` where the two engines must agree).

    Output: (id, text_norm, n_chars_norm, changed).  Stateless projection —
    no shuffle, scale-free.
    """
    import re
    import unicodedata

    ctrl = re.compile("[\x00-\x08\x0e-\x1f\x7f]")
    wsp = re.compile("[ \t\n\r\f\v]+")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        orig = batch[text_column].tolist()
        out = []
        for t in orig:
            s = unicodedata.normalize("NFC", t or "")
            s = ctrl.sub("", s)
            s = wsp.sub(" ", s).strip(" ")
            out.append(s)
        norm = pd.Series(out, dtype=object)
        return pd.DataFrame({
            id_column: batch[id_column].to_numpy(),
            "text_norm": norm,
            "n_chars_norm": norm.str.len().to_numpy("int64"),
            "changed": pd.Series([a != b for a, b in zip(out, orig)],
                                 dtype=bool),
        })

    return ds.map_batches(fn, batch_format="pandas")
