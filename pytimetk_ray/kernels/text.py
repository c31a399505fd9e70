"""Vectorized text kernels: tokenization counts, quality features, language
ID, fingerprints, shingles, MinHash, SimHash.

All pure functions over numpy/pyarrow/pandas batches — used by the
pipelines.text_analysis / pipelines.dedup stages.  Hash functions are
deterministic across processes (no PYTHONHASHSEED dependence): blake2b/md5
from hashlib and splitmix-style integer mixing in numpy uint64.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[\w']+", re.UNICODE)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu", "mit"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
    "it": {"il", "la", "che", "di", "è", "un", "una", "per", "non", "sono"},
}

STOPWORDS_EN = LANG_PROFILES["en"]


def token_count(texts) -> np.ndarray:
    """Whitespace-token count per string (vectorized regex)."""
    return np.fromiter(
        (len(_TOKEN_RE.findall(t)) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )


def quality_features(texts) -> dict[str, np.ndarray]:
    """Length / punctuation / stopword-ratio quality signals per doc."""
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    punct_ratio = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    upper_ratio = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        words = _WORD_RE.findall(t.lower())
        n_tokens[i] = len(words)
        n_punct = sum(not c.isalnum() and not c.isspace() for c in t)
        punct_ratio[i] = n_punct / max(1, len(t))
        stop_ratio[i] = sum(w in STOPWORDS_EN for w in words) / max(1, len(words))
        upper_ratio[i] = sum(c.isupper() for c in t) / max(1, len(t))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "upper_ratio": upper_ratio,
    }


def detect_language(texts) -> np.ndarray:
    """Stopword-overlap heuristic language ID ('und' when no evidence)."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        words = set(_WORD_RE.findall((t or "").lower()))
        best, best_score = "und", 0
        for lang, profile in LANG_PROFILES.items():
            score = len(words & profile)
            if score > best_score:
                best, best_score = lang, score
        out[i] = best
    return out


def md5_fingerprint(texts) -> np.ndarray:
    """Hex MD5 of the utf-8 bytes (matches DuckDB ``md5(text)``)."""
    return np.array(
        [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts], dtype=object
    )


def rolling_fingerprint(texts, window: int = 8) -> np.ndarray:
    """Deterministic 64-bit document fingerprint: min of rolling polynomial
    hashes over character windows (winnowing-style, content-position
    independent)."""
    B, M = np.uint64(1000003), np.uint64(0xFFFFFFFFFFFFFFFF)
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        data = (t or "").encode("utf-8")
        if len(data) < window:
            out[i] = np.uint64(int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big"))
            continue
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        h = np.zeros(len(arr) - window + 1, dtype=np.uint64)
        for j in range(window):
            h = (h * B + arr[j : len(arr) - window + 1 + j]) & M
        out[i] = h.min()
    return out


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Set of 64-bit hashes of word k-shingles (scalar path, used by the
    exact-Jaccard verifier; the sketch pipeline uses the vectorized
    ``shingle_hashes``)."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        joined = " ".join(words)
        return {_h64(joined)} if joined else set()
    return {_h64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


_SHINGLE_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63], dtype=np.uint64)


def word_hashes(text: str) -> np.ndarray:
    """uint64 hash per word (vectorized pandas hash over the word array)."""
    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return np.empty(0, dtype=np.uint64)
    import pandas as pd

    return pd.util.hash_array(np.asarray(words, dtype=object))


def shingle_hashes(wh: np.ndarray, k: int = 3) -> np.ndarray:
    """Unique uint64 hashes of word k-shingles from per-word hashes —
    one vectorized polynomial combine over sliding windows (no per-shingle
    Python hashing)."""
    n = len(wh)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        h = np.uint64(0)
        for i, m in enumerate(wh):
            h = h * _SHINGLE_MIX[0] + m
        return np.array([h], dtype=np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * _SHINGLE_MIX[0] + wh[j : n - k + 1 + j] * _SHINGLE_MIX[(j + 1) % len(_SHINGLE_MIX)]
    return np.unique(acc)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


# --- DuckDB-matchable md5 hashing (oracle-checkable sketch path) -----------


def md5_u64(s: str) -> int:
    """uint64 hash matching DuckDB ``md5_number_lower(s)`` exactly:
    bytes 8..16 of the md5 digest, little-endian."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def md5_u64_many(strings) -> np.ndarray:
    return np.fromiter((md5_u64(s) for s in strings), dtype=np.uint64,
                       count=len(strings))


def md5_u64_pair_many(strings) -> tuple[np.ndarray, np.ndarray]:
    """Both 64-bit halves of the md5 digest per string, matching DuckDB
    ``(md5_number_upper(s), md5_number_lower(s))``: bytes 0..8 and 8..16,
    little-endian.  A 128-bit key makes window-hash collisions negligible
    at any corpus size (birthday bound ~1e-14 at 10^12 windows)."""
    hi = np.empty(len(strings), dtype=np.uint64)
    lo = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.md5(s.encode("utf-8")).digest()
        hi[i] = int.from_bytes(d[0:8], "little")
        lo[i] = int.from_bytes(d[8:16], "little")
    return hi, lo


def shingle_strings(text: str, k: int = 3) -> list[str]:
    """Word k-shingle strings (space-joined); <k words -> one joined shingle;
    no words -> [].  Mirrors the SQL generate_series shingle expansion."""
    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return []
    if len(words) < k:
        return [" ".join(words)]
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1) in uint64 numpy without overflow, via 31-bit
    limb splitting and 2^61 === 1 (mod p).  a, x must be < p."""
    p = np.uint64(_MERSENNE)
    a1, a0 = a >> np.uint64(31), a & np.uint64(0x7FFFFFFF)
    x1, x0 = x >> np.uint64(31), x & np.uint64(0x7FFFFFFF)
    # a*x = a1*x1*2^62 + (a1*x0 + a0*x1)*2^31 + a0*x0
    t_hi = (a1 * x1) % p  # < p; *2^62 === *2 (mod p)
    hi = (t_hi * np.uint64(2)) % p
    mid = (a1 * x0 + a0 * x1) % p  # each product < 2^61, sum < 2^62? no:
    # a1,x1 < 2^30 and a0,x0 < 2^31 -> each product < 2^61, sum < 2^62 which
    # overflows-safe in uint64 (max 2^62 < 2^64)
    # mid*2^31 mod p: split mid = m1*2^30 + m0
    m1, m0 = mid >> np.uint64(30), mid & np.uint64(0x3FFFFFFF)
    mid = (m1 + (m0 << np.uint64(31))) % p  # m1*2^61 === m1; m0*2^31 < 2^61
    lo = (a0 * x0) % p
    return (hi + mid + lo) % p


def minhash_signature_exact(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True (a*x + b) mod (2^61-1) minima — matches DuckDB HUGEINT
    arithmetic (unlike ``minhash_signature``'s uint64-wrap mix).  ``x`` are
    raw uint64 hashes (reduced mod p here); empty input -> all-max sentinel."""
    if len(x) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    p = np.uint64(_MERSENNE)
    xm = x.astype(np.uint64, copy=False) % p
    # broadcast all permutations at once: (P, n) elementwise modmul
    prod = mulmod61(a.astype(np.uint64)[:, None], xm[None, :])
    return ((prod + b.astype(np.uint64)[:, None]) % p).min(axis=1)


def simhash_md5(text: str) -> int:
    """64-bit SimHash over md5_u64 word hashes (multiset votes) — the
    DuckDB-matchable variant of ``simhash``."""
    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return 0
    wh = md5_u64_many(words)
    bits = (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = 2 * bits.astype(np.int64).sum(axis=0) - len(wh)
    out = 0
    for bit in np.flatnonzero(acc > 0):
        out |= 1 << int(bit)
    return out


# --- MinHash ---------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int = 64, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod p over the shingle hashes (set or
    uint64 array)."""
    if isinstance(shingles, np.ndarray):
        x = shingles.astype(np.uint64, copy=False)
    else:
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    if len(x) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # uint64 wrap then mod Mersenne: a fixed permutation-ish mix, vectorized
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_bands(sig: np.ndarray, num_bands: int) -> list[int]:
    """Hash each band of the signature to a 64-bit bucket id."""
    rows = len(sig) // num_bands
    out = []
    for bi in range(num_bands):
        band = sig[bi * rows : (bi + 1) * rows]
        out.append(int.from_bytes(hashlib.blake2b(band.tobytes(), digest_size=8).digest(), "big"))
    return out


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


# --- SimHash ---------------------------------------------------------------


def simhash(text: str) -> int:
    """64-bit SimHash over word features (vectorized bit counting)."""
    wh = word_hashes(text)
    if len(wh) == 0:
        return 0
    bits = (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = 2 * bits.astype(np.int64).sum(axis=0) - len(wh)  # (+1/-1 votes)
    out = 0
    for bit in np.flatnonzero(acc > 0):
        out |= 1 << int(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
