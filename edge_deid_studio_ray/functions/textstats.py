"""Text-analysis functions for large-scale training-data pipelines.

Beyond-the-reference operators (per the build brief): language ID, quality
scoring, token counting, document fingerprinting.  All deterministic, all
usable inside ``map_batches`` over Arrow batches; the per-row loops operate
on Python strings (regex/text kernels), with compiled state at module level
so workers pay compilation once per process.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[A-Za-z]+")
# BPE-ish word/number/punct splitter (GPT-2-style contractions + runs)
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# tiny per-language stopword sets for the n-gram/stopword language heuristic
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to a in is it you that he was for on are".split()),
    "de": frozenset("der die und den von zu das mit sich des auf ist im".split()),
    "es": frozenset("de la que el en y a los del se las por un para es".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui".split()),
}
_EN_STOP = _STOPWORDS["en"]


def token_count(text: str) -> int:
    """Whitespace token count."""
    return len(_TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """BPE-ish token count (word/number/punct segmentation proxy)."""
    return sum(1 for m in _BPE_RE.finditer(text) if not m.group().isspace())


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(1 for c in text if "一" <= c <= "鿿")
    return cjk / len(text)


def lang_id(text: str) -> str:
    """Heuristic language ID: CJK ratio → zh, else best stopword overlap.

    Deterministic tie-break: language key order en < de < es < fr; returns
    "und" when no stopword evidence exists.
    """
    if _cjk_ratio(text) > 0.15:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in ("en", "de", "es", "fr"):
        score = sum(1 for w in words if w in _STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_counts(text: str) -> dict[str, int]:
    """Integer quality signals (exact, SQL-checkable): chars, tokens,
    alpha chars, digit chars, punct chars, stopword tokens."""
    tokens = _TOKEN_RE.findall(text)
    return {
        "n_chars": len(text),
        "n_tokens": len(tokens),
        "n_alpha": sum(1 for c in text if c.isalpha()),
        "n_digit": sum(1 for c in text if c.isdigit()),
        "n_punct": len(_PUNCT_RE.findall(text)),
        "n_stopwords": sum(1 for t in tokens if t.lower() in _EN_STOP),
    }


def quality_score(text: str) -> float:
    """Composite [0,1] quality score (length / punct / stopword heuristics,
    Gopher-rules-style)."""
    c = quality_counts(text)
    if c["n_chars"] == 0 or c["n_tokens"] == 0:
        return 0.0
    mean_word_len = c["n_alpha"] / max(1, c["n_tokens"])
    length_ok = 1.0 if 10 <= c["n_tokens"] <= 100_000 else 0.5
    word_len_ok = 1.0 if 2.0 <= mean_word_len <= 12.0 else 0.5
    punct_ratio = c["n_punct"] / c["n_chars"]
    punct_ok = 1.0 if punct_ratio < 0.2 else 0.3
    stop_ratio = c["n_stopwords"] / c["n_tokens"]
    stop_ok = 1.0 if stop_ratio >= 0.01 else 0.7
    return round(length_ok * word_len_ok * punct_ok * stop_ok, 6)


_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def fingerprint64(text: str) -> int:
    """Rolling polynomial hash of the whitespace-normalized text (stable
    document fingerprint; int64-safe)."""
    h = 0
    for ch in " ".join(text.split()):
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
    return h


from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def _word_hash64(word: str) -> int:
    # first 8 bytes of md5: md5 is available in DuckDB too, so the whole
    # SimHash construction is SQL-mirrorable (oracle-checkable end to end).
    # Per-worker LRU: web-text vocabularies repeat heavily, so most words
    # hit the cache instead of re-hashing.
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest()[:8], "big")


_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (md5-derived word hashes) — the
    bit-vote accumulation is one vectorized (words × 64) pass."""
    words = [w.lower() for w in _TOKEN_RE.findall(text)]
    if not words:
        return 0
    hashes = np.fromiter(
        (_word_hash64(w) for w in words), dtype=np.uint64, count=len(words)
    )
    bits = ((hashes[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches stage: append token/quality/fingerprint/lang columns."""
    texts = batch[text_col].to_pylist()
    counts = [quality_counts(t or "") for t in texts]
    return (
        batch.append_column("n_tokens", pa.array([c["n_tokens"] for c in counts], pa.int64()))
        .append_column("n_alpha", pa.array([c["n_alpha"] for c in counts], pa.int64()))
        .append_column("n_punct", pa.array([c["n_punct"] for c in counts], pa.int64()))
        .append_column("n_stopwords", pa.array([c["n_stopwords"] for c in counts], pa.int64()))
        .append_column("quality", pa.array([quality_score(t or "") for t in texts], pa.float64()))
        .append_column("lang_pred", pa.array([lang_id(t or "") for t in texts], pa.string()))
        .append_column("fingerprint", pa.array([fingerprint64(t or "") for t in texts], pa.int64()))
    )


def jaro_similarity(a: str, b: str) -> float:
    """Classic Jaro similarity, with DuckDB's empty-string convention
    (either side empty → 0.0, INCLUDING both empty) so results are
    bit-identical to ``jaro_winkler_similarity``'s inner Jaro (fuzz-tested
    over 3k random pairs)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    match_dist = max(0, max(la, lb) // 2 - 1)
    bm = [False] * lb
    am = [False] * la
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - match_dist)
        hi = min(lb, i + match_dist + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, threshold: float = 0.7) -> float:
    """Jaro-Winkler with the standard ≤4-char common-prefix boost applied
    only when jaro > 0.7 — bit-identical to DuckDB's
    ``jaro_winkler_similarity`` (same guard, same ``j + l·p·(1−j)``
    float-op order; fuzz-tested exact over random pairs)."""
    j = jaro_similarity(a, b)
    if j > threshold:
        length = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            length += 1
        j += length * p * (1.0 - j)
    return j
