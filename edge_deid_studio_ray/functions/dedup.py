"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB):

- *Exact*: content hash per row in a ``map_batches`` stage, then ONE
  hash-partitioned ``groupby(hash)`` — the only shuffle; group size is tiny
  (duplicate cardinality), keeper = min key.
- *MinHash+LSH*: shingle → K minhashes per row (vectorized numpy, universal
  hashing), banded into B band-hashes; explode to ``(band, band_hash, id)``
  rows; a single ``groupby([band, band_hash])`` yields candidate buckets;
  candidate pairs are verified with exact shingle Jaccard inside
  ``map_groups`` — no driver-side loop, no global pairwise comparison.
- *SimHash*: 64-bit signature per row; near-dup = identical band slices of
  the signature (same LSH-groupby skeleton, Hamming verify in-group).

All hash seeds are fixed constants → deterministic across runs/cluster
sizes (resume-safe).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8", "replace")).hexdigest()


def add_md5_column(batch: pa.Table, text_col: str = "text", out_col: str = "text_md5") -> pa.Table:
    return batch.append_column(
        out_col, pa.array([md5_hex(t or "") for t in batch[text_col].to_pylist()], pa.string())
    )


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 32-bit hashes of character k-shingles (whitespace
    normalized)."""
    norm = " ".join(text.split()).lower()
    if len(norm) < k:
        norm = norm + " " * (k - len(norm))
    shingles = {norm[i : i + k] for i in range(len(norm) - k + 1)}
    hashes = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "big")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(hashes)


class MinHasher:
    """K-permutation MinHash with fixed universal-hash parameters."""

    def __init__(self, num_hashes: int = 128, seed: int = 1337):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes

    def signature(self, text: str, k: int = 5) -> np.ndarray:
        sh = shingle_hashes(text, k)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        # (K, S) universal hashes, min over shingles — vectorized
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return (vals % _MAX_HASH).min(axis=1).astype(np.uint64)


def band_keys(signature: np.ndarray, num_bands: int = 16) -> list[str]:
    """LSH band hashes: one digest per contiguous signature slice."""
    rows = len(signature) // num_bands
    keys = []
    for band in range(num_bands):
        chunk = signature[band * rows : (band + 1) * rows]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        keys.append(f"{band}:{digest}")
    return keys


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-shingle Jaccard similarity."""
    a, b = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def word_ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard (token-level near-dup metric)."""

    def grams(t: str) -> set[tuple[str, ...]]:
        words = t.lower().split()
        if len(words) < n:
            return {tuple(words)} if words else set()
        return {tuple(words[i : i + n]) for i in range(len(words) - n + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    union = len(ga | gb)
    return len(ga & gb) / union if union else 1.0


# ---------------------------------------------------------------------------
# Dataset-level compositions
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", key_col: str = "doc_id"):
    """Keep one row (min key) per distinct text: hash stage + one groupby."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        return add_md5_column(batch, text_col)

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, key_col)

    return (
        ds.map_batches(hash_stage, batch_format="pyarrow")
        .groupby("text_md5")
        .map_groups(first, batch_format="pandas")
    )


def minhash_candidates(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    *,
    num_hashes: int = 128,
    num_bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    verify: str = "text",
):
    """MinHash-LSH near-dup candidate pairs, verified in-group.

    Returns a Dataset of ``(left, right, jaccard)`` with left < right.

    ``verify``:
    - ``"text"``  — exact shingle-Jaccard verification; band rows carry the
      text, so the shuffle ships num_bands× the corpus bytes.  Right for
      small/medium corpora or when exactness is required.
    - ``"signature"`` — the 100-TB scale path: band rows carry only the
      fixed-size MinHash signature (num_hashes × 8 bytes); similarity is the
      signature agreement estimate (±1/sqrt(num_hashes) error).  Shuffle
      volume is independent of document sizes.

    Partitioning assumption: a candidate bucket (same band hash) fits in one
    group task — true for near-dup buckets; pathological buckets are capped
    at 64 members (cap recorded in the ``truncated`` column, no silent drop).
    """
    hasher = MinHasher(num_hashes)
    if verify == "signature":
        return _minhash_candidates_sig(
            ds, hasher, text_col, key_col, num_bands, shingle_k, jaccard_threshold
        )

    def explode(batch: pa.Table) -> pa.Table:
        keys, bands, texts = [], [], []
        for key, text in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
            sig = hasher.signature(text or "", shingle_k)
            for bk in band_keys(sig, num_bands):
                keys.append(key)
                bands.append(bk)
                texts.append(text or "")
        return pa.table(
            {"band_key": pa.array(bands, pa.string()), key_col: keys, text_col: texts}
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[key_col]).sort_values(key_col)
        truncated = len(rows) > 64
        rows = rows.head(64)
        out = {"left": [], "right": [], "jaccard": [], "truncated": []}
        keys = list(rows[key_col])
        # shingle each member once, not once per pair
        shingles = [shingle_hashes(t, shingle_k) for t in rows[text_col]]
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                a, b = shingles[i], shingles[j]
                if len(a) == 0 and len(b) == 0:
                    sim = 1.0
                else:
                    inter = len(np.intersect1d(a, b, assume_unique=True))
                    union = len(a) + len(b) - inter
                    sim = inter / union if union else 1.0
                if sim >= jaccard_threshold:
                    out["left"].append(keys[i])
                    out["right"].append(keys[j])
                    out["jaccard"].append(round(sim, 6))
                    out["truncated"].append(truncated)
        return pd.DataFrame(out)

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )

    # a pair can surface from multiple bands → distinct
    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["left", "right"]).map_groups(dedup_pairs, batch_format="pandas")


def _minhash_candidates_sig(
    ds, hasher: "MinHasher", text_col: str, key_col: str, num_bands: int, shingle_k: int, threshold: float
):
    """Signature-carrying LSH variant (see minhash_candidates docstring)."""

    def explode(batch: pa.Table) -> pa.Table:
        keys, bands, sigs = [], [], []
        for key, text in zip(batch[key_col].to_pylist(), batch[text_col].to_pylist()):
            sig = hasher.signature(text or "", shingle_k)
            raw = sig.tobytes()
            for bk in band_keys(sig, num_bands):
                keys.append(key)
                bands.append(bk)
                sigs.append(raw)
        return pa.table(
            {
                "band_key": pa.array(bands, pa.string()),
                key_col: keys,
                "sig": pa.array(sigs, pa.binary()),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[key_col]).sort_values(key_col)
        truncated = len(rows) > 64
        rows = rows.head(64)
        keys = list(rows[key_col])
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]]
        out = {"left": [], "right": [], "jaccard": [], "truncated": []}
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    out["left"].append(keys[i])
                    out["right"].append(keys[j])
                    out["jaccard"].append(round(est, 6))
                    out["truncated"].append(truncated)
        return pd.DataFrame(out)

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["left", "right"]).map_groups(dedup_pairs, batch_format="pandas")


def add_simhash_column(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from .textstats import simhash64

    sims = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    # store as int64 (reinterpret top bit) for Arrow friendliness
    vals = [s - (1 << 64) if s >= (1 << 63) else s for s in sims]
    return batch.append_column("simhash", pa.array(vals, pa.int64()))
