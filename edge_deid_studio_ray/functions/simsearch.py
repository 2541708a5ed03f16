"""Approximate-nearest-neighbor search over an embedding column.

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once via ``ray.put`` (read per task, never re-shipped per batch), each
  batch computes a numpy matmul and emits only its LOCAL top-k per query
  (k rows per query per batch), and a final tiny ``groupby(query_id)``
  selects the global top-k.  Shuffle volume is O(queries × k × batches),
  independent of corpus size — the scale path for 100 TB.
- :func:`knn_lsh` — random-hyperplane LSH variant: bucket rows by sign
  pattern; only same-bucket candidates are scored (recall/speed trade
  documented per signature length).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_topk_fn(queries_ref, k: int, vec_col: str, key_col: str):
    import ray

    q = None  # resolved lazily inside the task (broadcast read, once per task)

    def topk(batch: pa.Table) -> pa.Table:
        nonlocal q
        if q is None:
            qm = ray.get(queries_ref) if queries_ref.__class__.__name__ == "ObjectRef" else queries_ref
            q = _normalize(np.asarray(qm, dtype=np.float64))
        mat = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        keys = np.asarray(batch[key_col].to_pylist())
        sims = q @ mat.T  # (Q, B)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out = {"query_id": [], key_col: [], "cosine": []}
        for qi in range(sims.shape[0]):
            for j in idx[qi]:
                out["query_id"].append(qi)
                out[key_col].append(keys[j].item() if hasattr(keys[j], "item") else keys[j])
                out["cosine"].append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                key_col: pa.array(out[key_col]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    return topk


def knn_bruteforce(ds, queries: np.ndarray, *, k: int = 5, vec_col: str = "embedding", key_col: str = "vec_id"):
    """Exact cosine top-k per query row of ``queries``.

    Returns Dataset(query_id, key_col, cosine) with k rows per query,
    deterministically tie-broken by (cosine desc, key asc).
    """
    import ray

    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))

    partials = ds.map_batches(
        _batch_topk_fn(queries_ref, k, vec_col, key_col), batch_format="pyarrow"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", key_col], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_near_dups(ds, *, threshold: float = 0.4, vec_col: str = "embedding", key_col: str = "vec_id"):
    """Embedding-cosine near-duplicate pairs (exact): the full normalized
    matrix is broadcast once via ``ray.put``; each batch computes its block
    of the similarity matrix (numpy matmul) and emits pairs above threshold
    with ``left < right``.

    Scale note: exact all-pairs is O(N²/blocks) compute with O(N·d)
    broadcast — right up to a few 10^6 rows; beyond that, bucket with
    :func:`hyperplane_bucket` (or IVF) first and run this per bucket.
    """
    import ray

    rows = ds.select_columns([key_col, vec_col]).take_all()
    rows.sort(key=lambda r: r[key_col])
    keys = np.asarray([r[key_col] for r in rows])
    mat = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    corpus_ref = ray.put((keys, mat))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        all_keys, all_mat = ray.get(corpus_ref)
        bkeys = np.asarray(batch[key_col].to_pylist())
        bmat = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        sims = bmat @ all_mat.T  # (B, N)
        bi, ni = np.nonzero(sims > threshold)
        left = bkeys[bi]
        right = all_keys[ni]
        mask = left < right  # dedupe symmetric pairs + drop self
        return pa.table(
            {
                "left": pa.array(left[mask].tolist()),
                "right": pa.array(right[mask].tolist()),
                "cosine": pa.array(np.round(sims[bi, ni][mask], 6).tolist(), pa.float64()),
            }
        )

    return ds.map_batches(pairs_batch, batch_format="pyarrow")


def hyperplane_bucket(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row (random-hyperplane LSH)."""
    signs = (mat @ planes.T) >= 0  # (N, P)
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return signs.astype(np.int64) @ weights


def knn_ivf(
    ds,
    queries: np.ndarray,
    *,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    seed: int = 11,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
):
    """IVF-flat ANN: coarse k-means centroids (trained on a bounded sample),
    rows pruned to the query's ``nprobe`` nearest centroids, then scored
    exactly.  The centroid codebook is tiny and rides in the task closure;
    training is deterministic (fixed seed + sorted sample).

    Scale path trade: recall grows with nprobe (nprobe == num_centroids
    degenerates to brute force).  Same output schema as knn_bruteforce.
    """
    import ray

    sample = ds.select_columns([vec_col]).limit(train_sample).take_all()
    train = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float64))
    rng = np.random.RandomState(seed)
    centroids = train[rng.choice(len(train), size=min(num_centroids, len(train)), replace=False)]
    for _ in range(10):  # Lloyd iterations on the sample
        assign = (train @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = train[assign == c]
            if len(members):
                centroid = members.mean(axis=0)
                norm = np.linalg.norm(centroid)
                if norm > 0:
                    centroids[c] = centroid / norm

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe_sets = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    probed = set(probe_sets.flatten().tolist())
    queries_ref = ray.put(qn)

    def centroid_filter(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return batch
        assign = (_normalize(mat) @ centroids.T).argmax(axis=1)
        mask = np.isin(assign, list(probed))
        return batch.filter(pa.array(mask))

    partials = ds.map_batches(centroid_filter, batch_format="pyarrow").map_batches(
        _batch_topk_fn(queries_ref, k, vec_col, key_col), batch_format="pyarrow"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", key_col], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_lsh(
    ds,
    queries: np.ndarray,
    *,
    k: int = 5,
    num_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
):
    """LSH-bucketed ANN: score only rows whose bucket matches a query bucket.

    The scale path: bucketing prunes the corpus ~2^planes-fold before the
    matmul; recall depends on num_planes (8 planes ≈ coarse; callers trade
    recall for cost).  Same output schema as :func:`knn_bruteforce`.
    """
    import ray

    rng = np.random.RandomState(seed)
    dim = np.asarray(queries).shape[1]
    planes = rng.standard_normal((num_planes, dim))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_buckets = set(hyperplane_bucket(qn, planes).tolist())
    queries_ref = ray.put(qn)

    def bucket_filter(batch: pa.Table) -> pa.Table:
        mat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return batch
        buckets = hyperplane_bucket(_normalize(mat), planes)
        mask = np.isin(buckets, list(q_buckets))
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(bucket_filter, batch_format="pyarrow")
    partials = filtered.map_batches(
        _batch_topk_fn(queries_ref, k, vec_col, key_col), batch_format="pyarrow"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", key_col], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
