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


def hyperplane_bucket(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row (random-hyperplane LSH)."""
    signs = (mat @ planes.T) >= 0  # (N, P)
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    return signs.astype(np.int64) @ weights


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
