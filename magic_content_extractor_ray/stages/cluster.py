"""Distributed k-means (Lloyd iterations with mergeable partial sums).

The canonical scale shape for clustering embeddings: each iteration
broadcasts the centroid matrix once (``ray.put``), every batch computes
assignments with one matmul and emits k partial (sum, count) rows, and the
driver reduces k×dim floats — the shuffle never carries vectors. Used
standalone (`kmeans_fit`, `assign_clusters`) and as the IVF trainer
(stages/ann.ivf_topk(train='kmeans')).

Determinism: centroids initialize from the n lowest-id vectors (same
bounded partial bottom-k as sample_centroids) and iterate a fixed count —
same input → same model on every run/parallelism level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _partial_stats(batch: pa.Table, *, centroids_ref, column: str):
    """Per-batch: assign to nearest centroid (cosine), emit per-centroid
    partial vector sums + counts (k rows, never the vectors)."""
    import ray

    from .ann import _batch_matrix, _normalize

    centroids = ray.get(centroids_ref)  # (k, dim) L2-normalized
    mat = _normalize(_batch_matrix(batch, column))
    if not len(mat):
        return pa.table({"cid": pa.array([], pa.int64()),
                         "vec_sum": pa.array([], pa.binary()),
                         "cnt": pa.array([], pa.int64())})
    assign = np.argmax(mat @ centroids.T, axis=1)
    k, dim = centroids.shape
    sums = np.zeros((k, dim), dtype=np.float64)
    np.add.at(sums, assign, mat.astype(np.float64))
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    used = np.nonzero(counts)[0]
    return pa.table({
        "cid": pa.array(used, pa.int64()),
        "vec_sum": pa.array([sums[c].tobytes() for c in used], pa.binary()),
        "cnt": pa.array(counts[used], pa.int64()),
    })


def kmeans_fit(ds, *, k: int = 16, iters: int = 5,
               column: str = "embedding",
               id_column: str = "vec_id") -> np.ndarray:
    """Fit k spherical-k-means centroids. Per iteration: one broadcast +
    one streaming pass + a driver reduce of ≤ batches×k tiny rows."""
    import ray

    from .ann import sample_centroids

    centroids = sample_centroids(ds, k, column=column, id_column=id_column)
    dim = centroids.shape[1]
    for _ in range(iters):
        cref = ray.put(centroids)
        rows = ds.map_batches(
            _partial_stats, batch_format="pyarrow",
            fn_kwargs=dict(centroids_ref=cref, column=column)).take_all()
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            c = int(r["cid"])
            sums[c] += np.frombuffer(r["vec_sum"], dtype=np.float64)
            counts[c] += int(r["cnt"])
        new = centroids.astype(np.float64).copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = (new / norms).astype(np.float32)
    return centroids


def assign_clusters(ds, centroids: np.ndarray, *,
                    column: str = "embedding", id_column: str = "vec_id"):
    """(id, cluster) Dataset: one broadcast, one matmul per batch."""
    import ray

    from .ann import _batch_matrix, _normalize

    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalize(_batch_matrix(batch, column))
        cid = (np.argmax(mat @ c.T, axis=1) if len(mat)
               else np.zeros(0, dtype=np.int64))
        return pa.table({
            id_column: batch.column(id_column),
            "cluster": pa.array(cid.astype(np.int64), pa.int64()),
        })

    return ds.select_columns([id_column, column]).map_batches(
        assign, batch_format="pyarrow")
