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


def semantic_dedup(ds, *, k: int = 16, threshold: float = 0.95,
                   iters: int = 5, column: str = "embedding",
                   id_column: str = "vec_id", tile: int = 256,
                   num_buckets: int = 64):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    partitions the embedding space, then near-duplicate GROUPS are found
    by exact pairwise cosine WITHIN each cluster only — O(n²/k) total
    pair work instead of O(n²), and the quadratic piece is bounded per
    task by the cluster size (size ``k`` to the corpus: the paper uses
    k ~ sqrt(n)).

    Returns one row per vector: (vec_id, kcluster, rep_id) where rep_id
    is the min-id member of the vector's within-cluster near-dup group
    (itself when unique). ``rep_id != vec_id`` rows are the prunable
    semantic duplicates. Deterministic: kmeans_fit is
    parallelism-independent, clusters are processed whole inside one
    hash partition, and grouping is min-id union-find.
    """
    import ray

    from .ann import _batch_matrix, _normalize
    from .window import map_key_partitions, segment_lengths, segment_starts

    # kmeans_fit streams the input once per iteration (+ the init and
    # assignment passes) — pin the projected columns in the object store
    # so those 7+ passes don't re-execute the read lineage each time
    ds = ds.select_columns([id_column, column]).materialize()
    centroids = kmeans_fit(ds, k=k, iters=iters, column=column,
                           id_column=id_column)
    cref = ray.put(centroids)

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        mat = _normalize(_batch_matrix(batch, column))
        if not len(mat):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "kcluster": pa.array([], pa.int64()),
                             "nvec": pa.array([], pa.binary())})
        assign = np.argmax(mat @ cents.T, axis=1).astype(np.int64)
        return pa.table({
            id_column: pa.array(batch.column(id_column).to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64()),
            "kcluster": pa.array(assign, pa.int64()),
            # normalized vector rides the shuffle as fp32 bytes
            "nvec": pa.array([mat[i].astype(np.float32).tobytes()
                              for i in range(len(mat))], pa.binary()),
        })

    assigned = ds.map_batches(assign_with_vec, batch_format="pyarrow")

    def dedup_partition(part: pa.Table) -> pa.Table:
        keys = part.column("kcluster").to_numpy(zero_copy_only=False)
        out_id: list = []
        out_cl: list = []
        out_rep: list = []
        if len(keys):
            ids_all = part.column(id_column).to_numpy(zero_copy_only=False)
            blobs = part.column("nvec").combine_chunks()
            starts = segment_starts(keys)
            lens = segment_lengths(starts, len(keys))
            for s, ln in zip(starts, lens):
                sl = slice(int(s), int(s + ln))
                ids = ids_all[sl]
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                mat = np.frombuffer(
                    b"".join(blobs[sl].to_pylist()),
                    dtype=np.float32).reshape(int(ln), -1)[order]
                # min-id union-find over cosine>=threshold pairs, tiled
                parent = np.arange(len(ids))

                def find(i):
                    while parent[i] != i:
                        parent[i] = parent[parent[i]]
                        i = parent[i]
                    return i

                for i0 in range(0, len(ids), tile):
                    sims = mat[i0:i0 + tile] @ mat.T
                    ii, jj = np.nonzero(sims >= threshold)
                    for i, j in zip(ii, jj):
                        gi = i0 + int(i)
                        if gi >= j:
                            continue
                        ra, rb = find(gi), find(int(j))
                        if ra != rb:  # ids sorted → min index = min id
                            parent[max(ra, rb)] = min(ra, rb)
                reps = ids[np.array([find(i) for i in range(len(ids))])]
                out_id.extend(ids.tolist())
                out_cl.extend([int(keys[s])] * int(ln))
                out_rep.extend(reps.tolist())
        return pa.table({id_column: pa.array(out_id, pa.int64()),
                         "kcluster": pa.array(out_cl, pa.int64()),
                         "rep_id": pa.array(out_rep, pa.int64())})

    return map_key_partitions(assigned, "kcluster", dedup_partition,
                              num_buckets=num_buckets,
                              sort_cols=[id_column])
