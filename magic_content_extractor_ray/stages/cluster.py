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


def semantic_dedup(ds, *, k: int | None = None, threshold: float = 0.95,
                   iters: int = 5, column: str = "embedding",
                   id_column: str = "vec_id", tile: int = 256,
                   num_buckets: int = 64, max_cluster_rows: int = 8192,
                   max_distinct: int = 4096, shard_bits: int = 8,
                   seed: int = 23):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    partitions the embedding space, then near-duplicate GROUPS are found
    by exact pairwise cosine WITHIN each cluster only — O(n²/k) total
    pair work instead of O(n²).

    ``k=None`` (default) sizes k ≈ √n from the dataset row count — the
    paper's scaling — so the expected cluster is √n rows and the O(n²/k)
    bound actually tightens as the corpus grows; pass an explicit k to
    pin it (tests / snapshot oracles do).

    Per-task work is bounded even when k-means drops a pathological
    share of the corpus into ONE cluster (template-expanded corpora):
    inside the partition task, each cluster first collapses
    byte-identical vectors to identity groups (m copies → one
    representative, never m² pairs — the embedding_dedup hot-bucket
    policy), and when the DISTINCT representatives still exceed
    ``max_cluster_rows`` they are sharded by a deterministic
    second-level sign-LSH (``shard_bits`` hyperplanes seeded per
    cluster) with a ``max_distinct`` comparison cap per shard — so the
    quadratic piece never exceeds max(max_cluster_rows, max_distinct)²
    regardless of cluster size. Sharding is an approximation (near-dup
    pairs straddling shards are missed); it only engages above the
    bound, below it results are exact and unchanged.

    Returns one row per vector: (vec_id, kcluster, rep_id) where rep_id
    is the min-id member of the vector's within-cluster near-dup group
    (itself when unique). ``rep_id != vec_id`` rows are the prunable
    semantic duplicates. Deterministic: kmeans_fit is
    parallelism-independent, clusters are processed whole inside one
    hash partition, grouping is min-id union-find, and the shard planes
    are a pure function of (seed, kcluster).
    """
    import ray

    from .ann import _batch_matrix, _normalize
    from .window import map_key_partitions, segment_lengths, segment_starts

    # kmeans_fit streams the input once per iteration (+ the init and
    # assignment passes) — pin the projected columns in the object store
    # so those 7+ passes don't re-execute the read lineage each time
    ds = ds.select_columns([id_column, column]).materialize()
    if k is None:
        n = ds.count()  # metadata-only on the materialized projection
        k = max(1, min(n, max(16, int(round(float(n) ** 0.5)))))
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

    def dedup_cluster(ids: np.ndarray, mat: np.ndarray, kcluster: int,
                      out_id: list, out_cl: list, out_rep: list) -> None:
        """One cluster (ids sorted ascending, mat row-aligned): min-id
        union-find over cosine>=threshold pairs. Identity groups collapse
        first; distinct representatives shard via sign-LSH only past
        ``max_cluster_rows`` (below the bound this reproduces all-pairs
        connectivity exactly: every member connects through its
        representative)."""
        n_rows = len(ids)
        parent = np.arange(n_rows)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        def union(i, j):
            ra, rb = find(int(i)), find(int(j))
            if ra != rb:  # ids sorted → min index = min id
                parent[max(ra, rb)] = min(ra, rb)

        # identity groups: byte-identical vectors → union to first member
        uniq, inverse = np.unique(mat, axis=0, return_inverse=True)
        inverse = inverse.ravel()
        order = np.argsort(inverse, kind="stable")
        g_starts = segment_starts(inverse[order])
        g_lens = segment_lengths(g_starts, n_rows)
        rep_idx = np.empty(len(uniq), dtype=np.int64)
        for s, ln in zip(g_starts, g_lens):
            members = order[int(s):int(s + ln)]
            members.sort()  # min index = min id
            gi = inverse[members[0]]
            rep_idx[gi] = members[0]
            # identical normalized vectors have cosine 1 — except the
            # all-zero vector (cosine 0), which only unions when the
            # threshold admits it (matches the pre-shard all-pairs path)
            if float(uniq[gi] @ uniq[gi]) >= threshold:
                for m in members[1:]:
                    union(members[0], m)

        # shard distinct representatives when the cluster is over-bound
        n_uniq = len(uniq)
        if n_uniq > max_cluster_rows:
            rng = np.random.RandomState(
                (seed * 1_000_003 + int(kcluster)) % (2**32))
            planes = rng.randn(shard_bits, uniq.shape[1]).astype(np.float32)
            bits = (uniq @ planes.T) > 0
            shard = bits @ (1 << np.arange(shard_bits, dtype=np.int64))
            shard_order = np.argsort(shard, kind="stable")
        else:
            shard = np.zeros(n_uniq, dtype=np.int64)
            shard_order = np.arange(n_uniq)

        s_starts = segment_starts(shard[shard_order])
        s_lens = segment_lengths(s_starts, n_uniq)
        for s, ln in zip(s_starts[s_lens >= 2], s_lens[s_lens >= 2]):
            grp = shard_order[int(s):int(s + ln)][:max_distinct]
            reps = uniq[grp]
            for i0 in range(0, len(grp), tile):
                sims = reps[i0:i0 + tile] @ reps.T
                ii, jj = np.nonzero(sims >= threshold)
                for i, j in zip(ii, jj):
                    gi, gj = i0 + int(i), int(j)
                    if gi < gj:
                        union(rep_idx[grp[gi]], rep_idx[grp[gj]])

        reps_ids = ids[np.array([find(i) for i in range(n_rows)])]
        out_id.extend(ids.tolist())
        out_cl.extend([int(kcluster)] * n_rows)
        out_rep.extend(reps_ids.tolist())

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
                dedup_cluster(ids, mat, int(keys[s]),
                              out_id, out_cl, out_rep)
        return pa.table({id_column: pa.array(out_id, pa.int64()),
                         "kcluster": pa.array(out_cl, pa.int64()),
                         "rep_id": pa.array(out_rep, pa.int64())})

    return map_key_partitions(assigned, "kcluster", dedup_partition,
                              num_buckets=num_buckets,
                              sort_cols=[id_column])
