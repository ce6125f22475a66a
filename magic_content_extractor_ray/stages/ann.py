"""Approximate nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once (``ray.put``) and every batch does one numpy matmul against it,
  emitting per-batch partial top-k candidates; a tiny driver-side merge
  produces the final top-k (candidates ≤ batches × queries × k — never the
  corpus).
- ``lsh_topk``: random-hyperplane LSH bucketing as the scale path — each
  vector lands in ``n_tables`` sign-pattern buckets; a query only scans its
  matching buckets. Same output schema; recall measured against brute force
  in tests.

Embeddings default to float32; ``dtype`` threads through the brute-force
path so oracle-compared queries can run the whole cosine computation in
float64 (matching DuckDB's double accumulation — a float32 near-tie can
flip ranks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, column: str,
                  dtype=np.float32) -> np.ndarray:
    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=dtype).reshape(len(batch), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _PartialTopK:
    """Stateful stage: the broadcast query matrix is fetched once per actor."""

    def __init__(self, queries_ref, k: int, column: str, id_column: str,
                 dtype_name: str = "float32"):
        import ray

        q = ray.get(queries_ref)
        self.dtype = np.dtype(dtype_name)
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = _normalize(np.asarray(q["matrix"], dtype=self.dtype))
        self.k = k
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_numpy(
            zero_copy_only=False))
        mat = _normalize(_batch_matrix(batch, self.column, self.dtype))
        sims = self.qmat @ mat.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        out_q = np.repeat(self.qids, k)
        out_n = ids[idx.ravel()].astype(np.int64)
        out_s = sims[np.repeat(np.arange(nq), k), idx.ravel()].astype(
            np.float64)
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int64()), pa.array(out_n, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["query_id", "neighbor_id", "score"])


def _dedup_and_topk(cands, k: int):
    """Candidate Dataset (query_id, neighbor_id, score) → per-query top-k
    Dataset (query_id, neighbor_id, rank, score). Fully distributed: a
    composite-key groupby dedups multi-bucket hits, then a per-query
    map_groups ranks — no driver materialization."""
    import pandas as pd

    # hash_agg: one group per (query, candidate) pair is candidate-scale
    # cardinality (see window.hash_agg); partitioning by query_id keeps
    # every pair of a query in one partition.
    from .window import hash_agg

    cands = cands.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
    deduped = hash_agg(cands, "query_id", [("score", "max", "score")],
                       group_cols=["query_id", "neighbor_id"])

    def topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        return g[["query_id", "neighbor_id", "rank", "score"]]

    return deduped.groupby("query_id").map_groups(
        topk, batch_format="pandas")


def _merge_topk(rows, k: int):
    """Driver-side merge of partial candidates → global top-k per query,
    deterministic tie-break on (−score, neighbor_id)."""
    import pandas as pd

    df = pd.DataFrame(rows)
    if df.empty:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rank": [],
                             "score": []})
    df = df.sort_values(["query_id", "score", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "neighbor_id", "rank", "score"]]


def load_queries(sf_dir: str, n_queries: int, column: str = "embedding",
                 id_column: str = "vec_id"):
    """First n vectors (by id) are the query set — deterministic."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=[id_column, column])
    t = t.sort_by(id_column).slice(0, n_queries)
    ids = t.column(id_column).to_pylist()
    mat = np.asarray(t.column(column).to_pylist(), dtype=np.float32)
    return {"ids": ids, "matrix": mat}


def brute_force_topk(ds, queries: dict, *, k: int = 10,
                     column: str = "embedding", id_column: str = "vec_id",
                     dtype: str = "float32"):
    """Exact cosine top-k of each query against the full dataset.
    ``dtype='float64'`` runs all cosine math in double precision (needed
    when ranks are compared against a double-precision SQL oracle)."""
    import ray

    qref = ray.put(queries)
    from ..util import actor_pool

    partials = ds.select_columns([id_column, column]).map_batches(
        _PartialTopK, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(queries_ref=qref, k=k, column=column,
                                   id_column=id_column, dtype_name=dtype))
    return _merge_topk(partials.take_all(), k)


def sample_centroids(ds, n_centroids: int, *, column: str = "embedding",
                     id_column: str = "vec_id") -> np.ndarray:
    """Deterministic IVF 'training': centroids = the n lowest-id vectors,
    L2-normalized (a seeded stand-in for k-means; at scale run minibatch
    k-means over a sample the same way).

    Selection is a per-batch partial bottom-k + tiny driver merge — the
    exact mirror of _PartialTopK (the previous global ``ds.sort`` was an
    all-to-all shuffle of the whole embedding table to pick n rows)."""

    def partial_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        if len(ids) > n_centroids:
            keep = np.argpartition(ids, n_centroids - 1)[:n_centroids]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch.select([id_column, column])

    rows = ds.select_columns([id_column, column]).map_batches(
        partial_bottomk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_column])
    mat = np.asarray([r[column] for r in rows[:n_centroids]],
                     dtype=np.float32)
    return _normalize(mat)


class _IvfAssigner:
    """Stateful stage: assigns each vector to its nearest centroid (one
    matmul per batch against the broadcast centroid matrix)."""

    def __init__(self, centroids_ref, column: str, id_column: str):
        import ray

        self.centroids = ray.get(centroids_ref)  # (C, dim), normalized
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, self.column))
        lists = np.argmax(mat @ self.centroids.T, axis=1)
        dim = mat.shape[1] if len(mat) else 1
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.astype(np.float32).ravel(), pa.float32()), dim)
        return pa.Table.from_arrays(
            [pa.array(lists.astype(np.int64)), pa.array(ids, pa.int64()),
             vec_arr],
            names=["ivf_list", self.id_column, "vec"])


def ivf_topk(ds, queries: dict, *, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, column: str = "embedding",
             id_column: str = "vec_id", train: str = "first"):
    """IVF-style ANN: vectors are inverted-listed by nearest centroid; a
    query scans only its ``nprobe`` closest lists. Same output schema as
    ``brute_force_topk``; recall grows with nprobe/n_centroids.
    ``train='kmeans'`` fits real centroids with distributed Lloyd
    iterations (stages/cluster.py) instead of the lowest-id seed set."""
    import ray
    import pandas as pd

    qmat = _normalize(np.asarray(queries["matrix"], dtype=np.float32))
    if train == "kmeans":
        from .cluster import kmeans_fit

        centroids = kmeans_fit(ds, k=n_centroids, iters=4, column=column,
                               id_column=id_column)
    else:
        centroids = sample_centroids(ds, n_centroids, column=column,
                                     id_column=id_column)
    centroids_ref = ray.put(centroids)

    from ..util import actor_pool

    assigned = ds.select_columns([id_column, column]).map_batches(
        _IvfAssigner, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(centroids_ref=centroids_ref,
                                   column=column, id_column=id_column))

    # per-query probe lists
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    probe_map: dict[int, list[int]] = {}
    for qi, lists in enumerate(probes):
        for li in lists:
            probe_map.setdefault(int(li), []).append(qi)
    info_ref = ray.put({"probe_map": probe_map, "qmat": qmat,
                        "qids": queries["ids"]})

    def scan_list(g: "pd.DataFrame") -> "pd.DataFrame":
        info = ray.get(info_ref)
        q_idx = info["probe_map"].get(int(g["ivf_list"].iloc[0]))
        if not q_idx:
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "score": []})
        mat = np.stack(g["vec"].to_numpy())
        ids = g[id_column].to_numpy()
        sims = info["qmat"][q_idx] @ mat.T
        out_q, out_n, out_s = [], [], []
        for row, qi in enumerate(q_idx):
            order = np.argsort(-sims[row])[:max(64, 4 * len(ids) // 10)]
            for j in order:
                out_q.append(info["qids"][qi])
                out_n.append(int(ids[j]))
                out_s.append(float(sims[row, j]))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "score": out_s})

    cands = assigned.groupby("ivf_list").map_groups(
        scan_list, batch_format="pandas")
    return _dedup_and_topk(cands, k)


class _LshBucketer:
    def __init__(self, planes_ref, column: str, id_column: str):
        import ray

        self.planes = ray.get(planes_ref)  # (n_tables, n_bits, dim) fp32
        self.column = column
        self.id_column = id_column

    def _keys(self, mat: np.ndarray) -> list[list[str]]:
        keys = []
        n_tables = self.planes.shape[0]
        bits_list = []
        for t in range(n_tables):
            proj = mat @ self.planes[t].T  # (n, n_bits)
            bits = (proj > 0).astype(np.uint64)
            key = (bits << np.arange(bits.shape[1], dtype=np.uint64)).sum(axis=1)
            bits_list.append([f"{t}:{int(v)}" for v in key])
        return bits_list

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        mat = _normalize(_batch_matrix(batch, self.column))
        per_table = self._keys(mat)
        n = len(ids)
        out_ids, out_keys, out_vecs = [], [], []
        for t_keys in per_table:
            out_ids.extend(ids.tolist())
            out_keys.extend(t_keys)
            out_vecs.append(mat)
        vec_mat = np.concatenate(out_vecs) if out_vecs else np.zeros((0, 1))
        dim = vec_mat.shape[1] if len(vec_mat) else 1
        vec_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vec_mat.astype(np.float32).ravel(), pa.float32()), dim)
        return pa.Table.from_arrays(
            [pa.array(out_keys), pa.array(out_ids, pa.int64()), vec_arr],
            names=["bucket", self.id_column, "vec"])


def make_planes(dim: int, n_tables: int = 8, n_bits: int = 8,
                seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim).astype(np.float32)


def lsh_topk(ds, queries: dict, *, k: int = 10, n_tables: int = 8,
             n_bits: int = 8, column: str = "embedding",
             id_column: str = "vec_id", seed: int = 7):
    """LSH-bucketed ANN: scan only buckets the query hashes into."""
    import ray
    import pandas as pd

    qmat = _normalize(np.asarray(queries["matrix"], dtype=np.float32))
    dim = qmat.shape[1]
    planes = make_planes(dim, n_tables, n_bits, seed)
    planes_ref = ray.put(planes)

    from ..util import actor_pool

    bucketed = ds.select_columns([id_column, column]).map_batches(
        _LshBucketer, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(planes_ref=planes_ref, column=column,
                                   id_column=id_column))

    # query bucket keys
    qkeys: dict[str, list[int]] = {}
    for t in range(n_tables):
        proj = qmat @ planes[t].T
        bits = (proj > 0).astype(np.uint64)
        key = (bits << np.arange(n_bits, dtype=np.uint64)).sum(axis=1)
        for qi, v in enumerate(key):
            qkeys.setdefault(f"{t}:{int(v)}", []).append(qi)
    qkey_ref = ray.put({"qkeys": qkeys, "qmat": qmat,
                        "qids": queries["ids"]})

    def scan_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        info = ray.get(qkey_ref)
        bucket = g["bucket"].iloc[0]
        q_idx = info["qkeys"].get(bucket)
        if not q_idx:
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "score": []})
        mat = np.stack(g["vec"].to_numpy())
        ids = g[id_column].to_numpy()
        sub = info["qmat"][q_idx]
        sims = sub @ mat.T
        out_q, out_n, out_s = [], [], []
        for row, qi in enumerate(q_idx):
            for j in range(sims.shape[1]):
                out_q.append(info["qids"][qi])
                out_n.append(int(ids[j]))
                out_s.append(float(sims[row, j]))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "score": out_s})

    cands = bucketed.groupby("bucket").map_groups(
        scan_bucket, batch_format="pandas")
    return _dedup_and_topk(cands, k)
