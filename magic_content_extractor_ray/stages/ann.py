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
                 dtype_name: str = "float32", normalize: bool = True):
        import ray

        q = ray.get(queries_ref)
        self.dtype = np.dtype(dtype_name)
        self.normalize = normalize
        qm = np.asarray(q["matrix"], dtype=self.dtype)
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = _normalize(qm) if normalize else qm
        self.k = k
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_numpy(
            zero_copy_only=False))
        mat = _batch_matrix(batch, self.column, self.dtype)
        if self.normalize:
            mat = _normalize(mat)
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
                     dtype: str = "float32", normalize: bool = True):
    """Exact cosine top-k of each query against the full dataset.
    ``dtype='float64'`` runs all cosine math in double precision (needed
    when ranks are compared against a double-precision SQL oracle).
    ``normalize=False`` skips L2 normalization — exact MAXIMUM INNER
    PRODUCT search, the ground truth for the quantized-MIPS recall
    check."""
    import ray

    qref = ray.put(queries)
    from ..util import actor_pool

    partials = ds.select_columns([id_column, column]).map_batches(
        _PartialTopK, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(queries_ref=qref, k=k, column=column,
                                   id_column=id_column, dtype_name=dtype,
                                   normalize=normalize))
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


def sq8_grid(ds, *, column: str = "embedding"):
    """Per-dimension (min, max) of the embedding column — the int8
    scalar-quantization grid (the SQ8 codec of FAISS/ScaNN). One combiner
    pass: each batch reduces to a (dim, mn, mx) table in float64 (float32
    promotes losslessly, so the grid is bit-identical to a SQL
    ``min(CAST(val AS DOUBLE))``); the driver merges the bounded
    n_blocks × dim partials."""

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, column, np.float64)
        if not len(mat):
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "dim": pa.array(np.arange(mat.shape[1], dtype=np.int64)),
            "mn": pa.array(mat.min(axis=0)),
            "mx": pa.array(mat.max(axis=0))})

    cells = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    g = cells.groupby("dim", sort=True)
    return (g["mn"].min().to_numpy(), g["mx"].max().to_numpy())


def sq8_encode(mat64: np.ndarray, mins: np.ndarray,
               maxs: np.ndarray) -> np.ndarray:
    """float64 matrix → int64 codes in [0, 255]:
    ``floor((x − mn) · 255 / (mx − mn))`` — written as the identical IEEE
    double expression the SQL twin uses, so codes match bit-for-bit
    (constant dims quantize to 0). Values are assumed in-grid (the grid
    came from the same corpus)."""
    span = maxs - mins
    safe = np.where(span == 0.0, 1.0, span)
    codes = np.floor((mat64 - mins) * 255.0 / safe)
    return np.where(span == 0.0, 0.0, codes).astype(np.int64)


_SQ8_FP = 16777216.0  # 2^24 fixed-point scale for dequantized values


def sq8_fixed_point(codes: np.ndarray, mins: np.ndarray,
                    maxs: np.ndarray) -> np.ndarray:
    """Codes → EXACT-INTEGER fixed-point dequantization
    ``X = floor(mn·2²⁴ + 0.5) + code · floor(span/255·2²⁴ + 0.5)`` —
    X/2²⁴ approximates the original value, and integer inner products of
    X rank identically in any summation order and engine. (Scoring raw
    codes instead would rank by the per-dim AFFINE-SHIFTED vectors — the
    shift by mn is not rank-preserving for inner products.) Half-up
    floor(x+0.5) keeps the rounding rule engine-independent. Headroom:
    unit-norm inputs give |X| ≤ ~2²⁴, 64-dim scores ≤ ~2⁵⁴ « int64."""
    mni = np.floor(mins * _SQ8_FP + 0.5).astype(np.int64)
    si = np.floor((maxs - mins) / 255.0 * _SQ8_FP + 0.5).astype(np.int64)
    return mni + codes * si


class _Sq8PartialTopK:
    """Stateful stage: quantizes each batch on the broadcast grid and
    scores against the broadcast quantized queries with an INT64 dot
    product — exact in any summation order, so ranks are engine- and
    partitioning-independent (unlike float cosine near-ties)."""

    def __init__(self, info_ref, k: int, column: str, id_column: str):
        import ray

        info = ray.get(info_ref)
        self.mins = info["mins"]
        self.maxs = info["maxs"]
        self.qids = np.asarray(info["qids"], dtype=np.int64)
        # queries in fixed point (same grid as the corpus side)
        self.qfx = sq8_fixed_point(info["qcodes"], self.mins, self.maxs)
        self.k = k
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_numpy(
            zero_copy_only=False))
        codes = sq8_encode(_batch_matrix(batch, self.column, np.float64),
                           self.mins, self.maxs)
        xfx = sq8_fixed_point(codes, self.mins, self.maxs)
        sims = self.qfx @ xfx.T  # (nq, nb) int64, exact
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        return pa.Table.from_arrays(
            [pa.array(np.repeat(self.qids, k), pa.int64()),
             pa.array(ids[idx.ravel()].astype(np.int64), pa.int64()),
             pa.array(sims[np.repeat(np.arange(nq), k), idx.ravel()],
                      pa.int64())],
            names=["query_id", "neighbor_id", "iscore"])


def sq8_topk(ds, queries: dict, *, k: int = 10,
             column: str = "embedding", id_column: str = "vec_id"):
    """Top-k by quantized inner product over SQ8 codes (symmetric
    quantization: query and corpus share the grid). Two passes: grid,
    then score — per-block partial top-k, tiny driver merge with
    deterministic (−iscore, neighbor_id) tie-break."""
    import pandas as pd
    import ray

    from ..util import actor_pool

    mins, maxs = sq8_grid(ds, column=column)
    qcodes = sq8_encode(np.asarray(queries["matrix"], dtype=np.float64),
                        mins, maxs)
    info_ref = ray.put({"mins": mins, "maxs": maxs, "qcodes": qcodes,
                        "qids": queries["ids"]})
    partials = ds.select_columns([id_column, column]).map_batches(
        _Sq8PartialTopK, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(info_ref=info_ref, k=k, column=column,
                                   id_column=id_column))
    df = pd.DataFrame(partials.take_all())
    df = df.sort_values(["query_id", "iscore", "neighbor_id"],
                        ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "neighbor_id", "rank", "iscore"]].astype(
        {"rank": "int64", "iscore": "int64"})


def kcenter_select(ds, *, k: int = 8, column: str = "embedding",
                   id_column: str = "vec_id"):
    """Greedy farthest-point (Gonzalez) k-center over the SQ8 codes —
    the diversity-sampling seed selector (coreset/facility-location
    style). Distances are EXACT integer squared-L2 on the codes, so the
    greedy trajectory is reproducible across engines, block orders and
    parallelism. Seed = lowest vec_id; each of the k−1 rounds broadcasts
    the chosen code rows and runs a distributed argmax of
    min-distance-to-chosen (per-block partial argmax, ≤1 row per block
    to the driver). k passes over a once-materialized projected codes
    dataset (id + 64 int64 codes — the full embedding table is never
    re-read or re-quantized per round)."""
    import ray

    mins, maxs = sq8_grid(ds, column=column)
    grid_ref = ray.put((mins, maxs))

    def encode_batch(batch: pa.Table) -> pa.Table:
        mn, mx = ray.get(grid_ref)
        ids = np.asarray(batch.column(id_column).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        codes = sq8_encode(_batch_matrix(batch, column, np.float64),
                           mn, mx)
        dim = codes.shape[1] if len(codes) else 1
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.int64()), dim)
        return pa.Table.from_arrays([pa.array(ids, pa.int64()), arr],
                                    names=[id_column, "code"])

    codes_ds = ds.select_columns([id_column, column]).map_batches(
        encode_batch, batch_format="pyarrow").materialize()

    def code_matrix(batch: pa.Table):
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return ids, flat.reshape(len(batch), -1)

    def partial_min_id(batch: pa.Table) -> pa.Table:
        ids, mat = code_matrix(batch)
        if not len(ids):
            return batch.slice(0, 0)
        return batch.take(pa.array([int(np.argmin(ids))]))

    seed_rows = codes_ds.map_batches(
        partial_min_id, batch_format="pyarrow").take_all()
    if not seed_rows:                     # empty input: empty selection
        import pandas as pd

        return pd.DataFrame({
            "round": pd.array([], dtype="int64"),
            id_column: pd.array([], dtype="int64"),
            "dist_sq": pd.array([], dtype="int64")})
    seed = min(seed_rows, key=lambda r: r[id_column])
    chosen_ids = [int(seed[id_column])]
    chosen_codes = [np.asarray(seed["code"], dtype=np.int64)]
    dists = [0]

    for _ in range(k - 1):
        ch_ref = ray.put(np.stack(chosen_codes))

        def partial_farthest(batch: pa.Table) -> pa.Table:
            ids, mat = code_matrix(batch)
            empty = pa.table({id_column: pa.array([], pa.int64()),
                              "d": pa.array([], pa.int64()),
                              "code": pa.array([], pa.list_(pa.int64()))})
            if not len(ids):
                return empty
            ch = ray.get(ch_ref)
            best = None
            for c in ch:
                diff = mat - c
                d = np.einsum("ij,ij->i", diff, diff)
                best = d if best is None else np.minimum(best, d)
            # farthest with (d desc, id asc) tie-break, vectorized
            top = np.flatnonzero(best == best.max())
            j = int(top[np.argmin(ids[top])])
            return pa.table({
                id_column: pa.array([int(ids[j])], pa.int64()),
                "d": pa.array([int(best[j])], pa.int64()),
                "code": pa.array([mat[j].tolist()],
                                 pa.list_(pa.int64()))})

        cands = codes_ds.map_batches(
            partial_farthest, batch_format="pyarrow").take_all()
        nxt = max(cands, key=lambda r: (r["d"], -r[id_column]))
        chosen_ids.append(int(nxt[id_column]))
        dists.append(int(nxt["d"]))
        chosen_codes.append(np.asarray(nxt["code"], dtype=np.int64))

    import pandas as pd

    return pd.DataFrame({
        "round": pd.array(range(1, k + 1), dtype="int64"),
        id_column: pd.array(chosen_ids, dtype="int64"),
        "dist_sq": pd.array(dists, dtype="int64")})


def mmr_select(ds, *, k: int = 8, column: str = "embedding",
               id_column: str = "vec_id"):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) over the SQ8 codes with λ = 1/2: query = the lowest-id
    vector's code; round 1 picks the most RELEVANT candidate
    (min distance to the query), every later round the candidate
    maximizing (min-dist-to-chosen − dist-to-query) — relevance minus
    redundancy on the same integer squared-L2 scale, so the greedy
    trajectory is exactly reproducible (ties → smaller id; the chosen
    set is excluded outright). Same execution shape as kcenter_select:
    once-materialized projected codes, per round one broadcast of the
    chosen codes + a distributed per-block partial argmax (≤1 row per
    block to the driver). Returns (round, id, score2) where
    score2 = mind − dq at pick time (round 1: −dq, mind ≡ 0)."""
    import ray

    mins, maxs = sq8_grid(ds, column=column)
    grid_ref = ray.put((mins, maxs))

    def encode_batch(batch: pa.Table) -> pa.Table:
        mn, mx = ray.get(grid_ref)
        ids = np.asarray(batch.column(id_column).to_numpy(
            zero_copy_only=False), dtype=np.int64)
        codes = sq8_encode(_batch_matrix(batch, column, np.float64),
                           mn, mx)
        dim = codes.shape[1] if len(codes) else 1
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.int64()), dim)
        return pa.Table.from_arrays([pa.array(ids, pa.int64()), arr],
                                    names=[id_column, "code"])

    codes_ds = ds.select_columns([id_column, column]).map_batches(
        encode_batch, batch_format="pyarrow").materialize()

    def code_matrix(batch: pa.Table):
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        col = batch.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return ids, flat.reshape(len(batch), -1)

    def partial_min_id(batch: pa.Table) -> pa.Table:
        ids, _ = code_matrix(batch)
        if not len(ids):
            return batch.slice(0, 0)
        return batch.take(pa.array([int(np.argmin(ids))]))

    seed_rows = codes_ds.map_batches(
        partial_min_id, batch_format="pyarrow").take_all()
    if not seed_rows:                     # empty input: empty selection
        import pandas as pd

        return pd.DataFrame({
            "round": pd.array([], dtype="int64"),
            id_column: pd.array([], dtype="int64"),
            "score2": pd.array([], dtype="int64")})
    qrow = min(seed_rows, key=lambda r: r[id_column])
    qid = int(qrow[id_column])
    qcode = np.asarray(qrow["code"], dtype=np.int64)

    chosen_ids: list[int] = []
    chosen_codes: list[np.ndarray] = []
    scores: list[int] = []

    for rnd in range(k):
        state = ray.put({
            "q": qcode, "qid": qid,
            "chosen": (np.stack(chosen_codes)
                       if chosen_codes else None),
            "excl": np.array([qid] + chosen_ids, dtype=np.int64)})

        def partial_best(batch: pa.Table) -> pa.Table:
            ids, mat = code_matrix(batch)
            empty = pa.table({id_column: pa.array([], pa.int64()),
                              "sc": pa.array([], pa.int64()),
                              "code": pa.array([],
                                               pa.list_(pa.int64()))})
            if not len(ids):
                return empty
            st = ray.get(state)
            keep = ~np.isin(ids, st["excl"])
            if not keep.any():
                return empty
            ids, mat = ids[keep], mat[keep]
            diff = mat - st["q"]
            dq = np.einsum("ij,ij->i", diff, diff)
            if st["chosen"] is None:
                sc = -dq
            else:
                mind = None
                for c in st["chosen"]:
                    d2 = mat - c
                    d = np.einsum("ij,ij->i", d2, d2)
                    mind = d if mind is None else np.minimum(mind, d)
                sc = mind - dq
            top = np.flatnonzero(sc == sc.max())
            j = int(top[np.argmin(ids[top])])
            return pa.table({
                id_column: pa.array([int(ids[j])], pa.int64()),
                "sc": pa.array([int(sc[j])], pa.int64()),
                "code": pa.array([mat[j].tolist()],
                                 pa.list_(pa.int64()))})

        cands = codes_ds.map_batches(
            partial_best, batch_format="pyarrow").take_all()
        if not cands:
            break
        nxt = max(cands, key=lambda r: (r["sc"], -r[id_column]))
        chosen_ids.append(int(nxt[id_column]))
        scores.append(int(nxt["sc"]))
        chosen_codes.append(np.asarray(nxt["code"], dtype=np.int64))

    import pandas as pd

    return pd.DataFrame({
        "round": pd.array(range(1, len(chosen_ids) + 1), dtype="int64"),
        id_column: pd.array(chosen_ids, dtype="int64"),
        "score2": pd.array(scores, dtype="int64")})


def knn_edges(ds, *, k: int = 5, n_rows: int | None = None,
              threshold: int = 4096, column: str = "embedding",
              id_column: str = "vec_id", n_centroids: int | None = None,
              nprobe: int | None = None, recall_sample: int = 256,
              min_recall: float = 0.9):
    """All-pairs cosine k-nearest-neighbor EDGE LIST (``s``, ``t``):
    every vector is a query; ``t`` ranges over its k nearest neighbors
    (self excluded, ties to the smaller id — the stable-argsort /
    ``row_number(ORDER BY sc DESC, t)`` convention shared with the SQL
    oracles). This is the kNN-graph builder behind mutual-NN pairing
    and label propagation.

    Two paths, switched on the row count:

    - ``n ≤ threshold`` — EXACT: the whole id-sorted matrix is gathered
      once (bounded by ``threshold`` rows), broadcast via ``ray.put``,
      and each batch takes its float64 top-k against it. Bitwise
      identical to the historical broadcast-matmul implementation, so
      the sf0.01 oracles are unchanged.
    - ``n > threshold`` — IVF-BUCKETED, no corpus broadcast: centroids
      = the deterministic lowest-id seed set (``sample_centroids``);
      ONE expansion map emits each vector once as a MEMBER of its
      nearest-centroid list and ``nprobe`` times as a QUERY of its
      closest lists; one ``map_key_partitions`` exchange per list runs
      the local queries×members matmul and keeps per-query local
      top-(k+1); a second exchange keyed by query merges local
      candidates into the global top-k. FLOPs drop from O(n²d) to
      ~(nprobe/n_centroids)·n²d and only (1+nprobe)·n rows shuffle —
      the 100 TB shape (each list partition holds ~n/n_centroids
      vectors regardless of cluster count). Every IVF run self-asserts:
      ``recall_sample`` hash-sampled queries are re-answered by the
      exact broadcast brute force (O(sample·n·d), cheap) and the run
      RAISES below ``min_recall`` — the q_ann_ivf in-query recall
      policy, sampled so the gate itself stays sub-quadratic."""
    import ray

    from ..util import actor_pool
    from .window import map_key_partitions, segment_starts

    if n_rows is None:
        n_rows = ds.count()
    if n_rows <= threshold:
        rows = ds.select_columns([id_column, column]).take_all()
        rows.sort(key=lambda r: r[id_column])
        all_ids = np.asarray([r[id_column] for r in rows], np.int64)
        qmat = _normalize(np.asarray(
            [r[column] for r in rows], np.float64))
        ref = ray.put({"ids": all_ids, "matrix": qmat})

        class _ExactTopK:
            def __init__(self):
                q = ray.get(ref)
                self.ids = q["ids"]
                self.mat = q["matrix"]

            def __call__(self, batch: pa.Table) -> pa.Table:
                if len(batch) == 0:
                    z = pa.array([], pa.int64())
                    return pa.table({"s": z, "t": z})
                bids = batch.column(id_column).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                m = _normalize(_batch_matrix(batch, column, np.float64))
                sims = m @ self.mat.T
                rows_ix = np.arange(len(bids))
                sims[rows_ix, np.searchsorted(self.ids, bids)] = -np.inf
                top = np.argsort(-sims, axis=1, kind="stable")[:, :k]
                return pa.table({
                    "s": pa.array(np.repeat(bids, k), pa.int64()),
                    "t": pa.array(self.ids[top.ravel()], pa.int64())})

        return ds.select_columns([id_column, column]).map_batches(
            _ExactTopK, batch_format="pyarrow", batch_size=1024,
            concurrency=(1, 8))

    # ---- IVF-bucketed path ----
    if n_centroids is None:
        n_centroids = max(16, int(np.sqrt(n_rows)))
    if nprobe is None:
        # measured at 20k and 200k vectors (BASELINE.md): recall 1.0
        # from nprobe=6 up on clustered embeddings. nprobe is CAPPED —
        # candidate volume is n·nprobe·(k+1) rows, so a probe count
        # that grows with √n turns the merge exchange into the
        # bottleneck (nprobe=37 at 200k: 44M candidate rows, 217 s;
        # nprobe=16: same recall, far smaller exchange)
        nprobe = max(8, min(16, n_centroids // 12))
    nprobe = min(nprobe, n_centroids)
    centroids = sample_centroids(ds, n_centroids, column=column,
                                 id_column=id_column)
    cref = ray.put(centroids)

    class _Expand:
        """member row (role 0, own list) + nprobe query rows (role 1)."""

        def __init__(self):
            self.cent = ray.get(cref).astype(np.float32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                z = pa.array([], pa.int64())
                return pa.table({
                    "list": z, "role": z, "vid": z,
                    "vec": pa.array([], pa.list_(pa.float32()))})
            ids = batch.column(id_column).to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(batch, column, np.float32))
            cs = m @ self.cent.T
            probes = np.argsort(-cs, axis=1, kind="stable")[:, :nprobe]
            n, dim = m.shape
            own = probes[:, 0]
            lists = np.concatenate([own, probes.ravel()])
            roles = np.concatenate([np.zeros(n, np.int64),
                                    np.ones(n * nprobe, np.int64)])
            vids = np.concatenate([ids, np.repeat(ids, nprobe)])
            mats = np.concatenate([m, np.repeat(m, nprobe, axis=0)])
            vec = pa.FixedSizeListArray.from_arrays(
                pa.array(mats.ravel(), pa.float32()), dim)
            return pa.table({
                "list": pa.array(lists.astype(np.int64), pa.int64()),
                "role": pa.array(roles, pa.int64()),
                "vid": pa.array(vids, pa.int64()),
                "vec": vec})

    expanded = ds.select_columns([id_column, column]).map_batches(
        _Expand, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool())

    def scan_lists(t: pa.Table) -> pa.Table:
        lists = t.column("list").to_numpy(zero_copy_only=False)
        out_q, out_t, out_s = [], [], []
        if len(lists):
            roles = t.column("role").to_numpy(zero_copy_only=False)
            vids = t.column("vid").to_numpy(zero_copy_only=False)
            col = t.column("vec")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = col.flatten().to_numpy(zero_copy_only=False).reshape(
                len(t), -1).astype(np.float64)
            for s in segment_starts(lists):
                e = int(np.searchsorted(lists, lists[s], side="right"))
                seg = slice(int(s), e)
                mem = roles[seg] == 0
                qm = ~mem
                if not mem.any() or not qm.any():
                    continue
                mids = vids[seg][mem]
                qids = vids[seg][qm]
                sims = mat[seg][qm] @ mat[seg][mem].T
                kk = min(k + 1, sims.shape[1])
                # per-query candidates by (sim desc, member id asc)
                ordm = np.argsort(mids, kind="stable")
                mids_s = mids[ordm]
                sims_s = sims[:, ordm]
                part = np.argsort(-sims_s, axis=1, kind="stable")[:, :kk]
                out_q.append(np.repeat(qids, kk))
                out_t.append(mids_s[part.ravel()])
                out_s.append(np.take_along_axis(
                    sims_s, part, axis=1).ravel())
        if not out_q:
            z = pa.array([], pa.int64())
            return pa.table({"q": z, "t": z,
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "q": pa.array(np.concatenate(out_q), pa.int64()),
            "t": pa.array(np.concatenate(out_t), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64())})

    cands = map_key_partitions(expanded, "list", scan_lists,
                               producer_expands=True)

    def merge_q(t: pa.Table) -> pa.Table:
        qs = t.column("q").to_numpy(zero_copy_only=False)
        out_s, out_t = [], []
        if len(qs):
            ts = t.column("t").to_numpy(zero_copy_only=False)
            sims = t.column("sim").to_numpy(zero_copy_only=False)
            for s in segment_starts(qs):
                e = int(np.searchsorted(qs, qs[s], side="right"))
                seg = slice(int(s), e)
                tt, ss = ts[seg], sims[seg]
                keep = tt != qs[s]
                tt, ss = tt[keep], ss[keep]
                if not len(tt):
                    continue
                order = np.lexsort((tt, -ss))[:k]
                out_s.append(np.full(len(order), qs[s], np.int64))
                out_t.append(tt[order])
        if not out_s:
            z = pa.array([], pa.int64())
            return pa.table({"s": z, "t": z})
        return pa.table({
            "s": pa.array(np.concatenate(out_s), pa.int64()),
            "t": pa.array(np.concatenate(out_t), pa.int64())})

    edges = map_key_partitions(cands, "q", merge_q).materialize()

    # ---- sampled recall gate vs exact brute force ----
    if recall_sample and min_recall > 0:
        step = max(1, n_rows // recall_sample)

        def pick_sample(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep = (ids % step) == 0
            return batch.filter(pa.array(keep)).select(
                [id_column, column])

        srows = ds.select_columns([id_column, column]).map_batches(
            pick_sample, batch_format="pyarrow").take_all()
        srows.sort(key=lambda r: r[id_column])
        squeries = {
            "ids": [int(r[id_column]) for r in srows],
            "matrix": np.asarray([r[column] for r in srows],
                                 np.float64)}
        # k+1 then drop self: corpus queries' top-1 is themselves
        exact = brute_force_topk(ds, squeries, k=k + 1, column=column,
                                 id_column=id_column, dtype="float64")
        noself = exact[exact["query_id"] != exact["neighbor_id"]]
        noself = noself.sort_values(["query_id", "rank"]).groupby(
            "query_id").head(k)
        exact_pairs = {(int(q), int(t)) for q, t in zip(
            noself["query_id"], noself["neighbor_id"])}
        sids = set(squeries["ids"])

        def count_hits(batch: pa.Table) -> pa.Table:
            ss = batch.column("s").to_numpy(zero_copy_only=False)
            tt = batch.column("t").to_numpy(zero_copy_only=False)
            hits = sum(1 for a, b in zip(ss, tt)
                       if int(a) in sids and (int(a), int(b))
                       in exact_pairs)
            return pa.table({"hits": pa.array([hits], pa.int64())})

        got = sum(r["hits"] for r in edges.map_batches(
            count_hits, batch_format="pyarrow").take_all())
        recall = got / max(1, len(exact_pairs))
        if recall < min_recall:
            raise AssertionError(
                f"knn_edges IVF sampled recall@{k} = {recall:.3f} < "
                f"{min_recall} vs exact brute force "
                f"({len(sids)} sampled queries)")
    return edges
