"""Embedding-space queries: ANN, selection, clustering, outliers, kNN-graph consumers.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _ANN_K, _ANN_NQ, _read_pq  # noqa: F401


def q_label_centroids(sf_dir: str):
    """Per-label embedding CENTROID sufficient statistics in exact integer
    micro-units: vectorized list flatten + positional index (no Python
    row loop), per-batch (label, dim) partial sums, one bounded shuffle
    (labels × dims rows). Values are scaled ×1e6 and rounded half-away
    (DuckDB round semantics) so the distributed sum is order-independent
    and hash-matches SQL."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            starts, lengths) + 1
        labels = np.repeat(batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64), lengths)
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        t = pa.table({
            "label": pa.array(labels, pa.int64()),
            "dim": pa.array(pos, pa.int64()),
            "sum_micro": pa.array(micro, pa.int64()),
        })
        g = t.group_by(["label", "dim"]).aggregate(
            [("sum_micro", "sum"), ("sum_micro", "count")])
        return pa.table({
            "label": g.column("label"),
            "dim": g.column("dim"),
            "sum_micro": g.column("sum_micro_sum"),
            "n_vals": pc.cast(g.column("sum_micro_count"), pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        ["label", "dim"]).aggregate(
        Sum("sum_micro", alias_name="sum_micro"),
        Sum("n_vals", alias_name="n_vals")).sort(["label", "dim"])

def q_embedding_norms(sf_dir: str):
    """Vector ops over the embedding column: per-vector squared L2 norm
    in exact integer micro²-units (values scaled ×1e6, half-away
    rounded — same convention as label_centroids, so the reduction is
    order-independent and SQL-matchable). Fully vectorized: list
    flatten + segment sums via parent run-lengths; no Python row loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def norms(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        sq = micro * micro
        ends = np.cumsum(lengths)
        sums = np.add.reduceat(sq, np.concatenate([[0], ends[:-1]])) \
            if len(sq) else np.zeros(0, np.int64)
        sums = np.where(lengths == 0, 0, sums)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "norm_sq_micro": pa.array(sums, pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
    ).map_batches(norms, batch_format="pyarrow").sort("vec_id")

def q_ann_topk(sf_dir: str):
    """Exact cosine top-k; dtype='float64' threads double precision through
    the whole partial-top-k path so ranks match DuckDB's double
    accumulation; ties broken on neighbor_id."""
    import ray.data as rd
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    return out[["query_id", "neighbor_id", "rank"]]

def q_ann_filtered(sf_dir: str):
    """FILTERED vector search (the standard metadata-constrained RAG
    query): exact cosine top-k restricted to label < 5, with the label
    predicate PUSHED TO THE SCAN — the ANN stage only ever sees the
    qualifying rows, so filter selectivity directly cuts compute."""
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding", "label"],
                  filter=(pc.field("label") < 5)).select_columns(
        ["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    return out[["query_id", "neighbor_id", "rank"]]

def q_sq8_topk(sf_dir: str):
    """INT8 scalar-quantized vector search (the SQ8 codec of
    FAISS/ScaNN): per-dim (min,max) grid → 0..255 codes → top-k by
    INT64 quantized inner product. Integer scores are exact in any
    summation order, so ranks are engine-independent — the SQL twin
    recomputes grid, codes and scores from scratch (no float near-tie
    risk; ties break on neighbor_id). Self-asserts recall@k ≥ 0.8 vs
    the exact float64 cosine top-k every run."""
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries, sq8_topk)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    out = sq8_topk(ds, queries, k=_ANN_K)
    exact = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64",
                             normalize=False)
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    hits = sum((q, n) in exact_pairs
               for q, n in zip(out["query_id"], out["neighbor_id"]))
    if hits / max(1, len(exact_pairs)) < 0.8:
        raise AssertionError(
            f"sq8 recall@{_ANN_K} = {hits / len(exact_pairs):.3f} < 0.8 "
            "vs exact float64 inner-product top-k")
    return out

def q_kcenter_sample(sf_dir: str):
    """DIVERSITY sampling: greedy farthest-point (Gonzalez) k-center
    seeds over the SQ8-quantized embeddings — 8 maximally-spread
    exemplars, the standard coreset/facility-location seed step for
    diverse data selection. Exact integer squared-L2 on the codes makes
    the greedy trajectory reproducible across engines; the SQL twin
    unrolls the same 8 argmax-of-min-distance rounds."""
    from magic_content_extractor_ray.stages.ann import kcenter_select

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    return kcenter_select(ds, k=8)

def _ann_recall_checked(approx, sf_dir: str, queries, *,
                        min_recall: float = 0.9):
    """Join an approximate-ANN result with the exact float64 brute-force
    top-k (the independently-SQL-oracled ann_topk algorithm) computed on
    the same input: adds ``in_exact_topk`` per row and RAISES if overall
    recall@k falls below ``min_recall`` — so every run of the approximate
    operators (driver correctness, bench, tests) self-asserts against
    independent ground truth instead of relying on the frozen snapshot
    alone. Driver-side work is bounded: nq × k rows per side."""
    import pandas as pd
    from magic_content_extractor_ray.stages.ann import brute_force_topk

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    out = approx.to_pandas() if hasattr(approx, "to_pandas") else approx
    out = out.copy()
    out["in_exact_topk"] = [
        int((q, n) in exact_pairs)
        for q, n in zip(out["query_id"], out["neighbor_id"])]
    recall = out["in_exact_topk"].sum() / max(1, len(exact_pairs))
    if recall < min_recall:
        raise AssertionError(
            f"approximate ANN recall@{_ANN_K} = {recall:.3f} < "
            f"{min_recall} vs exact brute-force top-k")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

def q_ann_ivf(sf_dir: str):
    """IVF ANN with an in-query recall assertion vs the exact float64
    brute-force top-k (see _ann_recall_checked)."""
    from magic_content_extractor_ray.stages.ann import ivf_topk, load_queries

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ivf_topk(ds, queries, k=_ANN_K, n_centroids=16, nprobe=6)
    return _ann_recall_checked(out, sf_dir, queries)

def q_ann_lsh(sf_dir: str):
    """LSH ANN with an in-query recall assertion vs the exact float64
    brute-force top-k (see _ann_recall_checked)."""
    from magic_content_extractor_ray.stages.ann import lsh_topk, load_queries

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # 24×4-bit tables, not 12×6: 6-bit sign patterns over these
    # embeddings bucket too finely for the true neighbors to collide
    # (measured recall@10 at sf0.01: 0.48 vs 0.98 here)
    out = lsh_topk(ds, queries, k=_ANN_K, n_tables=24, n_bits=4)
    return _ann_recall_checked(out, sf_dir, queries)

def q_embedding_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table (stages/cluster.py):
    fit 8 spherical centroids (mergeable partial sums — the shuffle never
    carries vectors), assign every vector, return per-cluster sizes.
    Not SQL-expressible (iterative algorithm) — rows-only check; the
    pytest blob-recovery + determinism tests pin correctness."""
    import ray.data as rd
    from ray.data.aggregate import Count
    from magic_content_extractor_ray.stages.cluster import (
        kmeans_fit, assign_clusters)

    # kmeans_fit streams the input once per iteration (+ init and the
    # final assignment): pin the projected columns in the object store
    # so those 6 passes don't re-decode the parquet list<float> column
    # each time (the semantic_dedup precedent; 32 s → ~8 s at sf0.1)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"]).materialize()
    centroids = kmeans_fit(ds, k=8, iters=4)
    return assign_clusters(ds, centroids).groupby("cluster").aggregate(
        Count(alias_name="n_vectors")).sort("cluster")

def q_centroid_assign(sf_dir: str):
    """Nearest-centroid classification (vector quantization / IVF-style
    assignment) with an EXACT SQL twin: per-label centroids from the
    label_centroids sufficient statistics (bounded labels×dims rows on
    the driver), quantized to integer micro-units with an explicit
    floor((2s+n)/2n) rule both sides reproduce bit-for-bit, broadcast
    once, then one vectorized int64 distance matmul-shape pass per batch.
    Ties break to the smallest label in both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    stats = q_label_centroids(sf_dir).take_all()  # bounded: labels × dims
    labels = sorted({r["label"] for r in stats})
    dims = max(r["dim"] for r in stats)
    lab_ix = {lab: i for i, lab in enumerate(labels)}
    cm = np.zeros((len(labels), dims), dtype=np.int64)
    for r in stats:
        s, n = int(r["sum_micro"]), int(r["n_vals"])
        cm[lab_ix[r["label"]], r["dim"] - 1] = int(
            np.floor((2.0 * s + n) / (2.0 * n)))
    cent_ref = ray.put(cm)
    labels_arr = np.array(labels, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        v = flat * 1e6
        xm = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
            np.int64).reshape(len(batch), -1)
        # (n, L) int64 distances — exact, order-independent
        d = ((xm[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d, axis=1)  # first minimum = smallest label
        return pa.table({
            "vec_id": pc.cast(batch.column("vec_id"), pa.int64()),
            "pred_label": pa.array(labels_arr[best], pa.int64()),
            "dist_sq": pa.array(d[np.arange(len(d)), best], pa.int64()),
        })

    return _read_pq(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"]
                    ).map_batches(assign, batch_format="pyarrow",
                                  batch_size=2048).sort("vec_id")

def q_embedding_covariance(sf_dir: str):
    """Full 64x64 covariance matrix of the embedding column (the input
    to whitening / PCA-style dimensionality audits), exact to the last
    bit: embeddings quantized to integer MICRO-units (round-half-away,
    matching SQL round()), per-batch integer sufficient stats
    (n, Σx 64-vector, ΣxxT Gram matrix via one int64 matmul), partials
    merged as arbitrary-precision Python ints on the driver (2 080
    cells × #batches rows — bounded by batch count, never by row
    count), cov = (n·Σxy − Σx·Σy)/n² single-rounded from the exact
    integer numerator exactly like CAST(... AS DOUBLE)/n²."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    DIM, SCALE = 64, 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "sxy": z, "sx": z,
                             "sy": z, "n": z})
        m = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * SCALE
        q = np.where(m >= 0, np.floor(m + 0.5),
                     np.ceil(m - 0.5)).astype(np.int64)
        gram = q.T @ q                     # 64x64 int64, exact
        sums = q.sum(axis=0)
        iu = np.triu_indices(DIM)
        return pa.table({
            "i": pa.array(iu[0].astype(np.int64), pa.int64()),
            "j": pa.array(iu[1].astype(np.int64), pa.int64()),
            "sxy": pa.array(gram[iu], pa.int64()),
            "sx": pa.array(sums[iu[0]], pa.int64()),
            "sy": pa.array(sums[iu[1]], pa.int64()),
            "n": pa.array(np.full(len(iu[0]), len(q), np.int64()),
                          pa.int64())})

    cells = _read_pq(f"{sf_dir}/embeddings.parquet",
                     columns=["embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096).take_all()

    acc: dict[tuple[int, int], list] = {}
    for r in cells:
        k = (int(r["i"]), int(r["j"]))
        a = acc.setdefault(k, [0, 0, 0, 0])   # python ints: exact bignum
        a[0] += int(r["sxy"])
        a[1] += int(r["sx"])
        a[2] += int(r["sy"])
        a[3] += int(r["n"])
    out = {"i": [], "j": [], "cov_micro2": []}
    for (i, j), (sxy, sx, sy, n) in sorted(acc.items()):
        num = n * sxy - sx * sy            # exact integer numerator
        # single rounding, mirroring CAST(num AS DOUBLE)/CAST(n*n ..)
        out["i"].append(i)
        out["j"].append(j)
        out["cov_micro2"].append(float(num) / float(n * n))
    return pd.DataFrame(out)

def q_embedding_dim_median(sf_dir: str):
    """Per-DIMENSION median of the embedding distribution (robust-scaler
    fit over a vector column): values micro-quantized half-away (DuckDB
    round), per-batch (dim, value) count partials, one bounded shuffle
    of histogram cells, and the exact lower weighted-median rule
    (min v with 2·cumweight ≥ total — the weighted_median precedent)
    inside a per-dim segment kernel. Raw vectors never shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            starts, lengths) + 1
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        g = pa.table({"dim": pa.array(pos, pa.int64()),
                      "v": pa.array(micro, pa.int64())}).group_by(
            ["dim", "v"]).aggregate([([], "count_all")])
        return pa.table({"dim": g.column("dim"), "v": g.column("v"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "dim", [("cnt", "sum", "cnt")], group_cols=["dim", "v"])

    def per_dim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cnt = g["cnt"].to_numpy(dtype="int64")
        v = g["v"].to_numpy(dtype="int64")
        cum = cnt.cumsum()
        tot = int(cum[-1])
        med = int(v[np.searchsorted(2 * cum, tot)])
        return pd.DataFrame({"dim": [int(g["dim"].iloc[0])],
                             "n": [tot], "median_micro": [med]})

    out = hist.groupby("dim").map_groups(
        per_dim, batch_format="pandas").to_pandas()
    return out.sort_values("dim").reset_index(drop=True)

def q_mutual_nn(sf_dir: str):
    """Mutual-nearest-neighbor pairs (the dataset-alignment / MNN
    dedup primitive): vectors a, b pair iff each is the other's
    cosine top-1 (self excluded, ties to the smaller vec_id). The
    corpus streams in batches against a BROADCAST normalized matrix
    (ray.put once, fetched per actor) — each vector's top-1 is
    decided in the one batch that carries it, so there is NO
    cross-batch merge; mutuality is then one hash_agg over packed
    pair keys (mutual ⟺ the unordered pair appears twice). Top-1
    comes from stages/ann.knn_edges: exact float64 broadcast at
    oracle scale (≤4096 rows — rank-level agreement with DuckDB's
    double list_cosine_similarity, the ann_topk convention) and the
    IVF-bucketed exchange above it, which ships each vector to only
    its nprobe probe lists (no corpus broadcast) and self-asserts
    sampled recall ≥ 0.9 vs exact brute force in the same run."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magic_content_extractor_ray.stages.ann import knn_edges
    from magic_content_extractor_ray.stages.window import hash_agg

    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    edges = knn_edges(
        _read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding"]),
        k=1, n_rows=n_rows)

    def to_pk(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        nbr = t.column("t").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(s, nbr), np.maximum(s, nbr)
        if len(lo) and (lo.min() < 0 or hi.max() >= (1 << 31)):
            raise ValueError("mutual_nn packs pairs into int64; "
                             "vec_ids must be in [0, 2^31)")
        return pa.table({
            "pk": pa.array((lo << np.int64(31)) | hi, pa.int64()),
            "c": pa.array(np.ones(len(lo), np.int64), pa.int64())})

    top1 = edges.map_batches(to_pk, batch_format="pyarrow")
    mutual = hash_agg(top1, "pk", [("c", "sum", "n")]).filter(
        lambda r: r["n"] == 2).to_pandas()
    pk = np.sort(mutual["pk"].to_numpy(dtype=np.int64))
    return pd.DataFrame({
        "vec_a": pd.Series(pk >> np.int64(31), dtype="int64"),
        "vec_b": pd.Series(pk & np.int64((1 << 31) - 1),
                           dtype="int64")})

def q_pca_power(sf_dir: str):
    """Top principal component of the embedding cloud by MATRIX-SQUARING
    power iteration, exact to the last bit: the distributed part is the
    same integer sufficient-stats pass as embedding_covariance
    (per-batch int64 Gram partials, merged as bignums on the driver —
    bounded by batch count, never rows); the 64×64 iteration runs
    driver-side in exact Python-int arithmetic (the legitimately small
    dim² side). Repeated squaring (10 rounds → effective power 2¹⁰)
    instead of plain matvecs because the synthetic cloud is near-
    isotropic (λ₂/λ₁ ≈ 0.93: plain power iteration needs ~500 steps;
    squaring gets (λ₂/λ₁)^1024 ≈ 4e-32 in 10). Every step is integer:
    the covariance numerator and each squared matrix renormalize to a
    ±10⁶ grid with round-half-away, and the final vector (M·1) is
    sign-canonicalized (first nonzero loading > 0) — so the
    unrolled-CTE SQL twin reproduces loadings bit-for-bit with no float
    summation order anywhere. Convergence is tested against numpy eigh
    (|cos| ≥ 0.999, tests/test_training_ops.py)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    DIM, SCALE, SQUARINGS = 64, 1_000_000, 10

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "sxy": z, "sx": z,
                             "sy": z, "n": z})
        m = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * SCALE
        q = np.where(m >= 0, np.floor(m + 0.5),
                     np.ceil(m - 0.5)).astype(np.int64)
        gram = q.T @ q
        sums = q.sum(axis=0)
        iu = np.triu_indices(DIM)
        return pa.table({
            "i": pa.array(iu[0].astype(np.int64), pa.int64()),
            "j": pa.array(iu[1].astype(np.int64), pa.int64()),
            "sxy": pa.array(gram[iu], pa.int64()),
            "sx": pa.array(sums[iu[0]], pa.int64()),
            "sy": pa.array(sums[iu[1]], pa.int64()),
            "n": pa.array(np.full(len(iu[0]), len(q), np.int64()),
                          pa.int64())})

    cells = _read_pq(f"{sf_dir}/embeddings.parquet",
                     columns=["embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096).take_all()

    acc: dict[tuple[int, int], list] = {}
    for r in cells:
        a = acc.setdefault((int(r["i"]), int(r["j"])), [0, 0, 0, 0])
        a[0] += int(r["sxy"])
        a[1] += int(r["sx"])
        a[2] += int(r["sy"])
        a[3] += int(r["n"])

    num = [[0] * DIM for _ in range(DIM)]
    for (i, j), (sxy, sx, sy, n) in acc.items():
        num[i][j] = num[j][i] = n * sxy - sx * sy   # exact bignum

    def rnd(x: int, den: int) -> int:
        """round-half-away(x·SCALE/den) in exact integers, den > 0."""
        ax = (2 * abs(x) * SCALE + den) // (2 * den)
        return ax if x >= 0 else -ax

    mx = max(abs(num[i][j]) for i in range(DIM) for j in range(DIM))
    if mx == 0:
        c = [[0] * DIM for _ in range(DIM)]
    else:
        c = [[rnd(num[i][j], mx) for j in range(DIM)]
             for i in range(DIM)]

    for _ in range(SQUARINGS):
        w = [[sum(c[i][k] * c[k][j] for k in range(DIM))
              for j in range(DIM)] for i in range(DIM)]
        m2 = max(abs(w[i][j]) for i in range(DIM) for j in range(DIM))
        if m2 == 0:
            c = w
            break
        c = [[rnd(w[i][j], m2) for j in range(DIM)] for i in range(DIM)]

    rowsum = [sum(c[i][j] for j in range(DIM)) for i in range(DIM)]
    m3 = max(abs(x) for x in rowsum)
    v = [0] * DIM if m3 == 0 else [rnd(x, m3) for x in rowsum]
    lead = next((x for x in v if x != 0), 0)
    if lead < 0:
        v = [-x for x in v]
    return pd.DataFrame({"i": list(range(DIM)),
                         "loading": v}).astype("int64")

def q_negative_samples(sf_dir: str):
    """DETERMINISTIC negative sampling for contrastive training pairs:
    for every distinct (user, item) purchase positive, draw 4 candidate
    negatives from the item catalog via md5(user:item:neg:r) mod |catalog|
    (the seeded-hash idiom — the SQL twin replays every draw), reject
    any candidate the user actually purchased (partitioned ANTI join on
    the packed (user, candidate) key — never a driver-side set), and
    keep the first 2 survivors by draw index. The catalog is
    dimension-sized, so it is broadcast once via ray.put and indexed
    inside map_batches (the fk_violations broadcast policy); positives
    are fact-scale and stay distributed throughout."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts)

    DRAWS, KEEP, MASK = 4, 2, np.int64((1 << 31) - 1)

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "user_id", "props"])

    def pairs_of(kinds):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("event_type"),
                                  value_set=pa.array(kinds)))
            col = t.column("props")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            it = pc.cast(pc.struct_field(
                pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
                pa.int64())
            u = pc.cast(t.column("user_id"), pa.int64())
            un = u.to_numpy(zero_copy_only=False)
            itn = it.to_numpy(zero_copy_only=False)
            if len(un) and (un.min() < 0 or un.max() >= (1 << 31)
                            or itn.min() < 0 or itn.max() >= (1 << 31)):
                raise ValueError("negative_samples packs (user, item) "
                                 "into one int64; ids must be in "
                                 "[0, 2^31)")
            out = pa.table({"pk": pa.array((un << np.int64(31)) | itn,
                                           pa.int64())})
            return out.group_by(["pk"]).aggregate([])  # map-side dedup

        return ev.map_batches(f, batch_format="pyarrow")

    def dedup_pk(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        if not len(pk):
            return pa.table({"pk": pa.array([], pa.int64())})
        keep = np.r_[True, pk[1:] != pk[:-1]]   # sorted by key
        return pa.table({"pk": pa.array(pk[keep], pa.int64())})

    pos = map_key_partitions(pairs_of(["purchase"]), "pk", dedup_pk)

    # item catalog: dimension-sized → distinct + driver sort + broadcast
    def items_only(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        it = np.unique(pk & MASK)
        return pa.table({"item": pa.array(it, pa.int64())})

    cat_rows = map_key_partitions(
        pairs_of(["view", "purchase"]).map_batches(
            items_only, batch_format="pyarrow"),
        "item", lambda t: dedup_pk(t.rename_columns(["pk"]))).take_all()
    catalog = np.sort(np.array([r["pk"] for r in cat_rows],
                               dtype=np.int64))
    cat_ref = ray.put(catalog)

    def draws(t: pa.Table) -> pa.Table:
        cat = ray.get(cat_ref)
        n = len(cat)
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("pk", "r", "neg", "apk")})
        if n == 0 or not len(t):
            return empty
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        u = pk >> np.int64(31)
        it = pk & MASK
        out_pk, out_r, out_neg = [], [], []
        for r in range(DRAWS):
            idx = np.array([int(hashlib.md5(
                f"{a}:{b}:neg:{r}".encode()).hexdigest()[:8], 16)
                for a, b in zip(u, it)], dtype=np.int64) % n
            out_pk.append(pk)
            out_r.append(np.full(len(pk), r, np.int64))
            out_neg.append(cat[idx])
        neg = np.concatenate(out_neg)
        uu = np.concatenate([u] * DRAWS)
        return pa.table({
            "pk": pa.array(np.concatenate(out_pk), pa.int64()),
            "r": pa.array(np.concatenate(out_r), pa.int64()),
            "neg": pa.array(neg, pa.int64()),
            "apk": pa.array((uu << np.int64(31)) | neg, pa.int64())})

    cand = pos.map_batches(draws, batch_format="pyarrow")

    anti = hash_join(
        cand, pos.map_batches(
            lambda t: t.rename_columns(["apk"]), batch_format="pyarrow"),
        key="apk", left_cols=["pk", "r", "neg"], right_cols=[],
        how="anti",
        left_types={"apk": pa.int64(), "pk": pa.int64(),
                    "r": pa.int64(), "neg": pa.int64()},
        right_types={"apk": pa.int64()})

    def keep2(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        if not len(pk):
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "pos_item": z,
                             "neg_rank": z, "neg_item": z})
        neg = t.column("neg").to_numpy(zero_copy_only=False)
        starts = segment_starts(pk)
        seg = np.cumsum(np.r_[True, pk[1:] != pk[:-1]]) - 1
        rank = np.arange(len(pk), dtype=np.int64) - starts[seg]
        sel = rank < KEEP
        return pa.table({
            "user_id": pa.array((pk >> np.int64(31))[sel], pa.int64()),
            "pos_item": pa.array((pk & MASK)[sel], pa.int64()),
            "neg_rank": pa.array(rank[sel], pa.int64()),
            "neg_item": pa.array(neg[sel], pa.int64())})

    out = map_key_partitions(anti, "pk", keep2, sort_cols=["r"])
    return out.sort(["user_id", "pos_item", "neg_rank"])

def q_label_propagation(sf_dir: str):
    """Semi-supervised LABEL PROPAGATION over the cosine 5-NN embedding
    graph (Zhu & Ghahramani 2002 shape): vectors with vec_id % 5 == 0
    are seeds and keep their true label; every other vector recomputes,
    for 3 synchronous rounds, the majority label among its 5 nearest
    neighbors' previous-round labels (ties → smaller label; no labeled
    neighbor → unlabeled −1). kNN edges come from stages/ann.knn_edges:
    EXACT broadcast top-5 at oracle scale (≤4096 rows, rank-level float
    agreement with DuckDB's list_cosine_similarity, oracle-pinned) and
    the IVF-BUCKETED exchange above it — no corpus broadcast, FLOPs cut
    to ~nprobe/n_centroids of brute force, self-asserting sampled
    recall ≥ 0.9 vs exact brute force in the same run. Each round is a
    distributed vote — edge map + count combiner + per-vector majority
    exchange — with only the n-sized label vector crossing to the
    driver per round (the pagerank broadcast-mode policy; beyond
    ~millions of vectors switch the state to a Dataset and the update
    to a keyed join)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.ann import knn_edges
    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts)

    K, ROUNDS = 5, 3

    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    edges = knn_edges(emb, k=K, n_rows=n_rows).materialize()

    lab_t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"]).sort_by("vec_id")
    all_ids = lab_t.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    true_lab = lab_t.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    seed = (all_ids % 5) == 0
    labels = np.where(seed, true_lab, -1).astype(np.int64)

    for _r in range(ROUNDS):
        st_ref = ray.put(labels)

        def votes(t: pa.Table, _s=st_ref) -> pa.Table:
            lab = ray.get(_s)
            s = t.column("s").to_numpy(zero_copy_only=False)
            nt = t.column("t").to_numpy(zero_copy_only=False)
            tl = lab[np.searchsorted(all_ids, nt)]
            m = tl >= 0
            s, tl = s[m], tl[m]
            if not len(s):
                z = pa.array([], pa.int64())
                return pa.table({"s": z, "lbl": z, "c": z})
            pk = (s << np.int64(8)) | tl          # labels < 2^8
            u, cnt = np.unique(pk, return_counts=True)
            return pa.table({
                "s": pa.array(u >> np.int64(8), pa.int64()),
                "lbl": pa.array(u & np.int64(255), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64())})

        counted = hash_agg(
            edges.map_batches(votes, batch_format="pyarrow"),
            "s", [("c", "sum", "c")], group_cols=["s", "lbl"])

        def majority(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            if not len(s):
                z = pa.array([], pa.int64())
                return pa.table({"s": z, "lbl": z})
            lbl = t.column("lbl").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            order = np.lexsort((lbl, -c, s))
            s, lbl = s[order], lbl[order]
            first = segment_starts(s)
            return pa.table({"s": pa.array(s[first], pa.int64()),
                             "lbl": pa.array(lbl[first], pa.int64())})

        win = map_key_partitions(counted, "s", majority).take_all()
        new = np.full(len(all_ids), -1, np.int64)
        for r in win:
            new[np.searchsorted(all_ids, int(r["s"]))] = int(r["lbl"])
        labels = np.where(seed, true_lab, new)

    return pd.DataFrame({
        "vec_id": pd.Series(all_ids, dtype="int64"),
        "pred_label": pd.Series(labels, dtype="int64"),
        "is_seed": pd.Series(seed.astype(np.int64), dtype="int64")})

def q_hard_negatives(sf_dir: str):
    """HARD-NEGATIVE mining for contrastive/metric learning: for every
    vector, the 2 most cosine-similar vectors with a DIFFERENT label —
    the pairs that matter for triplet-loss training, as opposed to
    q_negative_samples' random negatives. Same broadcast-matrix batch
    pass as mutual_nn (each vector's candidates decided in its own
    batch, rank-level float agreement with DuckDB's
    list_cosine_similarity); labels ride the broadcast so the
    different-label mask is applied BEFORE the top-k, not after (a
    post-filter could starve a vector surrounded by same-label
    neighbors)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.ann import (
        _batch_matrix, _normalize)

    K = 2

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"]
                         ).sort_by("vec_id")
    all_ids = full.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    all_lab = full.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_batch_matrix(full, "embedding", np.float64))
    ref = ray.put({"ids": all_ids, "labels": all_lab, "matrix": qmat})

    class Hard:
        def __init__(self):
            q = ray.get(ref)
            self.ids, self.labels, self.mat = (q["ids"], q["labels"],
                                               q["matrix"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            blab = batch.column("label").to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(batch, "embedding",
                                         np.float64))
            sims = m @ self.mat.T
            same = blab[:, None] == self.labels[None, :]
            sims[same] = -np.inf                # mask before top-k
            top = np.argsort(-sims, axis=1, kind="stable")[:, :K]
            return pa.table({
                "vec_id": pa.array(np.repeat(bids, K), pa.int64()),
                "neg_rank": pa.array(np.tile(np.arange(K, dtype=np.int64),
                                             len(bids)), pa.int64()),
                "neg_id": pa.array(self.ids[top.ravel()], pa.int64())})

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding", "label"])
    return emb.map_batches(Hard, batch_format="pyarrow",
                           batch_size=1024,
                           concurrency=(1, 8)).sort(["vec_id", "neg_rank"])

def q_hbos_outliers(sf_dir: str):
    """HBOS anomaly scoring over the embedding cloud (Goldstein &
    Dengel 2012 — the histogram-based outlier detector production
    pipelines run because it's one pass and embarrassingly parallel):
    per dimension, 10 equal-width bins between the corpus min/max;
    score(v) = Σ_d ln(N / count[d, bin_d(v)]), computed as per-(d,bin)
    nano-nat integer TERMS (one ln per cell, rounded before any sum —
    the nano-nat idiom, so the SQL twin sums the identical integers).
    Bin assignment is pure IEEE double arithmetic in the same operation
    order both sides. Three streaming passes (min/max partials → 640
    bin-count cells → scores + per-batch top-k); driver state is the
    64-row min/max table and the 640-cell histogram, never rows.
    Top-20 by (score desc, vec_id asc)."""
    import numpy as np
    import pyarrow as pa

    import ray

    DIM, BINS, K = 64, 10, 20

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])

    def mat_of(batch: pa.Table) -> np.ndarray:
        return np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)

    def minmax(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z64 = pa.array([], pa.int64())
            zf = pa.array([], pa.float64())
            return pa.table({"d": z64, "mn": zf, "mx": zf, "n": z64})
        m = mat_of(batch)
        return pa.table({
            "d": pa.array(np.arange(DIM, dtype=np.int64), pa.int64()),
            "mn": pa.array(m.min(axis=0), pa.float64()),
            "mx": pa.array(m.max(axis=0), pa.float64()),
            "n": pa.array(np.full(DIM, len(m), np.int64), pa.int64())})

    parts = emb.map_batches(minmax, batch_format="pyarrow").take_all()
    mn = np.full(DIM, np.inf)
    mx = np.full(DIM, -np.inf)
    n_total = 0
    seen = set()
    for r in parts:
        d = int(r["d"])
        mn[d] = min(mn[d], float(r["mn"]))
        mx[d] = max(mx[d], float(r["mx"]))
        # n repeats per dim; count each batch once (dim 0 rows)
        if d == 0:
            n_total += int(r["n"])

    def bins_of(m: np.ndarray) -> np.ndarray:
        span = mx - mn
        with np.errstate(divide="ignore", invalid="ignore"):
            b = np.floor((m - mn[None, :]) * float(BINS) / span[None, :])
        b = np.where(span[None, :] == 0, 0, b)
        return np.minimum(BINS - 1, b).astype(np.int64)

    mm_ref = ray.put({"mn": mn, "mx": mx})

    def cells(batch: pa.Table, _r=mm_ref) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"cell": z, "c": z})
        m = mat_of(batch)
        b = bins_of(m)
        flat = (np.arange(DIM, dtype=np.int64)[None, :] * BINS +
                b).ravel()
        c = np.bincount(flat, minlength=DIM * BINS).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(DIM * BINS, dtype=np.int64),
                             pa.int64()),
            "c": pa.array(c, pa.int64())})

    counts = np.zeros(DIM * BINS, np.int64)
    for r in emb.map_batches(cells, batch_format="pyarrow").take_all():
        counts[int(r["cell"])] += int(r["c"])

    term = np.zeros(DIM * BINS, np.int64)
    nz = counts > 0
    term[nz] = np.floor(
        np.log(float(n_total) / counts[nz].astype(np.float64)) * 1e9
        + 0.5).astype(np.int64)
    term_ref = ray.put(term)

    def score(batch: pa.Table, _t=term_ref) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "hbos_nano": z})
        tm = ray.get(_t)
        m = mat_of(batch)
        b = bins_of(m)
        flat = np.arange(DIM, dtype=np.int64)[None, :] * BINS + b
        sc = tm[flat].sum(axis=1)
        ids = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -sc))[:K]     # per-batch top-k pruning
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "hbos_nano": pa.array(sc[order], pa.int64())})

    return emb.map_batches(score, batch_format="pyarrow").sort(
        ["hbos_nano", "vec_id"], descending=[True, False]).limit(K)

def q_mmr_select(sf_dir: str):
    """MMR diverse re-ranking over SQ8 codes (λ = 1/2): query = lowest
    vec_id; greedy relevance-minus-redundancy picks on the exact
    integer squared-L2 scale (stages/ann.mmr_select — kcenter_select's
    execution shape with a marginal-relevance objective)."""
    from magic_content_extractor_ray.stages.ann import mmr_select

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    return mmr_select(emb, k=8)

def q_coverage_select(sf_dir: str):
    """GREEDY MAX-COVERAGE document selection (the classic (1−1/e) set
    cover greedy — the coverage-based data-selection recipe for
    instruction/eval set construction): pick 10 docs that together
    cover as much of the top-500 corpus vocabulary as possible. Each
    round broadcasts the uncovered-term bitmap (500 bools) and runs a
    distributed per-partition argmax of |terms(doc) ∩ uncovered|
    (ties doc_id asc; the winning partition row carries the doc's term
    ids so the driver can update the bitmap without a second pass).
    The (doc, term-id) pair table is built once — vocab-membership
    tokenize map, doc-keyed partitions materialized so each partition
    holds complete docs. Unrolled-CTE SQL twin, 10 rounds."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    V, K = 500, 10

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def term_df(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        g = pa.table({"term": flat.filter(keep),
                      "row": parent.filter(keep)}).group_by(
            ["term", "row"]).aggregate([])
        return pa.table({
            "term": g.column("term"),
            "df": pa.array(np.ones(len(g), np.int64), pa.int64())})

    dfs = hash_agg(docs.map_batches(term_df, batch_format="pyarrow"),
                   "term", [("df", "sum", "df")])

    def topv(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=V, sort_keys=[("df", "descending"),
                               ("term", "ascending")])
        return t.take(idx)

    cand = dfs.map_batches(topv, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["df", "term"],
                            ascending=[False, True]).head(V)
    vocab = np.sort(cand["term"].to_numpy().astype(object))
    vref = ray.put(vocab)

    def doc_tids(t: pa.Table, _v=vref) -> pa.Table:
        vv = ray.get(_v)
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        words = flat.to_numpy(zero_copy_only=False).astype(object)
        pidx = np.searchsorted(vv, words)
        pidx[pidx >= len(vv)] = 0
        hit = vv[pidx] == words
        ids = pc.cast(t.column("doc_id").take(parent.filter(
            pa.array(hit))), pa.int64()).to_numpy(zero_copy_only=False)
        tid = pidx[hit]
        pk = ids * np.int64(V) + tid
        u = np.unique(pk)
        return pa.table({
            "doc_id": pa.array(u // V, pa.int64()),
            "tid": pa.array(u % V, pa.int64())})

    pairs = map_key_partitions(
        docs.map_batches(doc_tids, batch_format="pyarrow"),
        "doc_id", lambda t: t).materialize()

    uncovered = np.ones(len(vocab), dtype=bool)
    out = {"round": [], "doc_id": [], "n_new": [], "n_total": []}
    chosen: set[int] = set()
    for rnd in range(1, K + 1):
        st = ray.put({"u": uncovered.copy(),
                      "excl": np.array(sorted(chosen), np.int64)})

        def best(t: pa.Table, _s=st) -> pa.Table:
            s = ray.get(_s)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64()),
                              "tids": pa.array([],
                                               pa.list_(pa.int64()))})
            if not len(d):
                return empty
            tid = t.column("tid").to_numpy(zero_copy_only=False)
            unc = s["u"][tid].astype(np.int64)
            starts = segment_starts(d)
            lens = segment_lengths(starts, len(d))
            cnt = np.add.reduceat(unc, starts)
            dd = d[starts]
            ok = ~np.isin(dd, s["excl"])
            if not ok.any():
                return empty
            cnt2 = np.where(ok, cnt, -1)
            top = np.flatnonzero(cnt2 == cnt2.max())
            j = int(top[np.argmin(dd[top])])
            lo, ln = int(starts[j]), int(lens[j])
            new_t = tid[lo:lo + ln][s["u"][tid[lo:lo + ln]]]
            return pa.table({
                "doc_id": pa.array([int(dd[j])], pa.int64()),
                "n": pa.array([int(cnt[j])], pa.int64()),
                "tids": pa.array([new_t.tolist()],
                                 pa.list_(pa.int64()))})

        cands = pairs.map_batches(best,
                                  batch_format="pyarrow").take_all()
        if not cands:
            break
        nxt = max(cands, key=lambda r: (r["n"], -r["doc_id"]))
        if int(nxt["n"]) == 0:
            break
        chosen.add(int(nxt["doc_id"]))
        for tdd in nxt["tids"]:
            uncovered[int(tdd)] = False
        out["round"].append(rnd)
        out["doc_id"].append(int(nxt["doc_id"]))
        out["n_new"].append(int(nxt["n"]))
        out["n_total"].append(int((~uncovered).sum()))
    return pd.DataFrame(out).astype("int64")

def q_shapley_coverage(sf_dir: str):
    """EXACT SHAPLEY VALUES of the five languages in the vocabulary-
    coverage game (the data-valuation question "which slice contributes
    the most unique coverage?"): v(S) = number of distinct terms that
    appear in at least one language of S. The distributed part reduces
    every term to a 5-bit language bitmask (one term-keyed exchange;
    segment-wise OR), leaving a 31-cell mask histogram — the whole
    game — on the driver, where Shapley is computed EXACTLY over all
    2⁵ coalitions with integer factorial weights (φ scaled by 5! = 120,
    no floats). Efficiency (Σφ = 120·v(N)) is asserted in pytest.
    Output: (lang, phi_num, phi_den=120, v_solo, v_all)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["lang", "text"])
    lang_rows = docs.groupby("lang").count().take_all()
    langs = sorted(r["lang"] for r in lang_rows)
    n = len(langs)
    lidx = {s: i for i, s in enumerate(langs)}

    def term_lang(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        lg = t.column("lang").take(parent).to_numpy(
            zero_copy_only=False)
        bits = np.array([1 << lidx[x] for x in lg], dtype=np.int64)
        tt = pa.table({"term": flat, "b": pa.array(bits, pa.int64())})
        # map-side OR-combine per term (numpy: arrow has no bit_or agg)
        terms = tt.column("term").to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        terms, bb = terms[order], bits[order]
        starts = segment_starts(terms)
        lens = segment_lengths(starts, len(terms))
        om = np.zeros(len(starts), np.int64)
        for k in range(n):
            has = np.add.reduceat((bb >> k) & 1, starts) > 0
            om |= has.astype(np.int64) << k
        return pa.table({"term": pa.array(terms[starts]),
                         "b": pa.array(om, pa.int64())})

    def mask_of(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_numpy(zero_copy_only=False)
        if not len(terms):
            return pa.table({"mask": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        b = t.column("b").to_numpy(zero_copy_only=False)
        starts = segment_starts(terms)
        lens = segment_lengths(starts, len(terms))
        om = np.zeros(len(starts), np.int64)
        for k in range(n):
            has = np.add.reduceat((b >> k) & 1, starts) > 0
            om |= has.astype(np.int64) << k
        u, cnt = np.unique(om, return_counts=True)
        return pa.table({"mask": pa.array(u, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    cells = map_key_partitions(
        docs.map_batches(term_lang, batch_format="pyarrow"),
        "term", mask_of).take_all()
    cnt = np.zeros(1 << n, np.int64)
    for r in cells:
        cnt[int(r["mask"])] += int(r["c"])

    masks = np.arange(1 << n)

    def v(S: int) -> int:
        return int(cnt[(masks & S) != 0].sum())

    import math

    fact = [math.factorial(k) for k in range(n + 1)]
    rows = []
    v_all = v((1 << n) - 1)
    for i, lg in enumerate(langs):
        phi = 0
        for S in range(1 << n):
            if S & (1 << i):
                continue
            s = bin(S).count("1")
            phi += fact[s] * fact[n - 1 - s] * (v(S | (1 << i)) - v(S))
        rows.append({"lang": lg, "phi_num": phi, "phi_den": fact[n],
                     "v_solo": v(1 << i), "v_all": v_all})
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in ("phi_num", "phi_den", "v_solo",
                              "v_all")}).sort_values("lang").reset_index(
        drop=True)
