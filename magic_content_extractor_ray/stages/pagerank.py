"""Distributed PageRank over an edge-list Dataset.

The web-scale ranking primitive the reference's domain (web content) sits
on top of: given directed weighted edges, iterate

    r'[v] = (1-d)/|V| + d * sum_{(u,v) in E} r[u] * w(u,v) / out_w(u)

(the "simple" PageRank without dangling-mass redistribution — documented
so the SQL oracle states the identical recurrence).

Two execution modes, chosen by the rank-vector size:

- ``mode="broadcast"`` (default, for |V| up to ~millions): the rank
  vector lives on the driver and is broadcast once per iteration with
  ``ray.put``; the edge list — the big side, materialized ONCE with
  pre-resolved int32 node indices — streams through ``map_batches``
  tasks that emit per-batch PARTIAL per-destination sums (np.bincount
  over compacted ids), combined by one small ``groupby(dst).sum``
  shuffle per iteration. Per-iteration driver traffic is O(|V|), edge
  traffic is zero (edges stay in the object store).

- ``mode="join"`` (|V| beyond driver memory): ranks stay a Dataset;
  each iteration is hash_join(edges, ranks on src) → per-batch partial
  dst sums → groupby(dst).sum → left join back onto the node list.
  ~2 shuffles per iteration, nothing driver-sized anywhere. Each
  iteration is ``materialize()``d — iterative lineage would otherwise
  re-execute every prior round per consumer (round-2 NOTES gotcha).

Both modes share the same edge aggregation (multi-edges collapse to
(src, dst, w) with w = multiplicity or summed weight) and produce
bit-identical rank vectors (tested against each other and against a
dense numpy reference).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _agg_edges(edges, src: str, dst: str, weight):
    """Collapse multi-edges: per-batch combine → one (src,dst) groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        w = (pc.cast(batch.column(weight), pa.float64()) if weight
             else pa.array(np.ones(len(batch), np.float64)))
        t = pa.table({"src": batch.column(src), "dst": batch.column(dst),
                      "w": w})
        g = t.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return g.rename_columns(["src", "dst", "w"])

    # hash_agg: one group per distinct edge is edge-scale cardinality
    # (see window.hash_agg); composite (src,dst) hash-partitions on src
    from .window import hash_agg

    return hash_agg(edges.map_batches(partial, batch_format="pyarrow"),
                    "src", [("w", "sum", "w")], group_cols=["src", "dst"])


def pagerank(edges, *, src: str = "src", dst: str = "dst", weight=None,
             damping: float = 0.85, n_iter: int = 10,
             mode: str = "broadcast", max_broadcast_nodes: int = 4_000_000,
             max_driver_edges: int = 2_000_000, num_buckets: int = 64):
    """PageRank over an edges Dataset → ``pa.Table(node, rank)`` sorted
    by node (broadcast mode) or a Dataset with the same columns (join
    mode). ``weight``: optional edge-weight column (default: each row
    counts 1; parallel edges sum).

    ``max_driver_edges``: in broadcast mode, if the AGGREGATED edge list
    is smaller than this (checked by an exact count, like graph.py's
    union-find bound), the power iteration runs driver-local over numpy
    arrays — each distributed round otherwise costs ~2 s of fixed
    execution overhead regardless of data size, which at 10 iterations
    dwarfs any graph that fits in one machine's memory. Above the bound
    the edge list stays in the object store and streams every round."""
    if mode == "broadcast":
        return _pagerank_broadcast(edges, src, dst, weight, damping,
                                   n_iter, max_broadcast_nodes,
                                   max_driver_edges)
    if mode == "join":
        return _pagerank_join(edges, src, dst, weight, damping, n_iter,
                              num_buckets)
    raise ValueError(f"unknown pagerank mode {mode!r}")


def _pagerank_local(eagg, nodes, damping, n_iter):
    """Counted-bound driver fast path: sparse power iteration with
    bincount — identical recurrence and term order as the streaming
    path ((r/ow)·w), so results agree to FP noise."""
    nv = len(nodes)
    parts = [(b.column("src").to_numpy(zero_copy_only=False),
              b.column("dst").to_numpy(zero_copy_only=False),
              b.column("w").to_numpy(zero_copy_only=False))
             for b in eagg.iter_batches(batch_format="pyarrow")]
    si = np.concatenate([np.searchsorted(nodes, s) for s, _, _ in parts]
                        or [np.zeros(0, np.int64)])
    di = np.concatenate([np.searchsorted(nodes, d) for _, d, _ in parts]
                        or [np.zeros(0, np.int64)])
    w = np.concatenate([x for _, _, x in parts]
                       or [np.zeros(0, np.float64)])
    outw = np.bincount(si, weights=w, minlength=nv)
    ranks = np.full(nv, 1.0 / nv, np.float64)
    base = (1.0 - damping) / nv
    for _ in range(n_iter):
        scaled = np.divide(ranks, outw, out=np.zeros(nv, np.float64),
                           where=outw > 0)
        ranks = base + damping * np.bincount(
            di, weights=scaled[si] * w, minlength=nv)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(ranks, pa.float64())})


def _pagerank_broadcast(edges, src, dst, weight, damping, n_iter,
                        max_broadcast_nodes, max_driver_edges):
    import ray
    from ray.data.aggregate import Sum

    eagg = _agg_edges(edges, src, dst, weight).materialize()

    # node id universe (distinct src ∪ dst) — driver-held, bounded
    ids = set()
    for batch in eagg.iter_batches(batch_format="pyarrow"):
        ids.update(batch.column("src").to_pylist())
        ids.update(batch.column("dst").to_pylist())
        if len(ids) > max_broadcast_nodes:
            raise ValueError(
                f"more than {max_broadcast_nodes} nodes — use mode='join'")
    nodes = np.array(sorted(ids), dtype=np.int64)
    nv = len(nodes)

    if eagg.count() <= max_driver_edges:
        return _pagerank_local(eagg, nodes, damping, n_iter)

    nodes_ref = ray.put(nodes)

    # resolve edge endpoints to dense node indices ONCE; edges then stay
    # materialized in the object store for every iteration
    def index_edges(batch: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        s = np.searchsorted(nd, batch.column("src").to_numpy(
            zero_copy_only=False))
        d = np.searchsorted(nd, batch.column("dst").to_numpy(
            zero_copy_only=False))
        return pa.table({
            "si": pa.array(s.astype(np.int32)),
            "di": pa.array(d.astype(np.int32)),
            "w": batch.column("w")})

    eidx = eagg.map_batches(index_edges,
                            batch_format="pyarrow").materialize()

    # out-weight per source (|V|-sized, driver-held like the rank vector)
    outw = np.zeros(nv, np.float64)
    from .window import hash_agg

    ow = hash_agg(eidx, "si", [("w", "sum", "ow")])
    for batch in ow.iter_batches(batch_format="pyarrow"):
        outw[batch.column("si").to_numpy(zero_copy_only=False)] = \
            batch.column("ow").to_numpy(zero_copy_only=False)

    ranks = np.full(nv, 1.0 / nv, np.float64)
    base = (1.0 - damping) / nv
    for _ in range(n_iter):
        # broadcast r/out once; each edge batch emits partial dst sums
        # over only the dst ids it actually touches
        scaled_ref = ray.put(
            np.divide(ranks, outw, out=np.zeros(nv, np.float64),
                      where=outw > 0))

        def contrib(batch: pa.Table, *, ref=scaled_ref) -> pa.Table:
            sc = ray.get(ref)
            si = batch.column("si").to_numpy(zero_copy_only=False)
            di = batch.column("di").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            c = sc[si] * w
            uniq, inv = np.unique(di, return_inverse=True)
            sums = np.bincount(inv, weights=c, minlength=len(uniq))
            return pa.table({"di": pa.array(uniq),
                             "s": pa.array(sums, pa.float64())})

        ranks = np.full(nv, base, np.float64)
        agg = hash_agg(eidx.map_batches(contrib, batch_format="pyarrow"),
                       "di", [("s", "sum", "s")])
        for batch in agg.iter_batches(batch_format="pyarrow"):
            di = batch.column("di").to_numpy(zero_copy_only=False)
            ranks[di] += damping * batch.column("s").to_numpy(
                zero_copy_only=False)

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank": pa.array(ranks, pa.float64())})


def _pagerank_join(edges, src, dst, weight, damping, n_iter, num_buckets):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import hash_join

    eagg = _agg_edges(edges, src, dst, weight).materialize()

    from .window import hash_agg

    nodes = hash_agg(
        eagg.select_columns(["src"]).rename_columns({"src": "node"}).union(
            eagg.select_columns(["dst"]).rename_columns({"dst": "node"})),
        "node", [("node", "count_all", "_x")]).drop_columns(
        ["_x"]).materialize()
    nv = nodes.count()

    # fold out-weight onto each edge once: (src, dst, w, ow)
    ow = hash_agg(eagg, "src", [("w", "sum", "ow")])
    ewo = hash_join(eagg, ow, key="src", left_cols=["dst", "w"],
                    right_cols=["ow"], num_buckets=num_buckets,
                    right_types={"ow": pa.float64()}).materialize()

    base = (1.0 - damping) / nv
    ranks = nodes.map_batches(
        lambda t, nv=nv: t.append_column(
            "rank", pa.array(np.full(len(t), 1.0 / nv, np.float64))),
        batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        withr = hash_join(
            ewo.rename_columns({"src": "node"}), ranks,
            key="node", left_cols=["dst", "w", "ow"],
            right_cols=["rank"], num_buckets=num_buckets)

        def partial(batch: pa.Table) -> pa.Table:
            c = (batch.column("rank").to_numpy(zero_copy_only=False)
                 * batch.column("w").to_numpy(zero_copy_only=False)
                 / batch.column("ow").to_numpy(zero_copy_only=False))
            t = pa.table({"node": batch.column("dst"),
                          "s": pa.array(c, pa.float64())})
            g = t.group_by("node").aggregate([("s", "sum")])
            return g.rename_columns(["node", "s"])

        sums = hash_agg(withr.map_batches(partial, batch_format="pyarrow"),
                        "node", [("s", "sum", "s")])
        # hash_join payloads ride in per-side structs, which can't be
        # empty — give the node list a constant payload and drop it
        nodes_p = nodes.map_batches(
            lambda t: t.append_column(
                "_one", pa.array(np.ones(len(t), np.int8))),
            batch_format="pyarrow")
        joined = hash_join(nodes_p, sums, key="node", left_cols=["_one"],
                           right_cols=["s"], how="left",
                           num_buckets=num_buckets,
                           right_types={"s": pa.float64()})
        ranks = joined.map_batches(
            lambda t, base=base, damping=damping: pa.table({
                "node": t.column("node"),
                "rank": pa.array(
                    base + damping * np.nan_to_num(
                        t.column("s").to_numpy(zero_copy_only=False)
                        .astype(np.float64), nan=0.0), pa.float64())}),
            batch_format="pyarrow").materialize()

    return ranks
