"""Distributed connected components via min-label propagation.

The near-dup dedup operators (stages/dedup.py) produce a verified candidate
pair list; clustering those pairs is a connected-components problem. On a
100 TB boilerplate-heavy corpus the pair list can be far larger than driver
memory, so components are computed as **Ray Data rounds** — no
``to_pandas``/``take_all`` of the edge set ever happens:

  1. edges are exploded in both directions: (node, nbr),
  2. labels start as ``min(node, neighbors)`` (one groupby),
  3. each round, every node's label flows to its neighbors via a
     vectorized ``hash_join(edges, labels)`` (acero per-bucket join, no
     per-group Python) and each node adopts the minimum candidate,
  4. rounds stop when no label changed (labels decrease monotonically, so
     the changed-count — computed by joining old labels onto new — is an
     exact fixpoint test).

A pair set that provably fits on the driver (exact count ≤
``driver_threshold``) short-circuits to plain union-find: each
distributed round costs ~3 shuffles of fixed overhead, which dwarfs the
work below ~1M pairs.

Round count is the cluster diameter; near-dup clusters from LSH buckets
are dense (star/clique-like), so 2–4 rounds is typical. Shuffle budget per
round: 2 shuffles over (edges + labels) rows. The public hash-to-min
formulation (Rastogi et al. 2013) has the same structure.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _driver_union_find(pairs, left, right, node_col, label_col, id_type):
    """Small-graph fast path: classic union-find over a BOUNDED pair list
    (caller enforces the bound via an exact count first)."""
    import ray.data as rd

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for batch in pairs.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
        for a, b in zip(batch.column(left).to_pylist(),
                        batch.column(right).to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra

    nodes = sorted(parent)
    return rd.from_arrow(pa.table({
        node_col: pa.array(nodes, id_type),
        label_col: pa.array([find(x) for x in nodes], id_type)}))


def _concat(col_a, col_b):
    a = col_a.combine_chunks() if isinstance(col_a, pa.ChunkedArray) else col_a
    b = col_b.combine_chunks() if isinstance(col_b, pa.ChunkedArray) else col_b
    return pa.concat_arrays([a, b])


def connected_components(pairs, *, left: str = "left_id",
                         right: str = "right_id",
                         node_col: str = "doc_id",
                         label_col: str = "cluster_id",
                         max_rounds: int = 25,
                         driver_threshold: int = 1_000_000):
    """Pairs Dataset (left, right) → Dataset (node_col, label_col) where
    label = min node id of the connected component.

    Hybrid execution: a pair set that provably fits on the driver
    (count ≤ ``driver_threshold`` — checked AFTER counting, so the bound
    is enforced, never assumed) runs plain union-find locally; each
    distributed label-propagation round costs 2 shuffles + 2 executions,
    so at small pair counts the fixed overhead (~10 s) dwarfs the work.
    Above the threshold, min-label propagation runs as Ray Data rounds —
    nothing unbounded ever lands on the driver."""
    import ray.data as rd
    from ray.data.aggregate import Min

    # one materialization (blocks stay in the object store, never on the
    # driver): count + schema probe + edge build would otherwise each
    # re-execute the whole upstream pair-generation pipeline
    pairs = pairs.materialize()
    base = pairs.schema().base_schema
    if not hasattr(base, "field"):  # pandas-block upstream → arrow blocks
        # strip the 'pandas' metadata the conversion attaches (it makes
        # pa.Schema unhashable on pyarrow 16.1 — see sources/io.py)
        pairs = pairs.map_batches(
            lambda t: t.replace_schema_metadata(None),
            batch_format="pyarrow").materialize()
        base = pairs.schema().base_schema
    id_type = base.field(left).type
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(pa.table({
            node_col: pa.array([], id_type),
            label_col: pa.array([], id_type)}))
    if n_pairs <= driver_threshold:
        return _driver_union_find(pairs, left, right, node_col, label_col,
                                  id_type)

    def to_edges(batch: pa.Table) -> pa.Table:
        a, b = batch.column(left), batch.column(right)
        return pa.table({"node": _concat(a, b), "nbr": _concat(b, a)})

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow").materialize()

    def init_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("node").aggregate([("nbr", "min")])
        return pa.table({
            "node": g.column("node"),
            "label": pc.min_element_wise(g.column("nbr_min"),
                                         g.column("node")),
        })

    labels = edges.map_batches(
        init_partial, batch_format="pyarrow").groupby("node").aggregate(
        Min("label", alias_name="label")).materialize()

    from .join import hash_join

    def nbr_cands(batch: pa.Table) -> pa.Table:
        # each node's label becomes a candidate for every neighbor
        return pa.table({"node": batch.column("nbr"),
                         "cand": batch.column("label")})

    def self_cands(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "cand": batch.column("label")})

    def count_changed(batch: pa.Table) -> pa.Table:
        ne = pc.not_equal(batch.column("cand"), batch.column("label"))
        c = pc.sum(pc.cast(ne, pa.int64())).as_py() or 0
        return pa.table({"n_changed": pa.array([c], pa.int64())})

    for _ in range(max_rounds):
        # edges ⋈ labels on node (vectorized acero bucket join) — the
        # label of each node flows to its neighbors as a candidate
        msgs = hash_join(edges, labels, key="node",
                         left_cols=["nbr"], right_cols=["label"])
        cands = msgs.map_batches(nbr_cands, batch_format="pyarrow").union(
            labels.map_batches(self_cands, batch_format="pyarrow"))
        new_labels = cands.groupby("node").aggregate(
            Min("cand", alias_name="label")).materialize()
        # exact fixpoint test: join old labels (renamed 'cand' to avoid
        # the shared column name) onto new, count differences
        old_rn = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "cand": t.column("label")}),
            batch_format="pyarrow")
        joined = hash_join(new_labels, old_rn, key="node",
                           left_cols=["label"], right_cols=["cand"])
        changed = joined.map_batches(
            count_changed, batch_format="pyarrow").sum("n_changed")
        labels = new_labels
        if not changed:
            break

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch.column("node"),
                         label_col: batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")
