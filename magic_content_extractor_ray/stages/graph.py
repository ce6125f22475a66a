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

Each round is a neighbor-propagation step FOLLOWED by a pointer-jumping
step (every node adopts its label's label — path lengths square), so
convergence is O(log diameter) rounds, not O(diameter): a 1000-link chain
of near-dup docs converges in ~10 rounds. If ``max_rounds`` is exhausted
while labels are still changing, the function RAISES rather than silently
returning split components. Shuffle budget per round: 2 joins + 2 groupbys
over (edges + labels) rows. The public hash-to-min formulation (Rastogi
et al. 2013) plus pointer jumping (Shiloach–Vishkin style) has the same
structure.
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

    from .window import hash_agg

    # hash_agg, not groupby().aggregate(Min): one group per NODE is
    # row-scale cardinality, where the sort-aggregate's per-group Python
    # callback dominates (see window.hash_agg)
    labels = hash_agg(
        edges.map_batches(init_partial, batch_format="pyarrow"),
        "node", [("label", "min", "label")]).materialize()
    # the label set is re-shuffled every round; without re-coalescing, the
    # per-round groupby/map_groups/union multiply the BLOCK count and the
    # shuffle's per-block metadata cost grows quadratically round over
    # round. Bound labels to ~500k rows per block (≥8 blocks), scaled to
    # the actual node count — one cheap split/coalesce pass per round.
    n_nodes = labels.count()
    nb = max(8, min(4096, n_nodes // 500_000 + 8))
    labels = labels.repartition(nb).materialize()

    from .join import hash_join

    def nbr_cands(batch: pa.Table) -> pa.Table:
        # each node's label becomes a candidate for every neighbor; no
        # 'old' on neighbor rows (null — ignored by the Min aggregate)
        n = len(batch)
        return pa.table({"node": batch.column("nbr"),
                         "cand": batch.column("label"),
                         "old": pa.nulls(n, id_type)})

    def self_cands(batch: pa.Table) -> pa.Table:
        # self rows carry the node's previous label twice: once as a
        # candidate, once as 'old' so the change count falls out of the
        # SAME groupby — no extra fixpoint join
        return pa.table({"node": batch.column("node"),
                         "cand": batch.column("label"),
                         "old": batch.column("label")})

    def count_ne(batch: pa.Table, a: str, b: str) -> pa.Table:
        ne = pc.not_equal(batch.column(a), batch.column(b))
        c = pc.sum(pc.cast(ne, pa.int64())).as_py() or 0
        return pa.table({"n_changed": pa.array([c], pa.int64())})

    def jump_table(batch: pa.Table) -> pa.Table:
        # lookup side for pointer jumping: label value → its own label
        return pa.table({"label": batch.column("node"),
                         "label2": batch.column("label")})

    import functools

    converged = False
    for _ in range(max_rounds):
        # (a) neighbor propagation: edges ⋈ labels on node (vectorized
        # acero bucket join) — each node's label flows to its neighbors
        msgs = hash_join(edges, labels, key="node",
                         left_cols=["nbr"], right_cols=["label"])
        cands = msgs.map_batches(
            nbr_cands, batch_format="pyarrow", batch_size=65536).union(
            labels.map_batches(self_cands, batch_format="pyarrow",
                               batch_size=65536))
        # per-round min-label reduce via hash_agg (node-scale groups;
        # Arrow's C++ min ignores the null 'old' on neighbor rows just
        # like Ray's Min would)
        stepped = hash_agg(
            cands, "node", [("cand", "min", "label"),
                            ("old", "min", "old")]
        ).repartition(nb).materialize()
        changed_a = stepped.map_batches(
            functools.partial(count_ne, a="label", b="old"),
            batch_format="pyarrow").sum("n_changed")
        # (b) pointer jumping: node adopts label[label[node]] (every label
        # value is itself a node with a label row, and label[x] ≤ x, so
        # the inner join is total and label2 ≤ label — path lengths
        # square each round → O(log diameter) convergence). The (b)
        # change count compares label vs label2 inside the same pass.
        lookup = stepped.map_batches(jump_table, batch_format="pyarrow")
        jumped = hash_join(stepped, lookup, key="label",
                           left_cols=["node"], right_cols=["label2"],
                           right_types={"label2": id_type}
                           ).repartition(nb).materialize()
        changed_b = jumped.map_batches(
            functools.partial(count_ne, a="label", b="label2"),
            batch_format="pyarrow").sum("n_changed")
        labels = jumped.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("label2")}),
            batch_format="pyarrow")
        if not changed_a and not changed_b:
            converged = True
            break
    if not converged:
        # silent exit would return split components (wrong cluster_ids);
        # with pointer jumping max_rounds=25 covers diameter ~2^25, so
        # hitting this indicates a bug, not a big graph
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds; labels were still changing")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch.column("node"),
                         label_col: batch.column("label")})

    return labels.map_batches(rename, batch_format="pyarrow")
