"""Graph queries over the co-view item graph.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _batch_topk, _read_pq, _tag_set_overlap  # noqa: F401


# Per-user degree cap for the pair-expansion mining queries (covisitation,
# item_triangles). The per-user unordered-pair expansion is O(degree²); one
# bot-like user (crawler, shared account) with 10⁴–10⁵ distinct items would
# otherwise produce 10⁸–10¹⁰ pairs inside ONE partition task. Standard
# co-vis mining bound: hub users' item lists are hash-sampled down to this
# cap (deterministic in (user, item) — partition/scheduler independent), so
# per-task pair work is ≤ cap²/2 ≈ 2M pairs ≈ 16 MB. Documented bias:
# co-occurrence counts involving capped hubs are computed over a uniform
# item sample. The fixture's max degree is 24 (sf0.1), so small-SF oracle
# hashes are unaffected.
MAX_USER_ITEMS = 2000

def _cap_user_items(u, it, cap=None):
    """Deterministically cap each user's distinct-item list at ``cap``.

    ``u`` must be segment-sorted (all of a user's rows adjacent) and ``it``
    ascending within each segment — both preserved on return (sampling
    drops rows by mask, never reorders). Selection key is a splitmix64 mix
    of (user, item), so the kept sample is a pure function of the data.
    """
    import numpy as np

    from magic_content_extractor_ray.stages.window import (
        segment_lengths, segment_starts)

    if cap is None:
        cap = MAX_USER_ITEMS
    if not len(u):
        return u, it
    starts = segment_starts(u)
    lens = segment_lengths(starts, len(u))
    if int(lens.max()) <= cap:
        return u, it
    keep = np.ones(len(u), dtype=bool)
    for s, ln in zip(starts[lens > cap], lens[lens > cap]):
        s, ln = int(s), int(ln)
        salt = np.uint64((int(u[s]) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
        mix = it[s:s + ln].astype(np.uint64) + salt
        mix ^= mix >> np.uint64(30)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        mix ^= mix >> np.uint64(27)
        mix *= np.uint64(0x94D049BB133111EB)
        mix ^= mix >> np.uint64(31)
        keep[s + np.argpartition(mix, cap)[cap:]] = False
    return u[keep], it[keep]

def q_page_rank(sf_dir: str):
    """Distributed PageRank (iterative graph algorithm — the web-scale
    ranking primitive of the reference's domain) over the per-user event
    transition graph: ``props.k`` values are nodes, and each user's
    consecutive events in (ts, event_id) order contribute one src→dst
    edge. 10 damped power iterations via ``stages/pagerank.py``
    (broadcast mode: the edge list streams through map_batches partial
    dst-sums, only the |V|-sized rank vector is broadcast per
    iteration). Ranks are emitted as half-away-rounded 1e8-scaled
    integers so the DuckDB oracle — the same recurrence unrolled as 10
    chained CTEs — compares exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.pagerank import pagerank
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, col_np)

    def with_k(batch: pa.Table) -> pa.Table:
        col = batch.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "ts": batch.column("ts"),
                         "event_id": batch.column("event_id"),
                         "k": ks})

    def edges(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        k = col_np(t, "k")
        same = uid[1:] == uid[:-1]
        return pa.table({
            "src": pa.array(k[:-1][same], pa.int64()),
            "dst": pa.array(k[1:][same], pa.int64())})

    e = map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id", "props"]
                 ).map_batches(with_k, batch_format="pyarrow"),
        "user_id", edges, sort_cols=["ts", "event_id"])
    pr = pagerank(e, damping=0.85, n_iter=10)
    r = pr.column("rank").to_numpy()
    return pa.table({
        "node": pr.column("node"),
        "pr_e8": pa.array(np.floor(r * 1e8 + 0.5).astype(np.int64),
                          pa.int64())})

def _covis_pair_counts(sf_dir: str):
    """Shared co-view pair-count pipeline (q_covisitation, q_item_bfs):
    distinct (user, item) from view events, per-user unordered item
    pairs via the vectorized triangular-index decode, PACKED int64 pair
    keys, per-partition partial counts, hash_sum combiner. Returns a
    Dataset (pk, n_users); per-user fan-out is bounded by the
    MAX_USER_ITEMS hub cap (see _cap_user_items)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        # map-side (user, item) pre-dedup shrinks the partition shuffle
        return out.group_by(["user_id", "item"]).aggregate([])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(u) and (it.min() < 0 or it.max() >= (1 << 31)):
            raise ValueError("covisitation packs item pairs into one "
                             "int64; item ids must be in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        if len(u) > 1:  # rows sorted by (user, item): adjacent dedup
            keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep])
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        sel = lens >= 2
        starts, lens = starts[sel], lens[sel]
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        seg = np.repeat(np.arange(len(lens)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tloc = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        pk = (it[base + a] << np.int64(31)) | it[base + b]
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    # hash_sum, not groupby().aggregate(Sum): one group per item PAIR is
    # row-scale cardinality, where the sort-aggregate's per-group Python
    # callback dominates (2M pairs: 146 s → 4 s on 4 cpus)
    return hash_sum(
        map_key_partitions(ui, "user_id", pairs, sort_cols=["item"]),
        "pk", "c", "n_users")

def q_covisitation(sf_dir: str):
    """Item co-occurrence mining ("users who viewed X also viewed Y"):
    the shared _covis_pair_counts pipeline, then a bounded top-50 with
    Arrow-native per-batch candidate pruning."""
    import numpy as np
    import pyarrow as pa

    K = 50
    counts = _covis_pair_counts(sf_dir)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    cands = counts.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=8192)
    df = cands.to_pandas().sort_values(
        ["n_users", "pk"], ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    return pa.table({
        "item_a": pa.array(pk >> np.int64(31), pa.int64()),
        "item_b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
        "n_users": pa.array(df["n_users"].to_numpy(dtype=np.int64),
                            pa.int64()),
    })

def q_item_triangles(sf_dir: str):
    """Distributed triangle counting on the item co-view graph (edge =
    item pair co-viewed by ≥2 users). Edges are oriented low→high, so
    every triangle is generated EXACTLY ONCE as a wedge from its MIN
    vertex (one partition pass, np.triu_indices per vertex segment) and
    verified by one partitioned hash join against the edge set — the
    standard wedge-check shape; no vertex's work exceeds its degree².
    Per-USER pair emission is bounded by the MAX_USER_ITEMS hub cap
    (deterministic hash sample — see _cap_user_items).
    Returns per-item triangle participation counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    MIN_SUP = 2
    MASK = (1 << 31) - 1

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(u) and (it.min() < 0 or it.max() >= (1 << 31)):
            raise ValueError("item_triangles packs item pairs into one "
                             "int64; item ids must be in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep])
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        out = []
        for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
            bs = it[int(s):int(s + ln)]  # sorted ascending within user
            iu, ju = np.triu_indices(int(ln), 1)
            out.append((bs[iu] << np.int64(31)) | bs[ju])
        pk = np.concatenate(out) if out else np.zeros(0, np.int64)
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    # hash_sum (Arrow C++ per-partition sum), not the sort-aggregate:
    # pair-key cardinality is row-scale (see q_covisitation)
    counts = hash_sum(
        map_key_partitions(ui, "user_id", pairs, sort_cols=["item"],
                           coalesce_rows=131072),
        "pk", "c", "n_users")

    def unpack_edges(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        keep = n >= MIN_SUP
        pk = pk[keep]
        return pa.table({"a": pa.array(pk >> np.int64(31), pa.int64()),
                         "b": pa.array(pk & np.int64(MASK), pa.int64()),
                         "pk": pa.array(pk, pa.int64())})

    edges = counts.map_batches(
        unpack_edges, batch_format="pyarrow").materialize()  # used 2×

    def wedges(part: pa.Table) -> pa.Table:
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        out_pk, out_a = [], []
        if len(a):
            starts = segment_starts(a)
            lens = segment_lengths(starts, len(a))
            for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
                bs = b[int(s):int(s + ln)]  # sorted (partition sort)
                iu, ju = np.triu_indices(int(ln), 1)
                out_pk.append((bs[iu] << np.int64(31)) | bs[ju])
                out_a.append(np.full(len(iu), a[int(s)], np.int64))
        pk = np.concatenate(out_pk) if out_pk else np.zeros(0, np.int64)
        av = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "apex": pa.array(av, pa.int64())})

    wedge_ds = map_key_partitions(edges, "a", wedges, sort_cols=["b"])

    # wedge (b, c) from apex a is a triangle iff (b, c) is an edge
    tris = hash_join(
        wedge_ds, edges.select_columns(["pk"]).map_batches(
            lambda t: t.append_column(
                "is_edge", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow"),
        key="pk", left_cols=["apex"], right_cols=["is_edge"],
        left_types={"pk": pa.int64(), "apex": pa.int64()},
        right_types={"is_edge": pa.int64()})

    def explode_items(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        apex = t.column("apex").to_numpy(zero_copy_only=False)
        items = np.concatenate([apex, pk >> np.int64(31),
                                pk & np.int64(MASK)])
        return pa.table({"item": pa.array(items, pa.int64())})

    from magic_content_extractor_ray.stages.window import hash_agg

    def corner_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("item").aggregate([([], "count_all")])
        return pa.table({"item": g.column("item"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    # hash_agg: the item domain is entity-cardinality at corpus scale
    return hash_agg(
        tris.map_batches(explode_items, batch_format="pyarrow"
                         ).map_batches(corner_partial,
                                       batch_format="pyarrow",
                                       batch_size=65536),
        "item", [("n", "sum", "n_triangles")]).sort("item")

def q_item_bfs(sf_dir: str):
    """Iterative distributed BFS (bounded-hop reachability) over the
    co-view item graph: edges = item pairs co-viewed by >= 2 users
    (support filter on the shared _covis_pair_counts pipeline, mirrored
    both directions), seed = smallest item id, 4 frontier-expansion
    rounds — each round is ONE semi hash_join (edges whose source is in
    the frontier) + ONE hash_agg min-dist merge, materialized so the
    lineage stays one round deep. This is the scale path for graphs
    whose frontier does not fit a broadcast; the SQL twin is an
    independent recursive CTE."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg

    MAX_HOPS, MIN_SUPPORT = 4, 2

    counts = _covis_pair_counts(sf_dir)

    def unpack_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("n_users"),
                                          MIN_SUPPORT))
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = counts.map_batches(unpack_edges,
                               batch_format="pyarrow").materialize()

    # seed: smallest item id in the distinct (user, item) universe
    def items_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"item": pa.array(
            [pc.min(ks).as_py()] if len(t) else [], pa.int64())})

    seed = int(_read_pq(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    ).map_batches(items_only, batch_format="pyarrow").aggregate(
        Min("item", alias_name="m"))["m"])

    dist = ray.data.from_arrow(pa.table({
        "item": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()

    frontier = dist
    for h in range(1, MAX_HOPS + 1):
        # early exit once the frontier drains (count() on the small
        # materialized dist table, not a lineage re-execution)
        if frontier.count() == 0:
            break
        nbrs = hash_join(
            edges, frontier, key="item", left_cols=["dst"],
            right_cols=[], how="semi",
            left_types={"item": pa.int64(), "dst": pa.int64()},
            right_types={"dist": pa.int64()})

        def cand(batch: pa.Table, hop=h) -> pa.Table:
            return pa.table({
                "item": pc.unique(batch.column("dst")),
                "dist": pa.array(
                    [hop] * len(pc.unique(batch.column("dst"))),
                    pa.int64())})

        dist = hash_agg(
            dist.union(nbrs.map_batches(cand, batch_format="pyarrow")),
            "item", [("dist", "min", "dist")]).materialize()

        def this_hop(batch: pa.Table, hop=h) -> pa.Table:
            return batch.filter(pc.equal(batch.column("dist"), hop))

        frontier = dist.map_batches(this_hop, batch_format="pyarrow")

    return dist.sort("item")

def q_item_neighbors(sf_dir: str):
    """Per-item "users also viewed" TOP-5 neighbor lists (the
    recommender-output shape of the co-occurrence family): the shared
    pair-count pipeline mirrored into both directions, then a per-item
    rank cut — per-batch Arrow top-k pruning bounds the candidates
    before one |items|-keyed partition rank (segment kernel, no
    per-group callback). Ties break (count desc, neighbor asc); the
    twin is the identical ROW_NUMBER window."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    K = 5
    counts = _covis_pair_counts(sf_dir)

    def mirror(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        c = batch.column("n_users").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "n_users": pa.array(np.concatenate([c, c]), pa.int64())})

    def prune(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("nbr", "ascending")], k=K,
                           group="item")

    cands = counts.map_batches(mirror, batch_format="pyarrow"
                               ).map_batches(prune,
                                             batch_format="pyarrow")

    def rank_cut(t: pa.Table) -> pa.Table:
        it = t.column("item").to_numpy(zero_copy_only=False)
        nb = t.column("nbr").to_numpy(zero_copy_only=False)
        nu = t.column("n_users").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -nu, it))
        it, nb, nu = it[order], nb[order], nu[order]
        new_grp = np.empty(len(it), bool)
        if len(it):
            new_grp[0] = True
            new_grp[1:] = it[1:] != it[:-1]
        starts = np.flatnonzero(new_grp)
        rank = np.arange(len(it)) - np.repeat(starts, np.diff(
            np.append(starts, len(it)))) + 1
        keep = rank <= K
        return pa.table({
            "item": pa.array(it[keep], pa.int64()),
            "rnk": pa.array(rank[keep], pa.int64()),
            "nbr": pa.array(nb[keep], pa.int64()),
            "n_users": pa.array(nu[keep], pa.int64())})

    return map_key_partitions(cands, "item", rank_cut).sort(
        ["item", "rnk"])

def q_item_components(sf_dir: str):
    """CONNECTED COMPONENTS of the co-view item graph (support >= 2
    edges, the same universe as item_bfs) through stages/graph's hybrid
    union-find / min-label-propagation — this gives the CC machinery a
    TRUE INDEPENDENT SQL oracle (a transitive-closure recursive CTE),
    where the dedup-clustering call sites can only pin it with
    snapshots and property tests. Output: (item, component) with
    component = min item id reachable; isolated items form their own
    singleton components."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from magic_content_extractor_ray.stages.graph import (
        connected_components)

    MIN_SUPPORT = 2
    counts = _covis_pair_counts(sf_dir)

    def unpack(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("n_users"),
                                          MIN_SUPPORT))
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "left_id": pa.array(pk >> np.int64(31), pa.int64()),
            "right_id": pa.array(pk & np.int64((1 << 31) - 1),
                                 pa.int64())})

    comp = connected_components(
        counts.map_batches(unpack, batch_format="pyarrow"),
        node_col="item", label_col="component").materialize()

    # add singleton components for items with no qualifying edge (the
    # oracle's universe is ALL viewed items)
    def items_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"item": pc.unique(ks)})

    from magic_content_extractor_ray.stages.window import hash_agg

    all_items = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "props"]).map_batches(
            items_only, batch_format="pyarrow"),
        "item", [("item", "count_all", "_n")])

    in_comp = np.sort(np.array(
        [int(r["item"]) for r in comp.take_all()], np.int64))
    in_ref = ray.put(in_comp)

    def singletons(batch: pa.Table) -> pa.Table:
        members = ray.get(in_ref)
        it = batch.column("item").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(members, it), 0,
                      max(len(members) - 1, 0))
        miss = ~((len(members) > 0) & (members[pos] == it))
        return pa.table({"item": pa.array(it[miss], pa.int64()),
                         "component": pa.array(it[miss], pa.int64())})

    extra = all_items.map_batches(singletons, batch_format="pyarrow")
    return comp.union(extra).sort("item")

def q_assoc_rules(sf_dir: str):
    """Association-rule mining (market basket): top-50 co-view item
    pairs by support, with EXACT integer-ppm confidence in both
    directions. Pair supports come from the shared _covis_pair_counts
    pipeline (hub-capped, hash_sum combiner); per-item user counts are
    a catalog-sized aggregate broadcast once; confidences are computed
    only on the 50 winning rows. Everything stays int64-exact:
    conf_ppm = (10^6 · n_both) // n_item (floor), mirrored by DuckDB's
    // integer division."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    K = 50

    def ui_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(ui_prep, batch_format="pyarrow")

    # the (user, item) pre-dedup above is per-BATCH; finish the exact
    # distinct with one composite-key hash_agg, then take per-item user
    # counts (catalog = dimension-sized) to the driver for the
    # confidence denominators
    from magic_content_extractor_ray.stages.window import hash_agg

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct_ui = hash_agg(ui.map_batches(one, batch_format="pyarrow"),
                           "user_id", [("one", "max", "one")],
                           group_cols=["user_id", "item"])
    item_counts = hash_sum(distinct_ui, "item", "one", "n_item"
                           ).to_pandas()
    ca = dict(zip(item_counts["item"].astype("int64"),
                  item_counts["n_item"].astype("int64")))

    pairs = _covis_pair_counts(sf_dir)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    cands = pairs.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=8192)
    df = cands.to_pandas().sort_values(
        ["n_users", "pk"], ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    a = pk >> np.int64(31)
    b = pk & np.int64((1 << 31) - 1)
    nb = df["n_users"].to_numpy(dtype=np.int64)
    na_ = np.array([ca[int(x)] for x in a], dtype=np.int64)
    nb_ = np.array([ca[int(x)] for x in b], dtype=np.int64)
    out = pd.DataFrame({
        "item_a": a, "item_b": b, "n_both": nb,
        "n_a": na_, "n_b": nb_,
        "conf_ab_ppm": (1_000_000 * nb) // na_,
        "conf_ba_ppm": (1_000_000 * nb) // nb_,
    })
    return out.sort_values(["n_both", "item_a", "item_b"],
                           ascending=[False, True, True]
                           ).reset_index(drop=True)

def q_user_recs(sf_dir: str):
    """Item-based collaborative-filtering recommendations: each user's
    top-3 unseen items scored by Σ co-view counts between the user's
    viewed items and each item's TOP-5 neighbor list. The neighbor
    lists are catalog-sized (≤ 5/item) — broadcast once as flat sorted
    arrays; scoring is one hash partitioning by user with vectorized
    expansion (searchsorted lookups, packed-key seen-filter, segment
    top-3) — no per-user Python. Ties break (score desc, item asc) in
    both engines."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    K = 3
    nbrs = q_item_neighbors(sf_dir)
    nb_df = nbrs.to_pandas() if not isinstance(nbrs, pd.DataFrame) \
        else nbrs
    nb_df = nb_df.sort_values(["item", "nbr"]).reset_index(drop=True)
    items_sorted = nb_df["item"].to_numpy(dtype=np.int64)
    flat_nbr = nb_df["nbr"].to_numpy(dtype=np.int64)
    flat_cnt = nb_df["n_users"].to_numpy(dtype=np.int64)
    ref = ray.put({"items": items_sorted, "nbr": flat_nbr,
                   "cnt": flat_cnt})

    def ui_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(ui_prep, batch_format="pyarrow")

    def recs(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "rnk": pa.array([], pa.int64()),
                          "item": pa.array([], pa.int64()),
                          "score": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        it = t.column("item").to_numpy(zero_copy_only=False)
        if not len(u):
            return empty
        if it.min() < 0 or it.max() >= (1 << 31) or u.min() < 0 \
                or u.max() >= (1 << 32):
            raise ValueError("user_recs packs (user, item) into one "
                             "int64; item ids must be in [0, 2^31) and "
                             "user ids in [0, 2^32)")
        keep = np.ones(len(u), dtype=bool)  # exact (user,item) distinct
        keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = u[keep], it[keep]
        lk = ray.get(ref)
        # expand each (user, item) row into the item's neighbor run
        lo = np.searchsorted(lk["items"], it, side="left")
        hi = np.searchsorted(lk["items"], it, side="right")
        runs = hi - lo
        total = int(runs.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(len(u)), runs)
        offs = np.concatenate(([0], np.cumsum(runs)[:-1]))
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(offs, runs) + lo[row])
        cu = u[row]
        cand = lk["nbr"][idx]
        sc = lk["cnt"][idx]
        # drop candidates the user has already seen: packed-key probe
        # against the partition's own (user, item) rows
        seen = np.sort((u.astype(np.int64) << np.int64(31)) | it)
        ck = (cu.astype(np.int64) << np.int64(31)) | cand
        pos = np.searchsorted(seen, ck)
        pos[pos >= len(seen)] = 0
        unseen = seen[pos] != ck
        cu, cand, sc = cu[unseen], cand[unseen], sc[unseen]
        if not len(cu):
            return empty
        # sum scores per (user, candidate): sort + segmented reduce
        order = np.lexsort((cand, cu))
        cu, cand, sc = cu[order], cand[order], sc[order]
        new = np.empty(len(cu), dtype=bool)
        new[0] = True
        new[1:] = (cu[1:] != cu[:-1]) | (cand[1:] != cand[:-1])
        starts = np.nonzero(new)[0]
        gu, gc = cu[starts], cand[starts]
        gs = np.add.reduceat(sc, starts)
        # per-user top-3 by (score desc, item asc)
        order2 = np.lexsort((gc, -gs, gu))
        gu, gc, gs = gu[order2], gc[order2], gs[order2]
        ng = np.empty(len(gu), dtype=bool)
        ng[0] = True
        ng[1:] = gu[1:] != gu[:-1]
        gstart = np.nonzero(ng)[0]
        rnk = np.arange(len(gu), dtype=np.int64) - np.repeat(
            gstart, np.diff(np.append(gstart, len(gu)))) + 1
        m = rnk <= K
        return pa.table({
            "user_id": pa.array(gu[m], pa.int64()),
            "rnk": pa.array(rnk[m], pa.int64()),
            "item": pa.array(gc[m], pa.int64()),
            "score": pa.array(gs[m], pa.int64())})

    out = map_key_partitions(ui, "user_id", recs,
                             sort_cols=["item"]).to_pandas()
    return out.sort_values(["user_id", "rnk"]).reset_index(drop=True)

def q_link_prediction(sf_dir: str):
    """Adamic-Adar link prediction over the co-view item graph: edges
    are item pairs co-viewed by >= 2 distinct users (from the shared
    _covis_pair_counts pipeline); for every NON-edge pair (a, b) the
    score is sum over common neighbors c of 1/ln(deg(c)), in half-up
    integer nano-units so the sum is order-independent. Wedges are
    generated per NODE inside one hash partition (the node's full
    neighbor list is co-located, so deg(c) and the pair fan-out come
    from segment lengths — no separate degree pass); existing edges
    are removed by a TAGGED-UNION exchange, not a driver-side set
    (edge sets at corpus scale exceed driver memory). Per-node
    fan-out is bounded by the same hub cap as covisitation. ln via
    math.log per DISTINCT degree (libm, matches DuckDB's ln — np.log's
    SIMD path is not guaranteed last-bit-identical). Top-20 by
    (score desc, item_a, item_b)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS = 2
    K = 20

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def wedges(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nbr = t.column("nbr").to_numpy(
            zero_copy_only=False).astype(np.int64)
        node, nbr = _cap_user_items(node, nbr)
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        sel = lens >= 2
        starts, lens = starts[sel], lens[sel]
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64()),
                             "is_edge": pa.array([], pa.int64())})
        # half-up nano-unit weight per DISTINCT degree, libm ln
        wmap = {int(d): int(math.floor(1e9 / math.log(float(d)) + 0.5))
                for d in np.unique(lens)}
        seg = np.repeat(np.arange(len(lens)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tloc = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        x, y = nbr[base + a], nbr[base + b]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        pk = (lo << np.int64(31)) | hi
        w = np.array([wmap[int(d)] for d in np.unique(lens)],
                     np.int64)[np.searchsorted(np.unique(lens), length)]
        pku, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "pk": pa.array(pku, pa.int64()),
            "w": pa.array(np.bincount(inv, weights=w).astype(np.int64),
                          pa.int64()),
            "nc": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "is_edge": pa.array(np.zeros(len(pku), np.int64), pa.int64())})

    def tag_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"pk": t.column("pk"), "w": z, "nc": z,
                         "is_edge": pa.array(np.ones(n, np.int64),
                                             pa.int64())})

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")
    wedge_counts = map_key_partitions(adj, "node", wedges,
                                      sort_cols=["nbr"])
    edge_rows = edges.map_batches(tag_edges, batch_format="pyarrow")
    merged = hash_agg(wedge_counts.union(edge_rows), "pk",
                      [("w", "sum", "score_nano"),
                       ("nc", "sum", "n_common"),
                       ("is_edge", "sum", "is_edge")])
    cand = merged.filter(lambda r: r["is_edge"] == 0)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("score_nano", "descending"),
                                   ("pk", "ascending")], k=K)

    df = cand.map_batches(partial_topk, batch_format="pyarrow",
                          batch_size=8192).to_pandas()
    if df.empty:  # complete graph: every wedge pair is an edge
        df = pd.DataFrame({"pk": pd.Series([], dtype="int64"),
                           "score_nano": pd.Series([], dtype="int64"),
                           "n_common": pd.Series([], dtype="int64")})
    df = df.sort_values(["score_nano", "pk"],
                        ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    return pa.table({
        "item_a": pa.array(pk >> np.int64(31), pa.int64()),
        "item_b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
        "n_common": pa.array(df["n_common"].to_numpy(dtype=np.int64),
                             pa.int64()),
        "score_nano": pa.array(df["score_nano"].to_numpy(dtype=np.int64),
                               pa.int64())})

def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the co-view item graph (Pearson r of
    endpoint degrees over DIRECTED edges) — the standard Newman mixing
    coefficient. Two keyed passes, both LINEAR in edges (no pair
    expansion, so no hub cap needed): partition by node gives
    deg(node) as the segment length and emits (nbr, deg_src) per edge;
    partition by nbr gives deg(nbr) the same way and reduces each
    partition to ONE exact int64 sufficient-stats row. The driver
    mirrors the oracle's double formula (lineitem_corr shape)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS = 2
    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def emit_src_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"nbr": pa.array([], pa.int64()),
                             "deg_src": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({
            "nbr": pa.array(nbr, pa.int64()),
            "deg_src": pa.array(np.repeat(lens, lens), pa.int64())})

    def stats_partial(t: pa.Table) -> pa.Table:
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        x = t.column("deg_src").to_numpy(zero_copy_only=False)
        if not len(nbr):
            z = pa.array([], pa.int64())
            return pa.table({c: z for c in
                             ("n", "sx", "sy", "sxx", "syy", "sxy")})
        starts = segment_starts(nbr)
        lens = segment_lengths(starts, len(nbr))
        y = np.repeat(lens, lens)
        return pa.table({
            "n": pa.array([len(nbr)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")
    deg_rows = map_key_partitions(adj, "node", emit_src_deg,
                                  sort_cols=["nbr"])
    st = map_key_partitions(deg_rows, "nbr", stats_partial).aggregate(
        *[Sum(c, alias_name=c) for c in
          ("n", "sx", "sy", "sxx", "syy", "sxy")])
    n, sx, sy = st["n"], st["sx"], st["sy"]
    sxx, syy, sxy = st["sxx"], st["syy"], st["sxy"]
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                    * (float(n) * float(syy) - float(sy) * float(sy)))
    # a REGULAR graph (every degree equal — e.g. complete) has zero
    # degree variance: assortativity is undefined; DuckDB yields NULL
    # on /0, so mirror with None (caught by the sf1 complete graph)
    r = num / den if den != 0.0 else None
    return pd.DataFrame({"n_edges": [int(n) // 2],
                         "assortativity": [r]})

def q_kcore_items(sf_dir: str):
    """Distributed K-CORE decomposition (k=5) of the co-view item
    graph: iterative edge peeling — each round two LINEAR keyed passes
    (partition by node → deg(node) rides each edge; partition by nbr →
    deg(nbr) is the segment length) drop every edge with an endpoint
    below k; rounds materialize like item_bfs/k-means and stop at the
    fixpoint (count unchanged). The k-core is UNIQUE, so any peeling
    order converges to the same set — the SQL twin's recursive CTE
    peels in lockstep rounds and must agree exactly. Bounded at 64
    rounds with a loud failure (real peel depths are far smaller;
    each round strictly shrinks the edge set)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    K = 5
    MAX_ROUNDS = 64
    MIN_USERS = 2

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(pk >> np.int64(31), pa.int64()),
            "b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64())})

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def emit_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64()),
                             "deg_src": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "deg_src": pa.array(np.repeat(lens, lens), pa.int64())})

    def filter_k(t: pa.Table) -> pa.Table:
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if not len(nbr):
            return empty
        node = t.column("node").to_numpy(zero_copy_only=False)
        ds_ = t.column("deg_src").to_numpy(zero_copy_only=False)
        starts = segment_starts(nbr)
        lens = segment_lengths(starts, len(nbr))
        deg_nbr = np.repeat(lens, lens)
        keep = (ds_ >= K) & (deg_nbr >= K) & (node < nbr)
        return pa.table({"a": pa.array(node[keep], pa.int64()),
                         "b": pa.array(nbr[keep], pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS).map_batches(
        unpack, batch_format="pyarrow").materialize()
    cnt = edges.count()
    for _ in range(MAX_ROUNDS):
        if cnt == 0:
            return pd.DataFrame({"item": pd.Series([], dtype="int64"),
                                 "core_degree": pd.Series(
                                     [], dtype="int64")})
        adj = edges.map_batches(symmetrize, batch_format="pyarrow")
        deg_rows = map_key_partitions(adj, "node", emit_deg,
                                      sort_cols=["nbr"])
        surv = map_key_partitions(deg_rows, "nbr",
                                  filter_k).materialize()
        new_cnt = surv.count()
        if new_cnt == cnt:
            break
        edges, cnt = surv, new_cnt
    else:
        raise RuntimeError(f"k-core did not converge in {MAX_ROUNDS} "
                           "rounds")

    def final_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"item": pa.array([], pa.int64()),
                             "core_degree": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({"item": pa.array(node[starts], pa.int64()),
                         "core_degree": pa.array(lens, pa.int64())})

    out = map_key_partitions(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        "node", final_deg).to_pandas()
    return out.sort_values("item").reset_index(drop=True)

def q_assoc_triples(sf_dir: str):
    """Apriori level-3: top-30 co-view item TRIPLES by user support.
    Per-user triples are generated fully vectorized — the existing
    triangular PAIR decode, then each pair (i, j) expands by the
    items ranked after j via one repeat/cumsum pass — and packed into
    one int64 (3 × 21-bit lanes, ids guarded < 2²¹), so the exchange
    is (pk, count) like covisitation. Per-user fan-out is C(d, 3);
    the hub cap here is TIGHTER than the pair cap (C(256,3) ≈ 2.7M
    rows per hub per task is the budget; the fixture's max degree is
    far below the cap, so capped == exact there, the covisitation
    convention). Tie-break (support desc, pk asc) == (n, ia, ib, ic)
    lexicographic because the pack is order-preserving."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    K = 30
    TRIPLE_CAP = 256

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks}).group_by(["user_id", "item"]).aggregate([])

    def triples(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if not len(u):
            return empty
        if it.min() < 0 or it.max() >= (1 << 21):
            raise ValueError("triple pack needs item ids in [0, 2^21)")
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep], cap=TRIPLE_CAP)
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        sel = lens >= 3
        starts, lens = starts[sel], lens[sel]
        if not len(starts):
            return empty
        # pair stage (triangular decode, the covisitation kernel)
        pcounts = lens * (lens - 1) // 2
        ptotal = int(pcounts.sum())
        seg = np.repeat(np.arange(len(lens)), pcounts)
        offs = np.concatenate(([0], np.cumsum(pcounts)[:-1]))
        tloc = np.arange(ptotal, dtype=np.int64) - np.repeat(offs,
                                                             pcounts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        # expand each pair (a, b) by every item ranked after b
        c3 = length - 1 - b
        total3 = int(c3.sum())
        if total3 == 0:
            return empty
        rep = np.repeat(np.arange(ptotal), c3)
        offs3 = np.concatenate(([0], np.cumsum(c3)[:-1]))
        tloc3 = np.arange(total3, dtype=np.int64) - np.repeat(offs3, c3)
        base = starts[seg][rep]
        ia = it[base + a[rep]]
        ib = it[base + b[rep]]
        ic = it[base + b[rep] + 1 + tloc3]
        pk = (ia << np.int64(42)) | (ib << np.int64(21)) | ic
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    counts = hash_sum(
        map_key_partitions(ui, "user_id", triples, sort_cols=["item"]),
        "pk", "c", "n_users")

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    df = counts.map_batches(partial_topk, batch_format="pyarrow",
                            batch_size=8192).to_pandas()
    df = df.sort_values(["n_users", "pk"],
                        ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    m21 = np.int64((1 << 21) - 1)
    return pd.DataFrame({
        "item_a": pd.Series(pk >> np.int64(42), dtype="int64"),
        "item_b": pd.Series((pk >> np.int64(21)) & m21, dtype="int64"),
        "item_c": pd.Series(pk & m21, dtype="int64"),
        "n_users": df["n_users"].astype("int64").to_numpy()})

def q_popularity_hitrate(sf_dir: str):
    """Recommender EVALUATION with a TEMPORAL SPLIT (train < day
    19743 = 2024-01-21 < test): the popularity baseline recommends
    each user the first 3 of the train-window global top-20 items
    (by distinct viewers, ties item asc) they have NOT viewed in
    train; hit-rate@3 = share of test-purchasing users with ≥1
    recommended item among their test purchases. The top-20 list is
    catalog-sized and broadcast; seen-sets and gold-sets live in one
    per-user partition pass. Floor-ppm hit rate; fully
    SQL-expressible, so the eval has a true independent oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts, ts_us)

    SPLIT_DAY = 19743
    TOPN = 20
    K = 3

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["view", "purchase"]))
        t = batch.filter(mask)
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        day = pa.array(ts_us(t.column("ts")) // 86_400_000_000,
                       pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": item, "day": day,
            "event_type": t.column("event_type")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type", "props"]
                  ).map_batches(prep,
                                batch_format="pyarrow").materialize()

    # train-window global popularity: distinct (user, item) viewers
    def train_views(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("event_type"), "view"),
                    pc.less(t.column("day"), SPLIT_DAY))
        f = t.filter(m)
        return pa.table({"user_id": f.column("user_id"),
                         "item": f.column("item")}).group_by(
            ["user_id", "item"]).aggregate([])

    def one(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct_ui = hash_agg(
        ev.map_batches(train_views, batch_format="pyarrow"
                       ).map_batches(one, batch_format="pyarrow"),
        "user_id", [("one", "max", "one")],
        group_cols=["user_id", "item"])
    pop = hash_agg(distinct_ui, "item", [("one", "sum", "n")]
                   ).to_pandas()
    pop = pop.sort_values(["n", "item"],
                          ascending=[False, True]).head(TOPN)
    top_items = pop["item"].to_numpy(dtype=np.int64)
    ref = ray.put(top_items)

    def hits(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_users": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return empty
        it = t.column("item").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        top = ray.get(ref)
        starts = segment_starts(u)
        ends = np.r_[starts[1:], len(u)]
        n_users = n_hits = 0
        for s, e in zip(starts, ends):
            sl = slice(s, e)
            gold = set(it[sl][(et[sl] == "purchase")
                              & (day[sl] >= SPLIT_DAY)].tolist())
            if not gold:
                continue
            seen = set(it[sl][(et[sl] == "view")
                              & (day[sl] < SPLIT_DAY)].tolist())
            recs = [x for x in top if x not in seen][:K]
            n_users += 1
            n_hits += int(any(x in gold for x in recs))
        return pa.table({"n_users": pa.array([n_users], pa.int64()),
                         "n_hits": pa.array([n_hits], pa.int64())})

    agg = map_key_partitions(ev, "user_id", hits).aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("n_hits", alias_name="n_hits"))
    n_users, n_hits = int(agg["n_users"]), int(agg["n_hits"])
    return pd.DataFrame({
        "n_users": pd.Series([n_users], dtype="int64"),
        "n_hits": pd.Series([n_hits], dtype="int64"),
        "hitrate_ppm": pd.Series([(1_000_000 * n_hits) // n_users],
                                 dtype="int64")})

def q_item_cheapest_path(sf_dir: str):
    """WEIGHTED single-source shortest paths over the co-view graph
    (edge cost = 10⁶ // co-view count: strong affinity = cheap) —
    distributed Bellman-Ford: each round one keyed exchange relaxes
    every settled node's edges and a hash_agg min merges candidates
    with current distances; distances only decrease, so the tagged
    changed-count fixpoint test is exact. Integer costs throughout;
    source = the graph's min item (deterministic at any sf). Bounded
    64 rounds (≥ the weighted-path hop diameter) with a loud
    failure. The SQL twin runs the same relaxation as a recursive
    CTE with a strict-improvement guard."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts)

    MIN_USERS = 2
    MAX_ROUNDS = 64

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        w = 1_000_000 // n
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    adj = edges.map_batches(symmetrize,
                            batch_format="pyarrow").materialize()
    src = int(adj.min("node"))
    import ray.data as rd

    dist = rd.from_arrow(pa.table({
        "node": pa.array([src], pa.int64()),
        "cost": pa.array([0], pa.int64())})).materialize()

    def tag_dist(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "nbr": pa.nulls(len(t), pa.int64()),
                         "w": t.column("cost")})

    def relax(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "cost": pa.array([], pa.int64())})
        if not len(node):
            return empty
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        is_d = pd.isna(nbr)
        starts = segment_starts(node)
        seg = np.searchsorted(starts, np.arange(len(node)),
                              side="right") - 1
        seg_cost = np.full(len(starts), -1, dtype=np.int64)
        seg_cost[seg[is_d]] = w[is_d]
        out_n = [node[is_d]]
        out_c = [w[is_d].astype(np.int64)]
        em = (~is_d) & (seg_cost[seg] >= 0)
        if em.any():
            out_n.append(nbr[em].astype(np.int64))
            out_c.append(seg_cost[seg[em]] + w[em].astype(np.int64))
        return pa.table({
            "node": pa.array(np.concatenate(out_n), pa.int64()),
            "cost": pa.array(np.concatenate(out_c), pa.int64())})

    # distances are monotone: node count only grows, total cost of
    # settled nodes only shrinks — (count, sum) equality IS the
    # fixpoint test, two cheap aggregates instead of a keyed exchange
    cnt, csum = 1, 0
    for _ in range(MAX_ROUNDS):
        tagged = dist.map_batches(tag_dist,
                                  batch_format="pyarrow").union(adj)
        new_dist = hash_agg(
            map_key_partitions(tagged, "node", relax),
            "node", [("cost", "min", "cost")]).materialize()
        new_cnt = new_dist.count()
        new_sum = int(new_dist.sum("cost"))
        stable = new_cnt == cnt and new_sum == csum
        dist, cnt, csum = new_dist, new_cnt, new_sum
        if stable:
            break
    else:
        raise RuntimeError("shortest-path relaxation did not converge "
                           f"in {MAX_ROUNDS} rounds")

    out = dist.to_pandas()
    return out.sort_values("node").reset_index(drop=True).rename(
        columns={"node": "item", "cost": "cost"})

def q_edge_churn(sf_dir: str):
    """TEMPORAL GRAPH churn: Jaccard overlap of CONSECUTIVE weeks'
    co-view edge sets (how fast the item-affinity structure turns
    over). Weekly edges are per-(user, week) triangular pair
    expansion (hub-capped); the week-set overlap rides the
    _tag_set_overlap bitmask machinery — the edge-key set never
    reaches the driver, only the ≤2^weeks mask histogram (weeks are
    calendar-bounded). Consecutive-week rows only; zero-overlap
    pairs are absent by the helper's contract (mirrored in SQL)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    WEEK_US = 604_800_000_000

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "week": pa.array(ts_us(t.column("ts")) // WEEK_US,
                             pa.int64()),
            "item": item}).group_by(
            ["user_id", "week", "item"]).aggregate([])

    def weekly_pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "week": pa.array([], pa.int64())})
        if not len(u):
            return empty
        wk = t.column("week").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if it.min() < 0 or it.max() >= (1 << 31):
            raise ValueError("edge pack needs item ids in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = ((u[1:] != u[:-1]) | (wk[1:] != wk[:-1])
                    | (it[1:] != it[:-1]))
        u, wk, it = u[keep], wk[keep], it[keep]
        # segments = (user, week); cap items per segment like covis
        seg_key = u * (1 << 20) + wk  # weeks < 2^20: no collision
        seg_key, it = _cap_user_items(seg_key, it)
        wk = seg_key & np.int64((1 << 20) - 1)
        starts = segment_starts(seg_key)
        lens = segment_lengths(starts, len(seg_key))
        sel = lens >= 2
        starts, lens = starts[sel], lens[sel]
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return empty
        seg = np.repeat(np.arange(len(lens)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tloc = np.arange(total, dtype=np.int64) - np.repeat(offs,
                                                            counts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        pk = (it[base + a] << np.int64(31)) | it[base + b]
        return pa.table({
            "pk": pa.array(pk, pa.int64()),
            "week": pa.array(wk[base], pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    keyed = map_key_partitions(ui, "user_id", weekly_pairs,
                               sort_cols=["week", "item"])
    out = _tag_set_overlap(keyed, key="pk", tag="week",
                           prefix="week")
    out = out[out["week_b"] == out["week_a"] + 1].reset_index(
        drop=True)
    return out.astype({"week_a": "int64", "week_b": "int64"})

def q_random_walks(sf_dir: str):
    """DETERMINISTIC random-walk corpus over the co-view item graph
    (the node2vec/DeepWalk data-generation stage): one 3-step walk per
    start node, where the step-s transition out of node u is the
    (md5(start:walk:s:u) mod deg(u))-th neighbor in ascending-id order
    — the dp_lang_counts seeded-hash idiom, so the SQL twin replays
    every transition exactly. Graph = covisitation edges (n_users ≥ 2),
    symmetrized. Shape: one ranked-adjacency exchange (rank + degree
    are segment offsets/lengths), then per step ONE degree join (packs
    (cur, idx) into int64) + ONE adjacency join — all hash_joins, no
    per-node loops; walk fan-out is 1, so frontier size stays exactly
    n_nodes at every step."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS, STEPS = 2, 3

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow")

    def rank_adj(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "apk": z, "nbr": z, "deg": z,
                             "rank": z})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        rank = np.arange(len(node), dtype=np.int64) - \
            np.repeat(starts, lens)
        deg = np.repeat(lens, lens).astype(np.int64)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "apk": pa.array((node << np.int64(31)) | rank, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "rank": pa.array(rank, pa.int64())})

    # adjacency is probed once per walk step (deg join + rank join) plus
    # the start-node scan: materialize ONCE — it is edge-scale (item
    # catalog co-view graph), not event-scale, and re-deriving it from
    # events 2·STEPS times would dominate the job (the k-means
    # projected-materialize policy)
    adj = map_key_partitions(sym, "node", rank_adj,
                             sort_cols=["nbr"]).materialize()

    import pyarrow.compute as pc

    def firsts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t.column("rank"), 0))
        return pa.table({"cur": f.column("node"), "deg": f.column("deg")})

    deg_t = adj.map_batches(firsts, batch_format="pyarrow")

    frontier = deg_t.map_batches(
        lambda t: pa.table({"start": t.column("cur"),
                            "cur": t.column("cur")}),
        batch_format="pyarrow").materialize()

    step_outs = [frontier.map_batches(
        lambda t: pa.table({"start": t.column("start"),
                            "step": pa.array(
                                np.zeros(len(t), np.int64)),
                            "node": t.column("cur")}),
        batch_format="pyarrow")]

    for s in range(1, STEPS + 1):
        with_deg = hash_join(
            frontier, deg_t, key="cur", left_cols=["start"],
            right_cols=["deg"], how="inner",
            left_types={"cur": pa.int64(), "start": pa.int64()},
            right_types={"cur": pa.int64(), "deg": pa.int64()})

        def pick(t: pa.Table, *, step=s) -> pa.Table:
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            st = t.column("start").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False)
            h = np.array([int(hashlib.md5(
                f"{a}:walk:{step}:{c}".encode()).hexdigest()[:8], 16)
                for a, c in zip(st, cur)], dtype=np.int64)
            idx = h % deg
            return pa.table({
                "apk": pa.array((cur << np.int64(31)) | idx, pa.int64()),
                "start": pa.array(st, pa.int64())})

        keyed = with_deg.map_batches(pick, batch_format="pyarrow")
        stepped = hash_join(
            keyed, adj, key="apk", left_cols=["start"],
            right_cols=["nbr"], how="inner",
            left_types={"apk": pa.int64(), "start": pa.int64()},
            right_types={"apk": pa.int64(), "nbr": pa.int64()})
        # frontier is node-scale (one row per start): materialize per
        # step so later steps and the union don't replay earlier joins
        frontier = stepped.map_batches(
            lambda t: pa.table({"start": t.column("start"),
                                "cur": t.column("nbr")}),
            batch_format="pyarrow").materialize()
        step_outs.append(frontier.map_batches(
            lambda t, _s=s: pa.table({
                "start": t.column("start"),
                "step": pa.array(np.full(len(t), _s, np.int64)),
                "node": t.column("cur")}),
            batch_format="pyarrow"))

    out = step_outs[0]
    for o in step_outs[1:]:
        out = out.union(o)
    return out.sort(["start", "step"])

def q_mst_coview(sf_dir: str):
    """Minimum spanning FOREST of the co-view item graph by distributed
    BORŮVKA: edge weight orders by (affinity desc, ia, ib) — strongest
    co-view ties are lightest, and the composite tie-break makes every
    weight distinct, so the MSF is unique and the SQL twin can verify
    it with a DIFFERENT algorithm (one-edge-per-iteration KRUSKAL in a
    recursive CTE) — two independent algorithms, one answer. Per round:
    one broadcast label lookup (labels are item-catalog-scale — the
    fk_violations dimension-broadcast policy), one keyed exchange
    where each component's segment yields its min incident edge via a
    vectorized lexsort, and a driver union-find over the per-component
    minima (≤ #components rows, halving every round — the
    connected_components hybrid policy). Rounds are O(log n); the
    edge-scale dataset is materialized once and re-mapped per round."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts)

    MIN_USERS = 2

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "ia": pa.array(pk >> np.int64(31), pa.int64()),
            "ib": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
            "cnt": pa.array(t.column("n_users").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS).map_batches(
        unpack, batch_format="pyarrow").materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t.column("ia").to_numpy(zero_copy_only=False),
            t.column("ib").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    node_rows = edges.map_batches(endpoints,
                                  batch_format="pyarrow").take_all()
    nodes = np.unique(np.array([r["node"] for r in node_rows],
                               dtype=np.int64))
    if not len(nodes):
        return pd.DataFrame({"ia": pd.Series([], dtype="int64"),
                             "ib": pd.Series([], dtype="int64"),
                             "n_users": pd.Series([], dtype="int64")})
    nodes_ref = ray.put(nodes)
    labels = nodes.copy()

    mst: list[tuple[int, int, int]] = []
    for _round in range(64):
        lab_ref = ray.put(labels)

        def cross(t: pa.Table, _n=nodes_ref, _l=lab_ref) -> pa.Table:
            nd = ray.get(_n)
            lb_arr = ray.get(_l)
            ia = t.column("ia").to_numpy(zero_copy_only=False)
            ib = t.column("ib").to_numpy(zero_copy_only=False)
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            la = lb_arr[np.searchsorted(nd, ia)]
            lb = lb_arr[np.searchsorted(nd, ib)]
            m = la != lb
            ia, ib, cnt, la, lb = ia[m], ib[m], cnt[m], la[m], lb[m]
            return pa.table({
                "comp": pa.array(np.concatenate([la, lb]), pa.int64()),
                "cnt": pa.array(np.concatenate([cnt, cnt]), pa.int64()),
                "ia": pa.array(np.concatenate([ia, ia]), pa.int64()),
                "ib": pa.array(np.concatenate([ib, ib]), pa.int64())})

        def pick_min(t: pa.Table) -> pa.Table:
            comp = t.column("comp").to_numpy(zero_copy_only=False)
            if not len(comp):
                z = pa.array([], pa.int64())
                return pa.table({"comp": z, "cnt": z, "ia": z, "ib": z})
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            ia = t.column("ia").to_numpy(zero_copy_only=False)
            ib = t.column("ib").to_numpy(zero_copy_only=False)
            order = np.lexsort((ib, ia, -cnt, comp))
            comp, cnt, ia, ib = (comp[order], cnt[order], ia[order],
                                 ib[order])
            first = segment_starts(comp)
            return pa.table({
                "comp": pa.array(comp[first], pa.int64()),
                "cnt": pa.array(cnt[first], pa.int64()),
                "ia": pa.array(ia[first], pa.int64()),
                "ib": pa.array(ib[first], pa.int64())})

        cand = map_key_partitions(
            edges.map_batches(cross, batch_format="pyarrow"),
            "comp", pick_min).take_all()
        if not cand:
            break

        # driver union-find over component minima (component-scale,
        # halving per round); min label becomes the root so labels stay
        # canonical-min like connected_components
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        nd_sorted = nodes
        lab_of = labels
        cand.sort(key=lambda r: (-int(r["cnt"]), int(r["ia"]),
                                 int(r["ib"])))
        for r in cand:
            ia_, ib_ = int(r["ia"]), int(r["ib"])
            la = int(lab_of[np.searchsorted(nd_sorted, ia_)])
            lb = int(lab_of[np.searchsorted(nd_sorted, ib_)])
            ra, rb = find(la), find(lb)
            if ra == rb:
                continue
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
            mst.append((ia_, ib_, int(r["cnt"])))

        # relabel: map each distinct label to its root, vectorized
        uniq = np.unique(labels)
        root = np.array([find(int(u)) for u in uniq], dtype=np.int64)
        labels = root[np.searchsorted(uniq, labels)]

    mst.sort()
    return pd.DataFrame({
        "ia": pd.Series([a for a, _, _ in mst], dtype="int64"),
        "ib": pd.Series([b for _, b, _ in mst], dtype="int64"),
        "n_users": pd.Series([c for _, _, c in mst], dtype="int64")})

def q_clustering_coefficient(sf_dir: str):
    """GLOBAL CLUSTERING COEFFICIENT (transitivity) of the co-view item
    graph: 3·triangles / wedges. Triangle participation comes from the
    q_item_triangles pipeline (min-vertex wedge generation + edge-set
    hash join; Σ participation = 3T exactly); wedges are Σ d(d−1)/2
    over node degrees (one keyed segment-length pass, mergeable int
    partials). Output is one row of exact integers + floor-ppm ratio."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    tri = q_item_triangles(sf_dir)
    if hasattr(tri, "to_pandas"):
        tri = tri.to_pandas()
    s = int(tri["n_triangles"].sum())        # = 3T

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= 2)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def wedge_partial(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"w": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({"w": pa.array(
            [int((lens * (lens - 1) // 2).sum())], pa.int64())})

    parts = map_key_partitions(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        "node", wedge_partial).take_all()
    w = sum(int(r["w"]) for r in parts)
    return pd.DataFrame([{
        "n_triangles": s // 3,
        "n_wedges": w,
        "cc_ppm": (1_000_000 * s) // w if w else 0}]).astype("int64")

def q_markov_stationary(sf_dir: str):
    """STATIONARY DISTRIBUTION of the per-user event-type Markov chain
    by integer matrix squaring (the q_pca_power idiom on a 5×5 chain):
    transition counts come from one keyed exchange (consecutive events
    per user in (ts, event_id) order — the page_rank edge pass); the
    row-stochastic matrix is quantized to a 10⁶ grid with
    round-half-away and squared 10 times (effective power 2¹⁰ — mixing
    drives every row to the stationary vector), all in exact int64, so
    the unrolled-CTE SQL twin reproduces the estimate bit-for-bit.
    Output: (event_type, pi_micro) — row 0 of the squared matrix."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        col_np, hash_agg, map_key_partitions)

    TYPES = ["click", "error", "purchase", "signup", "view"]
    K, SCALE, SQ = len(TYPES), 1_000_000, 10

    def with_t(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("event_type"),
                          value_set=pa.array(TYPES))
        return pa.table({"user_id": batch.column("user_id"),
                         "ts": batch.column("ts"),
                         "event_id": batch.column("event_id"),
                         "t": pc.cast(idx, pa.int64())})

    def edges(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        tt = col_np(t, "t")
        same = uid[1:] == uid[:-1]
        pk = tt[:-1][same] * K + tt[1:][same]
        u, c = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"])
    trans = hash_agg(
        map_key_partitions(ev.map_batches(with_t,
                                          batch_format="pyarrow"),
                           "user_id", edges,
                           sort_cols=["ts", "event_id"]),
        "pk", [("c", "sum", "c")]).take_all()

    cnt = [[0] * K for _ in range(K)]
    for r in trans:
        cnt[int(r["pk"]) // K][int(r["pk"]) % K] = int(r["c"])

    def rnd(x: int, den: int) -> int:
        ax = (2 * abs(x) * SCALE + den) // (2 * den)
        return ax if x >= 0 else -ax

    p = [[(rnd(cnt[i][j], sum(cnt[i])) if sum(cnt[i]) else
           (SCALE if i == j else 0)) for j in range(K)]
         for i in range(K)]
    for _ in range(SQ):
        w = [[sum(p[i][k] * p[k][j] for k in range(K))
              for j in range(K)] for i in range(K)]
        m2 = max(abs(w[i][j]) for i in range(K) for j in range(K))
        if m2 == 0:
            p = w
            break
        # renormalize each ROW to the 1e6 grid (stochasticity, not max)
        p = [[rnd(w[i][j], sum(w[i])) if sum(w[i]) else 0
              for j in range(K)] for i in range(K)]
    return pd.DataFrame({
        "event_type": TYPES,
        "pi_micro": pd.Series(p[0], dtype="int64")})

def q_modularity(sf_dir: str):
    """NEWMAN MODULARITY of the connected-component partition of the
    co-view graph, exact: Q = Σ_c (e_c/m − (deg_c/2m)²) emitted as the
    integer pair q_num = Σ_c (4m·e_c − deg_c²), q_den = 4m² (no float
    division; for the CC partition every edge is intra-community, so
    Q measures how far the component structure beats the configuration
    model). Components come from stages/graph.connected_components;
    per-component edge/degree sums are one keyed combiner after a
    label hash_join onto the edge list."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.graph import (
        connected_components)
    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(pk >> np.int64(31), pa.int64()),
            "b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= 2).map_batches(
        unpack, batch_format="pyarrow").materialize()

    comp = connected_components(edges, left="a", right="b",
                                node_col="node",
                                label_col="component")
    # comp: (node, component) — label both endpoints
    e1 = hash_join(edges, comp.map_batches(
        lambda t: pa.table({"a": t.column("node"),
                            "ca": t.column("component")}),
        batch_format="pyarrow"), key="a", left_cols=["b"],
        right_cols=["ca"], how="inner",
        left_types={"a": pa.int64(), "b": pa.int64()},
        right_types={"a": pa.int64(), "ca": pa.int64()})

    def epart(t: pa.Table) -> pa.Table:
        c = t.column("ca").to_numpy(zero_copy_only=False)
        u, k = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "ec": pa.array(k.astype(np.int64),
                                        pa.int64())})

    ec = hash_agg(e1.map_batches(epart, batch_format="pyarrow"),
                  "c", [("ec", "sum", "ec")]).to_pandas()

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    degs = hash_join(
        edges.map_batches(sym, batch_format="pyarrow").map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "d": pa.array(np.ones(len(t), np.int64), pa.int64())}),
            batch_format="pyarrow"),
        comp, key="node", left_cols=["d"], right_cols=["component"],
        how="inner",
        left_types={"node": pa.int64(), "d": pa.int64()},
        right_types={"node": pa.int64(), "component": pa.int64()})

    def dpart(t: pa.Table) -> pa.Table:
        c = t.column("component").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "dc": pa.array(np.bincount(
                             inv, weights=d, minlength=len(u))
                             .astype(np.int64), pa.int64())})

    dc = hash_agg(degs.map_batches(dpart, batch_format="pyarrow"),
                  "c", [("dc", "sum", "dc")]).to_pandas()

    m = int(ec["ec"].sum())
    merged = ec.set_index("c").join(dc.set_index("c"), how="outer") \
        .fillna(0).astype("int64")
    q_num = int((4 * m * merged["ec"] - merged["dc"] ** 2).sum())
    return pd.DataFrame([{
        "n_edges": m, "n_components": len(merged),
        "q_num": q_num, "q_den": 4 * m * m}]).astype("int64")
