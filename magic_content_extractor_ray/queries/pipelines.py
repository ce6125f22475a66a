"""Composed pipelines: training preprocessing, curation, packing, scheduling.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _read_pq  # noqa: F401


def q_pack_sequences(sf_dir: str):
    """Sequence packing for training contexts (stages/packing.py): greedy
    per-block packs of documents into a 2048-token budget. The snapshot
    oracle is anchored IN-QUERY by verify_pack_invariants — capacity,
    overflow shape, doc/token conservation against an independent
    recount, and the first-fit ≤1-half-empty-bin-per-chunk optimality
    bound — so every driver-gate run re-proves the packer."""
    from magic_content_extractor_ray.stages.packing import (
        pack_documents, verify_pack_invariants)
    from magic_content_extractor_ray.stages.textops import token_counts

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = pack_documents(docs, budget=2048).drop_columns(
        ["doc_ids"]).sort("pack_key").to_pandas()
    counted = docs.map_batches(
        token_counts, batch_format="pyarrow",
        fn_kwargs={"column": "text"}).select_columns(
        ["doc_id", "n_tokens"])
    verify_pack_invariants(out, counted, budget=2048)
    return out

def q_training_pipeline(sf_dir: str):
    """The COMPOSED training-data preprocessing job (quality gate → exact
    dedup semi-join → MinHash near-dup pruning → sequence packing) as one
    streaming pipeline — pipelines/training_pipeline.py. Rows-only check
    (FFD packing is not SQL-expressible); each constituent operator has
    its own oracle/test elsewhere."""
    from magic_content_extractor_ray.pipelines.training_pipeline import (
        run_training_pipeline)

    from magic_content_extractor_ray.stages.packing import (
        verify_pack_invariants)

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])
    packs, _ = run_training_pipeline(ds, budget=1024, collect_funnel=False)
    out = packs.drop_columns(["doc_ids"]).sort("pack_key").to_pandas()
    # capacity + overflow-shape anchors (the packer's input set is the
    # pipeline-filtered corpus, so conservation is checked upstream by
    # the quality/dedup oracles instead)
    verify_pack_invariants(out, None, budget=1024)
    return out

def q_token_waterfill(sf_dir: str):
    """WATER-FILLING token budget allocation across sources (the data-
    mixing step that caps over-represented sources so a 50%-of-corpus
    budget is spent as evenly as possible): water level T* = the max
    integer with Σ min(nᵢ, T) ≤ B, found over the exact candidate set
    {nᵢ} ∪ {(B − P_{k−1}) // (m−k+1)} (P = ascending prefix sums);
    the L = B − Σ min(nᵢ, T*) leftover tokens go one each to the L
    largest sources above the level, ordered (n desc, source asc) —
    all integer arithmetic, no float water level. The corpus-scale
    part is the token count (one tokenize-combiner pass); the m-source
    optimization is driver-side on an m-row aggregate."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"), pa.int64())
        out = pa.table({"source": t.column("source"), "nt": nt})
        return out.group_by(["source"]).aggregate(
            [("nt", "sum")]).rename_columns(["source", "nt"])

    per_src = hash_sum(docs.map_batches(counts, batch_format="pyarrow"),
                       "source", "nt", "n_tokens").to_pandas()
    per_src = per_src.sort_values("source").reset_index(drop=True)
    n = per_src["n_tokens"].to_numpy().astype(np.int64)
    srcs = per_src["source"].to_numpy()
    total = int(n.sum())
    B = total // 2
    m = len(n)

    order = np.lexsort((srcs, n))            # ascending (n, source)
    ns = n[order]
    prefix = np.concatenate([[0], np.cumsum(ns)[:-1]])
    cands = set(int(x) for x in ns)
    for k in range(m):
        rem = m - k
        cands.add(max(0, (B - int(prefix[k])) // rem))

    def f(T: int) -> int:
        return int(np.minimum(n, T).sum())

    tstar = max((T for T in cands if f(T) <= B), default=0)
    base = np.minimum(n, tstar)
    L = B - int(base.sum())
    above = n > tstar
    bonus = np.zeros(m, np.int64)
    if L > 0 and above.any():
        pri = np.lexsort((srcs, -n))         # (n desc, source asc)
        pri = [i for i in pri if above[i]][:L]
        bonus[pri] = 1
    return pd.DataFrame({
        "source": srcs,
        "n_tokens": pd.Series(n, dtype="int64"),
        "alloc": pd.Series(base + bonus, dtype="int64")}).sort_values(
        "source").reset_index(drop=True)

def q_curriculum_order(sf_dir: str):
    """CURRICULUM data ordering (easy→hard with per-source
    interleaving): docs are NTILE(10)-bucketed by length (exact SQL
    NTILE semantics — first n%10 deciles take the extra row), ranked
    within (decile, source), and the final training position orders by
    (decile, within-rank, source) — so consecutive positions cycle
    round-robin across sources inside each difficulty bucket instead
    of streaming one source at a time (the mixing property curriculum
    schedules need). Three exchanges, all integer: a two-phase
    prefix-sum global rank for the deciles, one keyed exchange for
    within-(decile, source) ranks, and a second prefix-sum over the
    packed (decile, rank, source) key for the global position — no
    global sort materializes anywhere."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    import ray

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "n_chars"])
    n_total = docs.count()
    q, r = divmod(n_total, 10)

    srcs = sorted({x["source"] for x in docs.map_batches(
        lambda t: pa.table({"source": t.column("source")}),
        batch_format="pyarrow").groupby("source").count().take_all()})
    sidx = {s: i for i, s in enumerate(srcs)}
    m = len(srcs)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "source": t.column("source"),
            "one": pa.array(np.ones(len(t), np.int64))})

    ranked = keyed_prefix_sum(
        docs.map_batches(prep, batch_format="pyarrow"),
        key_column="v", value_column="one", tie_column="doc_id",
        out_column="rk", bucket_width=256)

    def decile_key(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rk"].to_numpy(dtype="int64") + 1       # 1-based
        cut = r * (q + 1)
        first = rank <= cut
        dec = np.where(first, 1 + (rank - 1) // max(q + 1, 1),
                       1 + r + (rank - cut - 1) // max(q, 1)) \
            .astype(np.int64)
        si = df["source"].map(sidx).to_numpy(dtype="int64")
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "v": df["v"].astype("int64"),
            "ds": dec * m + si,
            "decile": dec})
        return out

    keyed = ranked.map_batches(decile_key, batch_format="pandas")

    def within_rank(t: pa.Table) -> pa.Table:
        ds_ = t.column("ds").to_numpy(zero_copy_only=False)
        if not len(ds_):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "decile": z, "pk": z,
                             "one": z})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dec = t.column("decile").to_numpy(zero_copy_only=False)
        starts = segment_starts(ds_)
        lens = segment_lengths(starts, len(ds_))
        rr = np.arange(len(ds_), dtype=np.int64) - \
            np.repeat(starts, lens)
        si = ds_ - dec * m
        pk = (dec << np.int64(46)) | (rr << np.int64(6)) | si
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "decile": pa.array(dec, pa.int64()),
            "pk": pa.array(pk, pa.int64()),
            "one": pa.array(np.ones(len(ds_), np.int64), pa.int64())})

    wr = map_key_partitions(keyed, "ds", within_rank,
                            sort_cols=["v", "doc_id"])

    pos = keyed_prefix_sum(wr, key_column="pk", value_column="one",
                           out_column="position",
                           bucket_width=1 << 46)
    return pos.map_batches(
        lambda df: df[["doc_id", "decile", "position"]].astype("int64"),
        batch_format="pandas").sort("doc_id")

def q_padding_waste(sf_dir: str):
    """PADDING-WASTE accounting for fixed-size training batches (the
    systems argument for length-bucketed batching): batches of 16 and
    64 docs are formed in doc_id order ('random') and in
    (n_chars, doc_id) order ('sorted'); every batch pads to its max
    length, waste_ppm = 10⁶·(padded − real) // padded. All integers:
    batch ids come from the two-phase prefix-sum rank (rank // b), the
    per-batch (rows, max, sum) reduce is one combiner groupby per
    configuration — no global sort is materialized."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64))})

    base = docs.map_batches(prep, batch_format="pyarrow")
    rows = []
    for ordering, key, tie, width in (
            ("random", "doc_id", None, 100_000),
            ("sorted", "v", "doc_id", 256)):
        ranked = keyed_prefix_sum(base, key_column=key,
                                  value_column="one", tie_column=tie,
                                  out_column="rk", bucket_width=width)
        for b in (16, 64):
            def tag(df: pd.DataFrame, _b=b) -> pd.DataFrame:
                return pd.DataFrame({
                    "bid": df["rk"].to_numpy(dtype="int64") // _b,
                    "v": df["v"].astype("int64"),
                    "one": np.ones(len(df), np.int64)})

            agg = hash_agg(
                ranked.map_batches(tag, batch_format="pandas"),
                "bid", [("one", "sum", "rows"), ("v", "max", "mx"),
                        ("v", "sum", "sv")]).to_pandas()
            padded = int((agg["rows"].astype("int64")
                          * agg["mx"].astype("int64")).sum())
            real = int(agg["sv"].sum())
            rows.append({
                "ordering": ordering, "batch_size": b,
                "n_batches": len(agg),
                "waste_ppm": (1_000_000 * (padded - real)) // padded})
    return pd.DataFrame(rows).astype(
        {"batch_size": "int64", "n_batches": "int64",
         "waste_ppm": "int64"}).sort_values(
        ["ordering", "batch_size"]).reset_index(drop=True)

def q_curation_pipeline(sf_dir: str):
    """END-TO-END CORPUS CURATION: quality gate (≥10 tokens) → exact
    dedup (min doc id per md5) → per-source token caps by water-filling
    half the surviving budget → greedy per-source truncation in doc_id
    order → curriculum position (length deciles, round-robin across
    sources). The four stages each reuse a proven exchange shape
    (content-hash exchange, source combiner + driver waterfill on the
    m-row aggregate, per-source cumsum exchange, prefix-sum deciles +
    packed-rank position scan) and the WHOLE composition is verified by
    one SQL twin — the training_pipeline complement where every stage
    is SQL-expressible. Output: (doc_id, source, n_tokens, position)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    MIN_TOKENS = 10

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"), pa.int64())
        keep = pc.greater_equal(nt, MIN_TOKENS)
        t2 = t.filter(keep)
        texts = t2.column("text").to_pylist()
        hh = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
              for x in texts]
        return pa.table({
            "h": pa.array(hh, pa.string()),
            "doc_id": pc.cast(t2.column("doc_id"), pa.int64()),
            "source": t2.column("source"),
            "nt": nt.filter(keep)})

    def dedup_min(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        if not len(h):
            return t.select(["doc_id", "source", "nt"])
        starts = segment_starts(h)   # sorted by (h, doc_id)
        return t.take(pa.array(starts)).select(
            ["doc_id", "source", "nt"])

    surv = map_key_partitions(
        docs.map_batches(keyed, batch_format="pyarrow"),
        "h", dedup_min, sort_cols=["doc_id"]).materialize()

    per_src = hash_agg(surv, "source",
                       [("nt", "sum", "n_tokens")]).to_pandas()
    per_src = per_src.sort_values("source").reset_index(drop=True)
    n = per_src["n_tokens"].to_numpy().astype(np.int64)
    srcs = per_src["source"].to_numpy()
    total, m = int(n.sum()), len(n)
    B = total // 2
    order = np.lexsort((srcs, n))
    ns_sorted = n[order]
    prefix = np.concatenate([[0], np.cumsum(ns_sorted)[:-1]])
    cands = set(int(x) for x in ns_sorted)
    for kk in range(m):
        cands.add(max(0, (B - int(prefix[kk])) // (m - kk)))
    tstar = max((T for T in cands
                 if int(np.minimum(n, T).sum()) <= B), default=0)
    base = np.minimum(n, tstar)
    L = B - int(base.sum())
    bonus = np.zeros(m, np.int64)
    above = n > tstar
    if L > 0 and above.any():
        pri = [i for i in np.lexsort((srcs, -n)) if above[i]][:L]
        bonus[pri] = 1
    alloc = {s: int(a) for s, a in zip(srcs, base + bonus)}
    aref = ray.put(alloc)

    def cap(t: pa.Table, _a=aref) -> pa.Table:
        al = ray.get(_a)
        s = t.column("source").to_numpy(zero_copy_only=False)
        if not len(s):
            return t
        nt = t.column("nt").to_numpy(zero_copy_only=False)
        starts = segment_starts(s)
        lens = segment_lengths(starts, len(s))
        cum = np.cumsum(nt)
        cum0 = cum - nt - np.repeat((cum - nt)[starts], lens)
        lim = np.array([al.get(x, 0) for x in s[starts]], np.int64)
        keep = cum0 + nt <= np.repeat(lim, lens)
        return t.filter(pa.array(keep))

    capped = map_key_partitions(surv, "source", cap,
                                sort_cols=["doc_id"]).materialize()

    # curriculum position over the capped survivors (the
    # q_curriculum_order shape on (doc_id, source, nt))
    n_total = capped.count()
    q10, r10 = divmod(n_total, 10)

    src_list = sorted(alloc)
    sidx = {s: i for i, s in enumerate(src_list)}
    mm = len(src_list)

    ranked = keyed_prefix_sum(
        capped.map_batches(
            lambda t: pa.table({
                "v": t.column("nt"),
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "one": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        key_column="v", value_column="one", tie_column="doc_id",
        out_column="rk", bucket_width=64)

    def decile_key(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rk"].to_numpy(dtype="int64") + 1
        cut = r10 * (q10 + 1)
        first = rank <= cut
        dec = np.where(first, 1 + (rank - 1) // max(q10 + 1, 1),
                       1 + r10 + (rank - cut - 1) // max(q10, 1)) \
            .astype(np.int64)
        si = df["source"].map(sidx).to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"],
            "v": df["v"].astype("int64"),
            "ds": dec * mm + si, "decile": dec})

    keyed2 = ranked.map_batches(decile_key, batch_format="pandas")

    def within_rank(t: pa.Table) -> pa.Table:
        ds_ = t.column("ds").to_numpy(zero_copy_only=False)
        if not len(ds_):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z,
                             "source": pa.array([], pa.string()),
                             "v": z, "pk": z, "one": z})
        dec = t.column("decile").to_numpy(zero_copy_only=False)
        starts = segment_starts(ds_)
        lens = segment_lengths(starts, len(ds_))
        rr = np.arange(len(ds_), dtype=np.int64) - \
            np.repeat(starts, lens)
        si = ds_ - dec * mm
        pk = (dec << np.int64(46)) | (rr << np.int64(6)) | si
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "v": t.column("v"),
            "pk": pa.array(pk, pa.int64()),
            "one": pa.array(np.ones(len(ds_), np.int64), pa.int64())})

    wr = map_key_partitions(keyed2, "ds", within_rank,
                            sort_cols=["v", "doc_id"])
    pos = keyed_prefix_sum(wr, key_column="pk", value_column="one",
                           out_column="position",
                           bucket_width=1 << 46)
    return pos.map_batches(
        lambda df: df[["doc_id", "source", "v", "position"]].rename(
            columns={"v": "n_tokens"}),
        batch_format="pandas").sort("doc_id")
