"""Sequence packing: greedy-pack documents into fixed token budgets.

Training pipelines batch documents into fixed-length contexts (e.g. 4k/8k
tokens); packing efficiency directly sets achieved tokens/step. Distributed
shape: token counts come from the vectorized textops stage; packing runs
one task per hash partition over deterministically-ordered fixed-size
chunks (``pack_deterministic`` — partitions are independent, so packing
parallelizes; cross-chunk fragmentation is bounded by one partial pack
per chunk and is reported, not hidden). A document
longer than the budget becomes its own SINGLETON OVERFLOW pack
(``is_overflow=true``) carrying its true token count — consumers that
split long documents across contexts can do so downstream; nothing is
silently truncated and tokens/step accounting stays exact.

Output: one row per pack —
(pack_key, doc_ids, n_docs, total_tokens, fill, is_overflow).
"""

from __future__ import annotations

import pyarrow as pa


def pack_batch(batch: pa.Table, *, budget: int = 4096,
               id_column: str = "doc_id",
               tokens_column: str = "n_tokens") -> pa.Table:
    """Greedy first-fit-decreasing packing within one block."""
    ids = batch.column(id_column).to_pylist()
    toks = batch.column(tokens_column).to_pylist()
    order = sorted(range(len(ids)), key=lambda i: -toks[i])

    packs: list[list[int]] = []
    loads: list[int] = []
    overflow: list[bool] = []
    for i in order:
        t = toks[i]
        if t > budget:  # singleton overflow pack, true count reported
            packs.append([i])
            loads.append(t)
            overflow.append(True)
            continue
        placed = False
        for p in range(len(packs)):
            if not overflow[p] and loads[p] + t <= budget:
                packs[p].append(i)
                loads[p] += t
                placed = True
                break
        if not placed:
            packs.append([i])
            loads.append(t)
            overflow.append(False)

    first_ids = [str(ids[p[0]]) for p in packs]
    return pa.table({
        "pack_key": pa.array(first_ids, pa.string()),
        "doc_ids": pa.array([[str(ids[i]) for i in p] for p in packs],
                            pa.list_(pa.string())),
        "n_docs": pa.array([len(p) for p in packs], pa.int64()),
        "total_tokens": pa.array(loads, pa.int64()),
        "fill": pa.array([round(min(l, budget) / budget, 4) for l in loads],
                         pa.float64()),
        "is_overflow": pa.array(overflow, pa.bool_()),
    })


def pack_deterministic(counted, *, budget: int = 4096,
                       id_column: str = "doc_id",
                       tokens_column: str = "n_tokens",
                       order_column: str | None = None,
                       num_buckets: int = 64, chunk: int = 2048):
    """Scheduling-independent packing of a (id, n_tokens) Dataset.

    Naive ``map_batches(pack_batch)`` packs whatever rows the executor
    happened to put in each block — pack membership (and even the pack
    COUNT) then varies run-to-run with task scheduling, which breaks
    reproducible-training guarantees and any snapshot-based regression
    check. Here rows are hash-partitioned by ``order_column`` (default:
    the id), each partition is sorted by it, and fixed ``chunk``-row
    slices are packed independently — pack assignment becomes a pure
    function of the row set. Pass a precomputed shuffle key as
    ``order_column`` to get a deterministic EPOCH-SHUFFLED packing.
    One shuffle; one task per bucket (size ``num_buckets`` to the
    cluster)."""
    from .window import map_key_partitions

    key = order_column or id_column

    def run(part: pa.Table) -> pa.Table:
        outs = [pack_batch(part.slice(s, chunk), budget=budget,
                           id_column=id_column, tokens_column=tokens_column)
                for s in range(0, max(len(part), 1), chunk)]
        return pa.concat_tables(outs)

    return map_key_partitions(counted, key, run, num_buckets=num_buckets)


def pack_documents(ds, *, budget: int = 4096, id_column: str = "doc_id",
                   text_column: str = "text", batch_size: int = 2048,
                   num_buckets: int = 64):
    """documents → token counts → deterministic greedy packs."""
    from .textops import token_counts

    counted = ds.map_batches(
        token_counts, batch_format="pyarrow",
        fn_kwargs={"column": text_column}).select_columns(
        [id_column, "n_tokens"])
    return pack_deterministic(counted, budget=budget, id_column=id_column,
                              num_buckets=num_buckets, chunk=batch_size)


def verify_pack_invariants(packs, counted=None, *, budget: int,
                           id_column: str = "doc_id",
                           tokens_column: str = "n_tokens",
                           num_buckets: int = 64, chunk: int = 2048):
    """Independent in-run anchors for the packing snapshot oracles —
    RAISES on violation, so every invocation (driver gate, bench,
    tests) re-proves the packer instead of trusting the frozen
    snapshot alone:

    - capacity: every non-overflow pack fits the budget; every overflow
      pack is a true singleton heavier than it;
    - any-fit optimality: first-fit leaves at most ONE ≤half-full bin
      per packed chunk (two such bins contradict first-fit: the later
      one's first item would have fit in the earlier), so
      #half-empty-packs ≤ #chunks — a bin-count bound against the
      trivial lower bound ⌈Σtokens/budget⌉ follows;
    - conservation (when ``counted`` — the same (id, n_tokens) Dataset
      the packer consumed — is given): Σ n_docs and Σ total_tokens
      equal the corpus totals, recounted here with the SAME
      deterministic bucketing the packer used, so the chunk count for
      the bound is exact, not estimated.

    ``packs``: pandas frame with (n_docs, total_tokens, is_overflow).
    Driver-side work is O(#packs + num_buckets) — never corpus rows."""
    import numpy as np
    import pyarrow as pa

    nono = packs[~packs["is_overflow"]]
    over = packs[packs["is_overflow"]]
    if not (nono["total_tokens"] <= budget).all():
        raise AssertionError("pack over budget without overflow flag")
    if not ((over["n_docs"] == 1).all()
            and (over["total_tokens"] > budget).all()):
        raise AssertionError("overflow pack is not a >budget singleton")
    if counted is None:
        return
    from .join import _bucket_array

    def per_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"b": z, "rows": z, "toks": z})
        b = _bucket_array(t.column(id_column), num_buckets).to_numpy(
            zero_copy_only=False)
        toks = t.column(tokens_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = np.bincount(b, minlength=num_buckets).astype(np.int64)
        tk = np.zeros(num_buckets, np.int64)
        np.add.at(tk, b, toks)
        return pa.table({
            "b": pa.array(np.arange(num_buckets, dtype=np.int64)),
            "rows": pa.array(rows), "toks": pa.array(tk)})

    rows = np.zeros(num_buckets, np.int64)
    toks = 0
    for r in counted.map_batches(per_bucket,
                                 batch_format="pyarrow").take_all():
        rows[int(r["b"])] += int(r["rows"])
        toks += int(r["toks"])
    if int(packs["n_docs"].sum()) != int(rows.sum()):
        raise AssertionError("packing lost or duplicated documents")
    if int(packs["total_tokens"].sum()) != toks:
        raise AssertionError("packing lost or duplicated tokens")
    n_chunks = int(np.ceil(rows / chunk).sum())
    half_empty = int((~packs["is_overflow"]
                      & (packs["total_tokens"] * 2 <= budget)).sum())
    if half_empty > n_chunks:
        raise AssertionError(
            f"{half_empty} half-empty packs > {n_chunks} chunks — "
            "first-fit invariant broken")
