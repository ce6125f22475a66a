"""Sequence packing: greedy-pack documents into fixed token budgets.

Training pipelines batch documents into fixed-length contexts (e.g. 4k/8k
tokens); packing efficiency directly sets achieved tokens/step. Distributed
shape: token counts come from the vectorized textops stage; packing runs
per-block with a greedy first-fit over the block's docs (blocks are
independent, so packing parallelizes; cross-block fragmentation is bounded
by one partial pack per block and is reported, not hidden). A document
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


def pack_documents(ds, *, budget: int = 4096, id_column: str = "doc_id",
                   text_column: str = "text", batch_size: int = 2048):
    """documents → token counts → per-block greedy packs."""
    from .textops import token_counts

    counted = ds.map_batches(
        token_counts, batch_format="pyarrow",
        fn_kwargs={"column": text_column}).select_columns(
        [id_column, "n_tokens"])
    return counted.map_batches(
        pack_batch, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs=dict(budget=budget, id_column=id_column))
