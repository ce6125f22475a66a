"""Distributed ordered prefix-sum (scan) over a key order.

``keyed_prefix_sum`` computes, for every row, the EXCLUSIVE running sum
of ``value_column`` over all rows with a smaller ``key_column`` — the
`sum(...) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING ... 1 PRECEDING)`
window, at any scale. This is the primitive behind offset assignment:
concat-and-chunk sequence packing (every document's global token start
offset → pack id = offset // budget), global row numbering, and byte
offsets for serialized corpus layouts.

Two-phase scan, the textbook distributed formulation:

1. per-batch partial: one (bucket, sum) row per key-range bucket
   (``bucket = key // bucket_width``) — a tiny combiner output;
2. the bucket totals (bounded: key_range / bucket_width rows) come to
   the driver, where an exclusive prefix over bucket order is computed
   and broadcast via ``ray.put``;
3. one shuffle co-locates each bucket's rows (`groupby(bucket)`), and a
   per-bucket sorted cumsum adds the intra-bucket offsets.

Partitioning assumption: rows within one bucket fit one task
(``bucket_width`` keys per group) — pick ``bucket_width`` so that
``bucket_width × bytes/row`` is a sane block size. Keys need not be
dense or start at zero; duplicates are allowed (ties are ordered by the
optional ``tie_column`` for determinism).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def keyed_prefix_sum(ds, *, key_column: str, value_column: str,
                     bucket_width: int = 100_000,
                     out_column: str = "prefix_sum",
                     tie_column: str | None = None):
    """Dataset → Dataset with ``out_column`` = exclusive prefix sum of
    ``value_column`` in ``key_column`` order (int64). Keys must be
    integral; with duplicate keys, rows tie-break on ``tie_column``.
    """
    import ray
    from ray.data.aggregate import Sum

    def bucket_of(batch: pa.Table) -> pa.Table:
        b = pc.divide(pc.cast(batch.column(key_column), pa.int64()),
                      bucket_width)
        return batch.append_column("_bucket", b)

    bucketed = ds.map_batches(bucket_of, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["_bucket", value_column]).group_by(
            "_bucket").aggregate([(value_column, "sum")])
        return pa.table({
            "_bucket": g.column("_bucket"),
            "bsum": pc.cast(g.column(f"{value_column}_sum"), pa.int64()),
        })

    totals = bucketed.map_batches(
        partial, batch_format="pyarrow").groupby("_bucket").aggregate(
        Sum("bsum", alias_name="bsum")).to_pandas()
    # exclusive prefix over bucket order — bounded by the bucket count.
    # Broadcast as two sorted numpy arrays (ids + prefix), not a Python
    # dict: at 10^12 keys / bucket_width=1e6 that's ~10^6 int64 pairs =
    # 16 MB in the object store vs GBs of dict overhead.
    totals = totals.sort_values("_bucket").reset_index(drop=True)
    bucket_ids = totals["_bucket"].to_numpy().astype(np.int64)
    bucket_prefix = np.concatenate(
        [[0], totals["bsum"].to_numpy().cumsum()[:-1]]).astype(np.int64)
    prefix_ref = ray.put({"ids": bucket_ids, "prefix": bucket_prefix})

    sort_cols = [key_column] + ([tie_column] if tie_column else [])

    def per_bucket(g, *, _ref=prefix_ref):
        g = g.sort_values(sort_cols).reset_index(drop=True)
        vals = g[value_column].to_numpy(dtype="int64")
        lk = ray.get(_ref)
        pos = int(np.searchsorted(lk["ids"], int(g["_bucket"].iloc[0])))
        base = int(lk["prefix"][pos])
        excl = np.concatenate([[0], vals.cumsum()[:-1]]) + base
        g[out_column] = excl
        return g.drop(columns=["_bucket"])

    return bucketed.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")
