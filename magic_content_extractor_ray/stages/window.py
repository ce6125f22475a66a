"""Arrow-native per-key window stages.

``groupby(key).map_groups(fn, batch_format="pandas")`` pays one Python
callback + one pandas DataFrame construction PER KEY — with millions of
tiny groups (per-user windows over an events table) the callback overhead
dominates the actual window math. This module keeps the same single
shuffle but collapses the per-key callbacks to one per HASH PARTITION:

- rows are bucketed by a vectorized key hash (stages/join._bucket_array,
  the same numpy/polars path the partitioned hash join uses), so every
  row of a key lands in exactly one bucket;
- ``groupby("__bucket").map_groups(fn, batch_format="pyarrow")`` hands the
  window function ONE Arrow table per bucket containing all of its keys'
  rows, key-sorted;
- the window math runs over ALL keys at once with numpy segment kernels
  (``np.add.reduceat`` / segmented cumsum / boundary masks) — no per-key
  Python, no pandas conversion.

At cluster scale ``num_buckets`` should be a small multiple of total
cores (each bucket is one task); the shuffle volume is identical to the
per-key groupby it replaces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def map_key_partitions(ds, key: str, fn, *, num_buckets: int = 64,
                       sort_cols: list[str] | None = None,
                       coalesce_rows: int | None = None,
                       producer_expands: bool = False):
    """Hash-partition ``ds`` by ``key`` and call ``fn`` once per partition.

    ``fn(table: pa.Table) -> pa.Table`` receives all rows of every key in
    the partition, sorted by ``[key] + sort_cols`` (defaults to just the
    key), WITHOUT the transient ``__bucket`` column. Keys never straddle
    partitions, so any per-key window computed inside ``fn`` is exact.

    ``coalesce_rows``: when set, the tagged stream is compacted into
    ``num_buckets`` dense blocks with a no-shuffle ``repartition``
    before the exchange (the groupby's all-to-all pays a fixed cost per
    input block × partition; see BASELINE.md union-coalescing). The
    repartition is deliberately NOT a ``batch_size`` on the tagging map:
    map fusion would push that batch size onto the UPSTREAM stage's
    input, serializing any row-expanding producer (a tokenizer emitting
    400 ngrams/doc collapsed to ONE task that way). Use for narrow
    key/value rows; leave None when rows carry large payloads.
    """
    from .join import _bucket_array

    order = [(c, "ascending") for c in ([key] + (sort_cols or []))]

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", _bucket_array(batch.column(key), num_buckets))

    def run(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["__bucket"]).sort_by(order)
        out = fn(t)
        return out.replace_schema_metadata(None)

    kwargs = {}
    if coalesce_rows is not None:
        kwargs["batch_size"] = coalesce_rows
        if producer_expands:
            # the off-unit num_cpus BREAKS operator fusion with the
            # upstream map: fused, the batch size applies to the
            # UPSTREAM stage's input, serializing a row-expanding
            # producer (a tokenizer emitting 400 ngrams/doc collapsed
            # to ONE task that way — dup_passages sf1 68→19 s unfused).
            # For 1:1/shrinking producers fusion is FASTER (one less
            # pass; item_triangles sf1 6→13 s when broken) — default.
            kwargs["num_cpus"] = 1.01
    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          **kwargs).groupby(
        "__bucket").map_groups(run, batch_format="pyarrow")


def segment_starts(keys: np.ndarray) -> np.ndarray:
    """Start indices of each run of equal values in a sorted array."""
    n = len(keys)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    return np.nonzero(new)[0].astype(np.int64)


def segment_lengths(starts: np.ndarray, n: int) -> np.ndarray:
    return np.diff(np.append(starts, n)).astype(np.int64)


def ts_us(col) -> np.ndarray:
    """Arrow timestamp column → int64 microseconds since epoch."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").astype(np.int64)


def col_np(table: pa.Table, name: str) -> np.ndarray:
    col = table.column(name)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False)
