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

    ``coalesce_rows``: when set, it is applied as ``batch_size`` on the
    tagging map so the exchange sees dense input blocks (the groupby's
    all-to-all pays a fixed cost per input block × partition; see
    BASELINE.md union-coalescing). CAVEAT — map fusion: Ray fuses the
    tagging map with the upstream stage, so that batch size applies to
    the UPSTREAM stage's INPUT. For 1:1/shrinking producers that is
    faster (one fewer pass); for a ROW-EXPANDING producer (a tokenizer
    emitting 400 ngrams/doc) it batches ~coalesce_rows producer inputs
    into one task and serializes the stage (dup_passages sf1: 68 s fused
    vs 19 s broken). Pass ``producer_expands=True`` for row-expanding
    producers: it breaks the fusion (via an off-unit num_cpus) so the
    batch size only compacts the already-expanded rows. Use for narrow
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


def hash_agg(ds, key: str, aggs, *, group_cols: list[str] | None = None,
             num_buckets: int = 64, coalesce_rows: int | None = 65536,
             producer_expands: bool = False):
    """``groupby(group_cols).aggregate(...)`` for HIGH-CARDINALITY groups.

    Ray's sort-based aggregate pays a Python callback per GROUP when it
    combines sorted runs — with row-scale group counts (one group per
    content hash in exact dedup, per candidate pair in LSH dedup, per
    packed item pair in co-occurrence mining: 2M groups took 146 s on 4
    cpus) that Python loop dominates. Same single shuffle here, but each
    hash partition is aggregated by Arrow's C++ ``Table.group_by`` — one
    callback per PARTITION, vectorized inside.

    ``aggs``: list of ``(column, fn, alias)`` with fn ∈ {sum, min, max,
    count, count_all} (count_all = row count, column ignored).
    ``group_cols`` defaults to ``[key]``; ``key`` must be a member —
    composite groups never straddle partitions because every row of a
    key lands in one partition. Output schema: (*group_cols, *aliases);
    sum/min/max preserve the input column type.
    """
    import pyarrow.compute as pc

    groups = list(group_cols or [key])
    assert key in groups

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(groups).aggregate(
            [(([] if fn == "count_all" else col), fn)
             for col, fn, _ in aggs])
        cols = {c: g.column(c) for c in groups}
        for col, fn, alias in aggs:
            out = g.column(f"{col}_{fn}" if fn != "count_all"
                           else "count_all")
            if fn in ("sum", "min", "max"):
                out = pc.cast(out, t.schema.field(col).type)
            cols[alias] = out
        return pa.table(cols)

    return map_key_partitions(ds, key, agg, num_buckets=num_buckets,
                              coalesce_rows=coalesce_rows,
                              producer_expands=producer_expands)


def hash_sum(ds, key: str, value: str, alias: str, *,
             num_buckets: int = 64, coalesce_rows: int | None = 65536):
    """``groupby(key).sum(value)`` — see hash_agg."""
    return hash_agg(ds, key, [(value, "sum", alias)],
                    num_buckets=num_buckets, coalesce_rows=coalesce_rows)


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
