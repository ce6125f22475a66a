"""Explicit partitioned hash join for two LARGE datasets.

Ray Data's portable big-big join pattern (ray_guide "Joins and lookups"):
add ``bucket = hash(key) % B`` to both sides, bring matching buckets
together with ONE groupby shuffle, and join pairwise inside ``map_groups``.
Because ``union`` requires identical schemas, each side's payload columns
ride in a side-specific struct column (null on the other side) — the
combined schema is ``(join key, bucket, side, left_payload, right_payload)``
and the shuffle moves each row exactly once.

Vectorization: payload structs are built zero-copy from the original
columns (``pa.StructArray.from_arrays``), bucket hashes are a numpy
multiply-xor-shift for integer keys (crc32 fallback otherwise), and the
per-bucket join runs as a pyarrow (acero) table join — no Python row loop
anywhere on the path.

Hot keys: choose B ≫ cluster cores and salt known-hot keys into
sub-buckets (append a salt to the bucket hash and replicate the other
side's hot rows per salt) — the per-bucket join is unchanged.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_array(keys, num_buckets: int) -> pa.Array:
    """Deterministic bucket per key. Integer keys: vectorized
    multiply-xor-shift (splitmix-style); other types: crc32 of str."""
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if pa.types.is_integer(arr.type):
        x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(31))
        return pa.array((x % np.uint64(num_buckets)).astype(np.int64))
    vals = np.fromiter(
        (zlib.crc32(str(v).encode()) % num_buckets for v in arr.to_pylist()),
        dtype=np.int64, count=len(arr))
    return pa.array(vals)


def _pack_side(batch: pa.Table, *, key: str, side: str, cols: list[str],
               left_type: pa.DataType, right_type: pa.DataType,
               num_buckets: int) -> pa.Table:
    n = len(batch)
    keys = batch.column(key)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()

    def struct_of(t: pa.DataType) -> pa.Array:
        children = [
            (batch.column(c).combine_chunks()
             if isinstance(batch.column(c), pa.ChunkedArray)
             else batch.column(c))
            for c in cols]
        return pa.StructArray.from_arrays(children, fields=list(t))

    mine = struct_of(left_type if side == "L" else right_type)
    return pa.Table.from_arrays(
        [
            keys,
            _bucket_array(keys, num_buckets),
            pa.array([side] * n, pa.string()),
            mine if side == "L" else pa.nulls(n, left_type),
            mine if side == "R" else pa.nulls(n, right_type),
        ],
        names=["join_key", "bucket", "side", "left_payload", "right_payload"])


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], num_buckets: int = 64,
              how: str = "inner"):
    """Join two Datasets on ``key``; returns a Dataset with columns
    [key, *left_cols, *right_cols]. One shuffle total (the bucket groupby);
    each bucket joins with a pyarrow table join inside ``map_groups``.
    ``how`` ∈ {'inner', 'left'} (left = left outer)."""
    join_type = {"inner": "inner", "left": "left outer"}[how]

    # infer payload struct types from the datasets' schemas
    lschema = left.schema()
    rschema = right.schema()
    ltype = pa.struct([(c, lschema.base_schema.field(c).type)
                       for c in left_cols])
    rtype = pa.struct([(c, rschema.base_schema.field(c).type)
                       for c in right_cols])

    packed_l = left.select_columns([key, *left_cols]).map_batches(
        _pack_side, batch_format="pyarrow",
        fn_kwargs=dict(key=key, side="L", cols=left_cols, left_type=ltype,
                       right_type=rtype, num_buckets=num_buckets))
    packed_r = right.select_columns([key, *right_cols]).map_batches(
        _pack_side, batch_format="pyarrow",
        fn_kwargs=dict(key=key, side="R", cols=right_cols, left_type=ltype,
                       right_type=rtype, num_buckets=num_buckets))

    empty_schema = pa.schema(
        [(key, lschema.base_schema.field(key).type)]
        + [(c, ltype.field(c).type) for c in left_cols]
        + [(c, rtype.field(c).type) for c in right_cols])

    def join_bucket(g: pa.Table) -> pa.Table:
        mask_l = pc.equal(g.column("side"), "L")
        lrows = g.filter(mask_l)
        rrows = g.filter(pc.invert(mask_l))
        if len(lrows) == 0 or (len(rrows) == 0 and join_type == "inner"):
            return empty_schema.empty_table()
        lpay = lrows.column("left_payload").combine_chunks()
        ltab = pa.table(
            {key: lrows.column("join_key"),
             **{c: pc.struct_field(lpay, c) for c in left_cols}})
        rpay = rrows.column("right_payload").combine_chunks()
        rtab = pa.table(
            {key: rrows.column("join_key"),
             **{c: pc.struct_field(rpay, c) for c in right_cols}})
        return ltab.join(rtab, keys=key, join_type=join_type).select(
            [key, *left_cols, *right_cols])

    return packed_l.union(packed_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow")
