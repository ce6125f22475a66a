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

Hot keys: pass ``hot_keys`` (known-skewed key values — from a pre-count
or domain knowledge) and each hot key is SALTED across ``num_salts``
sub-buckets: left rows with a hot key spread round-robin over the salts,
right rows with that key replicate into every salt, so no single task
ever holds a hot key's full row set. The per-bucket join is unchanged and
results are exactly equal to the unsalted join.
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
               num_buckets: int, hot_index: dict | None = None,
               num_salts: int = 8) -> pa.Table:
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

    if hot_index and side == "R":
        # replicate right-side hot rows into every salt sub-bucket
        hot_mask = np.array([k in hot_index for k in keys.to_pylist()])
        if hot_mask.any():
            idx = np.nonzero(hot_mask)[0]
            rep = np.concatenate(
                [np.arange(n)[~hot_mask]] + [idx] * num_salts)
            salts = np.concatenate(
                [np.full((~hot_mask).sum(), -1, dtype=np.int64)]
                + [np.full(len(idx), s, dtype=np.int64)
                   for s in range(num_salts)])
            batch = batch.take(pa.array(rep))
            keys = batch.column(key)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            n = len(batch)
            salt = salts
        else:
            salt = np.full(n, -1, dtype=np.int64)
    elif hot_index:
        # spread left-side hot rows round-robin over the salts
        hot_mask = np.array([k in hot_index for k in keys.to_pylist()])
        salt = np.full(n, -1, dtype=np.int64)
        salt[hot_mask] = np.arange(int(hot_mask.sum())) % num_salts
    else:
        salt = None

    buckets = _bucket_array(keys, num_buckets)
    if salt is not None and (salt >= 0).any():
        b = buckets.to_numpy(zero_copy_only=False).copy()
        hot_ids = np.array([hot_index.get(k, -1)
                            for k in keys.to_pylist()], dtype=np.int64)
        m = salt >= 0
        # hot keys own a dedicated bucket range past the normal space
        b[m] = num_buckets + hot_ids[m] * num_salts + salt[m]
        buckets = pa.array(b)

    mine = struct_of(left_type if side == "L" else right_type)
    return pa.Table.from_arrays(
        [
            keys,
            buckets,
            pa.array([side] * n, pa.string()),
            mine if side == "L" else pa.nulls(n, left_type),
            mine if side == "R" else pa.nulls(n, right_type),
        ],
        names=["join_key", "bucket", "side", "left_payload", "right_payload"])


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], num_buckets: int = 64,
              how: str = "inner", hot_keys=None, num_salts: int = 8):
    """Join two Datasets on ``key``; returns a Dataset with columns
    [key, *left_cols, *right_cols]. One shuffle total (the bucket groupby);
    each bucket joins with a pyarrow table join inside ``map_groups``.
    ``how`` ∈ {'inner', 'left'} (left = left outer). ``hot_keys`` salts the
    named skewed keys across ``num_salts`` sub-buckets (left spreads,
    right replicates) — identical results, bounded per-task key volume."""
    join_type = {"inner": "inner", "left": "left outer",
                 "full": "full outer"}[how]
    if how == "full" and hot_keys:
        # salting replicates the right side across sub-buckets, which
        # would emit one unmatched-right row PER SALT under full outer
        raise ValueError("hot_keys salting is not valid with how='full'")
    hot_index = ({k: i for i, k in enumerate(hot_keys)}
                 if hot_keys else None)

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
                       right_type=rtype, num_buckets=num_buckets,
                       hot_index=hot_index, num_salts=num_salts))
    packed_r = right.select_columns([key, *right_cols]).map_batches(
        _pack_side, batch_format="pyarrow",
        fn_kwargs=dict(key=key, side="R", cols=right_cols, left_type=ltype,
                       right_type=rtype, num_buckets=num_buckets,
                       hot_index=hot_index, num_salts=num_salts))

    empty_schema = pa.schema(
        [(key, lschema.base_schema.field(key).type)]
        + [(c, ltype.field(c).type) for c in left_cols]
        + [(c, rtype.field(c).type) for c in right_cols])

    def join_bucket(g: pa.Table) -> pa.Table:
        mask_l = pc.equal(g.column("side"), "L")
        lrows = g.filter(mask_l)
        rrows = g.filter(pc.invert(mask_l))
        if join_type == "full outer":
            if len(lrows) == 0 and len(rrows) == 0:
                return empty_schema.empty_table()
        elif len(lrows) == 0 or (len(rrows) == 0 and
                                 join_type == "inner"):
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
