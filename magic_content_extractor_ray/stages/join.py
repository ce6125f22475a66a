"""Explicit partitioned hash join for two LARGE datasets.

Ray Data's portable big-big join pattern (ray_guide "Joins and lookups"):
add ``bucket = hash(key) % B`` to both sides, bring matching buckets
together with ONE groupby shuffle, and join pairwise inside ``map_groups``.
Because ``union`` requires identical schemas, each side's payload columns
ride in a side-specific struct column (null on the other side) — the
combined schema is ``(join key, bucket, side, left_payload, right_payload)``
and the shuffle moves each row exactly once.

Hot keys: choose B ≫ cluster cores and salt known-hot keys into
sub-buckets (append a salt to the bucket hash and replicate the other
side's hot rows per salt) — the per-bucket join is unchanged.
"""

from __future__ import annotations

import zlib

import pyarrow as pa


def _bucket_of(values, num_buckets: int):
    return [zlib.crc32(str(v).encode()) % num_buckets for v in values]


def _pack_side(batch: pa.Table, *, key: str, side: str, cols: list[str],
               left_type: pa.DataType, right_type: pa.DataType,
               num_buckets: int) -> pa.Table:
    n = len(batch)
    keys = batch.column(key).to_pylist()
    payload = [
        {c: v for c, v in zip(cols, row)}
        for row in zip(*(batch.column(c).to_pylist() for c in cols))
    ] if cols else [{} for _ in range(n)]
    nulls_l = pa.nulls(n, left_type)
    nulls_r = pa.nulls(n, right_type)
    return pa.Table.from_arrays(
        [
            pa.array(keys),
            pa.array(_bucket_of(keys, num_buckets), pa.int64()),
            pa.array([side] * n, pa.string()),
            pa.array(payload, left_type) if side == "L" else nulls_l,
            pa.array(payload, right_type) if side == "R" else nulls_r,
        ],
        names=["join_key", "bucket", "side", "left_payload", "right_payload"])


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], num_buckets: int = 64,
              how: str = "inner"):
    """Join two Datasets on ``key``; returns a Dataset with columns
    [key, *left_cols, *right_cols]. One shuffle total (the bucket groupby);
    each bucket joins in pandas inside ``map_groups``."""
    import pandas as pd

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

    def join_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        lrows = g[g["side"] == "L"]
        rrows = g[g["side"] == "R"]
        if lrows.empty or (rrows.empty and how == "inner"):
            cols = {key: []}
            cols.update({c: [] for c in left_cols})
            cols.update({c: [] for c in right_cols})
            return pd.DataFrame(cols)
        ldf = pd.DataFrame(
            {key: lrows["join_key"].tolist(),
             **{c: [p[c] for p in lrows["left_payload"]]
                for c in left_cols}})
        rdf = pd.DataFrame(
            {key: rrows["join_key"].tolist(),
             **{c: [p[c] for p in rrows["right_payload"]]
                for c in right_cols}})
        return ldf.merge(rdf, on=key, how=how)

    return packed_l.union(packed_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas")
