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
multiply-xor-shift for integer keys and a polars vectorized hash for
string/binary keys (crc32 row loop only as a last-resort fallback), and
the per-bucket join runs as a pyarrow (acero) table join — no Python row
loop anywhere on the path. Hot-key membership/indexing uses arrow
``is_in``/``index_in`` kernels, never ``to_pylist`` scans.

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


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(31))
    return x


def _bucket_array(keys, num_buckets: int) -> pa.Array:
    """Per-key bucket, consistent across both join sides within a job.
    Integer keys: vectorized multiply-xor-shift (splitmix-style).
    String/binary keys: polars' vectorized xxhash over the arrow buffers
    (stable within a polars version — buckets are transient shuffle keys,
    never persisted). Last resort: a crc32 row loop."""
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    if pa.types.is_integer(arr.type):
        x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((_splitmix(x) % np.uint64(num_buckets)).astype(
            np.int64))
    if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
            or pa.types.is_binary(arr.type)):
        try:
            import polars as pl

            h = pl.from_arrow(arr).hash(seed=7).to_numpy().astype(np.uint64)
            # splitmix finalizer decorrelates polars' bucket-local bits
            return pa.array((_splitmix(h) % np.uint64(num_buckets)).astype(
                np.int64))
        except ImportError:
            pass
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
        if not cols:  # presence-only side (semi/anti joins)
            return pa.nulls(len(batch), type=t)
        children = [
            (batch.column(c).combine_chunks()
             if isinstance(batch.column(c), pa.ChunkedArray)
             else batch.column(c))
            for c in cols]
        return pa.StructArray.from_arrays(children, fields=list(t))

    hot_arr = (pa.array(list(hot_index), type=keys.type)
               if hot_index else None)

    def _hot_mask(k):
        return pc.fill_null(pc.is_in(k, value_set=hot_arr), False
                            ).to_numpy(zero_copy_only=False)

    if hot_index and side == "R":
        # replicate right-side hot rows into every salt sub-bucket
        hot_mask = _hot_mask(keys)
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
        hot_mask = _hot_mask(keys)
        salt = np.full(n, -1, dtype=np.int64)
        salt[hot_mask] = np.arange(int(hot_mask.sum())) % num_salts
    else:
        salt = None

    buckets = _bucket_array(keys, num_buckets)
    if salt is not None and (salt >= 0).any():
        b = buckets.to_numpy(zero_copy_only=False).copy()
        # vectorized key → hot-key ordinal (null → -1 for non-hot keys)
        hot_ids = pc.fill_null(
            pc.cast(pc.index_in(keys, value_set=hot_arr), pa.int64()), -1,
        ).to_numpy(zero_copy_only=False).astype(np.int64)
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


def detect_hot_keys(ds, key: str, *, num_buckets: int = 64,
                    skew_factor: float = 2.0, k: int = 32,
                    capacity: int | None = None) -> list:
    """Skew pre-pass for ``hash_join``: keys whose row count exceeds
    ``skew_factor × rows/num_buckets`` — the keys that would dominate a
    single bucket task.

    ONE streaming pass, nothing materialized (the key column at 10¹²
    rows is terabytes — pinning it in the object store was the round-3
    scale hazard): each batch emits a Misra-Gries summary (≤ ``capacity``
    rows; the batch's row count rides the first summary row), summaries
    merge by grouped sum, and each merged block is re-pruned to
    ``capacity`` before the driver sees it — driver input is O(capacity ×
    output blocks), never O(distinct keys). A key with true count > the
    hot threshold survives with estimate within N/capacity of truth;
    capacity defaults to 50·k = 1600 ≫ num_buckets/skew_factor = 32, so
    detection at the threshold is effectively exact (and either-way
    errors only shift work balance — salting never changes results)."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    capacity = capacity or 50 * k

    def mg_prune(vals, cnts, rows_total):
        """Top-``capacity`` values minus the waterline (MG-equivalent),
        row count carried on the first emitted row."""
        if len(cnts) > capacity:
            order = np.argsort(-cnts, kind="stable")[:capacity + 1]
            waterline = cnts[order[-1]]
            keep = order[:-1]
            vals = vals.take(pa.array(keep))
            cnts = cnts[keep] - waterline
        rows = np.zeros(len(cnts), np.int64)
        if len(rows):
            rows[0] = rows_total
        return pa.table({key: vals, "cnt": pa.array(cnts, pa.int64()),
                         "rows": pa.array(rows, pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table({key: batch.column(key)}).group_by(key).aggregate(
            [(key, "count")])
        cnts = g.column(f"{key}_count").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return mg_prune(g.column(key), cnts, len(batch))

    def reprune(t: pa.Table) -> pa.Table:
        cnts = t.column("cnt").to_numpy(zero_copy_only=False)
        rows = t.column("rows").to_numpy(zero_copy_only=False)
        return mg_prune(t.column(key).combine_chunks(),
                        cnts.astype(np.int64), int(rows.sum()))

    merged = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow").groupby(key).aggregate(
        Sum("cnt", alias_name="cnt"), Sum("rows", alias_name="rows")
    ).map_batches(reprune, batch_format="pyarrow")
    df = merged.to_pandas()
    n = int(df["rows"].sum())
    if n == 0:
        return []
    threshold = skew_factor * n / num_buckets
    hot = df[df["cnt"] > threshold].sort_values(
        ["cnt", key], ascending=[False, True]).head(k)
    return list(hot[key])


def hash_join(left, right, *, key: str, left_cols: list[str],
              right_cols: list[str], num_buckets: int = 64,
              how: str = "inner", hot_keys=None, num_salts: int = 8,
              left_types=None, right_types=None,
              pack_batch_size: int = 32768):
    """Join two Datasets on ``key``; returns a Dataset with columns
    [key, *left_cols, *right_cols]. One shuffle total (the bucket groupby);
    each bucket joins with a pyarrow table join inside ``map_groups``.
    ``how`` ∈ {'inner', 'left', 'full', 'semi', 'anti'} (semi/anti emit
    LEFT columns only — pass ``right_cols=[]`` for a presence-only right
    side). ``hot_keys`` salts the
    named skewed keys across ``num_salts`` sub-buckets (left spreads,
    right replicates) — identical results, bounded per-task key volume.
    ``hot_keys="auto"`` runs ``detect_hot_keys`` on the LEFT side first
    (the skewed key you didn't know about is the one that kills the job) —
    costs one extra scan of the left key column.
    ``left_types``/``right_types``: optional ``{column: pa.DataType}``
    for key/payload columns whose dataset schema isn't statically known
    — supplying them avoids a limit-1 schema probe that would otherwise
    EXECUTE the side's whole lineage (expensive when the side ends in an
    aggregate)."""
    join_type = {"inner": "inner", "left": "left outer",
                 "full": "full outer", "semi": "left semi",
                 "anti": "left anti"}[how]
    # semi/anti emit LEFT columns only; the right side contributes just
    # key presence (its payload still ships — pass right_cols=[] to keep
    # the presence-only side minimal)
    out_cols = [key, *left_cols] if how in ("semi", "anti") \
        else [key, *left_cols, *right_cols]
    if isinstance(hot_keys, str) and hot_keys == "auto":
        hot_keys = detect_hot_keys(left, key, num_buckets=num_buckets) \
            or None
    if how == "full" and hot_keys:
        # salting replicates the right side across sub-buckets, which
        # would emit one unmatched-right row PER SALT under full outer
        raise ValueError("hot_keys salting is not valid with how='full'")
    hot_index = ({k: i for i, k in enumerate(hot_keys)}
                 if hot_keys else None)

    # payload struct types: prefer caller-supplied / statically-known —
    # ``Dataset.schema()`` on an unmaterialized aggregate EXECUTES the
    # whole upstream as a limit-1 probe (measured ~4 s extra per join at
    # sf0.1), so the probe is strictly a last resort
    def _side_types(ds, cols, supplied):
        known = dict(supplied or {})
        missing = [c for c in [key, *cols] if c not in known]
        if missing:
            schema = ds.schema(fetch_if_missing=False)
            if schema is None:
                schema = ds.schema()  # limit-1 probe, runs the lineage
            base = schema.base_schema
            for c in missing:
                known[c] = base.field(c).type
        return known

    ltypes = _side_types(left, left_cols, left_types)
    # the right key is the same type as the left key — propagating it
    # means supplying just the right PAYLOAD types avoids the right probe
    rtypes = _side_types(right, right_cols,
                         {key: ltypes[key], **(right_types or {})})
    ltype = pa.struct([(c, ltypes[c]) for c in left_cols])
    rtype = pa.struct([(c, rtypes[c]) for c in right_cols])
    key_type = ltypes[key]

    # ``batch_size`` here COALESCES upstream blocks into dense pack tasks
    # (and splits oversized ones): the bucket groupby's all-to-all pays a
    # fixed scheduling cost PER INPUT BLOCK (~0.2 s/block measured on Ray
    # 2.49), so a side arriving as hundreds of tiny blocks — e.g. the
    # output of an upstream join or aggregate — would dominate the join's
    # wall clock. Packed rows are key+bucket+payload-struct, so 32k rows
    # per shuffle block stays far under the target block size.
    packed_l = left.select_columns([key, *left_cols]).map_batches(
        _pack_side, batch_format="pyarrow", batch_size=pack_batch_size,
        fn_kwargs=dict(key=key, side="L", cols=left_cols, left_type=ltype,
                       right_type=rtype, num_buckets=num_buckets,
                       hot_index=hot_index, num_salts=num_salts))
    packed_r = right.select_columns([key, *right_cols]).map_batches(
        _pack_side, batch_format="pyarrow", batch_size=pack_batch_size,
        fn_kwargs=dict(key=key, side="R", cols=right_cols, left_type=ltype,
                       right_type=rtype, num_buckets=num_buckets,
                       hot_index=hot_index, num_salts=num_salts))

    empty_schema = pa.schema(
        [(key, key_type)]
        + [(c, ltype.field(c).type) for c in left_cols]
        + ([] if how in ("semi", "anti")
           else [(c, rtype.field(c).type) for c in right_cols]))

    def join_bucket(g: pa.Table) -> pa.Table:
        mask_l = pc.equal(g.column("side"), "L")
        lrows = g.filter(mask_l)
        rrows = g.filter(pc.invert(mask_l))
        if join_type == "full outer":
            if len(lrows) == 0 and len(rrows) == 0:
                return empty_schema.empty_table()
        elif len(lrows) == 0 or (len(rrows) == 0 and
                                 join_type in ("inner", "left semi")):
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
            out_cols)

    return packed_l.union(packed_r).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def smb_write(ds, path: str, *, key: str, num_buckets: int = 32,
              **kwargs) -> None:
    """Persist ``ds`` in a sort-merge-bucket (SMB) layout: Hive
    partitions ``path/_smb_bucket=i/`` with bucket = key % num_buckets
    (an EXPLICIT persisted rule, deliberately not _bucket_array's
    xxhash — persisted layouts must be re-derivable across library
    versions). Two tables written with the same (key, num_buckets) are
    co-partitioned: every join key lives in the same bucket index on
    both sides, so joins become bucket-local — no shuffle, ever, at any
    scale. Integer keys only."""
    import pyarrow.compute as pc

    from ..sources.io import write_partitioned

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        b = k.to_numpy(zero_copy_only=False).astype(np.int64) \
            % num_buckets
        return batch.append_column("_smb_bucket", pa.array(b, pa.int64()))

    write_partitioned(ds.map_batches(tag, batch_format="pyarrow"),
                      path, partition_cols=["_smb_bucket"], **kwargs)


def smb_join(path_a: str, path_b: str, *, key: str,
             num_buckets: int = 32,
             left_cols: list[str] | None = None,
             right_cols: list[str] | None = None,
             join_type: str = "inner"):
    """SHUFFLE-FREE join of two SMB layouts written by ``smb_write``
    with the same (key, num_buckets): one Ray task per bucket index
    opens exactly its own partition directory on each side (storage
    co-partitioning replaces the all-to-all exchange — the layout cost
    was paid once at write time and is amortized over every subsequent
    join). Missing partition directories are empty buckets."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    def _side_schema(root: str, cols):
        f = sorted(glob.glob(f"{root}/_smb_bucket=*/*.parquet"))[0]
        s = pq.read_schema(f)
        names = cols if cols is not None else [
            n for n in s.names if n != "_smb_bucket"]
        return pa.schema([s.field(n) for n in names])

    def _empty(root: str, cols):
        return pa.Table.from_pylist([], schema=_side_schema(root, cols))

    lcols = ([key] + left_cols) if left_cols is not None else None
    rcols = ([key] + right_cols) if right_cols is not None else None

    def join_bucket(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch.column("b").to_pylist():
            try:
                ta = pq.read_table(f"{path_a}/_smb_bucket={b}",
                                   columns=lcols)
            except FileNotFoundError:
                ta = None
            try:
                tb = pq.read_table(f"{path_b}/_smb_bucket={b}",
                                   columns=rcols)
            except FileNotFoundError:
                tb = None
            if ta is None and join_type in ("inner", "left"):
                continue
            if tb is None and join_type == "inner":
                continue
            if ta is None:
                ta = _empty(path_a, lcols)
            if tb is None:
                tb = _empty(path_b, rcols)
            tables.append(ta.join(tb, keys=key, join_type=join_type))
        if not tables:
            # schema-correct empty output so Ray's batch validation and
            # downstream schema unification both hold
            e = _empty(path_a, lcols).join(_empty(path_b, rcols),
                                           keys=key, join_type=join_type)
            return e
        return pa.concat_tables(tables, promote_options="default")

    buckets = rd.from_items([{"b": i} for i in range(num_buckets)])
    out = buckets.map_batches(join_bucket, batch_size=1,
                              batch_format="pyarrow")
    return out
