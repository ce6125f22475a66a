"""Deterministic sampling operators (data-mixing primitives).

Training-data pipelines sample per-source/per-language at different rates
to hit a target mixture. Sampling here is a pure HASH PREDICATE on the
row id — `int(md5(salt + id)[:8], 16) % 100 < pct` — so it is:

- shuffle-free (a vectorized filter inside ``map_batches``),
- deterministic across runs, workers and parallelism levels,
- resume-safe (re-processing a shard re-selects the same rows),
- SQL-checkable (DuckDB: ``CAST(concat('0x', substr(md5(...),1,8)) AS
  UBIGINT) % 100 < pct`` matches bit-for-bit).

``stratified_sample`` applies a per-key rate table (broadcast dict; keys
absent from the table fall back to ``default_pct``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash_pct(ids, salt: str) -> np.ndarray:
    """Per-row bucket in [0, 100) from the md5 prefix (C-speed hashing)."""
    pre = salt.encode()
    return np.fromiter(
        (int(hashlib.md5(pre + str(v).encode()).hexdigest()[:8], 16) % 100
         for v in ids),
        dtype=np.int64, count=len(ids))


def hash_sample(ds, *, pct: int, id_column: str = "doc_id",
                salt: str = ""):
    """Keep ~pct% of rows, deterministically by id hash."""

    def keep(batch: pa.Table) -> pa.Table:
        buckets = _hash_pct(batch.column(id_column).to_pylist(), salt)
        return batch.filter(pa.array(buckets < pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, *, key_column: str, pcts: dict[str, int],
                      default_pct: int = 0, id_column: str = "doc_id",
                      salt: str = ""):
    """Per-key sampling rates (e.g. per-language mixture weights)."""

    def keep(batch: pa.Table) -> pa.Table:
        buckets = _hash_pct(batch.column(id_column).to_pylist(), salt)
        keys = batch.column(key_column).to_pylist()
        limits = np.fromiter(
            (pcts.get(k, default_pct) for k in keys),
            dtype=np.int64, count=len(keys))
        return batch.filter(pa.array(buckets < limits))

    return ds.map_batches(keep, batch_format="pyarrow")


def fixed_k_sample(ds, *, k: int, id_column: str = "doc_id",
                   salt: str = "", columns: list[str] | None = None):
    """Deterministic fixed-SIZE uniform sample: the k rows with the
    smallest ``md5(salt + id)`` — the order statistic analog of
    ``hash_sample``'s fixed-RATE predicate (and the deterministic
    replacement for reservoir sampling at scale).

    Distributed as a tree of partial bottom-k's: each batch keeps its k
    smallest hashes, so the driver merge sees ≤ k rows per batch, never
    the corpus. Same-id rows hash identically across runs, workers and
    parallelism levels, so the sample is stable and resume-safe.
    Returns a pandas DataFrame sorted by ``id_column``.
    """
    import hashlib as _h

    import pyarrow as pa
    import pyarrow.compute as pc

    pre = salt.encode()

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native bottom-k: (_h, id) pairs are unique (md5), so the
        # multi-key sort is deterministic without pandas round-trips
        ids = batch.column(id_column).to_pylist()
        hs = pa.array([_h.md5(pre + str(v).encode()).hexdigest()
                       for v in ids], pa.string())
        t = batch.append_column("_h", hs)
        idx = pc.sort_indices(t, sort_keys=[("_h", "ascending"),
                                            (id_column, "ascending")])
        return t.take(idx[:k]).replace_schema_metadata(None)

    src = ds if columns is None else ds.select_columns(
        list({*columns, id_column}))
    cands = src.map_batches(partial, batch_format="pyarrow",
                            batch_size=8192)
    out = cands.to_pandas().sort_values(
        ["_h", id_column], kind="stable").head(k)
    return out.drop(columns=["_h"]).sort_values(id_column).reset_index(
        drop=True)


def fixed_k_per_group(ds, *, k: int, group_column: str,
                      id_column: str = "doc_id", salt: str = ""):
    """Deterministic fixed-size sample PER GROUP: each group's k rows
    with the smallest salted id hash (per-group reservoir analog — the
    data-mixing primitive for "exactly k docs per language/source").

    Tree-reduced like the per-group top-k operator: per-batch bottom-k
    per group, then a bounded per-group map_groups final — no group
    ever holds more than k × (candidate batches) rows.
    """
    import hashlib as _h

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    pre = salt.encode()

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native per-group bottom-k: sort by (group, _h, id), keep
        # each group's first k via a vectorized within-segment rank mask
        from .window import segment_lengths, segment_starts

        ids = batch.column(id_column).to_pylist()
        hs = pa.array([_h.md5(pre + str(v).encode()).hexdigest()
                       for v in ids], pa.string())
        t = batch.append_column("_h", hs)
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group_column, "ascending"), ("_h", "ascending"),
                          (id_column, "ascending")]))
        g = t.column(group_column).to_numpy(zero_copy_only=False)
        starts = segment_starts(g)
        lens = segment_lengths(starts, len(g))
        rank = np.arange(len(g)) - np.repeat(starts, lens)
        return t.filter(pa.array(rank < k)).replace_schema_metadata(None)

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["_h", id_column], kind="stable").head(k)
        return g.drop(columns=["_h"])

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
    return cands.groupby(group_column).map_groups(
        final, batch_format="pandas")


def upsample_mixture(ds, *, key_column: str, rate_pcts: dict[str, int],
                     default_pct: int = 100, id_column: str = "doc_id",
                     salt: str = "", copy_column: str = "copy"):
    """Rate-controlled data mixing WITH upsampling: per-key rates in
    integer percent, where 250 means 2.5× (every row twice, a
    deterministic hash-selected half a third time), 60 means 0.6×
    (hash-sampled down), 100 is identity and 0 drops the source.

    Each row emits ``rate // 100`` copies plus one more when its md5
    bucket falls under ``rate % 100`` — the same shuffle-free,
    resume-safe, parallelism-independent predicate as ``hash_sample``,
    so the mixture is reproducible and SQL-checkable. A ``copy`` index
    column distinguishes replicas so a downstream epoch shuffle can
    salt on (id, copy) and decorrelate them."""

    def expand(batch: pa.Table) -> pa.Table:
        buckets = _hash_pct(batch.column(id_column).to_pylist(), salt)
        keys = batch.column(key_column).to_pylist()
        rates = np.fromiter(
            (rate_pcts.get(k, default_pct) for k in keys),
            dtype=np.int64, count=len(keys))
        copies = rates // 100 + (buckets < rates % 100)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), copies)
        out = batch.take(pa.array(idx))
        ends = np.cumsum(copies)
        copy_idx = (np.arange(len(idx), dtype=np.int64)
                    - np.repeat(ends - copies, copies))
        return out.append_column(copy_column,
                                 pa.array(copy_idx, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def _hash_ppm(ids, salt: str) -> np.ndarray:
    """Per-row bucket in [0, 1e6) from the md5 prefix — the fine-grained
    sibling of _hash_pct for fractional (ppm) acceptance thresholds."""
    pre = salt.encode()
    return np.fromiter(
        (int(hashlib.md5(pre + str(v).encode()).hexdigest()[:8], 16)
         % 1_000_000 for v in ids),
        dtype=np.int64, count=len(ids))


def importance_sample(ds, *, weight_ppm_column: str,
                      id_column: str = "doc_id", salt: str = ""):
    """Importance-weighted selection: keep a row iff its deterministic id
    hash bucket (parts-per-million) falls below the row's own acceptance
    threshold ``weight_ppm_column`` (int64 in [0, 1e6]; 1e6 = always
    keep). Shuffle-free, resumable (same ids → same decisions), and the
    integer threshold means an SQL oracle can reproduce the decision
    bit-for-bit — derive the weight column with integer arithmetic."""

    def keep(batch: pa.Table) -> pa.Table:
        buckets = _hash_ppm(batch.column(id_column).to_pylist(), salt)
        w = batch.column(weight_ppm_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(buckets < w))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_aes(ds, *, k: int, weight_column: str,
                        id_column: str = "doc_id", salt: str = ""):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row gets the key ln(u)/w for a
    per-id uniform u — the k LARGEST keys are a weight-proportional
    sample, the distributed order-statistic analog of weighted
    reservoir sampling.

    u derives from md5(salt + id) (top 60 hex-prefix bits, +1 so u > 0),
    so the draw is reproducible across runs / workers / parallelism AND
    SQL-expressible: the DuckDB twin evaluates the identical expression
    on identical doubles through the same libm, so even the top-k cut
    lands on the same rows bit-for-bit. Distributed as a tree of partial
    top-k's: each batch forwards at most k rows.

    Returns a pandas DataFrame (id, weight, aes_key rounded 6dp) sorted
    by ``id_column``. Weights must be > 0; rows with w <= 0 are dropped.
    """
    import hashlib as _h

    import pyarrow as pa
    import pyarrow.compute as pc

    pre = salt.encode()
    denom = float(1 << 60)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        w = batch.column(weight_column).to_numpy(
            zero_copy_only=False).astype(np.float64)
        h = np.fromiter(
            (int(_h.md5(pre + str(v).encode()).hexdigest()[:15], 16)
             for v in ids), dtype=np.int64, count=len(ids))
        u = (h.astype(np.float64) + 1.0) / denom
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.log(u) / w
        keep = w > 0
        t = pa.table({
            id_column: pa.array(ids,
                                batch.column(id_column).type),
            "weight": batch.column(weight_column),
            "aes_key": pa.array(r, pa.float64()),
        }).filter(pa.array(keep))
        order = pc.sort_indices(t, sort_keys=[("aes_key", "descending"),
                                              (id_column, "ascending")])
        return t.take(order[:k])

    lvl1 = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=8192)

    def merge_partial(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("aes_key", "descending"),
                                              (id_column, "ascending")])
        return t.take(order[:k])

    # second tree level: level-1 emits k rows per 8192-row batch, which
    # is still O(corpus/8192·k) — re-reduce 64k-row bundles so the
    # driver merge sees O(k · batches/655) rows regardless of scale
    cands = lvl1.map_batches(merge_partial, batch_format="pyarrow",
                             batch_size=65536).to_pandas()
    if cands.empty:  # empty input: schema-complete empty frame
        import pandas as pd

        return pd.DataFrame({id_column: [], "weight": [], "aes_key": []})
    top = cands.sort_values(["aes_key", id_column],
                            ascending=[False, True]).head(k)
    top = top.copy()
    top["aes_key"] = np.floor(top["aes_key"].to_numpy() * -1e6 + 0.5) / -1e6
    return top.sort_values(id_column).reset_index(drop=True)
