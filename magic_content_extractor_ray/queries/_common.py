"""Shared helpers for the query modules (column-pruned reads, actor-pool sizing, batch top-k pruning, tokenization).

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations
import re as _re



# ONE whitespace definition across every tokenizing query and its oracle:
# the DuckDB oracles tokenize with RE2's \S+ (ASCII whitespace only), so
# the Python side must too — str.split() would also split on U+00A0,
# U+2028 etc. and silently break bit-for-bit oracle equality.
_ASCII_WORD_RE = _re.compile(r"\S+", _re.ASCII)

def _ascii_words(text: str | None) -> list[str]:
    return _ASCII_WORD_RE.findall(text or "")

def _ws_split_lists(texts):
    """Arrow list<string> of tokens split on RE2 \\s+ (ASCII whitespace,
    matching the oracles' regexp_extract_all(text, '\\S+')). Leading /
    trailing whitespace yields '' entries — callers filter those."""
    import pyarrow.compute as pc

    return pc.split_pattern_regex(texts, pattern=r"\s+")

def _bincount_i64(inv, w, minlength=0):
    """Exact int64 grouped sum: like np.bincount(inv, weights=w) but
    accumulating in int64 via np.add.at (unbuffered integer adds), so
    per-group sums are exact for any magnitude below 2^63 — no float64
    accumulator, no 2^53 low-bit loss. inv must be non-negative ints."""
    import numpy as np

    n = max(int(minlength), int(inv.max()) + 1 if len(inv) else 0)
    out = np.zeros(n, np.int64)
    np.add.at(out, inv, np.asarray(w).astype(np.int64))
    return out

def _read_pq(path: str, *, columns=None, **kwargs):
    """Column-pruned parquet read with a metadata-free schema (keeps Ray's
    block-schema dedup working; see sources/io.read_parquet_clean)."""
    from magic_content_extractor_ray.sources.io import read_parquet_clean

    return read_parquet_clean(path, columns=columns, **kwargs)

def _pool():
    from magic_content_extractor_ray.util import actor_pool

    return actor_pool()

def _batch_topk(batch, keys, *, k, group=None):
    """Per-batch Arrow-native top-k candidate pruner: sort by ``keys``
    [(col, 'descending'|'ascending'), ...] and keep the first k rows —
    or the first k per ``group`` via a vectorized within-segment rank
    mask. Replaces the pandas round-trip finishers (round-4 verdict #8);
    selection is identical, row order is group-major (downstream finals
    and the driver compare re-sort, so order never matters here)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    order = ([(group, "ascending")] if group else []) + list(keys)
    t = batch.take(pc.sort_indices(batch, sort_keys=order))
    if group is None:
        return t.slice(0, k).replace_schema_metadata(None)
    from magic_content_extractor_ray.stages.window import (
        segment_lengths, segment_starts)

    g = t.column(group).to_numpy(zero_copy_only=False)
    if not len(g):
        return t.replace_schema_metadata(None)
    starts = segment_starts(g)
    lens = segment_lengths(starts, len(g))
    rank = np.arange(len(g)) - np.repeat(starts, lens)
    return t.filter(pa.array(rank < k)).replace_schema_metadata(None)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

_ANN_NQ = 5

_ANN_K = 10

def _tag_set_overlap(keyed, *, key: str, tag: str, prefix: str,
                     producer_expands: bool = False):
    """Pairwise SET overlap between tags over distinct (key, tag) pairs
    — the shared machinery of vocab_jaccard_langs / cross_source_dups:
    distinct via one composite-key hash_agg, per-key tag BITMASK via one
    keyed sum (each tag contributes its bit exactly once), then the
    bounded mask histogram (≤ 2^n_tags rows) comes to the driver where
    every pair's |∩| / |∪| is an exact integer fold over mask counts.
    The key set never passes through the driver; two shuffles total.
    Returns a pandas frame ({prefix}_a, {prefix}_b, n_a, n_b, n_common,
    jaccard_ppm) for pairs with a non-empty intersection."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, hash_sum)

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct = hash_agg(keyed.map_batches(one, batch_format="pyarrow"),
                        key, [("one", "max", "one")],
                        group_cols=[key, tag],
                        producer_expands=producer_expands)

    # tiny bounded aggregate: the tag list
    tags = sorted(distinct.groupby(tag).count(
    ).to_pandas()[tag].tolist())
    bit = {t_: 1 << i for i, t_ in enumerate(tags)}
    bit_ref = ray.put(bit)

    def to_bits(t: pa.Table) -> pa.Table:
        bits = ray.get(bit_ref)
        lv = np.array([bits[x] for x in t.column(tag).to_pylist()],
                      dtype=np.int64)
        return pa.table({key: t.column(key),
                         "b": pa.array(lv, pa.int64())})

    masks = hash_sum(distinct.map_batches(to_bits,
                                          batch_format="pyarrow"),
                     key, "b", "mask")

    def mask_hist(t: pa.Table) -> pa.Table:
        m = t.column("mask").to_numpy(zero_copy_only=False)
        mu, cnt = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(mu, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    hist = masks.map_batches(
        mask_hist, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("mask")["cnt"].sum()
    mvals = hist.index.to_numpy(dtype=np.int64)
    mcnts = hist.to_numpy(dtype=np.int64)

    rows = []
    for i, ta in enumerate(tags):
        for j in range(i + 1, len(tags)):
            tb = tags[j]
            has_a = (mvals & (1 << i)) > 0
            has_b = (mvals & (1 << j)) > 0
            inter = int(mcnts[has_a & has_b].sum())
            n_a = int(mcnts[has_a].sum())
            n_b = int(mcnts[has_b].sum())
            if inter == 0:
                continue
            rows.append({
                f"{prefix}_a": ta, f"{prefix}_b": tb,
                "n_a": n_a, "n_b": n_b, "n_common": inter,
                "jaccard_ppm": (1_000_000 * inter)
                // (n_a + n_b - inter)})
    return pd.DataFrame(rows, columns=[f"{prefix}_a", f"{prefix}_b",
                                       "n_a", "n_b", "n_common",
                                       "jaccard_ppm"])
