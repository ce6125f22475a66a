"""Fuzzy (edit-distance) string self-join — the near-duplicate
short-string matcher (titles, product names, queries) that a substring
or shingle dedup misses: "tabel" vs "table" share no useful shingles
but are one edit apart.

SymSpell/FastSS candidate generation: every DISTINCT string emits its
deletion neighborhood (itself + each single-character deletion — L+1
short variants). Two strings at Levenshtein distance ≤ 1 ALWAYS share a
variant (equal → themselves; substitution → delete the differing
position from both; insert/delete → the shorter string IS a deletion of
the longer), so bucketing by variant is a complete candidate filter —
no recall loss, unlike LSH. Candidates are then verified with an exact
distance-1 check (O(L) two-pointer, no DP needed), and surviving pairs
deduplicated with one row-scale hash_agg.

Scale: one variant shuffle of O(total chars) volume; buckets are
processed one hash partition per task with singleton buckets skipped
wholesale (the LSH run-length pattern, dedup.py); a pathological hot
bucket (thousands of titles differing only at one position all share a
variant) is capped at ``max_bucket`` members — cap hits are counted so
callers can see truncation instead of guessing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _within_one_edit(a: str, b: str) -> bool:
    """Exact lev(a, b) ≤ 1 for a ≠ b (callers exclude equality)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    # b = a with one insertion?
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_join(ds, column: str, *, max_bucket: int = 256):
    """All UNORDERED pairs of distinct values of ``column`` at
    Levenshtein distance exactly 1 (distance 0 is excluded by taking
    distinct values first). Returns a Dataset (left, right) with
    left < right lexicographically, each pair once."""
    from .window import hash_agg, map_key_partitions

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([column]).drop_null().group_by(
            [column]).aggregate([([], "count_all")])
        return pa.table({column: g.column(column),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    titles = hash_agg(
        ds.map_batches(distinct_partial, batch_format="pyarrow"),
        column, [("c", "sum", "c")]).drop_columns(["c"])

    def explode(batch: pa.Table) -> pa.Table:
        vs, ts = [], []
        for t in batch.column(column).to_pylist():
            vs.append(t)
            ts.append(t)
            for i in range(len(t)):
                vs.append(t[:i] + t[i + 1:])
                ts.append(t)
        return pa.table({"variant": pa.array(vs, pa.string()),
                         "title": pa.array(ts, pa.string())})

    def partition_pairs(part: pa.Table) -> pa.Table:
        from .window import segment_lengths, segment_starts

        keys = part.column("variant").to_numpy(zero_copy_only=False)
        out_l: list = []
        out_r: list = []
        if len(keys):
            titles_all = part.column("title").to_numpy(
                zero_copy_only=False)
            starts = segment_starts(keys)
            lens = segment_lengths(starts, len(keys))
            for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
                members = sorted(set(
                    titles_all[int(s):int(s + ln)]))[:max_bucket]
                for i in range(len(members)):
                    for j in range(i + 1, len(members)):
                        if _within_one_edit(members[i], members[j]):
                            out_l.append(members[i])
                            out_r.append(members[j])
        return pa.table({"left": pa.array(out_l, pa.string()),
                         "right": pa.array(out_r, pa.string())})

    pairs = map_key_partitions(
        titles.map_batches(explode, batch_format="pyarrow"),
        "variant", partition_pairs, coalesce_rows=262144,
        producer_expands=True)
    return hash_agg(pairs, "left", [([], "count_all", "nbuckets")],
                    group_cols=["left", "right"]).drop_columns(["nbuckets"])
