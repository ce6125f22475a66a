"""Mergeable sketches: HyperLogLog distinct counting.

The canonical scale pattern for distinct counts (ray_guide "Aggregation at
scale"): each ``map_batches`` task emits ONE serialized sketch per batch;
a tiny second stage merges them (register-wise max) — the shuffle carries
``2^p`` bytes per batch instead of every distinct value. Standard HLL with
the linear-counting small-range correction (public Flajolet et al. 2007
formulation).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HllSketch:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values) -> np.ndarray:
        """uint64 hashes: vectorized splitmix64 for integer arrays (the
        common distinct-count key case), blake2b fallback for anything
        else. Both are public mixers with HLL-grade bit diffusion."""
        arr = np.asarray(values)
        if arr.dtype.kind in ("i", "u"):
            x = arr.astype(np.uint64)
            x = (x + np.uint64(0x9E3779B97F4A7C15))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))
        return np.array(
            [int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "big") for v in values],
            dtype=np.uint64)

    @staticmethod
    def _clz64(x: np.ndarray) -> np.ndarray:
        """Vectorized count-leading-zeros (6 masked shift passes)."""
        x = x.copy()
        n = np.zeros(x.shape, dtype=np.uint8)
        for s in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - s))
            n[mask] += np.uint8(s)
            x[mask] = x[mask] << np.uint64(s)
        n[x == 0] = 64
        return n

    def add_many(self, values) -> None:
        hashes = self._hash64(values)
        if not len(hashes):
            return
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1 (vectorized)
        ranks = np.minimum(self._clz64(rest) + 1, 64 - self.p + 1).astype(
            np.uint8)
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        out = HllSketch(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / inv_sum
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return e

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HllSketch":
        s = cls(p)
        s.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return s


class BloomFilter:
    """Mergeable Bloom filter (double hashing, Kirsch–Mitzenmacher): the
    broadcast-side primitive for semi-join pushdown — build over the small
    side's keys, ``ray.put`` once, drop non-members inside ``map_batches``
    on the big side before any shuffle. Per-batch filters OR-merge exactly
    like the HLL registers."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    def _indices(self, values) -> np.ndarray:
        h1 = HllSketch._hash64(values)
        h2 = HllSketch._hash64(np.asarray(
            h1 ^ np.uint64(0xA076_1D64_78BD_642F), dtype=np.uint64))
        h2 = h2 | np.uint64(1)  # odd step → full-cycle double hashing
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :])
                % np.uint64(self.n_bits)).astype(np.int64)

    def add_many(self, values) -> None:
        if not len(values):
            return
        idx = self._indices(values).ravel()
        np.bitwise_or.at(self.bits, idx >> 3,
                         np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains_many(self, values) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        idx = self._indices(values)
        hit = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter(self.n_bits, self.k)
        out.bits = self.bits | other.bits
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, n_bits: int = 1 << 20,
                   k: int = 5) -> "BloomFilter":
        s = cls(n_bits, k)
        s.bits = np.frombuffer(data, dtype=np.uint8).copy()
        return s


def build_bloom(ds, column: str, *, n_bits: int = 1 << 20,
                k: int = 5) -> BloomFilter:
    """Distributed build: one Bloom filter per batch, OR-merged on the
    driver (n_bits/8 bytes per batch on the wire — never the values)."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        s = BloomFilter(n_bits, k)
        col = batch.column(column)
        try:
            vals = col.to_numpy(zero_copy_only=False)
        except Exception:
            vals = col.to_pylist()
        s.add_many(vals)
        return pa.table({"bloom": pa.array([s.to_bytes()], pa.binary())})

    merged = BloomFilter(n_bits, k)
    for r in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged = merged.merge(BloomFilter.from_bytes(r["bloom"], n_bits, k))
    return merged


def approx_distinct_by_group(ds, key_column: str, value_column: str,
                             *, p: int = 12):
    """Per-group approximate COUNT(DISTINCT value): each batch emits ONE
    serialized sketch per key it saw; a groupby(key) merges register-wise.
    The shuffle carries 2^p bytes per (key, batch) — never the values —
    so a 100 TB table with a handful of hot keys reduces to kilobytes per
    key. Returns a Dataset (key, approx_distinct:int64)."""
    import pandas as pd
    import pyarrow.compute as pc

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys_out, sk_out = [], []
        tbl = batch.select([key_column, value_column])
        for key_val in pc.unique(tbl.column(key_column)).to_pylist():
            sub = tbl.filter(pc.equal(tbl.column(key_column), key_val))
            s = HllSketch(p)
            col = sub.column(value_column)
            try:
                vals = col.to_numpy(zero_copy_only=False)
            except Exception:
                vals = col.to_pylist()
            s.add_many(vals)
            keys_out.append(key_val)
            sk_out.append(s.to_bytes())
        return pa.table({key_column: pa.array(keys_out),
                         "sketch": pa.array(sk_out, pa.binary())})

    def merge_group(g: "pd.DataFrame") -> "pd.DataFrame":
        merged = HllSketch(p)
        for b in g["sketch"]:
            merged = merged.merge(HllSketch.from_bytes(b, p))
        return pd.DataFrame({key_column: [g[key_column].iloc[0]],
                             "approx_distinct": [int(merged.estimate())]})

    return ds.map_batches(sketch_batch, batch_format="pyarrow").groupby(
        key_column).map_groups(merge_group, batch_format="pandas")


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): per-batch sketches → driver-side
    register-max merge of the tiny sketch rows."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        s = HllSketch(p)
        col = batch.column(column)
        try:
            vals = col.to_numpy(zero_copy_only=False)  # int fast path
        except Exception:
            vals = col.to_pylist()
        s.add_many(vals)
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    merged = HllSketch(p)
    for r in rows:
        merged = merged.merge(HllSketch.from_bytes(r["sketch"], p))
    return merged.estimate()


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def _mg_summary(values, counts, capacity: int) -> dict:
    """Misra-Gries compression of (value → count) down to ``capacity``
    entries. Classic guarantee: any value with true total count
    > N/capacity survives (public Misra & Gries 1982 / MG-merge from
    Agarwal et al. 2012)."""
    summary: dict = {}
    for v, c in zip(values, counts):
        c = int(c)
        if v in summary:
            summary[v] += c
        elif len(summary) < capacity:
            summary[v] = c
        else:
            # decrement-all by the min once the table is full
            dec = min(min(summary.values()), c)
            summary = {k: n - dec for k, n in summary.items() if n > dec}
            if c > dec:
                summary[v] = c - dec
    return summary


def heavy_hitters(ds, column: str, *, k: int = 100,
                  capacity: int | None = None):
    """EXACT top-k frequent values at unbounded cardinality: a two-pass
    sketch-then-recount.

    Pass 1: each batch emits a Misra-Gries summary (≤ ``capacity`` rows —
    the shuffle carries summaries, never the full value distribution);
    summaries merge by grouped sum (MG merge = add + re-compress, and
    re-compression is safe to skip: the union only over-keeps). Any value
    with true count > N/capacity is guaranteed present.

    Pass 2: the surviving candidate set (≤ capacity × n_batches rows,
    re-compressed to ``capacity`` on the driver) is broadcast and counted
    EXACTLY in one vectorized filter+count pass, so reported counts are
    true counts, not MG lower bounds.

    Returns a pandas DataFrame (rnk, value, n) — exact top-k whenever the
    k-th count exceeds N/capacity (guaranteed for Zipf-like text with the
    default capacity = 50·k); the MG threshold N/capacity is also
    returned so callers can verify the guarantee held.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    capacity = capacity or 50 * k

    def partial(batch: pa.Table) -> pa.Table:
        """Vectorized MG-equivalent prune of the batch's exact counts:
        keep the top ``capacity`` values and subtract the waterline (the
        (capacity+1)-th count). Per-batch deficit per value ≤
        N_batch/(capacity+1), so summed deficits stay < N/capacity — the
        same survival guarantee as sequential MG, in C-speed sorts."""
        import numpy as np

        col = batch.column(column)
        g = pa.table({column: col}).group_by(column).aggregate(
            [(column, "count")])
        cnts = g.column(f"{column}_count").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(cnts) > capacity:
            order = np.argsort(-cnts, kind="stable")[:capacity + 1]
            waterline = cnts[order[-1]]
            keep_idx = order[:-1]
            kept = cnts[keep_idx] - waterline
            pos = kept > 0
            keep_idx, kept = keep_idx[pos], kept[pos]
            vals_arr = pc.take(g.column(column),
                               pa.array(keep_idx, pa.int64()))
        else:
            kept = cnts
            vals_arr = g.column(column)
        if len(kept) == 0:
            return pa.table({
                column: pa.array([None], g.column(column).type),
                "mg_count": pa.array([0], pa.int64()),
                "batch_n": pa.array([len(batch)], pa.int64())})
        batch_n = np.zeros(len(kept), dtype=np.int64)
        batch_n[0] = len(batch)
        return pa.table({column: vals_arr,
                         "mg_count": pa.array(kept, pa.int64()),
                         "batch_n": pa.array(batch_n, pa.int64())})

    merged = ds.map_batches(partial, batch_format="pyarrow").groupby(
        column).aggregate(Sum("mg_count", alias_name="mg_count"),
                          Sum("batch_n", alias_name="batch_n")).to_pandas()
    total_n = int(merged["batch_n"].sum())
    merged = merged[merged[column].notna()]
    cand = _mg_summary(merged[column].tolist(),
                       merged["mg_count"].tolist(), capacity)
    cand_ref = ray.put(set(cand))

    class Recount:
        def __init__(self):
            self.cand = ray.get(cand_ref)
            self.cand_arr = pa.array(list(self.cand))

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(column)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            keep = pc.is_in(col, value_set=self.cand_arr)
            kept = col.filter(keep)
            g = pa.table({column: kept}).group_by(column).aggregate(
                [(column, "count")])
            return pa.table({
                column: g.column(column),
                "n": pc.cast(g.column(f"{column}_count"), pa.int64()),
            })

    from ..util import actor_pool

    exact = ds.map_batches(
        Recount, batch_format="pyarrow", concurrency=actor_pool(),
    ).groupby(column).aggregate(Sum("n", alias_name="n")).to_pandas()
    out = exact.sort_values(["n", column],
                            ascending=[False, True]).head(k).reset_index(
        drop=True)
    out["rnk"] = range(1, len(out) + 1)
    out = out.rename(columns={column: "value"})
    out.attrs["mg_threshold"] = total_n / capacity if capacity else 0.0
    return out[["rnk", "value", "n"]]


def histogram_quantiles(ds, column: str, *, n_buckets: int = 1024,
                        qs: tuple = (0.5, 0.9, 0.99)):
    """Mergeable approximate quantiles over an INTEGER column via a
    fixed-width histogram sketch — the streaming complement to the exact
    distributed quantile operator (which sorts): error is bounded by one
    bucket width ((max-min+1)/n_buckets), the shuffle carries at most
    ``n_buckets`` (bucket, count) rows per block, and partials merge by
    addition, so it composes with any pre-aggregation tree.

    All bucket math is INTEGER (bucket = (v-lo)*B // (hi-lo+1); estimate
    = lo + ceil(q*n)-rank interpolation on bucket lower bounds), so a
    SQL oracle reproduces the result bit-for-bit — approximate vs the
    true quantile, exact vs the spec.

    Returns a pyarrow Table (q, est) with one row per requested quantile
    (q as round(q*100) int64 percent, est int64).
    """
    import pyarrow.compute as pc
    import ray.data  # noqa: F401
    from ray.data.aggregate import Count, Max, Min, Sum

    # pass 1: exact global bounds + count (one streaming aggregate)
    bounds = ds.aggregate(Min(column), Max(column), Count())
    if not bounds or bounds.get(f"min({column})") is None:
        return pa.table({"q": pa.array([], pa.int64()),
                         "est": pa.array([], pa.int64())})
    lo = int(bounds[f"min({column})"])
    hi = int(bounds[f"max({column})"])
    n = int(bounds["count()"])
    span = hi - lo + 1

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - lo) * n_buckets // span
        ub, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = ds.map_batches(bucketize, batch_format="pyarrow").groupby(
        "bucket").aggregate(Sum("c", alias_name="c")).sort("bucket")
    ht = pa.concat_tables(hist.iter_batches(batch_format="pyarrow"))
    buckets = ht.column("bucket").to_numpy(zero_copy_only=False)
    counts = ht.column("c").to_numpy(zero_copy_only=False)
    cum = np.cumsum(counts)

    out_q, out_est = [], []
    for q in qs:
        q100 = int(round(q * 100))
        # ceil(q100·n/100) in pure ints — no float boundary anywhere
        rank = max(1, (q100 * n + 99) // 100)
        i = int(np.searchsorted(cum, rank))
        b = int(buckets[min(i, len(buckets) - 1)])
        out_q.append(q100)
        out_est.append(lo + b * span // n_buckets)  # bucket lower bound
    return pa.table({"q": pa.array(out_q, pa.int64()),
                     "est": pa.array(out_est, pa.int64())})


def histogram_quantiles_by_group(ds, key_column: str, column: str, *,
                                 n_buckets: int = 1024,
                                 qs: tuple = (0.5, 0.9)):
    """Per-group ``histogram_quantiles``: same mergeable integer-bucket
    sketch, one (group, bucket) combiner exchange, quantile extraction
    per group inside a partition kernel. Shares the GLOBAL [min, max]
    bucket grid across groups (one cheap bounds pass) — per-group error
    stays one global-bucket width, and the all-integer math keeps the
    SQL twin bit-exact.

    Returns a pyarrow Table (key, q, est) sorted by (key, q).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from .window import map_key_partitions, segment_lengths, segment_starts

    bounds = ds.aggregate(Min(column), Max(column))
    if not bounds or bounds.get(f"min({column})") is None:
        return pa.table({"key": pa.array([], pa.string()),
                         "q": pa.array([], pa.int64()),
                         "est": pa.array([], pa.int64())})
    lo = int(bounds[f"min({column})"])
    hi = int(bounds[f"max({column})"])
    span = hi - lo + 1
    q100s = [int(round(q * 100)) for q in qs]

    def bucketize(t: pa.Table) -> pa.Table:
        v = t.column(column).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - lo) * n_buckets // span
        g = pa.table({"key": t.column(key_column),
                      "bucket": pa.array(b, pa.int64())}).group_by(
            ["key", "bucket"]).aggregate([("bucket", "count")])
        return pa.table({"key": g.column("key"),
                         "bucket": g.column("bucket"),
                         "c": pc.cast(g.column("bucket_count"),
                                      pa.int64())})

    hist = ds.map_batches(bucketize, batch_format="pyarrow").groupby(
        ["key", "bucket"]).aggregate(Sum("c", alias_name="c"))

    def extract(part: pa.Table) -> pa.Table:
        keys = part.column("key").to_numpy(zero_copy_only=False)
        out_k: list = []
        out_q: list = []
        out_e: list = []
        if len(keys):
            buckets = part.column("bucket").to_numpy(zero_copy_only=False)
            cs = part.column("c").to_numpy(zero_copy_only=False)
            starts = segment_starts(keys)
            lens = segment_lengths(starts, len(keys))
            for s, ln in zip(starts, lens):
                sl = slice(int(s), int(s + ln))
                cum = np.cumsum(cs[sl])
                n = int(cum[-1])
                for q100 in q100s:
                    rank = max(1, (q100 * n + 99) // 100)
                    i = int(np.searchsorted(cum, rank))
                    b = int(buckets[sl][min(i, int(ln) - 1)])
                    out_k.append(keys[s])
                    out_q.append(q100)
                    out_e.append(lo + b * span // n_buckets)
        return pa.table({"key": pa.array(out_k),
                         "q": pa.array(out_q, pa.int64()),
                         "est": pa.array(out_e, pa.int64())})

    t = pa.concat_tables(map_key_partitions(
        hist, "key", extract, sort_cols=["bucket"]).iter_batches(
        batch_format="pyarrow"))
    return t.sort_by([("key", "ascending"), ("q", "ascending")])


def count_min_estimates(ds, column: str, *, query_values,
                        w: int = 1024, d: int = 4):
    """Count-Min sketch frequency estimates: the fixed-size mergeable
    counter (d rows × w buckets, here d·w·8 bytes total regardless of
    cardinality) that answers "roughly how often does value X occur?"
    over a stream too wide for exact per-value counts. One-sided error:
    est ≥ true count, over-counting by colliding values (≤ 2n/w with
    probability 1−2⁻ᵈ per the Cormode-Muthukrishnan bound).

    Fully deterministic — row r buckets value t at
    ``md5("cms{r}:" + t)[:8] mod w`` — so the estimate is reproducible
    bit-for-bit by a SQL twin applying the same md5 arithmetic. Each
    batch counts its values (Arrow group_by), hashes only the batch's
    DISTINCT values (the SimHasher vocab-only trick), and emits its
    partial (row, bucket, count) cells; one hash_agg merges them
    (shuffle ≤ d·w rows per batch, usually far less); the driver folds
    the ≤ d·w cells into the sketch and answers the point queries.
    Returns a pyarrow Table (value, est) for ``query_values`` in input
    order."""
    import hashlib

    import ray.data  # noqa: F401  (ds is already a Dataset)

    from .window import hash_agg

    def bucket(row: int, value: str) -> int:
        h = hashlib.md5(f"cms{row}:{value}".encode()).hexdigest()[:8]
        return int(h, 16) % w

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([column]).drop_null().group_by(
            [column]).aggregate([([], "count_all")])
        vals = g.column(column).to_pylist()
        cnts = g.column("count_all").to_pylist()
        rows_, buckets_, counts_ = [], [], []
        for r in range(d):
            cell: dict[int, int] = {}
            for v, c in zip(vals, cnts):
                b = bucket(r, v)
                cell[b] = cell.get(b, 0) + int(c)
            rows_.extend([r] * len(cell))
            buckets_.extend(cell.keys())
            counts_.extend(cell.values())
        return pa.table({
            "row": pa.array(rows_, pa.int64()),
            "bucket": pa.array(buckets_, pa.int64()),
            "c": pa.array(counts_, pa.int64())})

    cells = hash_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     "bucket", [("c", "sum", "c")],
                     group_cols=["row", "bucket"]).take_all()
    cms = np.zeros((d, w), dtype=np.int64)
    for r in cells:
        cms[r["row"], r["bucket"]] = r["c"]

    ests = [int(min(cms[r, bucket(r, v)] for r in range(d)))
            for v in query_values]
    return pa.table({"value": pa.array(list(query_values), pa.string()),
                     "est": pa.array(ests, pa.int64())})
