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

    def add_many(self, values) -> None:
        hashes = np.array(
            [int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                "big") for v in values],
            dtype=np.uint64)
        if not len(hashes):
            return
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        for i, r in enumerate(rest):
            r = int(r)
            rank = 1
            bit = 1 << 63
            while rank <= 64 - self.p and not (r & bit):
                rank += 1
                r <<= 1
            ranks[i] = rank
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


def approx_distinct(ds, column: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): per-batch sketches → driver-side
    register-max merge of the tiny sketch rows."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        s = HllSketch(p)
        s.add_many(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    rows = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    merged = HllSketch(p)
    for r in rows:
        merged = merged.merge(HllSketch.from_bytes(r["sketch"], p))
    return merged.estimate()
