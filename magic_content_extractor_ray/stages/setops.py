"""Distributed SQL set operations: UNION / INTERSECT / EXCEPT (distinct).

The classic implementation is a tagged union: each side contributes
``(key…, in_left, in_right)`` rows, a single hash shuffle groups by key,
and per-key max-flags decide membership:

- ``union``:     in_left OR  in_right
- ``intersect``: in_left AND in_right
- ``except``:    in_left AND NOT in_right

Scale properties (the reason this shape is used instead of a join):

- each side is pre-deduplicated *per batch* before the shuffle, so the
  exchange moves at most one row per distinct key per input block —
  heavily duplicated inputs (e.g. an events log keyed by user) shrink
  before they move;
- one shuffle total, on the same key for both sides;
- the per-key group is bounded (≤ 2 rows after the second-stage partial
  combine), so no skewed key can blow up a task.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max

_OPS = ("union", "intersect", "except")


def _tag(flag_l: int, flag_r: int, key_columns: list[str]):
    """Per-batch distinct + membership flags (vectorized group_by)."""

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.select(key_columns)
        distinct = keys.group_by(key_columns).aggregate([])
        n = len(distinct)
        return distinct.append_column(
            "in_l", pa.array([flag_l] * n, pa.int8())).append_column(
            "in_r", pa.array([flag_r] * n, pa.int8()))

    return tag


def set_op(left, right, *, key_columns: list[str] | str, op: str):
    """DISTINCT set operation between two Datasets on ``key_columns``.

    Returns a Dataset with exactly the key columns, one row per
    qualifying distinct key.
    """
    if isinstance(key_columns, str):
        key_columns = [key_columns]
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")

    # batch_size coalesces each side into dense blocks before the union:
    # the downstream groupby's all-to-all pays a fixed per-input-block
    # cost that grows superlinearly past ~100 blocks (see join.hash_join)
    tagged = left.map_batches(
        _tag(1, 0, key_columns), batch_format="pyarrow",
        batch_size=32768).union(
        right.map_batches(_tag(0, 1, key_columns), batch_format="pyarrow",
                          batch_size=32768))

    # hash_agg: distinct-key cardinality is row-scale; composite keys
    # never straddle partitions (hash on the first key column)
    from .window import hash_agg

    flags = hash_agg(tagged, key_columns[0],
                     [("in_l", "max", "in_l"), ("in_r", "max", "in_r")],
                     group_cols=key_columns)

    if op == "union":
        pred = None  # every grouped key qualifies
    elif op == "intersect":
        pred = lambda t: pc.and_(pc.equal(t.column("in_l"), 1),
                                 pc.equal(t.column("in_r"), 1))
    else:  # except
        pred = lambda t: pc.and_(pc.equal(t.column("in_l"), 1),
                                 pc.equal(t.column("in_r"), 0))

    def finish(batch: pa.Table) -> pa.Table:
        if pred is not None:
            batch = batch.filter(pred(batch))
        return batch.select(key_columns)

    return flags.map_batches(finish, batch_format="pyarrow")
