"""Model-scoring stages: hashed linear text classification.

``HashedLinearScorer`` is the fastText-style quality-classifier
inference shape (one linear weight per hashed token, summed over the
document, sign → label) used by CCNet/DCLM-style quality filtering —
expressed as a STATEFUL actor-pool stage: the token→weight table is
actor state (here derived on demand from the token's md5 and memoized,
standing in for a trained weight table loaded once in ``__init__``),
so repeated vocabulary across batches never re-hashes.

Weights are INTEGERS (md5-bucket in [-offset, buckets-offset)), so the
per-document score is an exact int64 sum — bit-for-bit reproducible
across engines and batch orders, and SQL-checkable:

    (CAST(concat('0x', substr(md5(word), 1, 8)) AS UBIGINT) % buckets)
        - offset

summed over word OCCURRENCES of ``regexp_extract_all(lower(text),
'\\S+')``. Documents with zero tokens are dropped (no score), matching
the SQL GROUP BY.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_weight(word: str, *, buckets: int = 2001,
                 offset: int = 1000) -> int:
    """Single-token reference for the batch path (and its tests)."""
    h = int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16)
    return h % buckets - offset


class HashedLinearScorer:
    """map_batches callable: (id, text) → (id, score, label).

    ``score`` = Σ weight(token) over token occurrences (int64);
    ``label`` = 1 if score ≥ 0 else 0. The weight memo lives for the
    actor's lifetime — size it like a model table, not a cache: at
    web scale pass the pool ``concurrency`` so each actor holds one
    copy (the realistic trained-classifier deployment loads the table
    once per actor in ``__init__``).
    """

    def __init__(self, *, column: str = "text", id_column: str = "doc_id",
                 buckets: int = 2001, offset: int = 1000,
                 max_memo: int = 4_000_000):
        self.column = column
        self.id_column = id_column
        self.buckets = buckets
        self.offset = offset
        self.max_memo = max_memo
        self._memo: dict[str, int] = {}

    def _weights(self, words: np.ndarray) -> np.ndarray:
        memo, buckets, offset = self._memo, self.buckets, self.offset
        if len(memo) > self.max_memo:  # unbounded web vocab backstop
            memo.clear()
        out = np.empty(len(words), dtype=np.int64)
        for i, w in enumerate(words):
            v = memo.get(w)
            if v is None:
                v = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8],
                        16) % buckets - offset
                memo[w] = v
            out[i] = v
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)

        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        scores = np.zeros(len(batch), dtype=np.int64)
        has_tok = np.zeros(len(batch), dtype=bool)
        if len(flat):
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            if isinstance(parent, pa.ChunkedArray):
                parent = parent.combine_chunks()
            # hash each DISTINCT token once; occurrences via the
            # dictionary indices
            dic = flat.dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            vocab = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            w = self._weights(vocab)
            par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            # float64 bincount is EXACT here: every partial sum is an
            # integer < 2**53 (|weight| ≤ offset, ≤ ~1e7 tokens/doc)
            scores = np.bincount(
                par, weights=w[codes].astype(np.float64),
                minlength=len(batch)).astype(np.int64)
            has_tok[par] = True
        return pa.table({
            self.id_column: pa.array(ids[has_tok]),
            "score": pa.array(scores[has_tok], pa.int64()),
            "label": pa.array((scores[has_tok] >= 0).astype(np.int64),
                              pa.int64()),
        })


def hashed_linear_scores(ds, *, column: str = "text",
                         id_column: str = "doc_id", buckets: int = 2001,
                         offset: int = 1000, concurrency=None):
    """Dataset → Dataset (id, score, label); see HashedLinearScorer."""
    from ..util import actor_pool

    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={"column": column, "id_column": id_column,
                               "buckets": buckets, "offset": offset},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool())
