"""Benchmark decontamination at blocklist scale.

The exact form (one vectorized substring pass per phrase — see the
``docs_decontaminated`` query) is right for a handful of phrases; real
eval blocklists carry 10^4–10^6 n-grams, where per-phrase passes are
O(phrases × corpus). This module implements the standard scale shape:

1. hash every blocklist n-gram into a Bloom filter (built once,
   ``ray.put`` once — kilobytes to a few MB on the wire);
2. each document batch computes its rolling token-n-gram hashes
   VECTORIZED (per-token hashes + a polynomial window combine via
   shifted adds — no Python loop over windows) and probes the filter;
3. a Bloom hit is a *candidate* — callers either drop candidates
   directly (conservative: false-positive rate ε drops ~ε extra docs)
   or exact-verify candidates against the phrase list (the candidate
   set is tiny, so per-phrase verification there is cheap).

Hashing uses the same splitmix64 mixer as the sketch module; tokens are
lowercased-whitespace tokens to match the rest of the text stack.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import BloomFilter, HllSketch

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the window poly


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Per-token uint64 hashes (blake2b via HllSketch fallback path)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return HllSketch._hash64(tokens).astype(np.uint64)


def ngram_hashes(tokens: list[str], n: int) -> np.ndarray:
    """Rolling n-gram hashes over a token list: h(i) = Σ_j th[i+j]·B^j
    (uint64 wraparound). Vectorized as n shifted adds."""
    th = _token_hashes(tokens)
    if len(th) < n:
        return np.zeros(0, dtype=np.uint64)
    w = len(th) - n + 1
    out = np.zeros(w, dtype=np.uint64)
    mult = np.uint64(1)
    for j in range(n):
        out += th[j:j + w] * mult
        mult *= _B
    return out


def build_phrase_bloom(phrases: list[str], *, n: int,
                       n_bits: int = 1 << 20) -> BloomFilter:
    """Bloom filter over every n-gram of every blocklist phrase (a
    phrase shorter than n tokens contributes its whole-phrase hash via
    zero-padding-free fallback: it is skipped — match semantics are
    n-gram containment)."""
    bloom = BloomFilter(n_bits=n_bits)
    all_hashes = []
    for p in phrases:
        hs = ngram_hashes(p.lower().split(), n)
        if len(hs):
            all_hashes.append(hs)
    if all_hashes:
        bloom.add_many(np.concatenate(all_hashes))
    return bloom


def decontaminate_bloom(ds, phrases: list[str], *, n: int = 13,
                        text_column: str = "text",
                        n_bits: int = 1 << 20,
                        verify_exact: bool = True):
    """Drop documents containing any blocklist n-gram.

    Returns the surviving Dataset. With ``verify_exact`` (default),
    Bloom candidates are substring-verified against the phrase n-grams
    so false positives are never dropped — the verification cost is
    O(candidates × phrases-ngram-set) on the tiny candidate stream, not
    the corpus. With ``verify_exact=False`` the ε false-positive docs
    are dropped too (conservative filtering, zero second pass).
    """
    import ray

    bloom = build_phrase_bloom(phrases, n=n, n_bits=n_bits)
    bloom_ref = ray.put(bloom.to_bytes())
    # exact n-gram string set for verification (normalized form)
    grams = set()
    for p in phrases:
        toks = p.lower().split()
        for i in range(max(0, len(toks) - n + 1)):
            grams.add(" ".join(toks[i:i + n]))
    grams_ref = ray.put(grams)

    class Filter:
        def __init__(self):
            self.bloom = BloomFilter.from_bytes(ray.get(bloom_ref),
                                                n_bits=n_bits)
            self.grams = ray.get(grams_ref) if verify_exact else None

        def _contaminated(self, text: str) -> bool:
            toks = (text or "").lower().split()
            hs = ngram_hashes(toks, n)
            if not len(hs):
                return False
            hits = self.bloom.contains_many(hs)
            if not hits.any():
                return False
            if self.grams is None:
                return True
            for i in np.flatnonzero(hits):
                if " ".join(toks[i:i + n]) in self.grams:
                    return True
            return False

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_column).to_pylist()
            keep = pa.array([not self._contaminated(t) for t in texts])
            return batch.filter(keep)

    from ..util import actor_pool

    return ds.map_batches(Filter, batch_format="pyarrow",
                          concurrency=actor_pool())


def ngram_overlap_scores(train, evalset, *, column: str = "text",
                         id_column: str = "doc_id", n: int = 3,
                         num_buckets: int = 64):
    """Per-eval-document contamination score: the fraction of each eval
    doc's distinct word n-grams that occur anywhere in the train corpus
    (the GPT-3 appendix-C / PaLM "n-gram overlap" decontamination
    metric — a graded complement to the boolean Bloom filter above).

    Single exchange on the ngram key: both corpora are tokenized
    map-side into distinct (doc, ngram) rows (``_doc_ngrams_batch``),
    tagged with a side bit, and hash-partitioned together. Within a
    partition sorted by (ngram, side), a segment's FIRST row is a train
    row iff the train corpus contains that ngram — so the per-eval-row
    hit flag falls out of one vectorized run-length pass. One int-key
    groupby then aggregates hits back to eval docs. No broadcast, no
    join, no driver state.

    Returns (doc_id, n_ngrams, n_overlap, overlap_ratio) for eval docs
    with at least one n-gram; overlap_ratio rounded 6dp.

    PARTITIONING ASSUMPTION: as in ``duplicate_passage_stats``, one
    ngram's full posting list lands in one partition; when universal
    boilerplate ngrams approach the corpus size, pre-reduce the train
    side to distinct (ng) per batch before the union, or switch to the
    salted-join shape described there.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import _doc_ngrams_batch
    from .window import map_key_partitions, segment_lengths, segment_starts

    def grams(ds, side: int):
        g = ds.map_batches(
            _doc_ngrams_batch, batch_format="pyarrow",
            fn_kwargs={"column": column, "id_column": id_column, "n": n})

        def tag(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(len(t), side, dtype=np.int64)))

        # NOTE: no batch_size here — map fusion would push it onto the
        # expanding tokenizer's INPUT and serialize it; density comes
        # from map_key_partitions' no-shuffle repartition below
        return g.map_batches(tag, batch_format="pyarrow")

    union = grams(train, 0).union(grams(evalset, 1))

    def score_partition(t: pa.Table) -> pa.Table:
        """train-presence per segment → PER-EVAL-DOC PARTIALS within the
        partition, so the doc exchange moves one row per (partition,
        eval doc) instead of one per (eval doc, ngram)."""
        keys = t.column("ng").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "c_all": pa.array([], pa.int64()),
                             "c_hit": pa.array([], pa.int64())})
        side = t.column("side").to_numpy(zero_copy_only=False)
        starts = segment_starts(keys)
        lens = segment_lengths(starts, len(keys))
        has_train = side[starts] == 0  # sorted by (ng, side)
        hit = np.repeat(has_train, lens)
        mask = side == 1
        ids = t.column(id_column).to_numpy(
            zero_copy_only=False).astype(np.int64)[mask]
        hit = hit[mask]
        uids, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            id_column: pa.array(uids, pa.int64()),
            "c_all": pa.array(np.bincount(inv, minlength=len(uids))
                              .astype(np.int64), pa.int64()),
            "c_hit": pa.array(np.bincount(inv, weights=hit,
                                          minlength=len(uids))
                              .astype(np.int64), pa.int64())})

    scored = map_key_partitions(union, "ng", score_partition,
                                num_buckets=num_buckets,
                                sort_cols=["side"],
                                coalesce_rows=262144,
                                producer_expands=True)
    # hash_agg: one group per doc is row-scale (see window.hash_agg)
    from .window import hash_agg

    stats = hash_agg(scored, id_column,
                     [("c_all", "sum", "n_ngrams"),
                      ("c_hit", "sum", "n_overlap")])

    def ratio(t: pa.Table) -> pa.Table:
        r = pc.round(pc.divide(
            pc.cast(t.column("n_overlap"), pa.float64()),
            pc.cast(t.column("n_ngrams"), pa.float64())), ndigits=6,
            round_mode="half_towards_infinity")  # = DuckDB round() on positives
        return t.append_column("overlap_ratio", r)

    return stats.map_batches(ratio, batch_format="pyarrow")
