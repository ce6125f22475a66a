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
