"""Deduplication operators for large-scale training-data pipelines.

All are Ray-Data-first:

- ``exact_dedup``: content-hash in a vectorized ``map_batches`` →
  ``groupby(hash)`` keep min(doc_id). The only shuffle moves (hash, doc_id)
  pairs, never the payload.
- ``minhash_lsh_dedup``: char-shingle → minhash signature (numpy, per batch)
  → band explode (the signature rides each band row as a binary column) →
  hash-partition by band_key (one task per PARTITION, not per bucket —
  singleton buckets are skipped by a vectorized run-length pass) → pairs
  VERIFIED by signature-estimated Jaccard inside the partition task →
  distributed duplicate-pair dedup (composite-key groupby) → connected
  components as Ray Data min-label-propagation rounds (stages/graph.py).
  Nothing funnels through the driver; every step returns/consumes a
  Dataset.
- ``simhash_dedup``: 64-bit simhash, pigeonhole band split (any pair within
  hamming distance d shares ≥1 of d+1 bands) → bucket → verify hamming.
- ``ngram_jaccard``: exact word n-gram Jaccard between candidate pairs
  (the precise verifier behind the sketch-based candidates).

Hot buckets (the boilerplate-heavy-corpus hazard): a bucket of n members
with identical signatures — the common pathological case — produces only
n-1 star pairs (members link to the min-id representative), not n²/2,
because members are first grouped by signature identity inside the bucket
task; pairwise estimation runs only across DISTINCT signatures, chunked
and capped at ``max_distinct_sigs`` representatives. No candidate from an
identity group is ever dropped, regardless of bucket size.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa


_MERSENNE = (1 << 61) - 1

# RE2's \s (what pyarrow's split_pattern_regex(r"\s+") matches) is the
# ASCII class [\t\n\f\r ] — NOT Python str.split(), which also splits on
# \v and Unicode whitespace (NBSP  , ideographic space 　, ...).
# Every single-doc reference implementation in this module tokenizes with
# this helper so it agrees byte-for-byte with the vectorized batch paths
# (and with DuckDB's regexp_split_to_array, also RE2) on web text.
_RE2_WS = re.compile(r"[\t\n\f\r ]+")


def ascii_ws_split(text: str) -> list[str]:
    """RE2-\\s-compatible whitespace tokenize (drops empty tokens)."""
    return [w for w in _RE2_WS.split(text) if w]


def add_text_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    """md5 content hash (hex), matching DuckDB's md5() for the SQL oracle."""
    texts = batch.column(column).to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """One representative (min id) per distinct content hash.
    Returns (text_hash, doc_id, n_dups).

    hash_agg, not groupby().aggregate(): group count is ~row count (one
    group per distinct document), where the sort-aggregate's per-group
    Python callback dominates at corpus scale — the per-partition Arrow
    C++ group_by keeps the same single (hash, id) shuffle."""
    from .window import hash_agg

    hashed = ds.map_batches(
        add_text_hash, batch_format="pyarrow", fn_kwargs={"column": column}
    ).select_columns(["text_hash", id_column])
    return hash_agg(hashed, "text_hash",
                    [(id_column, "min", id_column),
                     (id_column, "count_all", "n_dups")])


def exact_dedup_keep_best(ds, *, column: str = "text",
                          id_column: str = "doc_id",
                          priority_column: str = "priority"):
    """Exact dedup keeping the BEST duplicate, not the min-id one — the
    CCNet/RefinedWeb keep policy (when a page is crawled from several
    mirrors, keep the copy from the most-trusted source / highest
    quality score). ``priority_column`` is an int64 where SMALLER is
    better; ties break to the smaller id.

    Same single (hash, packed-int64) shuffle as ``exact_dedup``: the
    (priority, id) argmin is one ``min`` over ``priority << 40 | id``
    packed keys, so the per-partition Arrow C++ group_by resolves the
    whole policy without a per-group Python callback. Requires
    ``0 <= id < 2**40`` and ``0 <= priority < 2**23`` (checked).
    Returns (text_hash, id_column, priority_column, n_dups)."""
    import pyarrow.compute as pc

    from .window import hash_agg

    def pack(batch: pa.Table) -> pa.Table:
        t = add_text_hash(batch, column=column)
        ids = t.column(id_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        pri = t.column(priority_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 40)):
            raise ValueError(f"{id_column} outside [0, 2**40)")
        if len(pri) and (pri.min() < 0 or pri.max() >= (1 << 23)):
            raise ValueError(f"{priority_column} outside [0, 2**23)")
        return pa.table({"text_hash": t.column("text_hash"),
                         "packed": pa.array((pri << 40) | ids, pa.int64())})

    agg = hash_agg(ds.map_batches(pack, batch_format="pyarrow"),
                   "text_hash", [("packed", "min", "w"),
                                 ("packed", "count_all", "n_dups")])

    def unpack(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "text_hash": t.column("text_hash"),
            id_column: pa.array(w & ((1 << 40) - 1), pa.int64()),
            priority_column: pa.array(w >> 40, pa.int64()),
            "n_dups": pc.cast(t.column("n_dups"), pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling char k-shingle hashes (uint64)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    n = len(data) - k + 1
    arr = np.frombuffer(data, dtype=np.uint8)
    # polynomial rolling hash, vectorized over all shingles
    h = np.zeros(n, dtype=np.uint64)
    for i in range(k):
        h = h * np.uint64(1099511628211) + arr[i:i + n].astype(np.uint64)
    return np.unique(h)


class MinHasher:
    """Stateful stage: permutation parameters generated once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                 column: str = "text"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.column = column

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.k)
        # multiply-shift universal hashing (wrap-around uint64, no modulo —
        # ~4× faster than (a·x+b) mod p and equally valid for minhash);
        # chunked so (num_perm × n_shingles) stays cache-sized for long docs
        sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        step = 8192
        a = self.a[:, None]
        b = self.b[:, None]
        for i in range(0, len(sh), step):
            chunk = sh[i:i + step]
            vals = a * chunk[None, :] + b
            sig = np.minimum(sig, vals.min(axis=1))
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.zeros((0, self.num_perm), dtype=np.uint64)
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.astype(np.int64).ravel(), pa.int64()), self.num_perm)
        return batch.append_column("minhash", sig_arr)


def _band_explode(batch: pa.Table, *, bands: int, id_column: str) -> pa.Table:
    """(doc_id, sig) → one row per band: (band_key, doc_id, sig-bytes).

    The full signature rides each band row as a binary column so
    verification can happen INSIDE the bucket task — no driver round-trip.
    Cost: num_perm×8 B × bands per doc on the shuffle; verification
    locality is worth it (the alternative re-reads signatures per
    candidate on the driver, which is unbounded on a dup-heavy corpus)."""
    ids = batch.column(id_column)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    n = len(ids)
    sigs = np.asarray(batch.column("minhash").combine_chunks()
                      .flatten().to_numpy(zero_copy_only=False)).reshape(
        n, -1).astype(np.uint64)
    num_perm = sigs.shape[1] if n else 0
    r = num_perm // bands if bands else 0
    # vectorized band keys: FNV-1a fold of each band's r signature values
    # + a band-index salt, over all (doc, band) cells at once
    view = sigs[:, :bands * r].reshape(n, bands, r)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    for j in range(r):
        h = (h ^ view[:, :, j]) * np.uint64(0x100000001B3)
    h = h ^ (np.arange(bands, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))[None, :]
    out_ids = ids.take(pa.array(np.repeat(np.arange(n), bands)))
    sig_bytes = np.array([sigs[i].tobytes() for i in range(n)],
                         dtype=object)
    return pa.Table.from_arrays(
        [pa.array(h.ravel().astype(np.int64), pa.int64()), out_ids,
         pa.array(np.repeat(sig_bytes, bands), pa.binary())],
        names=["band_key", id_column, "sig"])


def _verify_bucket(ids: np.ndarray, sigs: np.ndarray, *, threshold: float,
                   max_distinct_sigs: int, out_l: list, out_r: list,
                   out_e: list) -> None:
    """Within one LSH bucket: append VERIFIED pairs (est Jaccard ≥
    threshold) to the output lists.

    Hot-bucket handling: members are first grouped by signature identity —
    an identity group of size m yields m-1 star pairs to its min-id
    representative (est 1.0), never m²/2. Pairwise estimation then runs
    only across distinct-signature representatives, chunked; buckets with
    more than ``max_distinct_sigs`` distinct signatures (a degenerate band)
    compare only the first that-many representatives, but identity pairs
    are always complete."""
    n = len(ids)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sigs = sigs[order]

    uniq, first_idx, inverse = np.unique(
        sigs, axis=0, return_index=True, return_inverse=True)
    # identity pairs: member → min-id representative of its identity group
    rep_of = {}
    for g in range(len(uniq)):
        members = np.nonzero(inverse == g)[0]
        rep = members[0]  # ids sorted → first member has the min id
        rep_of[g] = rep
        for m in members[1:]:
            out_l.append(ids[rep])
            out_r.append(ids[m])
            out_e.append(1.0)
    # representative pairwise (distinct signatures only), chunked
    r_count = min(len(uniq), max_distinct_sigs)
    reps = uniq[:r_count]
    step = 128
    for i0 in range(0, r_count, step):
        a = reps[i0:i0 + step]
        est = (a[:, None, :] == reps[None, :, :]).mean(axis=2)
        ii, jj = np.nonzero(est >= threshold)
        for i, j in zip(ii, jj):
            gi, gj = i0 + i, j
            if gi >= gj:
                continue
            ra, rb = rep_of[gi], rep_of[gj]
            la, lb = ids[ra], ids[rb]
            if lb < la:
                la, lb = lb, la
            out_l.append(la)
            out_r.append(lb)
            out_e.append(float(est[i, j]))


def _partition_verified_pairs(part: pa.Table, *, id_column: str,
                              threshold: float,
                              max_distinct_sigs: int) -> pa.Table:
    """All buckets of one hash partition (sorted by band_key) in ONE call.

    ``groupby(band_key).map_groups`` pays a Python callback + DataFrame
    construction per bucket; on a mostly-unique corpus ~all buckets are
    singletons, so callback overhead dominates (measured 3.4 s of a 10 s
    sf0.1 run). Here singleton buckets are skipped wholesale with one
    vectorized run-length pass; only multi-member buckets (rare) reach
    Python."""
    from .window import segment_lengths, segment_starts

    keys = part.column("band_key").to_numpy(zero_copy_only=False)
    n = len(keys)
    out_l: list = []
    out_r: list = []
    out_e: list = []
    if n:
        ids_all = part.column(id_column).to_numpy(zero_copy_only=False)
        sig_col = part.column("sig").combine_chunks()
        starts = segment_starts(keys)
        lens = segment_lengths(starts, n)
        width = len(sig_col[0].as_py()) // 8 if n else 0
        for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
            members = slice(int(s), int(s + ln))
            sigs = np.frombuffer(
                b"".join(sig_col[members].to_pylist()),
                dtype=np.uint64).reshape(int(ln), width)
            _verify_bucket(ids_all[members], sigs, threshold=threshold,
                           max_distinct_sigs=max_distinct_sigs,
                           out_l=out_l, out_r=out_r, out_e=out_e)
    return pa.table({
        "left_id": pa.array(out_l, pa.int64()),
        "right_id": pa.array(out_r, pa.int64()),
        "est_jaccard": pa.array(out_e, pa.float64()),
    })


def _minhash_raw_pairs(ds, *, column, id_column, num_perm, bands,
                       threshold, shingle_k, max_distinct_sigs, seed):
    """Verified pairs, possibly repeated across bands (cheap to produce;
    consumers that tolerate duplicate edges — union-find, label
    propagation — skip a whole pair-dedup shuffle by using this
    directly)."""
    from functools import partial

    from ..util import actor_pool
    from .window import map_key_partitions

    sigs = ds.select_columns([id_column, column]).map_batches(
        MinHasher, batch_format="pyarrow", concurrency=actor_pool(),
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, column=column),
    ).drop_columns([column])

    banded = sigs.map_batches(
        _band_explode, batch_format="pyarrow",
        fn_kwargs=dict(bands=bands, id_column=id_column))

    return map_key_partitions(
        banded, "band_key",
        partial(_partition_verified_pairs, id_column=id_column,
                threshold=threshold, max_distinct_sigs=max_distinct_sigs),
        coalesce_rows=16384)


def minhash_pairs(ds, *, column: str = "text", id_column: str = "doc_id",
                  num_perm: int = 64, bands: int = 16,
                  threshold: float = 0.7, shingle_k: int = 5,
                  max_distinct_sigs: int = 1000, seed: int = 42):
    """Verified near-dup pairs as a Dataset (left_id, right_id,
    est_jaccard), deduplicated across bands by a composite-key groupby."""
    from ray.data.aggregate import Max

    pairs = _minhash_raw_pairs(
        ds, column=column, id_column=id_column, num_perm=num_perm,
        bands=bands, threshold=threshold, shingle_k=shingle_k,
        max_distinct_sigs=max_distinct_sigs, seed=seed)
    # a pair found in k bands appears k times — distributed dedup via
    # hash_agg (pair-key group count is row-scale; the sort-aggregate's
    # per-group Python callback would dominate at corpus scale)
    from .window import hash_agg

    return hash_agg(pairs, "left_id",
                    [("est_jaccard", "max", "est_jaccard")],
                    group_cols=["left_id", "right_id"])


def minhash_lsh_dedup(ds, *, column: str = "text", id_column: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7, shingle_k: int = 5,
                      max_distinct_sigs: int = 1000, seed: int = 42):
    """Returns a Dataset (doc_id, cluster_id) for every doc in a near-dup
    cluster; cluster_id = min doc_id of the connected component
    (stages/graph.py — driver union-find under an exactly-counted bound,
    label-propagation rounds above it). Clustering consumes the RAW
    verified pairs: duplicate cross-band edges are harmless to both CC
    paths, which saves the pair-dedup shuffle entirely."""
    from .graph import connected_components

    pairs = _minhash_raw_pairs(
        ds, column=column, id_column=id_column, num_perm=num_perm,
        bands=bands, threshold=threshold, shingle_k=shingle_k,
        max_distinct_sigs=max_distinct_sigs, seed=seed)
    return connected_components(
        pairs, left="left_id", right="right_id",
        node_col=id_column, label_col="cluster_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word features. Stateful: the per-actor
    word→hash cache exploits natural-language vocabulary reuse (bounded;
    cleared past ``cache_limit`` entries so a pathological vocabulary
    can't grow actor memory)."""

    def __init__(self, column: str = "text", cache_limit: int = 1 << 20):
        self.column = column
        self.cache: dict[str, int] = {}
        self.cache_limit = cache_limit

    @staticmethod
    def _word_hash(w: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")

    def simhash64(self, text: str) -> int:
        """Single-doc reference implementation (tests); the batch path
        below is the vectorized equivalent. Uses the same RE2-compatible
        ASCII tokenization as the batch path (see ``ascii_ws_split``) so
        the two agree on Unicode whitespace (NBSP, ideographic space)."""
        words = ascii_ws_split((text or "").lower())
        if not words:
            return 0
        hs = np.array([self._word_hash(w) for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum())

    def _vocab_signed(self, vocab: list) -> np.ndarray:
        """(V, 64) ±1 bit matrix for the batch vocabulary; per-actor
        word→hash cache amortizes blake2b across batches."""
        if len(self.cache) > self.cache_limit:
            self.cache.clear()
        cache = self.cache
        hs = np.fromiter(
            (cache.get(w) or cache.setdefault(w, self._word_hash(w))
             for w in vocab), dtype=np.uint64, count=len(vocab))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
        return (2 * bits.astype(np.int8) - 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch simhash: one Arrow tokenize pass, blake2b only
        over the (cached) batch VOCABULARY, per-token ±1 bit rows summed
        per document with one segmented reduceat — no per-doc Python."""
        import pyarrow.compute as pc

        texts = batch.column(self.column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        out = np.zeros(len(batch), dtype=np.uint64)
        if len(flat):
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            dic = flat.dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            signed = self._vocab_signed(dic.dictionary.to_pylist())
            par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            starts = np.nonzero(np.concatenate(
                ([True], par[1:] != par[:-1])))[0]
            sums = np.add.reduceat(
                signed[codes].astype(np.int32), starts, axis=0)
            out[par[starts]] = (
                (sums > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        return batch.append_column(
            "simhash", pa.array(out.astype(np.int64), pa.int64()))


def simhash_dedup(ds, *, column: str = "text", id_column: str = "doc_id",
                  max_hamming: int = 3, max_distinct: int = 1000):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via pigeonhole
    banding (d+1 bands: any pair within distance d matches on ≥1 band).
    Returns a Dataset (left_id, right_id, hamming); cross-band duplicate
    pairs are deduplicated by a composite-key groupby, not on the driver.

    Hot buckets use the same policy as minhash (module docstring): bucket
    members are first grouped by IDENTICAL simhash — an identity group of
    m docs (boilerplate corpus) emits m-1 star pairs to its min-id
    representative, never m²/2 — and cross-hash comparison runs only
    between distinct-hash representatives, vectorized-popcount in chunks,
    capped at ``max_distinct`` representatives per bucket."""
    from ray.data.aggregate import Min

    n_bands = max_hamming + 1
    from ..util import actor_pool

    hashed = ds.select_columns([id_column, column]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=actor_pool(),
        fn_constructor_kwargs={"column": column}).drop_columns([column])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        width = 64 // n_bands
        # vectorized (doc × band) segment keys: band index in the high
        # bits keeps bands disjoint without string formatting
        shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))
        segs = (hs[:, None] >> shifts[None, :]) & np.uint64(
            (1 << width) - 1)
        keys = segs | (np.arange(n_bands, dtype=np.uint64)
                       << np.uint64(56))[None, :]
        rep = pa.array(np.repeat(np.arange(n), n_bands))
        return pa.Table.from_arrays(
            [pa.array(keys.ravel().astype(np.int64), pa.int64()),
             ids.take(rep),
             pa.array(np.repeat(hs, n_bands).astype(np.int64), pa.int64())],
            names=["band_key", id_column, "simhash"])

    def pairs_in_bucket(ids: np.ndarray, hs: np.ndarray,
                        out_l: list, out_r: list, out_d: list) -> None:
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        hs = hs[order]

        uniq, inverse = np.unique(hs, return_inverse=True)
        # identity pairs: member → min-id representative (hamming 0) —
        # n identical docs cost n-1 pairs, never n²/2
        rep_of = {}
        for gi in range(len(uniq)):
            members = np.nonzero(inverse == gi)[0]
            rep = members[0]  # ids sorted → first member has the min id
            rep_of[gi] = rep
            for m in members[1:]:
                out_l.append(ids[rep])
                out_r.append(ids[m])
                out_d.append(0)
        # cross-hash pairs between representatives only, chunked popcount
        r_count = min(len(uniq), max_distinct)
        reps = uniq[:r_count]
        step = 512
        for i0 in range(0, r_count, step):
            a = reps[i0:i0 + step]
            x = np.ascontiguousarray(a[:, None] ^ reps[None, :])
            d = np.unpackbits(
                x.view(np.uint8).reshape(len(a), r_count, 8),
                axis=2).sum(axis=2)
            ii, jj = np.nonzero((d <= max_hamming) & (d > 0))
            for i, j in zip(ii, jj):
                gi, gj = i0 + i, j
                if gi >= gj:
                    continue
                la, lb = ids[rep_of[gi]], ids[rep_of[gj]]
                if lb < la:
                    la, lb = lb, la
                out_l.append(la)
                out_r.append(lb)
                out_d.append(int(d[i, j]))

    def partition_pairs(part: pa.Table) -> pa.Table:
        # all buckets of one hash partition in one call; singleton
        # buckets (~all of them) are skipped by the run-length pass
        from .window import segment_lengths, segment_starts

        keys = part.column("band_key").to_numpy(zero_copy_only=False)
        out_l: list = []
        out_r: list = []
        out_d: list = []
        if len(keys):
            ids_all = part.column(id_column).to_numpy(zero_copy_only=False)
            hs_all = part.column("simhash").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            starts = segment_starts(keys)
            lens = segment_lengths(starts, len(keys))
            for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
                sl = slice(int(s), int(s + ln))
                pairs_in_bucket(ids_all[sl], hs_all[sl], out_l, out_r, out_d)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    from .window import map_key_partitions

    pairs = map_key_partitions(
        hashed.map_batches(explode, batch_format="pyarrow"),
        "band_key", partition_pairs, coalesce_rows=262144)
    # cross-band pair dedup via hash_agg (row-scale group count)
    from .window import hash_agg

    return hash_agg(pairs, "left_id", [("hamming", "min", "hamming")],
                    group_cols=["left_id", "right_id"])


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(ds, *, threshold: float = 0.95,
                    column: str = "embedding", id_column: str = "vec_id",
                    n_tables: int = 12, n_bits: int = 6, seed: int = 11,
                    max_distinct: int = 4096, tile: int = 256):
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH buckets (reusing the ANN bucketer) so
    only vectors sharing a sign-pattern bucket are compared — candidate
    generation is O(rows × tables), never O(rows²); pairs are verified with
    exact cosine inside each bucket. High thresholds (≥0.9) have near-1
    bucket-collision probability with this table count. Returns a Dataset
    (left_id, right_id, cosine), deduplicated across tables distributively.

    Hot buckets (template-expanded corpora put thousands of near-identical
    embeddings in ONE bucket) use the minhash policy: byte-identical
    vectors collapse to identity groups first — m copies emit m-1 star
    pairs (cosine 1.0) to the min-id representative, never m²/2 — then
    cross-vector cosine runs only between distinct representatives, in
    ``tile``-row matmul tiles (memory O(tile × bucket), never O(bucket²))
    and capped at ``max_distinct`` representatives per bucket.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max

    from .ann import _LshBucketer, make_planes

    # probe the dim from one row
    first = ds.take(1)
    if not first:
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    dim = len(first[0][column])
    planes_ref = ray.put(make_planes(dim, n_tables, n_bits, seed))

    from ..util import actor_pool

    bucketed = ds.select_columns([id_column, column]).map_batches(
        _LshBucketer, batch_format="pyarrow", batch_size=2048,
        concurrency=actor_pool(),
        fn_constructor_kwargs=dict(planes_ref=planes_ref, column=column,
                                   id_column=id_column))

    def pairs_in_bucket(ids: np.ndarray, mat: np.ndarray,
                        out_l: list, out_r: list, out_c: list) -> None:
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = mat[order]  # already L2-normalized

        # identity groups: byte-identical vectors → star pairs to min id
        uniq, inverse = np.unique(mat, axis=0, return_inverse=True)
        inverse = inverse.ravel()
        rep_of = {}
        for gi in range(len(uniq)):
            members = np.nonzero(inverse == gi)[0]
            rep = members[0]  # ids sorted → first member has the min id
            rep_of[gi] = rep
            for m in members[1:]:
                out_l.append(int(ids[rep]))
                out_r.append(int(ids[m]))
                out_c.append(1.0)
        # cross pairs between distinct representatives only, tiled matmul
        r_count = min(len(uniq), max_distinct)
        reps = uniq[:r_count]
        for i0 in range(0, r_count, tile):
            a = reps[i0:i0 + tile]
            sims = a @ reps.T  # (tile, r_count) — bounded memory
            ii, jj = np.nonzero(sims >= threshold)
            for i, j in zip(ii, jj):
                gi, gj = i0 + i, int(j)
                if gi >= gj:
                    continue
                la, lb = int(ids[rep_of[gi]]), int(ids[rep_of[gj]])
                if lb < la:
                    la, lb = lb, la
                out_l.append(la)
                out_r.append(lb)
                out_c.append(round(float(sims[i, j]), 6))

    def partition_pairs(part: pa.Table) -> pa.Table:
        # all buckets of one hash partition per call; singleton buckets
        # skipped by the run-length pass, vectors decoded zero-copy once
        from .window import segment_lengths, segment_starts

        keys = part.column("bucket").to_numpy(zero_copy_only=False)
        out_l: list = []
        out_r: list = []
        out_c: list = []
        if len(keys):
            ids_all = part.column(id_column).to_numpy(zero_copy_only=False)
            vecs = part.column("vec").combine_chunks()
            mat_all = vecs.flatten().to_numpy(
                zero_copy_only=False).reshape(len(keys), -1)
            starts = segment_starts(keys)
            lens = segment_lengths(starts, len(keys))
            for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
                sl = slice(int(s), int(s + ln))
                pairs_in_bucket(ids_all[sl], mat_all[sl],
                                out_l, out_r, out_c)
        return pa.table({"left_id": pa.array(out_l, pa.int64()),
                         "right_id": pa.array(out_r, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    from .window import map_key_partitions

    pairs = map_key_partitions(bucketed, "bucket", partition_pairs,
                               coalesce_rows=32768)
    # cross-table pair dedup via hash_agg (row-scale group count)
    from .window import hash_agg

    return hash_agg(pairs, "left_id", [("cosine", "max", "cosine")],
                    group_cols=["left_id", "right_id"])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verifier)
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set:
    """Single-doc reference for the batch shingle path — same
    RE2-compatible tokenization (``ascii_ws_split``) so verifier and
    batch agree on Unicode whitespace."""
    words = ascii_ws_split((text or "").lower())
    return {tuple(words[i:i + n]) for i in range(max(0, len(words) - n + 1))}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = word_ngrams(a, n), word_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# cluster / apply helpers (API symmetry across the dedup family)
# ---------------------------------------------------------------------------

def simhash_clusters(ds, *, column: str = "text", id_column: str = "doc_id",
                     max_hamming: int = 3):
    """SimHash pairs → (doc_id, cluster_id) via connected components."""
    from .graph import connected_components

    pairs = simhash_dedup(ds, column=column, id_column=id_column,
                          max_hamming=max_hamming)
    return connected_components(pairs, node_col=id_column,
                                label_col="cluster_id")


def embedding_dedup_clusters(ds, *, threshold: float = 0.95,
                             column: str = "embedding",
                             id_column: str = "vec_id", **kwargs):
    """Embedding-cosine pairs → (vec_id, cluster_id) via connected
    components."""
    from .graph import connected_components

    pairs = embedding_dedup(ds, threshold=threshold, column=column,
                            id_column=id_column, **kwargs)
    return connected_components(pairs, node_col=id_column,
                                label_col="cluster_id")


def drop_exact_duplicates(ds, *, column: str = "text",
                          id_column: str = "doc_id",
                          extra_columns: tuple[str, ...] = ()):
    """Keep one representative (min id) per distinct content: the
    exact-dedup keep-list semi-joined back onto the stream (one bucket
    shuffle; the payload rides the join, the keep list is one row per
    distinct content)."""
    from .join import hash_join

    reps = exact_dedup(ds, column=column, id_column=id_column
                       ).select_columns([id_column]).map_batches(
        lambda t: t.append_column(
            "keep_e", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")
    return hash_join(
        ds, reps, key=id_column,
        left_cols=[column, *extra_columns], right_cols=["keep_e"],
        right_types={"keep_e": pa.int64()},
    ).drop_columns(["keep_e"])


# ---------------------------------------------------------------------------
# Cross-run incremental dedup (persisted hash index)
# ---------------------------------------------------------------------------

def incremental_exact_dedup(ds, index_dir: str, *, column: str = "text",
                            id_column: str = "doc_id"):
    """Dedup NEW data against a PERSISTED content-hash index from all
    previous runs, then extend the index — the cross-run form of
    ``exact_dedup`` for continuously-ingested corpora.

    Shape: the new batch is first self-deduped (min-id per hash), then
    anti-joined against the stored index on ``text_hash`` (a big-big
    hash join when the index is large — one shuffle of hash+id only,
    payloads never move), and the surviving hashes are APPENDED to the
    index as a new ``run-*/`` parquet subdirectory (distributed write,
    nothing on the driver). The index is an append-only set of hash
    runs: duplicate hashes across runs are harmless because membership
    is what matters, and a periodic compaction can re-unique it.

    Returns (kept Dataset of (id, text_hash) survivors, n_new_hashes).
    """
    import os
    import uuid

    import ray.data as rd
    from .join import hash_join

    os.makedirs(index_dir, exist_ok=True)
    run_dirs = [os.path.join(index_dir, d) for d in os.listdir(index_dir)
                if d.startswith("run-")]

    self_deduped = exact_dedup(ds, column=column, id_column=id_column
                               ).select_columns(["text_hash", id_column])
    in_schema = ds.schema(fetch_if_missing=False)
    id_type = (in_schema.base_schema.field(id_column).type
               if in_schema is not None else None)

    if run_dirs:
        def mark_seen(t: pa.Table) -> pa.Table:
            distinct = t.group_by("text_hash").aggregate([])
            return distinct.append_column(
                "seen", pa.array([1] * len(distinct), pa.int64()))

        run_files = [os.path.join(d, f) for d in run_dirs
                     for f in os.listdir(d) if f.endswith(".parquet")]
        seen = rd.read_parquet(run_files, columns=["text_hash"]
                               ).map_batches(mark_seen,
                                             batch_format="pyarrow")
        joined = hash_join(self_deduped, seen, key="text_hash",
                           left_cols=[id_column], right_cols=["seen"],
                           how="left",
                           left_types={"text_hash": pa.string(),
                                       **({id_column: id_type}
                                          if id_type else {})},
                           right_types={"seen": pa.int64()})

        def unseen_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return t.filter(_pc.is_null(t.column("seen"))).select(
                ["text_hash", id_column])

        kept = joined.map_batches(unseen_only, batch_format="pyarrow")
    else:
        kept = self_deduped
    kept = kept.materialize()

    out_dir = os.path.join(index_dir, f"run-{uuid.uuid4().hex}")
    kept.select_columns(["text_hash"]).write_parquet(out_dir)
    return kept, kept.count()


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (inverted shingle index, stop-gram pruned)
# ---------------------------------------------------------------------------

def _doc_ngrams_batch(batch: pa.Table, *, column: str, id_column: str,
                      n: int) -> pa.Table:
    """Distinct lower-cased word ``n``-grams per document, fully in Arrow:
    RE2 \\s+ tokenize → n-gram strings via offset-sliced
    ``binary_join_element_wise`` → per-(doc, ngram) distinct. Documents are
    atomic rows, so per-batch distinct == global distinct."""
    import pyarrow.compute as pc

    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(parent, pa.ChunkedArray):
        parent = parent.combine_chunks()
    if len(flat) < n:
        try:
            import polars  # noqa: F401
            empty_t = pa.int64()
        except ImportError:
            empty_t = pa.string()
        return pa.table({id_column: pa.array([], batch.column(id_column).type),
                         "ng": pa.array([], empty_t)})
    parts = [flat.slice(i, len(flat) - n + 1) for i in range(n)]
    ngrams = pc.binary_join_element_wise(*parts, " ")
    head = parent.slice(0, len(parent) - n + 1)
    same_doc = pc.equal(head, parent.slice(n - 1, len(parent) - n + 1))
    ngrams = ngrams.filter(same_doc)
    ids = batch.column(id_column).take(head.filter(same_doc))
    # shuffle int64 xxhashes of the ngrams, never the strings (polars
    # vectorized hash, fixed seed — deterministic within a polars
    # version; a 64-bit collision among distinct shingles is ~p²/2⁶⁵ and
    # would only perturb one intersection count)
    try:
        import polars as pl

        key = pa.array(pl.from_arrow(ngrams).hash(seed=7).to_numpy()
                       .astype(np.int64), pa.int64())
    except ImportError:  # correct but string-shuffle fallback
        key = ngrams
    distinct = pa.table({id_column: ids, "ng": key}).group_by(
        [id_column, "ng"]).aggregate([])
    return distinct.replace_schema_metadata(None)


def _pairs_from_partition(t: pa.Table, *, id_column: str) -> pa.Table:
    """All intra-group (left < right) doc pairs for every ngram group in a
    hash partition, one vectorized emission: triangular-index decode
    (scipy-squareform formulas) over numpy segment arrays — no per-ngram
    Python. Group size is globally df-capped upstream, so the pair count
    per group is <= max_df^2/2 by construction."""
    import pyarrow.compute as pc

    from .window import segment_lengths

    col = t.column("ng").combine_chunks()
    docs = t.column(id_column).combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(docs) and (docs.min() < 0 or docs.max() >= (1 << 31)):
        raise ValueError("ngram_jaccard_dedup packs doc-id pairs into one "
                         "int64; ids must be in [0, 2^31)")
    if len(col) == 0:
        return pa.table({"pk": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    # run boundaries of the sorted string key, computed in Arrow (no
    # per-row Python string compares)
    new = pc.not_equal(col.slice(1), col.slice(0, len(col) - 1))
    starts = np.nonzero(np.concatenate(
        ([True], new.to_numpy(zero_copy_only=False))))[0].astype(np.int64)
    lens = segment_lengths(starts, len(col))
    sel = lens >= 2
    starts, lens = starts[sel], lens[sel]
    counts = lens * (lens - 1) // 2
    total = int(counts.sum())
    if total == 0:
        return pa.table({"pk": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    seg = np.repeat(np.arange(len(lens)), counts)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    tloc = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
    length = lens[seg]
    a = (length - 2 - np.floor(
        (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0) - 1.0)
        / 2.0)).astype(np.int64)
    b = tloc + a + 1 - length * (length - 1) // 2 \
        + (length - a) * (length - a - 1) // 2
    base = starts[seg]
    # rows are sorted by (ng, id), so a < b implies left < right; pack the
    # pair into ONE int64 (ids < 2^31) and pre-aggregate the partition's
    # duplicate pairs with np.unique — the downstream exchange then moves
    # (packed pair, partial count) rows and never needs a two-column
    # full-key sort
    pk = (docs[base + a] << np.int64(31)) | docs[base + b]
    pku, cnt = np.unique(pk, return_counts=True)
    return pa.table({"pk": pa.array(pku, pa.int64()),
                     "c": pa.array(cnt.astype(np.int64), pa.int64())})


def ngram_jaccard_dedup(ds, *, column: str = "text",
                        id_column: str = "doc_id", n: int = 3,
                        threshold: float = 0.4, max_df: int = 32,
                        num_buckets: int = 64,
                        metric: str = "jaccard"):
    """EXACT word-n-gram Jaccard near-dup pairs (no sketch approximation):

    1. distinct (doc, ngram) rows, Arrow-vectorized per batch;
    2. global document frequency per ngram; ngrams with df > ``max_df``
       are stop shingles — boilerplate that carries no dedup signal —
       and are dropped from the universe on BOTH the candidate and the
       denominator side (the hot-group hazard is excluded by definition:
       no inverted-index posting list ever exceeds ``max_df``);
    3. candidate pairs from the surviving inverted index
       (``map_key_partitions`` by ngram + vectorized triangular decode —
       one callback per hash partition, not per ngram), then one int-key
       ``groupby(left,right)`` count = exact |A ∩ B|;
    4. jaccard = inter / (|A| + |B| - inter) with per-doc surviving-set
       sizes broadcast once via ``ray.put`` as sorted arrays
       (searchsorted lookup; O(#docs * 16 B) — beyond ~10^8 docs swap
       the broadcast for two ``stages/join.hash_join`` passes).

    Returns (left_id, right_id, n_common, jaccard) for jaccard >=
    ``threshold``, jaccard rounded to 6 dp. Matches a DuckDB oracle that
    mirrors the same tokenization (RE2 ``\\s+``), df cap and universe.

    ``metric="overlap"`` scores the OVERLAP COEFFICIENT instead —
    |A∩B| / min(|A|, |B|) — the asymmetric-containment signal that
    catches quote-expansion / subset duplicates Jaccard misses (a short
    doc fully contained in a long one scores 1.0 here but near 0 on
    Jaccard). Same candidate universe, same exchanges; only the final
    vectorized score changes. The score column keeps the schema name
    ``jaccard`` either way — callers rename at the query surface.
    """
    import ray
    from ray.data.aggregate import Count

    from .window import map_key_partitions

    pairs = ds.map_batches(
        _doc_ngrams_batch, batch_format="pyarrow",
        fn_kwargs={"column": column, "id_column": id_column, "n": n},
    ).materialize()  # consumed 3x (df, sizes, index) — tokenize once

    # hash_agg: one group per distinct shingle is row-scale cardinality
    from .window import hash_agg

    dfc = hash_agg(pairs, "ng", [("ng", "count_all", "df")])

    def only_stop(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("df"), max_df)).select(["ng"])

    stop_batches = [b for b in dfc.map_batches(
        only_stop, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow")]
    stop_list = (pa.concat_tables(stop_batches).column("ng").combine_chunks()
                 if stop_batches else None)
    if isinstance(stop_list, pa.ChunkedArray):
        stop_list = stop_list.combine_chunks()
    stop_ref = ray.put(stop_list)

    def drop_stop(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sl = ray.get(stop_ref)
        if sl is None or len(sl) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t.column("ng"),
                                           value_set=sl)))

    surv = pairs.map_batches(drop_stop, batch_format="pyarrow")

    sizes = hash_agg(surv, id_column, [("ng", "count_all", "sz")])
    sz_tbl = pa.concat_tables(
        [b for b in sizes.iter_batches(batch_format="pyarrow")]
    ).combine_chunks().sort_by(id_column)
    sz_ids = ray.put(sz_tbl.column(id_column).to_numpy(
        zero_copy_only=False).astype(np.int64))
    sz_vals = ray.put(sz_tbl.column("sz").to_numpy(
        zero_copy_only=False).astype(np.int64))

    partials = map_key_partitions(
        surv, "ng", lambda t: _pairs_from_partition(t, id_column=id_column),
        num_buckets=num_buckets, sort_cols=[id_column])

    def sum_and_score(t: pa.Table) -> pa.Table:
        """Per-pk partition: segment-sum the partial counts (exact |A∩B|),
        unpack the pair, jaccard + threshold — the heavy candidate volume
        dies inside this bucket task."""
        from .window import segment_starts, segment_lengths

        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "n_common": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        pk = t.column("pk").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = t.column("c").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = segment_starts(pk)
        common = np.add.reduceat(c, starts)
        pku = pk[starts]
        li = pku >> np.int64(31)
        ri = pku & np.int64((1 << 31) - 1)
        ids_np = ray.get(sz_ids)
        vals_np = ray.get(sz_vals)
        sa = vals_np[np.searchsorted(ids_np, li)].astype(np.float64)
        sb = vals_np[np.searchsorted(ids_np, ri)].astype(np.float64)
        raw = (common / np.minimum(sa, sb) if metric == "overlap"
               else common / (sa + sb - common))
        # threshold on the UNROUNDED ratio (the oracle's WHERE clause
        # does the same); round only the reported value
        keep = raw >= threshold
        jac = np.round(raw, 6)
        return pa.table({
            "left_id": pa.array(li[keep], pa.int64()),
            "right_id": pa.array(ri[keep], pa.int64()),
            "n_common": pa.array(common[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64())})

    return map_key_partitions(partials, "pk", sum_and_score,
                              num_buckets=num_buckets)


def duplicate_passage_stats(ds, *, column: str = "text",
                            id_column: str = "doc_id", n: int = 3,
                            min_df: int = 2, num_buckets: int = 64):
    """Per-document duplicated-passage statistics: how much of each
    document is word-``n``-gram content that also occurs in at least
    ``min_df - 1`` OTHER documents — the doc-level signal behind
    substring-dedup / repeated-passage pruning policies (Lee et al.
    2022 style, at n-gram granularity).

    ONE exchange on the ngram key: every row of an ngram lands in the
    same hash partition (``map_key_partitions``), so a sorted segment's
    length IS the ngram's document frequency — no df table, no second
    join. The flagged rows then take one int-key groupby back to docs.

    Returns (doc_id, n_ngrams, n_dup, dup_ratio): distinct n-grams,
    how many of them are duplicated corpus-wide, and their ratio
    (rounded 6dp). Documents with fewer than ``n`` words have no
    n-grams and produce no row — the same universe as the SQL oracle.

    PARTITIONING ASSUMPTION: one ngram's full posting list (df rows)
    lands in one partition, so the hottest ngram's df must fit a task.
    At corpus scales where universal boilerplate ngrams approach the
    doc count, switch to the three-exchange shape: map-side partial
    (ng, count) combiner → groupby-sum df (hot keys are pre-reduced per
    block) → ``hash_join(grams, df, hot_keys="auto")`` salted flag join
    — or prune stop ngrams up front as ``ngram_jaccard_dedup`` does
    with its ``max_df`` cap.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .window import map_key_partitions, segment_lengths, segment_starts

    grams = ds.map_batches(
        _doc_ngrams_batch, batch_format="pyarrow",
        fn_kwargs={"column": column, "id_column": id_column, "n": n})

    def flag_partition(t: pa.Table) -> pa.Table:
        """df per ngram (segment length) → PER-DOC PARTIALS within the
        partition (np.unique + bincount), so the doc exchange moves one
        row per (partition, doc) instead of one per (doc, ngram)."""
        keys = t.column("ng").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "c_all": pa.array([], pa.int64()),
                             "c_dup": pa.array([], pa.int64())})
        ids = t.column(id_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = segment_starts(keys)
        lens = segment_lengths(starts, len(keys))
        is_dup = np.repeat(lens >= min_df, lens)
        uids, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            id_column: pa.array(uids, pa.int64()),
            "c_all": pa.array(np.bincount(inv, minlength=len(uids))
                              .astype(np.int64), pa.int64()),
            "c_dup": pa.array(np.bincount(inv, weights=is_dup,
                                          minlength=len(uids))
                              .astype(np.int64), pa.int64())})

    flagged = map_key_partitions(grams, "ng", flag_partition,
                                 num_buckets=num_buckets,
                                 coalesce_rows=262144,
                                 producer_expands=True)
    from .window import hash_agg

    stats = hash_agg(flagged, id_column,
                     [("c_all", "sum", "n_ngrams"),
                      ("c_dup", "sum", "n_dup")])

    def ratio(t: pa.Table) -> pa.Table:
        r = pc.round(pc.divide(
            pc.cast(t.column("n_dup"), pa.float64()),
            pc.cast(t.column("n_ngrams"), pa.float64())), ndigits=6,
            round_mode="half_towards_infinity")  # = DuckDB round() on positives
        return t.append_column("dup_ratio", r)

    return stats.map_batches(ratio, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cross-corpus near-dup detection (decontaminate train against eval)
# ---------------------------------------------------------------------------

def cross_corpus_near_dups(train, evalset, *, column: str = "text",
                           id_column: str = "doc_id",
                           threshold: float = 0.7, **minhash_kwargs):
    """Train docs that are MinHash near-dups of any eval doc — the
    similarity-level complement of exact n-gram decontamination
    (stages/decontam.py): paraphrased or lightly-edited eval leakage
    that no exact n-gram match catches. Both corpora are tagged
    map-side and share ONE banded LSH pass (``minhash_pairs`` on the
    union). Flagging is COMPONENT-level, not pair-level, on purpose:
    the hot-bucket star-pair policy emits an identity group as a star
    to its min-id representative, so a train doc may reach an eval doc
    only through intra-train edges — connected components recover
    exactly those transitive leaks. Returns (train_id, eval_id) where
    eval_id is the smallest eval doc in the train doc's near-dup
    cluster.

    Ids must be disjoint across the two inputs (enforced by the odd/even
    tag bit): ids are tagged ``2·id`` (train) / ``2·id + 1`` (eval) so
    side membership survives every shuffle without a lookup structure."""
    import pyarrow.compute as pc

    from .graph import connected_components
    from .window import map_key_partitions, segment_lengths, segment_starts

    def tag(factor_add):
        def f(t: pa.Table) -> pa.Table:
            ids = pc.add(pc.multiply(t.column(id_column),
                                     pa.scalar(2, pa.int64())),
                         pa.scalar(factor_add, pa.int64()))
            return t.drop_columns([id_column]).append_column(
                id_column, pc.cast(ids, pa.int64()))
        return f

    union = train.map_batches(tag(0), batch_format="pyarrow").union(
        evalset.map_batches(tag(1), batch_format="pyarrow"))
    pairs = minhash_pairs(union, column=column, id_column=id_column,
                          threshold=threshold, **minhash_kwargs)
    memb = connected_components(pairs, node_col="node",
                                label_col="cluster_id")

    INF = np.int64(1 << 62)

    def flag_clusters(t: pa.Table) -> pa.Table:
        nodes = t.column("node").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        cl = t.column("cluster_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(nodes) == 0:
            return pa.table({"train_id": pa.array([], pa.int64()),
                             "eval_id": pa.array([], pa.int64())})
        starts = segment_starts(cl)
        lens = segment_lengths(starts, len(cl))
        is_eval = (nodes & 1) == 1
        eval_untag = np.where(is_eval, nodes >> 1, INF)
        min_eval = np.repeat(np.minimum.reduceat(eval_untag, starts),
                             lens)
        keep = (~is_eval) & (min_eval < INF)
        return pa.table({
            "train_id": pa.array(nodes[keep] >> 1, pa.int64()),
            "eval_id": pa.array(min_eval[keep], pa.int64())})

    return map_key_partitions(memb, "cluster_id", flag_clusters)


def sorted_neighborhood_dups(ds, *, column: str = "text",
                             id_column: str = "doc_id",
                             key_chars: int = 16, bucket_chars: int = 3,
                             window: int = 4, group_ranks: int = 4096,
                             num_buckets: int = 32):
    """Sorted-neighborhood dedup (Hernández & Stolfo): sort the corpus by
    a cheap blocking key (the lowercased ``key_chars``-char prefix, ties
    by id), slide a ``window``-row window down the GLOBAL sort order, and
    keep window pairs whose exact word-set Jaccard is >= 0.5 — the
    classic cheap-blocking alternative to LSH when near-dups share
    prefixes (mirrors, truncations, re-crawls).

    Distributed in three scale-safe phases, none of which moves the
    corpus through the driver:

    1. GLOBAL RANK without a global sort: rows hash-partition by the
       ``bucket_chars``-char key prefix (a prefix of the sort key, so
       bucket order == key order); per-bucket counts (bounded by the
       prefix vocabulary) come to the driver for an exclusive prefix
       offset, and each partition assigns dense ranks locally.
    2. BOUNDARY-OVERLAP window grouping: rank-range groups of
       ``group_ranks`` rows; the first ``window-1`` rows of each group
       are REPLICATED into the previous group (flagged non-native), so
       every window pair is co-located in exactly one task and anchored
       at a native row — no pair is emitted twice, none is lost at a
       group boundary.
    3. In-task verify, fully vectorized: the partition's texts are
       tokenized in one Arrow pass, dictionary-encoded to integer codes,
       and per-pair intersection sizes for every rank shift k<window
       come from ONE sorted-membership probe per k (packed (code, row)
       keys + searchsorted) — no per-pair Python.

    Returns a Dataset of (left_id, right_id, n_common) with
    left rank < right rank. Partitioning assumptions: one 3-char key
    prefix's rows fit one task (split finer via ``bucket_chars`` for
    skewed corpora), and ``group_ranks`` rows of payload fit one task.
    """
    import pyarrow.compute as pc

    import ray

    from .window import (map_key_partitions, segment_lengths,
                         segment_starts)

    def keyed(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t.column(column))
        return pa.table({
            id_column: pc.cast(t.column(id_column), pa.int64()),
            "text": low,
            "k": pc.utf8_slice_codeunits(low, 0, key_chars),
            "b": pc.utf8_slice_codeunits(low, 0, bucket_chars),
        })

    kd = ds.map_batches(keyed, batch_format="pyarrow")

    # phase 1a: bucket counts -> driver exclusive prefix (bucket order is
    # lexicographic == global key order, because b is a prefix of k)
    def bcount(t: pa.Table) -> pa.Table:
        g = t.select(["b"]).group_by("b").aggregate([([], "count_all")])
        return pa.table({"b": g.column("b"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    counts = kd.map_batches(bcount, batch_format="pyarrow").to_pandas()
    counts = counts.groupby("b")["c"].sum().sort_index()
    off = counts.cumsum().shift(fill_value=0).to_dict()
    off_ref = ray.put(off)

    # phase 1b: dense global ranks inside per-bucket partitions
    def rank_fn(t: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        b = np.asarray(t.column("b").to_pylist(), dtype=object)
        if not len(b):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "text": pa.array([], pa.string()),
                             "rank": pa.array([], pa.int64())})
        starts = segment_starts(b)
        lens = segment_lengths(starts, len(b))
        local = np.arange(len(b), dtype=np.int64) - np.repeat(
            starts, lens)
        base = np.repeat(np.array([offs[x] for x in b[starts]],
                                  dtype=np.int64), lens)
        return pa.table({id_column: t.column(id_column),
                         "text": t.column("text"),
                         "rank": pa.array(base + local, pa.int64())})

    ranked = map_key_partitions(kd, "b", rank_fn,
                                sort_cols=["k", id_column],
                                num_buckets=num_buckets)

    # phase 2: rank-range groups + boundary replicas
    w1 = window - 1

    def tag_groups(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        gid = r // group_ranks
        nat = t.append_column("gid", pa.array(gid, pa.int64()))
        nat = nat.append_column("native",
                                pa.array(np.ones(len(r), bool)))
        rep_mask = (gid > 0) & (r % group_ranks < w1)
        rep = t.filter(pa.array(rep_mask))
        rep = rep.append_column(
            "gid", pa.array(gid[rep_mask] - 1, pa.int64()))
        rep = rep.append_column(
            "native", pa.array(np.zeros(int(rep_mask.sum()), bool)))
        return pa.concat_tables([nat, rep])

    tagged = ranked.map_batches(tag_groups, batch_format="pyarrow")

    def pair_fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"left_id": pa.array([], pa.int64()),
                          "right_id": pa.array([], pa.int64()),
                          "n_common": pa.array([], pa.int64())})
        n = len(t)
        if n < 2:
            return empty
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        ranks = t.column("rank").to_numpy(zero_copy_only=False)
        native = t.column("native").to_numpy(zero_copy_only=False)
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        rows = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        # unique (code, row) tokens, packed and sorted for membership
        q = np.unique(codes * np.int64(n) + rows)
        r_of = q % n
        sz = np.bincount(r_of, minlength=n)
        out_l, out_r, out_c = [], [], []
        for k in range(1, window):
            cand = q + k
            ok = r_of + k < n
            idx = np.searchsorted(q, cand)
            idx[idx >= len(q)] = 0
            hit = ok & (q[idx] == cand)
            common = np.bincount(r_of[hit], minlength=n)
            i = np.arange(n - k)
            m = native[:-k] & (ranks[k:] - ranks[:-k] == k)
            c = common[i]
            # Jaccard >= 0.5, exact integers: 2*|A∩B| >= |A|+|B|-|A∩B|
            m &= (c > 0) & (2 * c >= sz[:-k] + sz[k:] - c)
            out_l.append(ids[:-k][m])
            out_r.append(ids[k:][m])
            out_c.append(c[m])
        return pa.table({
            "left_id": pa.array(np.concatenate(out_l), pa.int64()),
            "right_id": pa.array(np.concatenate(out_r), pa.int64()),
            "n_common": pa.array(np.concatenate(out_c), pa.int64())})

    return map_key_partitions(tagged, "gid", pair_fn,
                              sort_cols=["rank"],
                              num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# merged duplicate-span coverage (substring-dedup diagnostic)
# ---------------------------------------------------------------------------

def duplicate_span_stats(ds, *, column: str = "text",
                         id_column: str = "doc_id", n: int = 5,
                         min_count: int = 2, num_buckets: int = 64):
    """Merged duplicate-SPAN coverage per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", at word
    granularity): the fraction of each document's tokens covered by at
    least one word-``n``-gram that occurs ``min_count``+ times
    corpus-wide (all occurrences counted — intra- and inter-document).

    This is the SPAN complement of ``duplicate_passage_stats``: that
    one counts how many *distinct n-grams* are duplicated; this one
    merges the *positions* of duplicated n-grams into intervals
    (each n-gram at token position p covers [p, p+n-1]) and reports the
    union length — the quantity substring-dedup would actually remove.

    Shape: tokenize map (occurrences keep their doc-relative token
    position) → ONE exchange on the int64 ngram hash, where a sorted
    segment's length IS the n-gram's corpus frequency, flagged
    occurrences return as (doc, pos) → ONE exchange on the doc id,
    where interval union over sorted positions is a vectorized
    np.diff/np.minimum sweep (union length = Σ min(n, next_pos − pos)
    with n for each run's last position) → left join with per-doc
    token totals. Positions ride the ngram exchange, so the hottest
    n-gram's posting list must fit one task — same partitioning
    assumption (and same ``max_df``-style escape hatch) as
    ``duplicate_passage_stats``.

    Returns (doc_id, n_tokens, covered_tokens, dup_span_ratio) for
    every document with ≥1 token, sorted by doc_id.
    """
    import pyarrow.compute as pc

    from .join import hash_join
    from .window import map_key_partitions, segment_lengths, segment_starts

    def positions(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        total = len(flat)
        empty = pa.table({"ng": pa.array([], pa.int64()),
                          id_column: pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if total < n:
            return empty
        parent_np = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(parent_np, minlength=len(batch))
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        pos = np.arange(total, dtype=np.int64) - starts[parent_np]
        parts = [flat.slice(i, total - n + 1) for i in range(n)]
        ngrams = pc.binary_join_element_wise(*parts, " ")
        head = parent_np[:total - n + 1]
        same = head == parent_np[n - 1:]
        if not same.any():
            return empty
        ngrams = ngrams.filter(pa.array(same))
        ids = pc.cast(batch.column(id_column).take(pa.array(head[same])),
                      pa.int64())
        # exchange int64 xxhashes, not strings (the _doc_ngrams_batch
        # idiom: a 64-bit collision among distinct shingles is ~p²/2⁶⁵)
        import polars as pl

        key = pa.array(pl.from_arrow(ngrams).hash(seed=7).to_numpy()
                       .astype(np.int64), pa.int64())
        return pa.table({"ng": key, id_column: ids,
                         "pos": pa.array(pos[:total - n + 1][same],
                                         pa.int64())})

    grams = ds.map_batches(positions, batch_format="pyarrow")

    def flag(t: pa.Table) -> pa.Table:
        keys = t.column("ng").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        seg = segment_starts(keys)
        lens = segment_lengths(seg, len(keys))
        is_dup = np.repeat(lens >= min_count, lens)
        return pa.table({
            id_column: pa.array(t.column(id_column).to_numpy(
                zero_copy_only=False)[is_dup], pa.int64()),
            "pos": pa.array(t.column("pos").to_numpy(
                zero_copy_only=False)[is_dup], pa.int64())})

    dup_pos = map_key_partitions(grams, "ng", flag,
                                 num_buckets=num_buckets,
                                 coalesce_rows=262144,
                                 producer_expands=True)

    def cover(t: pa.Table) -> pa.Table:
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "covered_tokens": pa.array([], pa.int64())})
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        new = np.r_[True, ids[1:] != ids[:-1]]
        last = np.r_[new[1:], True]
        gap = np.empty(len(pos), np.int64)
        gap[:-1] = pos[1:] - pos[:-1]
        gap[-1] = n
        step = np.where(last, n, np.minimum(n, gap))
        covered = np.add.reduceat(step, np.flatnonzero(new))
        return pa.table({
            id_column: pa.array(ids[new], pa.int64()),
            "covered_tokens": pa.array(covered.astype(np.int64),
                                       pa.int64())})

    covered = map_key_partitions(dup_pos, id_column, cover,
                                 sort_cols=["pos"],
                                 num_buckets=num_buckets)

    def totals(batch: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            batch.column(column), pattern=r"\S+"), pa.int64())
        out = pa.table({id_column: pc.cast(batch.column(id_column),
                                           pa.int64()),
                        "n_tokens": nt})
        return out.filter(pc.greater(out.column("n_tokens"), 0))

    tot = ds.map_batches(totals, batch_format="pyarrow")

    joined = hash_join(
        tot, covered, key=id_column, left_cols=["n_tokens"],
        right_cols=["covered_tokens"], how="left",
        num_buckets=num_buckets,
        left_types={id_column: pa.int64(), "n_tokens": pa.int64()},
        right_types={id_column: pa.int64(),
                     "covered_tokens": pa.int64()})

    def finish(t: pa.Table) -> pa.Table:
        cov = pc.coalesce(t.column("covered_tokens"),
                          pa.scalar(0, pa.int64()))
        ratio = pc.round(pc.divide(pc.cast(cov, pa.float64()),
                                   pc.cast(t.column("n_tokens"),
                                           pa.float64())), ndigits=6,
                         round_mode="half_towards_infinity")
        return pa.table({id_column: t.column(id_column),
                         "n_tokens": t.column("n_tokens"),
                         "covered_tokens": cov,
                         "dup_span_ratio": ratio})

    return joined.map_batches(finish, batch_format="pyarrow")
