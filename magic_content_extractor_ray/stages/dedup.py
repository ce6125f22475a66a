"""Deduplication operators for large-scale training-data pipelines.

All are Ray-Data-first:

- ``exact_dedup``: content-hash in a vectorized ``map_batches`` →
  ``groupby(hash)`` keep min(doc_id). The only shuffle moves (hash, doc_id)
  pairs, never the payload.
- ``minhash_lsh_dedup``: char-shingle → minhash signature (numpy, per batch)
  → band explode → ``groupby(band_key)`` bucket → candidate pairs → verify
  by signature-estimated Jaccard → connected components via min-label
  propagation on the driver (candidate graph is tiny relative to the
  corpus; at 100 TB the pair list is still ≪ input because buckets cap
  pair generation).
- ``simhash_dedup``: 64-bit simhash, pigeonhole band split (any pair within
  hamming distance d shares ≥1 of d+1 bands) → bucket → verify hamming.
- ``ngram_jaccard``: exact word n-gram Jaccard between candidate pairs
  (the precise verifier behind the sketch-based candidates).

Scale notes: signatures are fixed-width int64 arrays (Arrow
fixed_size_list), so the band shuffle is O(docs × bands × 16 bytes);
hot buckets (boilerplate-heavy corpora) are capped by ``max_bucket_size``
(documented cap; at fleet scale salt hot band keys into sub-buckets
instead of truncating).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


_MERSENNE = (1 << 61) - 1


def add_text_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    """md5 content hash (hex), matching DuckDB's md5() for the SQL oracle."""
    texts = batch.column(column).to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """One representative (min id) per distinct content hash.
    Returns (text_hash, doc_id, n_dups)."""
    from ray.data.aggregate import Min, Count

    hashed = ds.map_batches(
        add_text_hash, batch_format="pyarrow", fn_kwargs={"column": column}
    ).select_columns(["text_hash", id_column])
    return hashed.groupby("text_hash").aggregate(
        Min(id_column, alias_name=id_column),
        Count(alias_name="n_dups"),
    )


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
    """(doc_id, sig) → one LIGHT row per band: (band_key, doc_id).

    The band shuffle ships only the 16-byte band hash + id — never the
    signature (512 B × bands would be ~25× the average document payload).
    Signatures are looked up later, only for candidate ids."""
    ids = batch.column(id_column).to_pylist()
    sigs = np.asarray(batch.column("minhash").combine_chunks()
                      .flatten().to_numpy(zero_copy_only=False)).reshape(
        len(ids), -1)
    num_perm = sigs.shape[1] if len(ids) else 0
    r = num_perm // bands if bands else 0
    out_ids, out_keys = [], []
    for i, did in enumerate(ids):
        for b in range(bands):
            chunk = sigs[i, b * r:(b + 1) * r]
            key = hashlib.md5(
                b"%d:" % b + chunk.tobytes()).hexdigest()[:16]
            out_ids.append(did)
            out_keys.append(key)
    return pa.Table.from_arrays(
        [pa.array(out_keys, pa.string()), pa.array(out_ids)],
        names=["band_key", id_column])


def _bucket_candidate_pairs(group, *, id_column: str, max_bucket_size: int):
    """Within one LSH bucket: all candidate id pairs (verification happens
    later against the signatures). pandas in / pandas out (map_groups)."""
    import pandas as pd

    n = len(group)
    if n < 2:
        return pd.DataFrame({"left_id": [], "right_id": []})
    if n > max_bucket_size:
        # explicit cap on pathological buckets; at scale, log + salt instead
        group = group.iloc[:max_bucket_size]
        n = max_bucket_size
    ids = sorted(group[id_column].tolist())
    out_l, out_r = [], []
    for i in range(n):
        for j in range(i + 1, n):
            if ids[i] != ids[j]:
                out_l.append(ids[i])
                out_r.append(ids[j])
    return pd.DataFrame({"left_id": out_l, "right_id": out_r})


def minhash_lsh_dedup(ds, *, column: str = "text", id_column: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7, shingle_k: int = 5,
                      max_bucket_size: int = 1000, seed: int = 42):
    """Returns (doc_id, cluster_id) for every doc in a near-dup cluster;
    cluster_id = min doc_id of the connected component.

    Shuffle budget: the band groupby moves (16 B key + id) × bands per doc;
    the signature table (num_perm × 8 B per doc) is computed once, kept as a
    (small) materialized dataset, and only candidate ids' signatures are
    pulled for verification."""
    sigs = ds.select_columns([id_column, column]).map_batches(
        MinHasher, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   seed=seed, column=column),
    ).drop_columns([column]).materialize()

    banded = sigs.map_batches(
        _band_explode, batch_format="pyarrow",
        fn_kwargs=dict(bands=bands, id_column=id_column))

    pairs = banded.groupby("band_key").map_groups(
        _bucket_candidate_pairs, batch_format="pandas",
        fn_kwargs=dict(id_column=id_column,
                       max_bucket_size=max_bucket_size))

    cand_df = pairs.to_pandas()
    if cand_df.empty or "left_id" not in cand_df.columns:
        import pandas as pd

        return pd.DataFrame({id_column: [], "cluster_id": []})
    cand_df = cand_df.drop_duplicates(subset=["left_id", "right_id"])
    cand_ids = set(cand_df["left_id"]) | set(cand_df["right_id"])

    # fetch signatures for candidate ids only (broadcast filter; the
    # candidate set is ≪ corpus by construction)
    import ray

    cand_ref = ray.put(cand_ids)

    def keep_cands(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        mask = [i in wanted for i in batch.column(id_column).to_pylist()]
        return batch.filter(pa.array(mask))

    sig_rows = sigs.map_batches(keep_cands, batch_format="pyarrow").take_all()
    sig_map = {r[id_column]: np.asarray(r["minhash"]) for r in sig_rows}

    # verify estimated Jaccard on the driver, then union-find
    pair_rows = []
    for r in cand_df.itertuples():
        sa, sb = sig_map.get(r.left_id), sig_map.get(r.right_id)
        if sa is None or sb is None:
            continue
        est = float((sa == sb).mean())
        if est >= threshold:
            pair_rows.append({"left_id": r.left_id, "right_id": r.right_id,
                              "est_jaccard": est})
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    seen_pairs = set()
    for r in pair_rows:
        key = (r["left_id"], r["right_id"])
        if key in seen_pairs:
            continue
        seen_pairs.add(key)
        parent.setdefault(r["left_id"], r["left_id"])
        parent.setdefault(r["right_id"], r["right_id"])
        union(r["left_id"], r["right_id"])

    assignments = sorted(
        (x, find(x)) for x in parent)
    import pandas as pd

    return pd.DataFrame(assignments, columns=[id_column, "cluster_id"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word features (stateful: seeds fixed per actor)."""

    def __init__(self, column: str = "text"):
        self.column = column

    @staticmethod
    def simhash64(text: str) -> int:
        words = (text or "").lower().split()
        if not words:
            return 0
        hs = np.array(
            [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(),
                            "big") for w in words],
            dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        out = np.array([self.simhash64(t) for t in texts], dtype=np.uint64)
        return batch.append_column(
            "simhash", pa.array(out.astype(np.int64), pa.int64()))


def simhash_dedup(ds, *, column: str = "text", id_column: str = "doc_id",
                  max_hamming: int = 3):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via pigeonhole
    banding (d+1 bands: any pair within distance d matches on ≥1 band)."""
    import pandas as pd

    n_bands = max_hamming + 1
    hashed = ds.select_columns([id_column, column]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"column": column}).drop_columns([column])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        width = 64 // n_bands
        out_ids, out_keys, out_h = [], [], []
        for i, did in enumerate(ids):
            for b in range(n_bands):
                seg = (hs[i] >> np.uint64(b * width)) & np.uint64(
                    (1 << width) - 1)
                out_ids.append(did)
                out_keys.append(f"{b}:{int(seg)}")
                out_h.append(int(hs[i]))
        return pa.Table.from_arrays(
            [pa.array(out_keys), pa.array(out_ids),
             pa.array(np.array(out_h, dtype=np.uint64).astype(np.int64))],
            names=["band_key", id_column, "simhash"])

    def pairs_in_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        n = len(g)
        if n < 2:
            return pd.DataFrame({"left_id": [], "right_id": [], "hamming": []})
        ids = g[id_column].tolist()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        out_l, out_r, out_d = [], [], []
        for i in range(n):
            x = hs[i] ^ hs[i + 1:]
            d = np.array([bin(int(v)).count("1") for v in x])
            for off in np.nonzero(d <= max_hamming)[0]:
                a, b = ids[i], ids[i + 1 + off]
                if a == b:
                    continue
                if b < a:
                    a, b = b, a
                out_l.append(a)
                out_r.append(b)
                out_d.append(int(d[off]))
        return pd.DataFrame({"left_id": out_l, "right_id": out_r,
                             "hamming": out_d})

    pairs = hashed.map_batches(explode, batch_format="pyarrow").groupby(
        "band_key").map_groups(pairs_in_bucket, batch_format="pandas")
    df = pairs.to_pandas()
    return df.drop_duplicates(subset=["left_id", "right_id"]).reset_index(
        drop=True)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(ds, *, threshold: float = 0.95,
                    column: str = "embedding", id_column: str = "vec_id",
                    n_tables: int = 12, n_bits: int = 6, seed: int = 11):
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH buckets (reusing the ANN bucketer) so
    only vectors sharing a sign-pattern bucket are compared — candidate
    generation is O(rows × tables), never O(rows²); pairs are verified with
    exact cosine inside each bucket. High thresholds (≥0.9) have near-1
    bucket-collision probability with this table count.
    """
    import pandas as pd
    import ray

    from .ann import _LshBucketer, make_planes

    # probe the dim from one row
    first = ds.take(1)
    if not first:
        return pd.DataFrame({"left_id": [], "right_id": [], "cosine": []})
    dim = len(first[0][column])
    planes_ref = ray.put(make_planes(dim, n_tables, n_bits, seed))

    bucketed = ds.select_columns([id_column, column]).map_batches(
        _LshBucketer, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(planes_ref=planes_ref, column=column,
                                   id_column=id_column))

    def pairs_in_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        n = len(g)
        if n < 2:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine": []})
        ids = g[id_column].to_numpy()
        mat = np.stack(g["vec"].to_numpy())  # already L2-normalized
        sims = mat @ mat.T
        out_l, out_r, out_c = [], [], []
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        for i, j in zip(ii, jj):
            a, b = int(ids[i]), int(ids[j])
            if a == b:
                continue
            if b < a:
                a, b = b, a
            out_l.append(a)
            out_r.append(b)
            out_c.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"left_id": out_l, "right_id": out_r,
                             "cosine": out_c})

    pairs = bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas")
    df = pairs.to_pandas()
    if df.empty or "left_id" not in df.columns:
        return pd.DataFrame({"left_id": pd.Series(dtype="int64"),
                             "right_id": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    return df.drop_duplicates(subset=["left_id", "right_id"]).sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verifier)
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> set:
    words = (text or "").lower().split()
    return {tuple(words[i:i + n]) for i in range(max(0, len(words) - n + 1))}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = word_ngrams(a, n), word_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
