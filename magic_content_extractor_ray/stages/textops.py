"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All vectorized ``map_batches`` stages over the
``documents`` table; integer outputs wherever an SQL oracle compares values
(float ratios are derivable downstream from the integer counts).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish token regex: word pieces, numbers, or single non-space symbols
# (public GPT-2 pre-tokenizer shape, simplified to stdlib ``re``)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

# ONE whitespace definition for every word tokenizer in this module: RE2's
# \S+ is ASCII-only, and the DuckDB oracles tokenize with it — Python's
# str.split() splits on Unicode whitespace (U+00A0, U+2028, …) and would
# silently break bit-for-bit oracle equality on non-ASCII text.
_ASCII_WORD_RE = re.compile(r"\S+", re.ASCII)

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on at by for with as "
    "it this that from".split())


def token_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    """n_tokens (whitespace) + n_bpe_tokens (regex pre-tokenizer)."""
    texts = batch.column(column)
    # whitespace tokens, vectorized: count runs of non-space
    ws = pc.count_substring_regex(texts, r"\S+")
    bpe = pc.count_substring_regex(texts, _BPE_RE.pattern)
    batch = batch.append_column("n_tokens", pc.cast(ws, pa.int64()))
    return batch.append_column("n_bpe_tokens", pc.cast(bpe, pa.int64()))


def quality_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    """Integer quality features: chars / alpha / digits / punct / stopwords."""
    texts = batch.column(column)
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    n_alpha = pc.cast(pc.count_substring_regex(texts, r"[A-Za-z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(texts, r"[0-9]"), pa.int64())
    n_punct = pc.cast(
        pc.count_substring_regex(texts, r"[.,;:!?]"), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(
        texts,
        r"\b(" + "|".join(sorted(_STOPWORDS)) + r")\b"), pa.int64())
    for name, arr in (("n_chars_q", n_chars), ("n_alpha", n_alpha),
                      ("n_digit", n_digit), ("n_punct", n_punct),
                      ("n_stopword", n_stop)):
        batch = batch.append_column(name, arr)
    return batch


def quality_score_batch(batch: pa.Table, column: str = "text",
                        min_len: int = 50) -> pa.Table:
    """Composite 0-100 quality score (float, for filtering not oracles).
    Fully vectorized from arrow count kernels (alpha is [A-Za-z] — ASCII
    letters, consistent with quality_counts' n_alpha feature)."""
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(float)
    alpha_n = pc.count_substring_regex(texts, r"[A-Za-z]").to_numpy(
        zero_copy_only=False).astype(float)
    punct_n = pc.count_substring_regex(texts, r"[.,;:!?]").to_numpy(
        zero_copy_only=False).astype(float)
    words_n = pc.count_substring_regex(texts, r"\S+").to_numpy(
        zero_copy_only=False).astype(float)
    stop_n = pc.count_substring_regex(
        texts, r"(?i)\b(" + "|".join(sorted(_STOPWORDS)) + r")\b"
    ).to_numpy(zero_copy_only=False).astype(float)

    safe_n = np.maximum(n, 1.0)
    alpha = alpha_n / safe_n
    punct = punct_n / safe_n
    stop = stop_n / np.maximum(words_n, 1.0)
    length_score = np.minimum(1.0, n / 500.0)
    score = 100.0 * (0.4 * length_score + 0.3 * alpha
                     + 0.2 * np.minimum(stop * 4, 1.0)
                     + 0.1 * np.minimum(punct * 25, 1.0))
    score = np.where(n == 0, 0.0, np.round(score, 4))
    return batch.append_column("quality", pa.array(score, pa.float64()))


# --- language id (n-gram heuristic) ---------------------------------------

_LANG_PROFILES = {
    # top character bigrams per language (hand-rolled tiny profiles; the
    # synthetic corpus carries a ``lang`` label so accuracy is measured, not
    # assumed)
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "de": ("er", "en", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"),
    "es": ("de", "la", "os", "en", "ar", "el", "er", "as", "on", "es"),
    "zh": (),  # CJK detected by codepoint range, not bigrams
}


class LangId:
    """Stateful stage: profiles compiled once per actor."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.profiles = {
            lang: {bg: len(bgs) - i for i, bg in enumerate(bgs)}
            for lang, bgs in _LANG_PROFILES.items() if bgs
        }

    def classify(self, text: str) -> str:
        t = (text or "").lower()
        if not t:
            return "unknown"
        cjk = sum(1 for c in t[:200] if "一" <= c <= "鿿")
        if cjk > len(t[:200]) * 0.2:
            return "zh"
        bigrams = [t[i:i + 2] for i in range(min(len(t) - 1, 400))]
        best_lang, best_score = "unknown", 0
        for lang, prof in self.profiles.items():
            score = sum(prof.get(b, 0) for b in bigrams)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        return batch.append_column(
            "lang_pred", pa.array([self.classify(t) for t in texts],
                                  pa.string()))


def repetition_counts(batch: pa.Table, column: str = "text") -> pa.Table:
    """Gopher-style repetition/shape features (public pretraining-filter
    rules): word count, DISTINCT word count (repetition signal:
    1 - distinct/total), and non-space char count (mean word length =
    chars/words). All integers so a SQL oracle compares exactly; the
    per-doc distinct count uses np.unique over the split words (C sort),
    the rest is arrow kernels. Both counts tokenize with the SAME
    ASCII-\\S+ definition (RE2 in arrow, re.ASCII in Python)."""
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_words = pc.cast(pc.count_substring_regex(texts, r"\S+"), pa.int64())
    n_nonspace = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, r"\s", "")),
        pa.int64())
    distinct = [
        len(np.unique(_ASCII_WORD_RE.findall((t or "").lower())))
        for t in texts.to_pylist()]
    batch = batch.append_column("n_words", n_words)
    batch = batch.append_column(
        "n_distinct_words", pa.array(distinct, pa.int64()))
    return batch.append_column("n_nonspace_chars", n_nonspace)


def word_entropy_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-document unigram Shannon entropy (bits) and type-token ratio
    — the distributional quality signals behind perplexity-proxy
    filters (low entropy = keyword-stuffed / template text; low TTR =
    repetitive text). Fully vectorized: lowercased RE2 ``\\s+`` tokens
    are dictionary-encoded, (row, word-code) keys packed into one int64,
    and ONE ``np.unique`` over the whole batch yields every document's
    word histogram; entropy = log2(n) − Σ c·log2(c) / n via segmented
    reduceat. No Python loop over rows or words.

    Appends n_words, n_distinct, word_entropy (4dp), ttr (6dp); empty
    documents get zeros."""
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)

    n_rows = len(batch)
    n_words = np.zeros(n_rows, np.int64)
    n_distinct = np.zeros(n_rows, np.int64)
    ent = np.zeros(n_rows, np.float64)
    ttr = np.zeros(n_rows, np.float64)
    if len(flat):
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        codes = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        par = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        key = (par << np.int64(32)) | codes
        uk, counts = np.unique(key, return_counts=True)
        docseg = (uk >> np.int64(32)).astype(np.int64)
        starts = np.nonzero(np.concatenate(
            ([True], docseg[1:] != docseg[:-1])))[0]
        rows = docseg[starts]
        tot = np.add.reduceat(counts, starts)
        s = np.add.reduceat(counts * np.log2(counts), starts)
        n_words[rows] = tot
        n_distinct[rows] = np.diff(np.append(starts, len(uk)))
        ent[rows] = np.log2(tot) - s / tot
        ttr[rows] = n_distinct[rows] / tot
    batch = batch.append_column("n_words", pa.array(n_words, pa.int64()))
    batch = batch.append_column("n_distinct",
                                pa.array(n_distinct, pa.int64()))
    # half-away-from-zero (= DuckDB round on non-negatives) — both values
    # can land on exact .5 ties (power-of-two word counts make entropy
    # dyadic; ttr is a small-int ratio, e.g. 1/128), where np.round's
    # half-to-even would diverge from the SQL oracle
    ent_r = np.floor(ent * 1e4 + 0.5) / 1e4
    ttr_r = np.floor(ttr * 1e6 + 0.5) / 1e6
    batch = batch.append_column(
        "word_entropy", pa.array(ent_r, pa.float64()))
    return batch.append_column("ttr", pa.array(ttr_r, pa.float64()))


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Document fingerprints:

    - ``fingerprint``: md5 hex of the whitespace-normalized lowercase text
      — SQL-oracle-checkable (DuckDB:
      ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))``);
    - ``fingerprint_rolling``: chained crc32 over normalized words — the
      order-sensitive streaming variant (cheap incremental update)."""
    import hashlib

    texts = batch.column(column).to_pylist()
    fps, rolls = [], []
    for t in texts:
        words = _ASCII_WORD_RE.findall((t or "").lower())
        fps.append(hashlib.md5(" ".join(words).encode()).hexdigest())
        h = 0
        for w in words:
            h = zlib.crc32(w.encode(), h)
        rolls.append(h)
    batch = batch.append_column(
        "fingerprint", pa.array(fps, pa.string()))
    return batch.append_column(
        "fingerprint_rolling",
        pa.array(np.array(rolls, dtype=np.int64), pa.int64()))


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, RE2 pattern, replacement) — applied in order. RE2-safe (no
# lookaround) so pyarrow's replace_substring_regex and DuckDB's
# regexp_replace execute the IDENTICAL pattern semantics, which is what
# makes the pii_redacted query SQL-oracle-checkable bit-for-bit.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, column: str = "text",
                     out_column: str = "text_redacted",
                     with_counts: bool = True) -> pa.Table:
    """Scrub emails / IPv4s / phone numbers from ``column`` — fully
    vectorized ``pc.replace_substring_regex`` chain, no Python rows.
    Match counts (``n_<kind>``) are taken on the ORIGINAL text before any
    replacement; replacements then apply in ``PII_PATTERNS`` order."""
    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if with_counts:
        for name, pat, _ in PII_PATTERNS:
            batch = batch.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(texts, pat), pa.int64()))
    red = texts
    for _, pat, repl in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)
    return batch.append_column(out_column, red)


# ---------------------------------------------------------------------------
# PMI collocation mining (phrase detection for tokenizer/vocab pipelines)
# ---------------------------------------------------------------------------

def _colloc_partial(batch: pa.Table, *, column: str) -> pa.Table:
    """Per-batch combined unigram + bigram partial counts. Tokens cannot
    contain spaces (RE2 \\s+ split), so "w" and "w1 w2" keys are disjoint
    and share ONE vocab-bounded combiner shuffle."""
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
    tables = []
    ucnt = pa.table({"term": flat}).group_by("term").aggregate(
        [("term", "count")])
    tables.append(pa.table({"term": ucnt.column("term"),
                            "c": pc.cast(ucnt.column("term_count"),
                                         pa.int64())}))
    if len(flat) >= 2:
        w1 = flat.slice(0, len(flat) - 1)
        w2 = flat.slice(1, len(flat) - 1)
        same = pc.equal(parent.slice(0, len(parent) - 1),
                        parent.slice(1, len(parent) - 1))
        big = pc.binary_join_element_wise(w1, w2, " ").filter(same)
        bcnt = pa.table({"term": big}).group_by("term").aggregate(
            [("term", "count")])
        tables.append(pa.table({"term": bcnt.column("term"),
                                "c": pc.cast(bcnt.column("term_count"),
                                             pa.int64())}))
    return pa.concat_tables(tables).replace_schema_metadata(None)


def collocation_pmi(ds, *, column: str = "text", min_count: int = 5,
                    k: int = 100):
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information: pmi = ln((c_ab/Nb) / ((c_a/Nu)·(c_b/Nu))), Nb = total
    bigrams, Nu = total tokens. Counts combine map-side (one vocab-bounded
    string shuffle); unigram counts broadcast once via ``ray.put`` as
    sorted arrays (web-scale vocab: swap for a hash_join); ranking on the
    6-dp ROUNDED pmi with (w1, w2) tiebreak so the cut is deterministic on
    both the Ray and the SQL side. Returns (w1, w2, c_ab, pmi)."""
    import numpy as np
    import ray

    # hash_agg: one group per distinct unigram/bigram is vocabulary-scale
    # cardinality (see window.hash_agg)
    from .window import hash_agg

    agg = hash_agg(ds.map_batches(
        _colloc_partial, batch_format="pyarrow",
        fn_kwargs={"column": column},
    ), "term", [("c", "sum", "c")]).materialize()

    def split_kind(t: pa.Table, want_bigrams: bool) -> pa.Table:
        import pyarrow.compute as pc

        has_sp = pc.greater(pc.count_substring(t.column("term"), " "), 0)
        return t.filter(has_sp if want_bigrams else pc.invert(has_sp))

    uni = pa.concat_tables(list(agg.map_batches(
        lambda t: split_kind(t, False), batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"))).combine_chunks().sort_by("term")
    u_terms = uni.column("term").to_pylist()
    u_counts = uni.column("c").to_numpy(zero_copy_only=False).astype(
        np.float64)
    nu = float(u_counts.sum())
    u_ref = ray.put((np.array(u_terms, dtype=object), u_counts))

    bigrams = agg.map_batches(lambda t: split_kind(t, True),
                              batch_format="pyarrow")
    nb = float(bigrams.sum("c"))

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t.column("c"), min_count))
        if len(t) == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "c_ab": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        terms, counts = ray.get(u_ref)
        w1 = pc.split_pattern(t.column("term"), " ").combine_chunks()
        w1a = pc.list_element(w1, 0)
        w2a = pc.list_element(w1, 1)
        ca = counts[np.searchsorted(
            terms, w1a.to_numpy(zero_copy_only=False))]
        cb = counts[np.searchsorted(
            terms, w2a.to_numpy(zero_copy_only=False))]
        cab = t.column("c").to_numpy(zero_copy_only=False).astype(
            np.float64)
        pmi = np.round(np.log((cab / nb) / ((ca / nu) * (cb / nu))), 6)
        return pa.table({"w1": w1a, "w2": w2a,
                         "c_ab": pc.cast(t.column("c"), pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    def partial_topk(t: pa.Table) -> pa.Table:
        import pandas as pd

        d = t.to_pandas().sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(
            d, preserve_index=False).replace_schema_metadata(None)

    cands = bigrams.map_batches(score, batch_format="pyarrow").map_batches(
        partial_topk, batch_format="pyarrow", batch_size=8192)
    out = pa.concat_tables(
        list(cands.iter_batches(batch_format="pyarrow")))
    import pandas as pd

    return pa.Table.from_pandas(
        out.to_pandas().sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]).head(k),
        preserve_index=False).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Unicode text normalization (corpus cleaning)
# ---------------------------------------------------------------------------

def normalize_text_batch(batch: pa.Table, column: str = "text",
                         out_column: str = "clean_text") -> pa.Table:
    """Control-char strip → Unicode NFC → whitespace collapse → trim.
    The strip runs BEFORE NFC on purpose: DuckDB's ``nfc_normalize``
    truncates at an embedded NUL whenever it rewrites the string, so the
    oracle-parity order is strip-first (and a NUL inside text is garbage
    either way). Strip/collapse/trim are Arrow RE2 kernels;
    NFC falls back to ``unicodedata`` per row because this build's
    ``pc.utf8_normalize`` does not compose (verified: U+0065 U+0301 stays
    decomposed) — the ``is_normalized`` fast path skips the copy for the
    (dominant) already-NFC rows."""
    import unicodedata

    texts = batch.column(column)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.replace_substring_regex(
        texts, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    vals = t.to_pylist()
    t = pa.array(
        [None if s is None
         else (s if unicodedata.is_normalized("NFC", s)
               else unicodedata.normalize("NFC", s)) for s in vals],
        pa.string())
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column(out_column, t)


class WinnowFingerprinter:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm), distinct-window-min variant: hash every
    word ``k``-gram, slide a window of ``w`` consecutive gram hashes,
    keep the DISTINCT window minima as the document's fingerprint set.
    Guarantees every shared run of ``w + k - 1`` words between two
    documents shares at least one fingerprint, at ~1/w the density of
    the full gram set — the standard local fingerprinting scheme for
    plagiarism / near-copy detection at corpus scale.

    Stateful actor stage: the gram→hash memo persists across batches.
    Gram hashes are the first 8 hex chars of md5 (a uint32), so the
    DuckDB oracle reproduces the fingerprints bit-for-bit. Documents
    with fewer than ``k`` words emit nothing; documents with ≤ w gram
    hashes emit the single global min (one incomplete window).
    Emits one (id, fp) row per distinct fingerprint."""

    def __init__(self, *, column: str = "text", id_column: str = "doc_id",
                 k: int = 3, w: int = 4, max_memo: int = 4_000_000):
        self.column = column
        self.id_column = id_column
        self.k = k
        self.w = w
        self.max_memo = max_memo
        self._memo: dict[str, int] = {}

    def _hashes(self, grams: np.ndarray) -> np.ndarray:
        import hashlib

        memo = self._memo
        if len(memo) > self.max_memo:
            memo.clear()
        out = np.empty(len(grams), dtype=np.int64)
        for i, g in enumerate(grams):
            v = memo.get(g)
            if v is None:
                v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                memo[g] = v
            out[i] = v
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        k, w = self.k, self.w
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        empty = pa.table({self.id_column: pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
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
        if len(flat) < k:
            return empty
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        par = parent.to_numpy(zero_copy_only=False).astype(np.int64)

        # k-gram strings at every in-document start (vectorized join of
        # the k shifted word arrays)
        shifted = [flat.slice(i, len(flat) - k + 1) for i in range(k)]
        grams = pc.binary_join_element_wise(*shifted, " ")
        valid = par[:len(par) - k + 1] == par[k - 1:]
        gpar = par[:len(par) - k + 1][valid]
        grams = grams.filter(pa.array(valid))
        if len(grams) == 0:
            return empty

        # hash each DISTINCT gram once (memoized across batches)
        dic = grams.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = self._hashes(
            np.asarray(dic.dictionary.to_pylist(), dtype=object))[codes]

        # per-document sliding window minima over the contiguous
        # gram-hash runs; windows never straddle documents
        out_parts = []
        if len(h) >= w:
            mins = sliding_window_view(h, w).min(axis=1)
            ok = gpar[:len(gpar) - w + 1] == gpar[w - 1:]
            out_parts.append((gpar[:len(gpar) - w + 1][ok], mins[ok]))
        # documents with 1..w gram hashes: single global min
        starts = np.nonzero(np.concatenate(
            ([True], gpar[1:] != gpar[:-1])))[0]
        lens = np.diff(np.append(starts, len(gpar)))
        short = lens <= w
        if short.any():
            smin = np.minimum.reduceat(h, starts)[short]
            out_parts.append((gpar[starts][short], smin))

        dpar = np.concatenate([p for p, _ in out_parts])
        fps = np.concatenate([f for _, f in out_parts])
        packed = np.unique((dpar << np.int64(32)) | fps)
        return pa.table({
            self.id_column: pa.array(ids[packed >> np.int64(32)]),
            "fp": pa.array(packed & np.int64(0xFFFFFFFF), pa.int64()),
        })


def winnow_fingerprints(ds, *, column: str = "text",
                        id_column: str = "doc_id", k: int = 3, w: int = 4,
                        concurrency=None):
    """Dataset → Dataset (id, fp); see WinnowFingerprinter."""
    from ..util import actor_pool

    return ds.map_batches(
        WinnowFingerprinter,
        fn_constructor_kwargs={"column": column, "id_column": id_column,
                               "k": k, "w": w},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool())
