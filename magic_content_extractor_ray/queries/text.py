"""Text analysis / vocabulary / retrieval / BPE / LM queries.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import (
    _ascii_words,
    _batch_topk,
    _bincount_i64,
    _pool,
    _read_pq,
    _tag_set_overlap,
    _ws_split_lists)  # noqa: F401


def q_token_count(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.textops import token_counts

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(token_counts, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"])

def q_quality_counts(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.textops import quality_counts

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(quality_counts, batch_format="pyarrow").select_columns(
        ["doc_id", "n_chars_q", "n_alpha", "n_digit", "n_punct",
         "n_stopword"])

def q_lang_id(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.textops import LangId

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"],
    ).map_batches(LangId, batch_format="pyarrow",
                  concurrency=_pool()).select_columns(
        ["doc_id", "lang", "lang_pred"])

def q_pii_redacted(sf_dir: str):
    """PII scrubbing (email / IPv4 / phone → placeholder tokens), fully
    vectorized RE2 replace chain (stages/textops.redact_pii_batch). The
    synthetic corpus carries no PII, so each row is first augmented with
    deterministic doc_id-derived PII — the DuckDB oracle performs the
    IDENTICAL augmentation and redaction (same RE2 patterns), so the two
    engines verify each other bit-for-bit on text that exercises every
    pattern."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.textops import redact_pii_batch

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        s = pc.cast(ids, pa.string())
        import numpy as np

        idv = ids.to_numpy(zero_copy_only=False)
        aug = pc.binary_join_element_wise(
            batch.column("text"), " contact: user", s, "@example.com from 10.0.",
            pa.array((idv % 256).astype(str), pa.string()), ".",
            pa.array((idv % 100).astype(str), pa.string()), " call 555-",
            pa.array((100 + idv % 900).astype(str), pa.string()), "-",
            pa.array((1000 + idv % 9000).astype(str), pa.string()), "")
        return batch.drop_columns(["text"]).append_column("text", aug)

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(augment, batch_format="pyarrow").map_batches(
        redact_pii_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_email", "n_ip", "n_phone", "text_redacted"])

def q_top_terms(sf_dir: str):
    """Global top-100 most frequent words (vocabulary building): fully
    vectorized per-batch word counting (arrow split + flatten + group_by),
    a (word → count) combiner groupby, then tree-reduced partial top-k so
    no task ever holds the whole vocabulary."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pandas as pd
    from ray.data.aggregate import Sum

    K = 100

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.list_flatten(
            _ws_split_lists(pc.utf8_lower(texts)))
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"term": words}).group_by("term").aggregate(
            [("term", "count")])
        return pa.table({
            "term": g.column("term"),
            "n": pc.cast(g.column("term_count"), pa.int64()),
        })

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n", "descending"),
                                   ("term", "ascending")], k=K)

    counts = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["text"],
    ).map_batches(partial_counts, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("n", alias_name="n"))
    cands = counts.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=8192)

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["n", "term"],
                            ascending=[False, True]).head(K)
        df = df.reset_index(drop=True)
        df["rnk"] = range(1, len(df) + 1)
        return df[["rnk", "term", "n"]]

    # the candidate stream is ≤ K rows per 8192-candidate batch — a
    # single bounded final reduction
    return final(cands.to_pandas())

def q_doc_frequency(sf_dir: str):
    """Top-50 terms by DOCUMENT frequency (the IDF denominator): per-doc
    distinct words (np.unique per doc — C sort), per-batch partial doc
    counts per term, grouped sum, tree-reduced top-k."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    K = 50

    def partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch.column("text").to_pylist():
            terms.extend(np.unique(_ascii_words((t or "").lower())).tolist())
        tb = pa.table({"term": pa.array(terms, pa.string())})
        g = tb.group_by("term").aggregate([("term", "count")])
        return pa.table({
            "term": g.column("term"),
            "df": pc.cast(g.column("term_count"), pa.int64()),
        })

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("df", "descending"),
                                   ("term", "ascending")], k=K)

    counts = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["text"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("df", alias_name="df"))
    cands = counts.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=8192)

    out = cands.to_pandas().sort_values(
        ["df", "term"], ascending=[False, True]).head(K).reset_index(
        drop=True)
    out["rnk"] = range(1, len(out) + 1)
    return out[["rnk", "term", "df"]]

def q_top_terms_per_lang(sf_dir: str):
    """Per-GROUP frequent items: the 5 most frequent words per language
    (per-language vocabulary heads). Vectorized per-batch (lang, term)
    counting, one grouped-sum shuffle, then the tree-reduced per-group
    top-k pattern (partial top-k per wide batch keeps the final
    per-lang group bounded)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    K = 5

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _ws_split_lists(pc.utf8_lower(texts))
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        langs = pc.take(batch.column("lang"),
                        pc.list_parent_indices(lists).filter(keep))
        g = pa.table({"lang": langs, "term": words}).group_by(
            ["lang", "term"]).aggregate([("term", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "term": g.column("term"),
            "n": pc.cast(g.column("term_count"), pa.int64()),
        })

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n", "descending"),
                                   ("term", "ascending")], k=K,
                           group="lang")

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["n", "term"],
                          ascending=[False, True]).head(K)
        g = g.reset_index(drop=True)
        g["rnk"] = range(1, len(g) + 1)
        return g[["lang", "rnk", "term", "n"]]

    counts = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"],
    ).map_batches(partial_counts, batch_format="pyarrow").groupby(
        ["lang", "term"]).aggregate(Sum("n", alias_name="n"))
    cands = counts.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=8192)
    return cands.groupby("lang").map_groups(
        final, batch_format="pandas").sort(["lang", "rnk"])

def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition/shape features per doc (the standard
    public pretraining quality-filter inputs), integer-exact vs SQL."""
    from magic_content_extractor_ray.stages.textops import repetition_counts

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(repetition_counts, batch_format="pyarrow").select_columns(
        ["doc_id", "n_words", "n_distinct_words", "n_nonspace_chars"])

def q_token_histogram(sf_dir: str):
    """Histogram of document token counts (textops chain → bucket →
    partial-agg combiner)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum
    from magic_content_extractor_ray.stages.textops import token_counts

    def partial(batch: pa.Table) -> pa.Table:
        batch = token_counts(batch)
        bucket = pc.divide(batch.column("n_tokens"), 10)
        t = pa.table({"token_bucket": bucket})
        g = t.group_by("token_bucket").aggregate([("token_bucket", "count")])
        return pa.table({
            "token_bucket": g.column("token_bucket"),
            "n_docs": pc.cast(g.column("token_bucket_count"), pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["text"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "token_bucket").aggregate(
        Sum("n_docs", alias_name="n_docs")).sort("token_bucket")

def q_collocations(sf_dir: str):
    """PMI collocation mining (phrase detection for tokenizer/vocab
    building): unigram+bigram counts combined map-side into one
    vocab-bounded shuffle, pmi scored against broadcast unigram counts,
    deterministic top-100 on (rounded pmi, w1, w2)."""
    from magic_content_extractor_ray.stages.textops import collocation_pmi

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    return collocation_pmi(docs, min_count=5, k=100)

def q_tfidf_terms(sf_dir: str):
    """TF-IDF vocabulary scoring: ONE tokenization pass emits both term
    frequency and document frequency partials (docs never split across
    batches, so per-batch distinct (doc, term) pairs sum to exact global
    df), a single (term → Σtf, Σdf) shuffle, vectorized score
    tf·ln(N/df) rounded to 6 dp, then tree-reduced top-50."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    K = 50
    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    n_docs = docs.count()  # parquet metadata count — no scan

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _ws_split_lists(pc.utf8_lower(texts))
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        parent = pc.list_parent_indices(lists).filter(keep)
        tf = pa.table({"term": words}).group_by("term").aggregate(
            [("term", "count")])
        pairs = pa.table({"p": parent, "term": words}).group_by(
            ["p", "term"]).aggregate([])
        df = pairs.group_by("term").aggregate([("term", "count")])
        # select generated columns by NAME (their position has differed
        # across pyarrow versions)
        merged = pa.table({
            "term": tf.column("term"), "tf": tf.column("term_count"),
        }).join(pa.table({
            "term": df.column("term"), "df": df.column("term_count"),
        }), keys="term")
        return pa.table({
            "term": merged.column("term"),
            "tf": pc.cast(merged.column("tf"), pa.int64()),
            "df": pc.cast(merged.column("df"), pa.int64()),
        })

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby(
        "term").aggregate(Sum("tf", alias_name="tf"),
                          Sum("df", alias_name="df"))

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64)
        df = batch.column("df").to_numpy(zero_copy_only=False).astype(
            np.float64)
        s = np.round(tf * np.log(float(n_docs) / df), 6)
        return batch.append_column("score", pa.array(s, pa.float64()))

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("score", "descending"),
                                   ("term", "ascending")], k=K)

    cands = agg.map_batches(score, batch_format="pyarrow").map_batches(
        partial_topk, batch_format="pyarrow", batch_size=8192)
    out = cands.to_pandas().sort_values(
        ["score", "term"], ascending=[False, True]).head(K).reset_index(
        drop=True)
    out["rnk"] = range(1, len(out) + 1)
    return out[["rnk", "term", "tf", "df", "score"]]

def q_clean_text(sf_dir: str):
    """Unicode corpus cleaning: control-char strip → NFC → whitespace
    collapse → trim, map-only (no shuffle), bit-for-bit matched by the
    DuckDB nfc_normalize/regexp_replace oracle."""
    from magic_content_extractor_ray.stages.textops import (
        normalize_text_batch)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return docs.map_batches(
        normalize_text_batch, batch_format="pyarrow",
    ).select_columns(["doc_id", "clean_text"])

def q_quality_pruned(sf_dir: str):
    """Percentile-threshold quality pruning (the perplexity-filter
    shape): exact global p25 of the token-count distribution from the
    distributed value-histogram quantile operator (tiny result), then a
    broadcast-threshold filter — two passes over one derived column, no
    row-level shuffle. Keeps docs strictly above the cutoff."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import grouped_quantiles
    from magic_content_extractor_ray.stages.textops import token_counts

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        return token_counts(batch).select(["doc_id", "n_tokens"])

    toks = docs.map_batches(tok, batch_format="pyarrow")
    cuts = grouped_quantiles(
        toks.map_batches(
            lambda t: t.append_column(
                "g", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow"),
        key_column="g", value_column="n_tokens",
        quantiles=(0.25,)).to_pandas()
    p25 = float(cuts["q_0_25"].iloc[0])

    return toks.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_tokens"), p25)),
        batch_format="pyarrow").sort("doc_id")

def q_doc_chunks(sf_dir: str):
    """Sliding-window CHUNKING (RAG / long-context training prep): split
    each document into 128-token chunks with stride 96 (32-token
    overlap), one output row per chunk with its exact token span and
    single-space-rejoined text. Pure map-side flat expansion — no
    shuffle; chunk identity is (doc_id, chunk_id) so output is
    deterministic and resumable."""
    import pyarrow as pa

    CHUNK, STRIDE = 128, 96

    def chunk(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, starts, lens, texts = [], [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = _ascii_words(text)
            n = len(toks)
            pos = 0
            cid = 1
            while pos < n:
                take = min(CHUNK, n - pos)
                doc_ids.append(did)
                chunk_ids.append(cid)
                starts.append(pos)
                lens.append(take)
                texts.append(" ".join(toks[pos:pos + take]))
                if pos + take >= n:
                    break
                pos += STRIDE
                cid += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_id": pa.array(chunk_ids, pa.int64()),
            "start_token": pa.array(starts, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
        })

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(chunk, batch_format="pyarrow").sort(
        ["doc_id", "chunk_id"])

def q_token_offsets(sf_dir: str):
    """Distributed ordered PREFIX-SUM (scan): every document's global
    token start offset in doc_id order, and the concat-and-chunk pack it
    starts in (offset // budget) — the allow_split packing layout. Uses
    the two-phase range-bucketed scan in stages/scan.py (bounded driver
    state: one partial sum per key bucket)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.textops import token_counts

    BUDGET = 2048

    counted = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(token_counts, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"])
    out = keyed_prefix_sum(counted, key_column="doc_id",
                           value_column="n_tokens",
                           bucket_width=10_000,
                           out_column="token_offset")

    def pack(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pack_id", pc.divide(batch.column("token_offset"),
                                 pa.scalar(BUDGET, pa.int64())))

    return out.map_batches(pack, batch_format="pyarrow").sort("doc_id")

def q_heavy_terms(sf_dir: str):
    """Top-20 terms via the Misra-Gries heavy-hitters path (sketch →
    exact recount): the UNBOUNDED-cardinality alternative to top_terms'
    full-vocabulary groupby — the shuffle carries ≤ capacity-row
    summaries per batch instead of the whole vocabulary. Exact (and
    oracle-checked) because the 20th term count far exceeds N/capacity
    on Zipf-like text."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.sketch import heavy_hitters

    def tokens(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.list_flatten(
            _ws_split_lists(pc.utf8_lower(texts)))
        return pa.table({"term": words.filter(pc.not_equal(words, ""))})

    words = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["text"],
    ).map_batches(tokens, batch_format="pyarrow")
    out = heavy_hitters(words, "term", k=20)
    return out.rename(columns={"value": "term"})

def q_quality_percentile(sf_dir: str):
    """Exact PERCENT_RANK of every document's token count without a
    global sort: a bounded value histogram of token counts (distinct
    counts ≪ rows) is aggregated once, its cumulative strictly-less
    table broadcast, and the rank becomes a map-side searchsorted —
    rank math in integers, the final ratio floored to ppm with the same
    IEEE op order as the SQL window function."""
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.textops import token_counts

    toks = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]
                    ).map_batches(token_counts, batch_format="pyarrow"
                                  ).select_columns(["doc_id", "n_tokens"])

    def hist(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch.group_by("n_tokens").aggregate([("n_tokens", "count")])
        return pa.table({
            "n_tokens": g.column("n_tokens"),
            "cnt": pc.cast(g.column("n_tokens_count"), pa.int64()),
        })

    h = toks.map_batches(hist, batch_format="pyarrow").groupby(
        "n_tokens").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    vals = np.array([r["n_tokens"] for r in h], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in h], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    n_total = int(cnts.sum())
    ref = ray.put((vals, less))

    def rank(batch: pa.Table) -> pa.Table:
        v, lt = ray.get(ref)
        nt = batch.column("n_tokens").to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = lt[np.searchsorted(v, nt)]
        # same op order as SQL floor(percent_rank() * 1e6):
        # (rank-1)/(N-1) first, then × 1e6, then floor — both IEEE double
        pr = np.floor((c.astype(np.float64) / (n_total - 1)) * 1e6)
        return batch.append_column(
            "pr_ppm", pa.array(pr.astype(np.int64), pa.int64()))

    return toks.map_batches(rank, batch_format="pyarrow").sort("doc_id")

def q_inverted_index(sf_dir: str):
    """Inverted-index build (top-5 postings per term by tf): docs never
    split across batches, so per-batch (doc, term) tf is exact; each
    batch keeps only its own top-5 per term (the global top-5 is a
    subset of the per-batch top-5 union), so the term shuffle moves ≤5
    rows per term per batch; the per-term merge re-ranks the bounded
    candidate set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    K = 5

    def postings(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _ws_split_lists(pc.utf8_lower(texts))
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        parent = pc.list_parent_indices(lists).filter(keep)
        doc_ids = pc.take(batch.column("doc_id"), parent)
        tf = pa.table({"term": words, "doc_id": doc_ids}).group_by(
            ["term", "doc_id"]).aggregate([("doc_id", "count")])
        t = pa.table({
            "term": tf.column("term"),
            "doc_id": pc.cast(tf.column("doc_id"), pa.int64()),
            "tf": pc.cast(tf.column("doc_id_count"), pa.int64()),
        }).sort_by([("term", "ascending"), ("tf", "descending"),
                    ("doc_id", "ascending")])
        col = t.column("term").combine_chunks()
        if len(col) == 0:
            return t
        new = pc.not_equal(col.slice(1), col.slice(0, len(col) - 1))
        starts = np.nonzero(np.concatenate(
            ([True], new.to_numpy(zero_copy_only=False))))[0]
        seg_id = np.cumsum(np.concatenate(
            ([True], new.to_numpy(zero_copy_only=False)))) - 1
        rank = np.arange(len(col), dtype=np.int64) - starts[seg_id]
        return t.filter(pa.array(rank < K))

    def merge(g: pa.Table) -> pa.Table:
        t = g.sort_by([("term", "ascending"), ("tf", "descending"),
                       ("doc_id", "ascending")]).slice(0, K)
        return t.append_column("rank", pa.array(
            np.arange(1, len(t) + 1, dtype=np.int64), pa.int64()))

    return _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]
                    ).map_batches(postings, batch_format="pyarrow"
                                  ).groupby("term").map_groups(
        merge, batch_format="pyarrow").sort(["term", "rank"])

def q_word_entropy(sf_dir: str):
    """Per-doc unigram Shannon entropy + type-token ratio (the
    perplexity-proxy quality features) — one vectorized map_batches,
    no shuffle (stages/textops.word_entropy_batch: dictionary-encode +
    packed (row, code) keys + one np.unique per batch)."""
    from magic_content_extractor_ray.stages.textops import (
        word_entropy_batch)

    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        out = word_entropy_batch(t, "text")
        # the SQL oracle's unnest produces no row for word-less docs
        out = out.filter(pc.greater(out.column("n_words"), 0))
        return out.select(["doc_id", "n_words", "n_distinct",
                           "word_entropy", "ttr"])

    return _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").sort("doc_id")

def q_lang_source_pmi(sf_dir: str):
    """Dataset-composition diagnostics: pointwise mutual information
    between language and source (is a source lang-skewed?). Per-batch
    Arrow partial counts → one tiny combiner groupby; the cell table is
    bounded by |langs|×|sources|, so the PMI math runs driver-side on
    integer counts (identical doubles → the SQL twin hash-matches)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([("lang", "count")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("lang_count"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "source"]).map_batches(
        partial, batch_format="pyarrow").groupby(
        ["lang", "source"]).aggregate(Sum("c", alias_name="n")).take_all()

    langs: dict = {}
    srcs: dict = {}
    total = 0
    for r in cells:
        langs[r["lang"]] = langs.get(r["lang"], 0) + int(r["n"])
        srcs[r["source"]] = srcs.get(r["source"], 0) + int(r["n"])
        total += int(r["n"])
    rows = sorted(cells, key=lambda r: (r["lang"], r["source"]))
    pmi = np.array([float(np.log((int(r["n"]) * total)
                                 / (langs[r["lang"]] * srcs[r["source"]])))
                    for r in rows])
    # half-away-from-zero on BOTH signs (= DuckDB round; PMI can be < 0)
    pmi_r = np.sign(pmi) * np.floor(np.abs(pmi) * 1e6 + 0.5) / 1e6
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "pmi": pa.array(pmi_r, pa.float64()),
    })

def q_lm_scores(sf_dir: str):
    """CCNet-style LM quality scoring: add-one bigram model trained on
    the train split (doc_id % 10 != 0), mean negative log-likelihood per
    transition for each eval doc (stages/lm.bigram_lm_scores: two keyed
    exchanges attach the counts — the LM is never broadcast — and
    per-doc partials leave each partition)."""
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.lm import bigram_lm_scores

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def side(want_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            mod = pc.subtract(
                ids, pc.multiply(pc.divide(ids, 10), 10))
            is_eval = pc.equal(mod, 0)
            return t.filter(is_eval if want_eval else pc.invert(is_eval))

        return docs.map_batches(f, batch_format="pyarrow")

    return bigram_lm_scores(side(False), side(True)).sort("doc_id")

_BM25_TERMS = ("batch", "hash", "scan")

def q_bm25_topk(sf_dir: str):
    """Okapi/Lucene BM25 top-20 against a fixed query-term set
    (stages/retrieval.bm25_topk): the term stream is filtered at the
    tokenize pass, corpus stats reduce through tiny aggregates, scoring
    maps over matches only. Deterministic (rounded score, doc_id) cut."""
    from magic_content_extractor_ray.stages.retrieval import bm25_topk

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return bm25_topk(docs, list(_BM25_TERMS), k=20)

def q_quality_classifier(sf_dir: str):
    """fastText-style hashed linear quality-classifier inference
    (stages/classify.HashedLinearScorer): integer md5-bucket weight per
    token, exact int64 per-doc sum, sign → keep label. The token→weight
    table is actor-pool state (the trained-model deployment shape);
    scores are bit-exact against the SQL twin."""
    from magic_content_extractor_ray.stages.classify import (
        hashed_linear_scores)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return hashed_linear_scores(docs, concurrency=_pool())

def q_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the lexical BM25
    top-20 (fixed query terms) and the dense exact-cosine top-20 for
    the first embedded query (vec_id 0; ids are doc-aligned). Each
    distributed leg is an already-oracled top-k; fusion of two 20-row
    lists is inherently driver-scale. RRF contributions are integer
    nano-units (⌊1e9/(60+rank)+0.5⌋, missing list → 0) so the score is
    exact and the SQL twin — which recomputes BOTH legs independently —
    hash-matches. Returns the top-10 (rnk, doc_id, rrf_ppb)."""
    import math

    import pyarrow as pa

    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries)
    from magic_content_extractor_ray.stages.retrieval import bm25_topk

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    lex = bm25_topk(docs, list(_BM25_TERMS), k=20).take_all()
    lex.sort(key=lambda r: (-r["score"], r["doc_id"]))

    queries = load_queries(sf_dir, 1)
    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    den = brute_force_topk(emb, queries, k=20,
                           dtype="float64")  # pandas DataFrame
    den = den.sort_values("rank").to_dict("records")

    ppb: dict[int, int] = {}
    for i, r in enumerate(lex, start=1):
        ppb[int(r["doc_id"])] = math.floor(1e9 / (60 + i) + 0.5)
    for r in den:
        d = int(r["neighbor_id"])
        ppb[d] = ppb.get(d, 0) + math.floor(1e9 / (60 + r["rank"]) + 0.5)
    fused = sorted(ppb.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "rnk": pa.array(range(1, len(fused) + 1), pa.int64()),
        "doc_id": pa.array([d for d, _ in fused], pa.int64()),
        "rrf_ppb": pa.array([s for _, s in fused], pa.int64()),
    })

def q_bpe_pairs(sf_dir: str):
    """Tokenizer-training corpus statistics: the top-50 adjacent
    character pairs over lowered text — the first BPE merge-candidate
    table. Fully vectorized: each doc's code points come from one
    utf-32 decode (np.frombuffer), adjacent pairs pack into int64
    ((a<<21)|b — code-point order == lexicographic order of the
    2-char string, so the numeric tie-break matches the SQL's string
    tie-break), per-batch np.unique partials → one O(|pair vocab|)
    hash_agg → tree top-k. Returns (rnk, pair, n)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    K = 50

    def partial(batch: pa.Table) -> pa.Table:
        packs = []
        for s in batch.column("text").to_pylist():
            if not s or len(s) < 2:
                continue
            cp = np.frombuffer(s.lower().encode("utf-32-le"),
                               dtype=np.uint32).astype(np.int64)
            packs.append((cp[:-1] << 21) | cp[1:])
        if not packs:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u, c = np.unique(np.concatenate(packs), return_counts=True)
        return pa.table({"pk": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    counts = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow"),
        "pk", [("n", "sum", "n")])
    cands = counts.map_batches(
        lambda b: _batch_topk(b, [("n", "descending"),
                                  ("pk", "ascending")], k=K),
        batch_format="pyarrow", batch_size=8192).take_all()
    cands.sort(key=lambda r: (-r["n"], r["pk"]))
    top = cands[:K]
    return pa.table({
        "rnk": pa.array(range(1, len(top) + 1), pa.int64()),
        "pair": pa.array([chr(r["pk"] >> 21) + chr(r["pk"] & 0x1FFFFF)
                          for r in top], pa.string()),
        "n": pa.array([int(r["n"]) for r in top], pa.int64()),
    })

def q_term_cms(sf_dir: str):
    """Count-Min sketch point estimates for the global top-30 terms
    (stages/sketch.count_min_estimates): the fixed-size (4×1024 cells)
    mergeable counter for frequency queries where exact per-value
    counts won't fit — deterministic md5 bucketing, so the DuckDB twin
    rebuilds the identical sketch and the estimates hash-match
    bit-for-bit (and are ≥ the true counts, the CMS one-sided
    guarantee)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.sketch import count_min_estimates
    from magic_content_extractor_ray.stages.window import hash_agg

    K = 30

    def tok_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.list_flatten(_ws_split_lists(pc.utf8_lower(texts)))
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"term": words}).group_by("term").aggregate(
            [("term", "count")])
        return pa.table({"term": g.column("term"),
                         "n": pc.cast(g.column("term_count"), pa.int64())})

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    counts = hash_agg(docs.map_batches(tok_counts, batch_format="pyarrow"),
                      "term", [("n", "sum", "n")])
    cands = counts.map_batches(
        lambda b: _batch_topk(b, [("n", "descending"),
                                  ("term", "ascending")], k=K),
        batch_format="pyarrow", batch_size=8192).take_all()
    cands.sort(key=lambda r: (-r["n"], r["term"]))
    top = [r["term"] for r in cands[:K]]

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.list_flatten(_ws_split_lists(pc.utf8_lower(texts)))
        return pa.table({"term": words.filter(
            pc.not_equal(words, ""))})

    toks = docs.map_batches(explode, batch_format="pyarrow")
    return count_min_estimates(toks, "term", query_values=top)

def q_readability(sf_dir: str):
    """Per-language mean Coleman–Liau readability index — a pure
    count-based readability score (letters / words / sentences per
    document), so unlike syllable formulas it is EXACTLY
    SQL-expressible. Per-batch vectorized Arrow regex counts, exact
    integer sufficient sums, one |langs| combiner shuffle; the final
    float formula is mirrored CAST-for-CAST by the oracle. Documents
    with zero words are excluded on both sides."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        words = pc.cast(pc.count_substring_regex(txt, r"\S+"),
                        pa.int64())
        letters = pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]"),
                          pa.int64())
        sents = pc.cast(pc.count_substring_regex(txt, r"[.!?]"),
                        pa.int64())
        t = pa.table({
            "lang": batch.column("lang"),
            "w": words, "l": letters,
            # sentence count floors at 1 (trailing fragment)
            "s": pc.max_element_wise(sents, pa.scalar(1, pa.int64())),
        }).filter(pc.greater(words, 0))
        # CLI is linear in L=100*letters/words and S=100*sents/words,
        # but the MEAN of per-doc CLI needs per-doc ratios — carry the
        # per-doc ratio sums as exact micro-unit integers, rounded
        # half-UP via the integer floor((2·x·SCALE + w) / 2w) rule the
        # SQL twin reproduces bit-for-bit (pc.round is half-to-even)
        w = t.column("w").to_numpy(zero_copy_only=False)
        lv = t.column("l").to_numpy(zero_copy_only=False)
        sv = t.column("s").to_numpy(zero_copy_only=False)
        SCALE = 100_000_000
        lw = (2 * lv * SCALE + w) // (2 * w)
        sw = (2 * sv * SCALE + w) // (2 * w)
        g = pa.table({"lang": t.column("lang"),
                      "lw": pa.array(lw, pa.int64()),
                      "sw": pa.array(sw, pa.int64())}
                     ).group_by("lang").aggregate(
            [("lw", "sum"), ("sw", "sum"), ("lw", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "lw": g.column("lw_sum"), "sw": g.column("sw_sum"),
            "n": pc.cast(g.column("lw_count"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "text"]).map_batches(
        partial, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("lw", alias_name="lw"), Sum("sw", alias_name="sw"),
        Sum("n", alias_name="n")).sort("lang").take_all()

    import math

    import pandas as pd
    # mean CLI = 0.0588*mean(L) - 0.296*mean(S) - 15.8 with
    # L = 100*letters/words, S = 100*sents/words (per-doc, micro-units);
    # final rounding is half-away (DuckDB round), not Python banker's
    out = {"lang": [], "n_docs": [], "mean_cli": []}
    for r in cells:
        n = int(r["n"])
        mean_l = float(int(r["lw"])) / float(n) / 1e6
        mean_s = float(int(r["sw"])) / float(n) / 1e6
        x = 0.0588 * mean_l - 0.296 * mean_s - 15.8
        out["lang"].append(r["lang"])
        out["n_docs"].append(n)
        out["mean_cli"].append(
            math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6)
    return pd.DataFrame(out)

def q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth curve over word TRIGRAMS: distinct
    trigrams FIRST SEEN per 50-doc bucket of doc_id order, plus the
    cumulative vocabulary size (the corpus-scaling diagnostic for
    tokenizer / n-gram-LM sizing; unigrams are useless here — this
    corpus' unigram vocabulary closes after ten documents). Per-trigram
    min doc_id via one hash_agg over per-batch (term, min doc)
    partials; the bucket histogram and its running sum are bucket-count
    tiny."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    W = 50

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        terms: list[str] = []
        docs: list[int] = []
        for i, txt in zip(ids, batch.column("text").to_pylist()):
            ws = _ascii_words((txt or "").lower())
            tgs = {" ".join(ws[k:k + 3])
                   for k in range(max(0, len(ws) - 2))}
            terms.extend(tgs)
            docs.extend([int(i)] * len(tgs))
        t = pa.table({"term": pa.array(terms, pa.string()),
                      "first_doc": pa.array(docs, pa.int64())})
        g = t.group_by("term").aggregate([("first_doc", "min")])
        return pa.table({"term": g.column("term"),
                         "first_doc": g.column("first_doc_min")})

    firsts = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        "term", [("first_doc", "min", "first_doc")])

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t.column("first_doc"), W)
        g = pa.table({"bucket": b}).group_by("bucket").aggregate(
            [([], "count_all")])
        return pa.table({"bucket": g.column("bucket"),
                         "new_terms": pc.cast(g.column("count_all"),
                                              pa.int64())})

    from ray.data.aggregate import Sum

    cells = firsts.map_batches(bucket, batch_format="pyarrow").groupby(
        "bucket").aggregate(Sum("new_terms", alias_name="new_terms")
                            ).sort("bucket").take_all()
    out = {"bucket": [], "new_terms": [], "vocab_size": []}
    cum = 0
    for r in cells:
        cum += int(r["new_terms"])
        out["bucket"].append(int(r["bucket"]))
        out["new_terms"].append(int(r["new_terms"]))
        out["vocab_size"].append(cum)
    return pd.DataFrame(out)

def q_doc_novelty(sf_dir: str):
    """Per-document trigram NOVELTY in doc_id order (the dedup-adjacent
    curation signal: how much of each doc's shingle set is first seen
    there) — the 20 most REDUNDANT docs (lowest novelty). Plan: per-doc
    distinct trigrams → one term-keyed partition pass that knows each
    trigram's first doc (min within the partition — a term's rows never
    straddle partitions) and emits (doc, new, total) increments → one
    per-doc hash_agg. Novelty is exact integer ppm."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    def tri(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        terms: list[str] = []
        docs: list[int] = []
        for i, txt in zip(ids, batch.column("text").to_pylist()):
            ws = _ascii_words((txt or "").lower())
            tgs = {" ".join(ws[k:k + 3])
                   for k in range(max(0, len(ws) - 2))}
            terms.extend(tgs)
            docs.extend([int(i)] * len(tgs))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(docs, pa.int64())})

    posting = _read_pq(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text"]).map_batches(
        tri, batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        # t sorted by (term, doc_id): first doc of each term run is the
        # novelty owner; every row contributes one trigram to its doc
        term = t.column("term").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        if not len(term):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "new": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        starts = segment_starts(term)
        lens = segment_lengths(starts, len(term))
        first_doc = doc[starts]          # min doc: rows are doc-sorted
        is_new = (doc == np.repeat(first_doc, lens))
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "new": pa.array(is_new.astype(np.int64),
                                         pa.int64()),
                         "total": pa.array(np.ones(len(doc), np.int64),
                                           pa.int64())})

    per_doc = hash_agg(
        map_key_partitions(posting, "term", score, sort_cols=["doc_id"],
                           producer_expands=True),
        "doc_id", [("new", "sum", "n_new"), ("total", "sum", "n_tri")])

    def finish(t: pa.Table) -> pa.Table:
        ppm = pc.cast(pc.divide(
            pc.multiply(pc.cast(t.column("n_new"), pa.int64()),
                        1_000_000),
            t.column("n_tri")), pa.int64())
        out = pa.table({"doc_id": t.column("doc_id"),
                        "n_tri": t.column("n_tri"),
                        "n_new": t.column("n_new"),
                        "novelty_ppm": ppm})
        return _batch_topk(out.sort_by([
            ("novelty_ppm", "ascending"), ("doc_id", "ascending")]),
            [("novelty_ppm", "ascending"), ("doc_id", "ascending")], k=20)

    out = per_doc.map_batches(
        finish, batch_format="pyarrow").to_pandas().sort_values(
        ["novelty_ppm", "doc_id"]).head(20).reset_index(drop=True)
    return out[["doc_id", "n_tri", "n_new", "novelty_ppm"]]

def q_term_keyness(sf_dir: str):
    """Log-likelihood-ratio KEYNESS (Dunning's G²) of every (source,
    term) pair — which terms are over-represented in which source,
    the standard corpus-comparison statistic. Occurrence counts per
    (source, term) via hash_agg; per-term partitions compute the 2×2
    G² against broadcast per-source totals; top 20 by G². The four
    x·ln(x·N/(r·c)) contributions are each half-up-rounded to integer
    nano-nats BEFORE the fixed-order sum, so both engines evaluate one
    deterministic expression over exact integer counts."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    def counts(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        out_s: list[str] = []
        out_t: list[str] = []
        for s, txt in zip(srcs, batch.column("text").to_pylist()):
            for w in _ascii_words((txt or "").lower()):
                out_s.append(s)
                out_t.append(w)
        t = pa.table({"source": pa.array(out_s, pa.string()),
                      "term": pa.array(out_t, pa.string())})
        g = t.group_by(["source", "term"]).aggregate([([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "term": g.column("term"),
                         "k": pc.cast(g.column("count_all"), pa.int64())})

    cells = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["source", "text"]).map_batches(
            counts, batch_format="pyarrow"),
        "term", [("k", "sum", "k")], group_cols=["term", "source"],
        producer_expands=True)

    totals = cells.groupby("source").aggregate(
        __import__("ray").data.aggregate.Sum("k", alias_name="n")
    ).take_all()
    n_s = {r["source"]: int(r["n"]) for r in totals}
    big_n = sum(n_s.values())

    def nano(x: float) -> int:
        return int(math.floor(x * 1e9 + 0.5))

    def g2_cells(t: pa.Table) -> pa.Table:
        import collections

        rows = t.to_pylist()
        by_term: dict = collections.defaultdict(list)
        for r in rows:
            by_term[r["term"]].append((r["source"], int(r["k"])))
        out = {"source": [], "term": [], "k": [], "g2_nano": []}
        for term, cell_list in by_term.items():
            kt = sum(k for _, k in cell_list)
            for src, a in cell_list:
                ns = n_s[src]
                b = kt - a
                c = ns - a
                d = big_n - kt - ns + a
                g2 = 0
                for x, row_tot, col_tot in (
                        (a, kt, ns), (b, kt, big_n - ns),
                        (c, big_n - kt, ns), (d, big_n - kt, big_n - ns)):
                    if x > 0:
                        g2 += nano(2.0 * x * math.log(
                            x * big_n / (row_tot * col_tot)))
                out["source"].append(src)
                out["term"].append(term)
                out["k"].append(a)
                out["g2_nano"].append(g2)
        res = pa.table({
            "source": pa.array(out["source"], pa.string()),
            "term": pa.array(out["term"], pa.string()),
            "k": pa.array(out["k"], pa.int64()),
            "g2_nano": pa.array(out["g2_nano"], pa.int64())})
        return _batch_topk(res.sort_by([
            ("g2_nano", "descending"), ("source", "ascending"),
            ("term", "ascending")]),
            [("g2_nano", "descending"), ("source", "ascending"),
             ("term", "ascending")], k=20)

    out = map_key_partitions(cells, "term", g2_cells).to_pandas()
    out = out.sort_values(["g2_nano", "source", "term"],
                          ascending=[False, True, True]).head(
        20).reset_index(drop=True)
    return out[["source", "term", "k", "g2_nano"]]

def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich subword units) over
    the corpus: 40 merges learned on the word-type table — one corpus
    tokenize+hash_agg, then per-round O(distinct pairs) sweeps (see
    stages/bpe.py). Iterative + tie-broken deterministically, so the
    oracle is a frozen sf0.01 snapshot; the independent anchor is the
    single-process differential test (distributed == reference on
    random multi-block corpora)."""
    import pandas as pd

    from magic_content_extractor_ray.stages.bpe import bpe_train

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    merges = bpe_train(docs, column="text", num_merges=40)
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "pair_count"])

def q_vocab_jaccard_langs(sf_dir: str):
    """Pairwise VOCABULARY Jaccard between languages (corpus-drift /
    contamination diagnostic) — the _tag_set_overlap bitmask machinery
    over distinct (token, lang)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def tok_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        langs = t.column("lang").take(parent)
        return pa.table({"token": flat, "lang": langs}).group_by(
            ["token", "lang"]).aggregate([])

    toks = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["lang", "text"]
                    ).map_batches(tok_partial, batch_format="pyarrow")
    return _tag_set_overlap(toks, key="token", tag="lang",
                            prefix="lang", producer_expands=True)

def q_source_ttr(sf_dir: str):
    """Type-token ratio + mean token length per source (lexical-richness
    screens for machine-generated / template text): per-batch
    (source, token) count partials, one composite-key hash_agg to make
    counts exact-distinct, then a per-batch fold to per-source partials
    (sources are bounded) merged on the driver. ttr/char stats are
    floor-ppm integers."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def tok_partial(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        srcs = t.column("source").take(parent)
        g = pa.table({"token": flat, "source": srcs}).group_by(
            ["token", "source"]).aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    counts = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["source", "text"]
                 ).map_batches(tok_partial, batch_format="pyarrow"),
        "token", [("c", "sum", "c")], group_cols=["token", "source"],
        producer_expands=True)

    def fold(t: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(t.column("token")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        g = pa.table({
            "source": t.column("source"),
            "n_types": pa.array(np.ones(len(c), np.int64)),
            "n_tokens": pa.array(c),
            "sum_chars": pa.array(ln * c),
        }).group_by("source").aggregate(
            [("n_types", "sum"), ("n_tokens", "sum"),
             ("sum_chars", "sum")])
        return g.rename_columns(["source", "n_types", "n_tokens",
                                 "sum_chars"])

    parts = counts.map_batches(fold, batch_format="pyarrow").to_pandas()
    out = parts.groupby("source", as_index=False)[
        ["n_types", "n_tokens", "sum_chars"]].sum()
    for col in ("n_types", "n_tokens", "sum_chars"):
        out[col] = out[col].astype("int64")
    out["ttr_ppm"] = (1_000_000 * out["n_types"]) // out["n_tokens"]
    return out.sort_values("source").reset_index(drop=True)

def q_ndcg_eval(sf_dir: str):
    """RETRIEVAL EVALUATION: nDCG@20 of the BM25 ranking against
    boolean-AND relevance (docs containing ALL query terms) — both
    legs fully SQL-expressible, so the metric has a true independent
    oracle (unlike recall-vs-snapshot checks). Discount terms
    1/log2(i+1) are half-up nano-ints summed in rank order; ideal DCG
    uses min(20, |gold|) positions; ndcg_ppm is exact integer
    division. Gold membership of the 20 ranked docs is a tiny pushed
    is_in read — |gold| itself is a distributed count."""
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.retrieval import bm25_topk

    K = 20

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    lex = bm25_topk(docs, list(_BM25_TERMS), k=K).take_all()
    lex.sort(key=lambda r: (-r["score"], r["doc_id"]))
    ranked = [int(r["doc_id"]) for r in lex]

    def and_flag(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        flag = None
        for term in _BM25_TERMS:
            m = pc.match_substring_regex(
                low, rf"(?:^|\s){term}(?:\s|$)")
            flag = m if flag is None else pc.and_(flag, m)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "g": pc.cast(flag, pa.int64())})

    flags = docs.map_batches(and_flag,
                             batch_format="pyarrow").materialize()
    n_gold = int(flags.sum("g"))
    rset = pa.array(ranked, pa.int64())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.is_in(t.column("doc_id"), value_set=rset),
            pc.equal(t.column("g"), 1)))

    in_ranked = flags.map_batches(pick,
                                  batch_format="pyarrow").to_pandas()
    gold_ranked = set(in_ranked["doc_id"].astype("int64"))

    def nano_disc(i: int) -> int:
        return math.floor(1e9 / math.log2(i + 1.0) + 0.5)

    dcg = sum(nano_disc(i) for i, d in enumerate(ranked, start=1)
              if d in gold_ranked)
    idcg = sum(nano_disc(i) for i in range(1, min(K, n_gold) + 1))
    return pd.DataFrame({
        "n_gold": pd.Series([n_gold], dtype="int64"),
        "dcg_nano": pd.Series([dcg], dtype="int64"),
        "idcg_nano": pd.Series([idcg], dtype="int64"),
        "ndcg_ppm": pd.Series([(1_000_000 * dcg) // idcg],
                              dtype="int64")})

def q_nucleus_vocab(sf_dir: str):
    """NUCLEUS (top-p) vocabulary cut per language: the smallest count
    of distinct terms — taken in (count desc, term asc) order — whose
    cumulative mass reaches half of the lang's token mass, plus the
    exact mass those terms cover. Term counts are one (lang, term)
    combiner shuffle; each lang's ordered cumsum runs inside its hash
    partition (vocab per partition is term-scale, the per-lang sort is
    the same work the top-terms family already does). All integer."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = pc.take(batch.column("lang"), parent)
        mask = pc.not_equal(flat, "")
        g = pa.table({"lang": pc.take(lang, pc.indices_nonzero(mask)),
                      "term": pc.take(flat, pc.indices_nonzero(mask)),
                      }).group_by(["lang", "term"]).aggregate(
            [([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "term": g.column("term"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    tc = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["lang", "text"]).map_batches(
            counts, batch_format="pyarrow"),
        "lang", [("c", "sum", "c")], group_cols=["lang", "term"])

    def nucleus(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "vocab_size": pa.array([], pa.int64()),
                          "nucleus_terms": pa.array([], pa.int64()),
                          "nucleus_mass": pa.array([], pa.int64()),
                          "total_mass": pa.array([], pa.int64())})
        if not len(t):
            return empty
        df = t.select(["lang", "term", "c"]).to_pandas()
        rows = []
        for lang, g in df.groupby("lang", sort=True):
            g = g.sort_values(["c", "term"],
                              ascending=[False, True])
            c = g["c"].to_numpy(dtype=np.int64)
            total = int(c.sum())
            cum = np.cumsum(c)
            # smallest k with 2*cum[k-1] >= total (exact half rule)
            k = int(np.searchsorted(2 * cum, total, side="left")) + 1
            rows.append({"lang": lang, "vocab_size": len(c),
                         "nucleus_terms": k,
                         "nucleus_mass": int(cum[k - 1]),
                         "total_mass": total})
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = map_key_partitions(tc, "lang", nucleus).to_pandas()
    return out.sort_values("lang").reset_index(drop=True)

def q_phrase_search(sf_dir: str):
    """Exact PHRASE query (positional match, not bag-of-words): docs
    whose token stream contains the consecutive phrase "batch hash" —
    one vectorized RE2 pass per batch, whitespace-tokenization
    boundaries mirrored exactly by the SQL twin's regexp. Output:
    per-source match counts (the phrase-filter aggregate shape)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    PAT = r"(?:^|\s)batch\s+hash(?:\s|$)"

    def flags(batch: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(
            pc.utf8_lower(batch.column("text")), PAT)
        g = pa.table({"source": batch.column("source"),
                      "n_docs": pa.array(np.ones(len(batch), np.int64)),
                      "n_match": pc.cast(m, pa.int64())}).group_by(
            "source").aggregate([("n_docs", "sum"), ("n_match", "sum")])
        return g.rename_columns(["source", "n_docs", "n_match"])

    out = _read_pq(f"{sf_dir}/documents.parquet",
                   columns=["source", "text"]).map_batches(
        flags, batch_format="pyarrow").groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_match", alias_name="n_match")).to_pandas()
    return out.sort_values("source").reset_index(drop=True)

def q_index_compression(sf_dir: str):
    """Inverted-index STORAGE model: Elias-gamma cost of delta-encoded
    posting lists for the 20 highest-df terms — per posting gap g the
    code costs 2·⌊log2 g⌋+1 bits, computed EXACTLY as bit_length−1
    (no float log2; the SQL twin uses length(printf('%b', g))−1).
    Posting lists are term-keyed hash partitions: doc-id gaps, gamma
    bits and counts reduce per segment; output compares gamma bits
    against the raw 64-bit layout as floor-ppm."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    K = 20

    def doc_terms(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(batch.column("doc_id"), parent)
        mask = pc.not_equal(flat, "")
        sel = pc.indices_nonzero(mask)
        g = pa.table({"term": pc.take(flat, sel),
                      "doc_id": pc.take(ids, sel)}).group_by(
            ["term", "doc_id"]).aggregate([])
        return g

    posts = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text"]).map_batches(
            doc_terms, batch_format="pyarrow").map_batches(
            lambda t: t.append_column("one", pa.array(
                np.ones(len(t), np.int64))), batch_format="pyarrow"),
        "term", [("one", "max", "one")],
        group_cols=["term", "doc_id"]).materialize()

    df = hash_agg(posts, "term", [("one", "sum", "df")]).to_pandas()
    top = df.sort_values(["df", "term"],
                         ascending=[False, True]).head(K)
    top_terms = set(top["term"])

    def gamma_bits(t: pa.Table) -> pa.Table:
        term = t.column("term").to_numpy(zero_copy_only=False)
        empty = pa.table({"term": pa.array([], pa.string()),
                          "n_postings": pa.array([], pa.int64()),
                          "gamma_bits": pa.array([], pa.int64())})
        if not len(term):
            return empty
        keep = np.array([x in top_terms for x in term])
        if not keep.any():
            return empty
        term = term[keep]
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False)[keep].astype(np.int64)
        starts = segment_starts(term)
        lens = segment_lengths(starts, len(term))
        # gap: first posting = doc_id + 1 (ids can be 0), then deltas
        gaps = np.empty(len(ids), dtype=np.int64)
        gaps[starts] = ids[starts] + 1
        rest = np.ones(len(ids), dtype=bool)
        rest[starts] = False
        gaps[rest] = ids[rest] - ids[np.flatnonzero(rest) - 1]
        # exact ⌊log2⌋ via bit length: frexp exponent is exact for
        # integers < 2^53 (doc-id gaps always are)
        nbits = np.frexp(gaps.astype(np.float64))[1].astype(np.int64)
        bits = 2 * (nbits - 1) + 1
        return pa.table({
            "term": pa.array(term[starts], pa.string()),
            "n_postings": pa.array(lens, pa.int64()),
            "gamma_bits": pa.array(np.add.reduceat(bits, starts),
                                   pa.int64())})

    from ray.data.aggregate import Sum

    out = map_key_partitions(posts, "term", gamma_bits,
                             sort_cols=["doc_id"]).groupby(
        "term").aggregate(
        Sum("n_postings", alias_name="n_postings"),
        Sum("gamma_bits", alias_name="gamma_bits")).to_pandas()
    out["raw_bits"] = (64 * out["n_postings"]).astype("int64")
    out["ratio_ppm"] = ((1_000_000 * out["gamma_bits"])
                        // out["raw_bits"]).astype("int64")
    return out.sort_values("term").reset_index(drop=True)

def q_lang_cross_entropy(sf_dir: str):
    """Language-model EVALUATION MATRIX: an add-1-smoothed character
    BIGRAM model per language, evaluated on every language (5×5
    cross-entropy) — the diagonal should be the row minimum (a model
    fits its own language best). One (lang × bigram) combiner shuffle
    (vocab-bounded); the matrix math runs on the driver in integer
    nano-nats — each bigram TYPE's ln p is half-up rounded BEFORE the
    count-weighted sum, so the total is order-independent and the SQL
    twin matches exactly. Output: eval_lang × train_lang,
    per-character cross-entropy in nano-nats (floor)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def bigram_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "bg": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        texts = [t.lower() for t in batch.column("text").to_pylist()]
        langs = batch.column("lang").to_pylist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        if not len(texts) or lens.sum() == 0:
            return empty
        codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                              dtype=np.uint32).astype(np.int64)
        if codes.max() >= (1 << 21):
            raise ValueError("bigram pack needs codepoints < 2^21")
        lang_u, lang_inv = np.unique(np.array(langs), return_inverse=True)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        offset = np.arange(len(codes)) - np.repeat(starts, lens)
        doc = np.repeat(np.arange(len(texts)), lens)
        valid = offset < np.repeat(lens, lens) - 1  # within-doc pairs
        pk = (lang_inv[doc] << np.int64(42)) \
            | (codes << np.int64(21)) \
            | np.concatenate((codes[1:], [0]))
        pk = pk[valid]
        if not len(pk):
            return empty
        pku, cnt = np.unique(pk, return_counts=True)
        m21 = np.int64((1 << 21) - 1)
        return pa.table({
            "lang": pa.array([str(lang_u[i]) for i in pku >> 42],
                             pa.string()),
            "bg": pa.array([chr(int(a)) + chr(int(b)) for a, b in
                            zip((pku >> np.int64(21)) & m21,
                                pku & m21)], pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64())})

    counts = _read_pq(f"{sf_dir}/documents.parquet",
                      columns=["lang", "text"]).map_batches(
        bigram_counts, batch_format="pyarrow").groupby(
        ["lang", "bg"]).aggregate(Sum("c", alias_name="c")).to_pandas()

    langs = sorted(counts["lang"].unique())
    vocab = sorted(counts["bg"].unique())
    v = len(vocab)
    c_map = {(r.lang, r.bg): int(r.c) for r in counts.itertuples()}
    totals = counts.groupby("lang")["c"].sum().to_dict()
    rows = []
    for ev in langs:
        t_eval = int(totals[ev])
        for tr in langs:
            denom = float(int(totals[tr]) + v)
            ce = 0
            for bg in vocab:
                ce_cnt = c_map.get((ev, bg), 0)
                if not ce_cnt:
                    continue
                lp = math.log(float(c_map.get((tr, bg), 0) + 1)
                              / denom)
                ce -= ce_cnt * int(math.floor(lp * 1e9 + 0.5))
            rows.append({"eval_lang": ev, "train_lang": tr,
                         "ce_nano_per_char": ce // t_eval})
    return pd.DataFrame(rows).astype({"ce_nano_per_char": "int64"})

def q_zipf_slope(sf_dir: str):
    """ZIPF'S-LAW fit: OLS slope of ln(frequency) on ln(rank) over
    the top-100 terms (true Zipf ⇒ slope ≈ −1). Both logs are
    half-up-rounded to integer NANO-nats per term BEFORE the
    regression sums (the order-independent idiom — float Σ over SQL
    rows has no guaranteed order), the sums run in arbitrary
    precision (nano² crosses int64), and only the final
    num/den division is a mirrored double op. Term counts are one
    combiner shuffle + partial top-k."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    K = 100

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"term": flat}).group_by("term").aggregate(
            [([], "count_all")])
        return pa.table({"term": g.column("term"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    tc = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet", columns=["text"]
                 ).map_batches(counts, batch_format="pyarrow"),
        "term", [("c", "sum", "c")])

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("c", "descending"),
                                   ("term", "ascending")], k=K)

    df = tc.map_batches(partial_topk, batch_format="pyarrow",
                        batch_size=8192).to_pandas()
    df = df.sort_values(["c", "term"],
                        ascending=[False, True]).head(K)
    freqs = df["c"].to_numpy(dtype=np.int64)
    n = len(freqs)
    xs = [int(math.floor(math.log(float(r)) * 1e9 + 0.5))
          for r in range(1, n + 1)]
    ys = [int(math.floor(math.log(float(c)) * 1e9 + 0.5))
          for c in freqs]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    return pd.DataFrame({
        "n_terms": pd.Series([n], dtype="int64"),
        "zipf_slope": [float(num) / float(den)]})

def q_dict_encoding(sf_dir: str):
    """Storage-engine cost model: DICTIONARY vs PLAIN encoding size for
    every low-cardinality string column in the star schema (the choice
    a Parquet/Lance writer makes per column chunk). Per column: one
    combiner map pass (per-batch group_by value → count), bounded cell
    tables merged driver-side with exact integers. dict_bytes =
    Σ strlen(distinct value bytes) + ceil(n_rows·bits/8) with bits =
    bit_length(n_distinct − 1) — the bit-packed index width Parquet's
    RLE_DICTIONARY uses. All-integer, byte-exact vs the SQL twin
    (strlen / printf('%%b') bit widths)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    COLS = [("documents", "lang"), ("documents", "source"),
            ("events", "event_type"), ("customer", "c_mktsegment"),
            ("orders", "o_orderpriority")]

    def make_partial(col):
        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by([col]).aggregate([([], "count_all")])
            return pa.table({
                "v": g.column(col),
                "c": pc.cast(g.column("count_all"), pa.int64())})
        return partial

    rows = []
    for table, col in COLS:
        cells = _read_pq(f"{sf_dir}/{table}.parquet",
                         columns=[col]).map_batches(
            make_partial(col), batch_format="pyarrow").to_pandas()
        cells = cells.groupby("v", as_index=False)["c"].sum()
        n = int(cells["c"].sum())
        nd = len(cells)
        octets = [len(str(v).encode()) for v in cells["v"]]
        plain = sum(int(c) * o for c, o in zip(cells["c"], octets))
        bits = (nd - 1).bit_length() if nd > 1 else 0
        dict_bytes = sum(octets) + (n * bits + 7) // 8
        rows.append({"col": f"{table}.{col}", "n_rows": n,
                     "n_distinct": nd, "plain_bytes": plain,
                     "dict_bytes": dict_bytes})
    return pd.DataFrame(rows).sort_values("col").reset_index(
        drop=True).astype({"n_rows": "int64", "n_distinct": "int64",
                           "plain_bytes": "int64",
                           "dict_bytes": "int64"})

def q_textrank_keywords(sf_dir: str):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — nodes are content words
    (len ≥ 4 after lowercasing), edges join words adjacent in the
    filtered token sequence of a document, symmetrized, weighted by
    corpus-wide co-occurrence multiplicity. Reuses stages/pagerank.py
    (broadcast mode: edge list streams, only the vocab-sized rank
    vector moves per iteration); 10 damped iterations, ranks rounded
    to the 1e-8 grain exactly like q_page_rank, top-20 by
    (rank desc, word asc)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.pagerank import pagerank

    MIN_LEN = 4

    def word_edges(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.greater_equal(pc.utf8_length(flat), MIN_LEN)
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if isinstance(parent, pa.ChunkedArray):
            parent = parent.combine_chunks()
        n = len(flat)
        if n < 2:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string())})
        pnp = parent.to_numpy(zero_copy_only=False)
        same = pa.array(pnp[:-1] == pnp[1:])
        a = flat.slice(0, n - 1).filter(same)
        b = flat.slice(1, n - 1).filter(same)
        # undirected: emit both directions
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks()
                                     if isinstance(a, pa.ChunkedArray)
                                     else a,
                                     b.combine_chunks()
                                     if isinstance(b, pa.ChunkedArray)
                                     else b]),
            "dst": pa.concat_arrays([b.combine_chunks()
                                     if isinstance(b, pa.ChunkedArray)
                                     else b,
                                     a.combine_chunks()
                                     if isinstance(a, pa.ChunkedArray)
                                     else a])})

    e = _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["text"]).map_batches(
        word_edges, batch_format="pyarrow").materialize()

    # pagerank wants integer nodes: dictionary-encode the vocab once
    # (vocab-scale — the dimension-broadcast policy) and map back after
    import ray

    def vocab_partial(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)]))
        return pa.table({"w": pa.array(u, pa.string())})

    vrows = e.map_batches(vocab_partial, batch_format="pyarrow").take_all()
    vocab = np.unique(np.array([r["w"] for r in vrows], dtype=object))
    vref = ray.put(vocab)

    def encode(t: pa.Table, _v=vref) -> pa.Table:
        v = ray.get(_v)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.searchsorted(v, s), pa.int64()),
            "dst": pa.array(np.searchsorted(v, d), pa.int64())})

    pr = pagerank(e.map_batches(encode, batch_format="pyarrow"),
                  damping=0.85, n_iter=10)
    r = pr.column("rank").to_numpy()
    ids = pr.column("node").to_numpy()
    t = pa.table({
        "word": pa.array(vocab[ids], pa.string()),
        "pr_e8": pa.array(np.floor(r * 1e8 + 0.5).astype(np.int64),
                          pa.int64())})
    df = t.to_pandas().sort_values(
        ["pr_e8", "word"], ascending=[False, True]).head(20)
    return df.reset_index(drop=True)

def q_bpe_encode(sf_dir: str):
    """TOKENIZER APPLICATION: encode the corpus with the 40-merge BPE
    table trained by stages/bpe.bpe_train (the q_bpe_train model) and
    report per-doc word count, subword count, and fertility
    (subwords-per-word, integer micro-units) — the token-budget
    accounting step between tokenizer training and packing. The merge
    table is tiny → ray.put once; encoding is an ACTOR pool whose
    per-actor word-TYPE cache encodes each distinct word once (types ≪
    tokens — the same observation bpe_train exploits), batches
    vectorize via np.unique + inverse counts. Not SQL-expressible
    (iterative greedy merges): the oracle is a frozen sf0.01 snapshot;
    the independent anchor is the pytest differential vs brute-force
    bpe_encode_word on every doc (tests/test_training_ops.py)."""
    import numpy as np
    import pyarrow as pa

    import ray

    from magic_content_extractor_ray.stages.bpe import (
        bpe_encode_word, bpe_train)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    merges = bpe_train(docs, column="text", num_merges=40)
    mref = ray.put(merges)

    class Encode:
        def __init__(self):
            self.merges = ray.get(mref)
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            import re

            ws = re.compile(r"\S+", re.ASCII)
            nw = np.zeros(len(batch), np.int64)
            nsw = np.zeros(len(batch), np.int64)
            texts = batch.column("text").to_pylist()
            for i, t in enumerate(texts):
                words = ws.findall((t or "").lower())
                if not words:
                    continue
                uw, cnt = np.unique(np.array(words, dtype=object),
                                    return_counts=True)
                subs = np.empty(len(uw), np.int64)
                for j, w in enumerate(uw):
                    s = self.cache.get(w)
                    if s is None:
                        s = len(bpe_encode_word(w, self.merges))
                        self.cache[w] = s
                    subs[j] = s
                nw[i] = int(cnt.sum())
                nsw[i] = int((subs * cnt).sum())
            out = pa.table({
                "doc_id": pa.array(batch.column("doc_id").to_numpy(
                    zero_copy_only=False).astype(np.int64), pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_subwords": pa.array(nsw, pa.int64())})
            import pyarrow.compute as pc

            out = out.filter(pc.greater(out.column("n_words"), 0))
            fert = pc.divide(pc.multiply(out.column("n_subwords"),
                                         pa.scalar(1_000_000,
                                                   pa.int64())),
                             out.column("n_words"))
            return out.append_column("fertility_micro", fert)

    return docs.map_batches(Encode, batch_format="pyarrow",
                            batch_size=256,
                            concurrency=(1, 8)).sort("doc_id")

def q_rank_rbo(sf_dir: str):
    """RANK-BIASED OVERLAP (Webber et al. 2010) between two term
    rankings of the corpus — document frequency vs raw term frequency
    (the ranking-stability diagnostic for vocabulary selection):
    prefix RBO at depth 50 with p = 0.9, each depth's contribution
    (1−p)·p^(i−1)·|A_i ∩ B_i|/i rounded to integer nanos BEFORE the
    sum (the nano-nat idiom). The corpus-scale part is one tokenize +
    per-(term) combiner computing df (distinct docs) and tf (raw
    count) together; the two top-50 lists and the depth sweep are
    driver-side on a 50-row object. Ties break term-ascending in both
    rankings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import hash_agg

    DEPTH, P = 50, 0.9

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def term_stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        tt = pa.table({"term": flat, "row": parent})
        g = tt.group_by(["term", "row"]).aggregate([("row", "count")])
        # per (doc,term): df contribution 1, tf contribution count
        return pa.table({
            "term": g.column("term"),
            "df": pa.array(np.ones(len(g), np.int64), pa.int64()),
            "tf": pa.array(g.column("row_count").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())})

    stats = hash_agg(docs.map_batches(term_stats,
                                      batch_format="pyarrow"),
                     "term", [("df", "sum", "df"), ("tf", "sum", "tf")])

    def topk(t: pa.Table, col: str) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.select_k_unstable(
            t, k=DEPTH, sort_keys=[(col, "descending"),
                                   ("term", "ascending")])
        return t.take(idx)

    tops = stats.map_batches(
        lambda t: pa.concat_tables([topk(t, "df"), topk(t, "tf")]),
        batch_format="pyarrow").to_pandas().drop_duplicates("term")

    a = tops.sort_values(["df", "term"],
                         ascending=[False, True]).head(DEPTH)
    b = tops.sort_values(["tf", "term"],
                         ascending=[False, True]).head(DEPTH)
    A = a["term"].tolist()
    B = b["term"].tolist()
    rbo = 0
    for i in range(1, DEPTH + 1):
        ov = len(set(A[:i]) & set(B[:i]))
        term = (1 - P) * (P ** (i - 1)) * ov / i
        rbo += int(np.floor(term * 1e9 + 0.5))
    return pd.DataFrame([{"depth": DEPTH, "rbo_nano": rbo}]).astype(
        "int64")

def q_oov_rate(sf_dir: str):
    """OUT-OF-VOCABULARY rate per source against the corpus top-1000
    vocabulary (the tokenizer-coverage audit run before committing a
    vocab size): reference vocab = top-1000 terms by (count desc, term
    asc); per source, the fraction of token OCCURRENCES outside it, in
    floor ppm. Vocab selection is per-partition top-k candidates + a
    driver final top-k (vocab-scale, broadcast once via ray.put);
    the per-source scan is one vectorized membership map + combiner."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.window import hash_agg

    V = 1000

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])

    def term_counts(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        tt = pa.table({"term": flat})
        g = tt.group_by(["term"]).aggregate([([], "count_all")])
        return pa.table({"term": g.column("term"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    counts = hash_agg(docs.map_batches(term_counts,
                                       batch_format="pyarrow"),
                      "term", [("c", "sum", "c")])

    def topv(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=V, sort_keys=[("c", "descending"),
                               ("term", "ascending")])
        return t.take(idx)

    cand = counts.map_batches(topv, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["c", "term"],
                            ascending=[False, True]).head(V)
    vocab = np.sort(cand["term"].to_numpy().astype(object))
    vref = ray.put(vocab)

    def per_source(t: pa.Table, _v=vref) -> pa.Table:
        vv = ray.get(_v)
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        words = flat.to_numpy(zero_copy_only=False).astype(object)
        pidx = np.searchsorted(vv, words)
        pidx[pidx >= len(vv)] = 0
        inv = vv[pidx] != words
        src = t.column("source").take(parent).to_numpy(
            zero_copy_only=False)
        us, iv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(us, pa.string()),
            "n_tokens": pa.array(np.bincount(iv, minlength=len(us))
                                 .astype(np.int64), pa.int64()),
            "n_oov": pa.array(_bincount_i64(iv, inv, minlength=len(us)),
                              pa.int64())})

    agg = hash_agg(docs.map_batches(per_source, batch_format="pyarrow"),
                   "source", [("n_tokens", "sum", "n_tokens"),
                              ("n_oov", "sum", "n_oov")]).to_pandas()
    agg = agg.sort_values("source").reset_index(drop=True)
    agg["oov_ppm"] = (1_000_000 * agg["n_oov"].astype("int64")) \
        // agg["n_tokens"].astype("int64")
    return agg.astype({"n_tokens": "int64", "n_oov": "int64",
                       "oov_ppm": "int64"})

def q_term_burstiness(sf_dir: str):
    """TERM BURSTINESS (Church & Gale / Katz): exact integer sufficient
    statistics of per-document term counts — n_docs containing, Σc,
    Σc², plus the floor-ppm variance-to-mean ratio computed over ALL N
    docs (a Poisson term has VMR ≈ 1; bursty content words ≫ 1) — for
    the 50 highest-df terms (ties term asc). Per-batch (term, doc)
    count partials ride ONE term-keyed combiner; df-top-50 selection is
    per-partition select_k + driver final. VMR_ppm uses the exact
    integer identity 10⁶·(N·Σc² − (Σc)²) // (Σc·N) — population
    variance over mean, single floor, no float sums."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    K = 50

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    n_docs = docs.count()

    def per_doc_counts(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        tt = pa.table({"term": flat, "row": parent})
        g = tt.group_by(["term", "row"]).aggregate([("row", "count")])
        c = pc.cast(g.column("row_count"), pa.int64())
        return pa.table({
            "term": g.column("term"),
            "df": pa.array(np.ones(len(g), np.int64), pa.int64()),
            "sc": c,
            "sc2": pc.multiply(c, c)})

    stats = hash_agg(docs.map_batches(per_doc_counts,
                                      batch_format="pyarrow"),
                     "term", [("df", "sum", "df"), ("sc", "sum", "sc"),
                              ("sc2", "sum", "sc2")])

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=K, sort_keys=[("df", "descending"),
                               ("term", "ascending")])
        return t.take(idx)

    cand = stats.map_batches(topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["df", "term"],
                            ascending=[False, True]).head(K)
    sc = cand["sc"].to_numpy().astype(np.int64)
    sc2 = cand["sc2"].to_numpy().astype(np.int64)
    vmr = (1_000_000 * (n_docs * sc2 - sc * sc)) // (sc * n_docs)
    out = pd.DataFrame({
        "term": cand["term"].to_numpy(),
        "df": cand["df"].astype("int64").to_numpy(),
        "sum_c": sc, "sum_c2": sc2,
        "vmr_ppm": vmr}).sort_values("term").reset_index(drop=True)
    return out.astype({"df": "int64", "sum_c": "int64",
                       "sum_c2": "int64", "vmr_ppm": "int64"})

def q_heaps_fit(sf_dir: str):
    """HEAPS'-LAW FIT V = K·Nᵝ over the word-trigram growth curve
    (q_vocab_growth's diagnostic turned into the two sizing constants):
    per 50-doc bucket, cumulative trigram OCCURRENCES N and cumulative
    distinct vocabulary V (per-trigram min-doc exchange), then log-log
    OLS with per-point nano logs and exact integer sums (the
    zipf_slope idiom) — β is scale-free in the nano logs; ln K comes
    back in nanos. Output (n_points, beta_nano, logk_nano)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    W = 50

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def trigrams(t: pa.Table) -> pa.Table:
        texts = t.column("text")
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
        ntok = len(flat)
        if ntok < 3:
            return pa.table({"ng": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        parts = [flat.slice(i, ntok - 2) for i in range(3)]
        ngrams = pc.binary_join_element_wise(*parts, " ")
        pnp = parent.to_numpy(zero_copy_only=False)
        same = pa.array(pnp[:ntok - 2] == pnp[2:])
        ngrams = ngrams.filter(same)
        ids = pc.cast(t.column("doc_id").take(
            pa.array(pnp[:ntok - 2][same.to_numpy(
                zero_copy_only=False)])), pa.int64())
        return pa.table({"ng": ngrams, "doc_id": ids})

    tg = docs.map_batches(trigrams, batch_format="pyarrow") \
        .materialize()

    def occ_part(t: pa.Table) -> pa.Table:
        b = t.column("doc_id").to_numpy(zero_copy_only=False) // W
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    occ = hash_agg(tg.map_batches(occ_part, batch_format="pyarrow"),
                   "b", [("c", "sum", "c")]).to_pandas()

    def md_part(t: pa.Table) -> pa.Table:
        g = t.group_by(["ng"]).aggregate([("doc_id", "min")])
        return pa.table({"ng": g.column("ng"),
                         "md": pc.cast(g.column("doc_id_min"),
                                       pa.int64())})

    firsts = hash_agg(tg.map_batches(md_part, batch_format="pyarrow"),
                      "ng", [("md", "min", "md")])

    def vb_part(t: pa.Table) -> pa.Table:
        b = t.column("md").to_numpy(zero_copy_only=False) // W
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u, pa.int64()),
                         "v": pa.array(c.astype(np.int64), pa.int64())})

    vb = hash_agg(firsts.map_batches(vb_part, batch_format="pyarrow"),
                  "b", [("v", "sum", "v")]).to_pandas()

    merged = occ.set_index("b").join(vb.set_index("b"), how="outer") \
        .fillna(0).astype("int64").sort_index()
    cn = merged["c"].cumsum().to_numpy()
    cv = merged["v"].cumsum().to_numpy()
    keep = (cn > 0) & (cv > 0)
    x = np.floor(np.log(cn[keep].astype(np.float64)) * 1e9
                 + 0.5).astype(np.int64)
    y = np.floor(np.log(cv[keep].astype(np.float64)) * 1e9
                 + 0.5).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = sum(int(a) * int(a) for a in x)
    sxy = sum(int(a) * int(b_) for a, b_ in zip(x, y))
    beta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    beta_nano = int(math.floor(beta * 1e9 + 0.5))
    logk_nano = int(math.floor((sy - beta * sx) / n + 0.5))
    return pd.DataFrame([{"n_points": n, "beta_nano": beta_nano,
                          "logk_nano": logk_nano}]).astype("int64")

def q_good_turing(sf_dir: str):
    """GOOD-TURING frequency-of-frequencies table for the corpus
    unigram distribution (the classical smoothing estimator's input):
    for every observed count r, the number of distinct terms N_r seen
    exactly r times, plus the adjusted-count fraction as the exact
    integer pair gt_num = (r+1)·N_{r+1}, gt_den = N_r (the smoothing
    layer divides; no float anywhere). Term counts are one combiner
    exchange; the frequency-of-frequencies reduce is a second tiny
    combiner over (count) keys — output is O(distinct counts)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"term": flat}).group_by(["term"]).aggregate(
            [([], "count_all")])
        return pa.table({"term": g.column("term"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    counts = hash_agg(docs.map_batches(term_counts,
                                       batch_format="pyarrow"),
                      "term", [("c", "sum", "c")])

    def fof_partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        u, k = np.unique(c, return_counts=True)
        return pa.table({"r": pa.array(u, pa.int64()),
                         "nr": pa.array(k.astype(np.int64),
                                        pa.int64())})

    fof = hash_agg(counts.map_batches(fof_partial,
                                      batch_format="pyarrow"),
                   "r", [("nr", "sum", "nr")]).to_pandas()
    fof = fof.sort_values("r").reset_index(drop=True)
    r = fof["r"].to_numpy().astype(np.int64)
    nr = fof["nr"].to_numpy().astype(np.int64)
    nxt = {int(a): int(b) for a, b in zip(r, nr)}
    gt_num = np.array([(int(x) + 1) * nxt.get(int(x) + 1, 0)
                       for x in r], dtype=np.int64)
    return pd.DataFrame({"r": r, "n_r": nr, "gt_num": gt_num,
                         "gt_den": nr}).astype("int64")
